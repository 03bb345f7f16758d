"""Grouped two-frame pandas processing — ``cogroup().applyInPandas``.

The escape hatch for per-key logic that needs BOTH sides of a join as
materialized frames at once (sequence alignment, per-key model fit
against a reference series, order-book replay): Spark co-shuffles the
two inputs on the key and hands each key's pair of pandas frames to an
Arrow-batched Python function — one shuffle per side, no driver
involvement, vectorized inside the batch.

Use the relational form when the logic IS relational (join + agg beats
any UDF; see the module docstrings everywhere else in this package).
The demo operator below — per-order reconciliation of the order header
total against its line items — is deliberately chosen to HAVE a
relational equivalent, so the parity test and the DuckDB oracle can
verify the cogroup path end-to-end rather than trusting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile_orders_lines(
    orders: DataFrame,
    lines: DataFrame,
    key: str = "o_orderkey",
    line_key: str = "l_orderkey",
) -> DataFrame:
    """Per-order reconciliation via cogroup: each order's header frame
    and line frame arrive together; output is (orderkey, header total,
    line revenue total, line count, delta).  Orders with no lines and
    lines with no order header both surface (full-outer semantics) —
    the classic ledger-reconciliation shape."""
    import pandas as pd

    def _reconcile(o_pdf: "pd.DataFrame", l_pdf: "pd.DataFrame") -> "pd.DataFrame":
        # dirty-input guards: a NULL join key cogroups as NaN, and NaN
        # survives neither int() nor astype('int64') — ledger
        # reconciliation exists to SURFACE bad rows, not crash on them
        if len(o_pdf):
            k0 = o_pdf[key].iloc[0]
            t0 = o_pdf["o_totalprice"].iloc[0]
            k = int(k0) if pd.notna(k0) else None
            total = float(t0) if pd.notna(t0) else None
        else:
            k0 = l_pdf[line_key].iloc[0]
            k = int(k0) if pd.notna(k0) else None
            total = None
        l_pdf = l_pdf.dropna(subset=["l_extendedprice", "l_discount"])
        if len(l_pdf):
            # integer micro-unit accumulation: price and discount are
            # 2-decimal quantities, so round(x*100) recovers the exact
            # integer cents/percent and the per-line product
            # cents * (100 - disc_pct) is EXACT — the sum is integer
            # arithmetic, bit-identical to any engine's replay,
            # independent of accumulation order
            cents = (l_pdf["l_extendedprice"] * 100.0).round().astype("int64")
            disc = (l_pdf["l_discount"] * 100.0).round().astype("int64")
            line_total = float(int((cents * (100 - disc)).sum()) / 10000.0)
            n = int(len(l_pdf))
        else:
            line_total, n = None, 0
        return pd.DataFrame(
            {
                "orderkey": [k],
                "header_total": [total],
                "line_total": [line_total],
                "n_lines": [n],
            }
        )

    return (
        orders.select(key, "o_totalprice")
        .groupBy(key)
        .cogroup(lines.select(line_key, "l_extendedprice", "l_discount").groupBy(line_key))
        .applyInPandas(
            _reconcile,
            "orderkey long, header_total double, line_total double, n_lines long",
        )
        .withColumn(
            "delta",
            F.when(
                F.col("header_total").isNotNull()
                & F.col("line_total").isNotNull(),
                F.col("header_total") - F.col("line_total"),
            ),
        )
    )
