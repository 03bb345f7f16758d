"""Zero-extra-pass pipeline telemetry via Spark's Observation API.

A 100-TB pipeline needs row counts, null rates, and value bounds at
every stage — but a separate ``count()``/``agg()`` per stage re-scans
(or re-shuffles) the data it just processed.  ``DataFrame.observe``
piggybacks named aggregates onto whatever action the caller was going
to run anyway: the metrics accumulate inside the SAME job, cost one
accumulator merge, and arrive after the action completes.  This is the
mechanism behind every serious ingest's "rows in / rows out / null
keys" ledger.

Caveats the wrapper encodes: observed aggregates must be commutative
accumulator-style expressions (count/sum/min/max — no distinct, no
percentiles), and the values describe ONE action's execution — re-use
of the Observation across actions raises, so the wrapper hands back a
fresh one per call.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_profile(
    df: DataFrame,
    cols: Sequence[str],
    name: str = "profile",
) -> tuple[DataFrame, Observation]:
    """Attach a per-stage data-quality profile to ``df`` that costs
    nothing beyond the action the caller already runs: total rows plus,
    per column, null count and min/max.  Returns ``(df, observation)``
    — run any action on the returned frame, then read
    ``observation.get`` (blocks until the action finishes).

    Metric names: ``n_rows``, ``<col>_nulls``, ``<col>_min``,
    ``<col>_max``.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")
        )
        metrics.append(F.min(c).alias(f"{c}_min"))
        metrics.append(F.max(c).alias(f"{c}_max"))
    return df.observe(obs, *metrics), obs
