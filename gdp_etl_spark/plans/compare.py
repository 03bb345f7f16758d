"""Release-diff job (``gdp_compare_with_old_data.R:3-94``).

The previous published release has labels but no codes; codes are
recovered by a label join (after patching renamed labels), the wide
value columns are melted to the canonical (Variable, Value) long form,
and new ⋈⟗ old on (Economy_Code, Year, Variable) yields the diff table
every QA query derives from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import conditional_overwrite
from ..operators.diff import full_outer_diff

#: label patches applied to the old release before the code-recovery
#: join (``gdp_compare_with_old_data.R:24-26``): old label -> new label.
DEFAULT_LABEL_PATCHES: dict[str, str] = {}


def patch_labels(
    old: DataFrame, label_col: str, patches: dict[str, str]
) -> DataFrame:
    """C1-style label rewrites so the old release's labels match the
    current label dimension."""
    rules = [(F.col(label_col) == src, dst) for src, dst in patches.items()]
    return old.withColumn(label_col, conditional_overwrite(F.col(label_col), rules))


def melt_old_release(
    old_wide: DataFrame,
    label_col: str,
    year_col: str,
    measure_cols: dict[str, str],
) -> DataFrame:
    """R2: old release carries one value column per measure
    (``US_at_current_prices_Value`` …); melt to (Variable, Value) using
    ``measure_cols``: wide column -> canonical Variable name."""
    struct = F.array(
        *[
            F.struct(F.lit(var).alias("Variable"), F.col(c).alias("Value"))
            for c, var in measure_cols.items()
        ]
    )
    return (
        old_wide.select(
            F.col(label_col).alias("Economy_Label"),
            F.col(year_col).alias("Year"),
            F.explode(struct).alias("mv"),
        )
        .select("Economy_Label", "Year", "mv.Variable", "mv.Value")
    )


def release_diff(
    new: DataFrame,
    old_long: DataFrame,
    labels: DataFrame,
    label_patches: dict[str, str] | None = None,
) -> DataFrame:
    """J5 + J6 (``gdp_compare_with_old_data.R:30-44``): recover codes on
    the old side via the label dim, then full-outer diff on
    (Economy_Code, Year, Variable) with suffixed values."""
    patched = patch_labels(
        old_long, "Economy_Label", label_patches or DEFAULT_LABEL_PATCHES
    )
    lab = labels.select(F.col("Code"), F.col("Label"))
    old_coded = (
        patched.join(
            F.broadcast(lab), patched["Economy_Label"] == lab["Label"], "left"
        )
        .select(
            F.col("Code").alias("Economy_Code"),
            "Economy_Label",
            "Year",
            "Variable",
            "Value",
        )
    )
    new_keyed = new.select("Economy_Code", "Year", "Variable", "Value")
    diff = full_outer_diff(
        new_keyed,
        old_coded.select("Economy_Code", "Year", "Variable", "Value"),
        ["Economy_Code", "Year", "Variable"],
        "Value",
    )
    # carry the old release's label for report grouping (A4)
    old_labels = old_coded.select("Economy_Code", "Economy_Label").distinct()
    return diff.join(F.broadcast(old_labels), "Economy_Code", "left")


#: the three code-keyed label-dimension patches the reference applies
#: before recovering codes on the old release
#: (``gdp_compare_with_old_data.R:24-26``)
REFERENCE_LABEL_DIM_PATCHES: dict[str, str] = {
    "498": "Republic of Moldova",
    "410": "Republic of Korea",
    "890": "Yugoslavia, Soc. Fed. Rep. of",
}

#: old-release wide column -> canonical Variable name
#: (``gdp_compare_with_old_data.R:33-36``)
OLD_RELEASE_MEASURES: dict[str, str] = {
    "US_at_constant_prices_2015_Value": "GDP_at_constant_prices_2015",
    "US_at_current_prices_Value": "GDP_at_current_prices",
}


def patch_label_dim(
    labels: DataFrame, patches: dict[str, str] | None = None
) -> DataFrame:
    """C1 on the label dimension itself: the reference rewrites three
    labels BY CODE before the code-recovery join, so the old release's
    (renamed) labels match (``gdp_compare_with_old_data.R:24-26``)."""
    rules = [
        (F.col("Code") == code, label)
        for code, label in (patches or REFERENCE_LABEL_DIM_PATCHES).items()
    ]
    return labels.withColumn(
        "Label", conditional_overwrite(F.col("Label"), rules)
    )


def comparison_with_old_release(
    new: DataFrame,
    old_wide: DataFrame,
    labels: DataFrame,
    label_patches: dict[str, str] | None = None,
    measure_cols: dict[str, str] | None = None,
    keep_old_label: bool = False,
) -> DataFrame:
    """The reference's full §3.2 comparison chain
    (``gdp_compare_with_old_data.R:20-51``), golden-output-exact:

    1. patch the label dimension by code (:func:`patch_label_dim`);
    2. recover codes on the old wide release via a broadcast label join
       (old labels are unique per label in the real data; NULL labels
       match nothing, unlike dplyr's default NA-matches-NA — no real
       row exercises the difference);
    3. melt the two wide measure columns to (Variable, Value), KEEPING
       NULL values exactly like ``pivot_longer``'s default;
    4. full-outer join against the new release on (Code, Year,
       Variable) and take the NEW side's label and comments.

    Output columns (``Value_old``/``Value_new`` stand in for the golden
    CSV's ``Value.old``/``Value.new`` — dots in column names break
    column-name-keyed consumers): ``Code, Economy_Label, Year,
    Variable, Value_old, Value_new, CommentEN, CommentFR``.  On the
    reference's real inputs this reproduces
    ``output/gdp_comparison.csv`` row-for-row
    (``tests/test_golden_reference.py``).

    ``keep_old_label=True`` appends ``Economy_Label_old`` (the old
    release's label) — the reference's per-economy comparison PDF
    groups charts by it (``gdp_compare_with_old_data.R:57,88``)."""
    lab = patch_label_dim(labels, label_patches).select("Code", "Label")
    measures = measure_cols or OLD_RELEASE_MEASURES
    old_coded = old_wide.join(
        F.broadcast(lab), old_wide["Economy_Label"] == lab["Label"], "left"
    ).select(
        "Code",
        F.col("Economy_Label").alias("Economy_Label_old"),
        "Year",
        *[F.col(c).alias(var) for c, var in measures.items()],
    )
    old_long = old_coded.unpivot(
        ["Code", "Economy_Label_old", "Year"],
        list(measures.values()),
        "Variable",
        "Value",
    ).select(
        "Code",
        "Economy_Label_old",
        "Year",
        "Variable",
        F.col("Value").alias("Value_old"),
    )
    new_keyed = new.select(
        F.col("Economy_Code").alias("Code"),
        "Economy_Label",
        "Year",
        "Variable",
        F.col("Value").alias("Value_new"),
        "CommentEN",
        "CommentFR",
    )
    out_cols = [
        "Code",
        "Economy_Label",
        "Year",
        "Variable",
        "Value_old",
        "Value_new",
        "CommentEN",
        "CommentFR",
    ]
    if keep_old_label:
        out_cols.append("Economy_Label_old")
    return old_long.join(
        new_keyed, ["Code", "Year", "Variable"], "full"
    ).select(*out_cols)


def export_comparison_pdf(diff: DataFrame, path: str, **kwargs) -> int:
    """S8 (``gdp_compare_with_old_data.R:54-90``): render the
    :func:`release_diff` frame to the per-economy comparison PDF via
    the dependency-free writer (``io_pdf.write_comparison_pdf``),
    wiring this plan's column names.  Returns economies plotted.

    Economies present only in the NEW release have no old-side label
    (``release_diff`` left-joins labels from the old release) — the
    'added economy' case is exactly what this report must surface, so
    the label coalesces to the economy code instead of dropping."""
    from ..io_pdf import write_comparison_pdf

    return write_comparison_pdf(
        diff.withColumn(
            "Economy_Label",
            F.coalesce(F.col("Economy_Label"), F.col("Economy_Code")),
        ),
        path,
        label_col="Economy_Label",
        year_col="Year",
        variable_col="Variable",
        old_col="Value_old",
        new_col="Value_new",
        **kwargs,
    )
