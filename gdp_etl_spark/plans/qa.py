"""The bookdown QA query suite (chapters 04-08) over the release diff.

Input contract: a diff frame from :func:`..plans.compare.release_diff`
with ``Economy_Code, Economy_Label, Year, Variable, Value_new,
Value_old``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import near
from ..operators.windows import gaps_and_islands, group_extrema


def _individuals(diff: DataFrame) -> DataFrame:
    """F5: individual economies only — group codes are 4 chars
    (``04-discrepancies-before-last-year.Rmd:95`` et al.)."""
    return diff.filter(F.length("Economy_Code") < 4)


def discrepancies_before_last_year(
    diff: DataFrame, last_year: int, tol: float = 2.0
) -> DataFrame:
    """QA 1 (``04:94-106``): rows where |new − old| > tol before the
    estimation year, compressed to per-(economy, variable) year ranges."""
    bad = _individuals(diff).filter(
        (F.col("Year") != last_year)
        & ~near(F.col("Value_new"), F.col("Value_old"), tol)
    )
    labels = bad.groupBy("Economy_Code", "Variable").agg(
        F.min("Economy_Label").alias("Economy_Label")
    )
    years = gaps_and_islands(
        bad.select("Economy_Code", "Variable", "Year"),
        ["Economy_Code", "Variable"],
        "Year",
        out_col="Years",
    )
    return labels.join(years, ["Economy_Code", "Variable"])


def top_discrepancies_last_year(
    diff: DataFrame, last_year: int, k: int = 19
) -> DataFrame:
    """QA 2 (``05:10-28``): largest log-ratio discrepancies in the
    estimation year, top-k (TakeOrderedAndProject)."""
    d = (
        _individuals(diff)
        .filter(F.col("Year") == last_year)
        .withColumn(
            "log_ratio", F.abs(F.log(F.col("Value_new") / F.col("Value_old")))
        )
    )
    return (
        d.orderBy(F.col("log_ratio").desc(), F.col("Economy_Code"), F.col("Variable"))
        .limit(k)
        .select(
            "Economy_Code", "Economy_Label", "Variable",
            "Value_new", "Value_old", "log_ratio",
        )
    )


def _null_pattern_report(diff: DataFrame, missing: bool) -> DataFrame:
    nv, ov = F.col("Value_new"), F.col("Value_old")
    cond = (nv.isNull() & ov.isNotNull()) if missing else (nv.isNotNull() & ov.isNull())
    rows = _individuals(diff).filter(cond)
    labels = rows.groupBy("Economy_Code", "Variable").agg(
        F.min("Economy_Label").alias("Economy_Label")
    )
    years = gaps_and_islands(
        rows.select("Economy_Code", "Variable", "Year"),
        ["Economy_Code", "Variable"],
        "Year",
        out_col="Years",
    )
    return labels.join(years, ["Economy_Code", "Variable"])


def missing_values(diff: DataFrame) -> DataFrame:
    """QA 3 (``06:5-16``): present in the old release, absent in the new."""
    return _null_pattern_report(diff, missing=True)


def added_values(diff: DataFrame) -> DataFrame:
    """QA 4 (``07:5-16``): new values absent from the old release."""
    return _null_pattern_report(diff, missing=False)


def deflator_check(
    fact: DataFrame,
    independent_deflators: DataFrame,
    last_year: int,
    tol: float = 1.0,
    constant_var: str = "GDP_at_constant_prices_2015",
    current_var: str = "GDP_at_current_prices",
) -> DataFrame:
    """QA 5 (``08:10-93``): metamorphic cross-check — the deflator implied
    by the pipeline's own outputs (100·current/constant, R3 pivot) versus
    an independently sourced deflator series; keep each economy's largest
    |discrepancy| (W3).

    ``independent_deflators``: (Economy_Code, Year, Deflator_USD)."""
    wide = (
        fact.groupBy("Economy_Code", "Economy_Label", "Year")
        .pivot("Variable", [current_var, constant_var])
        .agg(F.first("Value"))
    )
    implied = wide.withColumn(
        "Deflator_implied",
        F.lit(100.0) * F.col(current_var) / F.col(constant_var),
    ).withColumn(
        # the estimation year's deflator is itself derived -> NA it out
        "Deflator_implied",
        F.when(F.col("Year") == last_year, F.lit(None)).otherwise(
            F.col("Deflator_implied")
        ),
    )
    ind = independent_deflators.select(
        F.col("Economy_Code").alias("__c"),
        F.col("Year").alias("__y"),
        F.col("Deflator_USD"),
    )
    joined = implied.join(
        ind,
        (implied["Economy_Code"] == ind["__c"]) & (implied["Year"] == ind["__y"]),
        "left",
    ).drop("__c", "__y")
    bad = joined.filter(
        ~near(F.col("Deflator_implied"), F.col("Deflator_USD"), tol)
    ).withColumn("Diff", F.col("Deflator_implied") - F.col("Deflator_USD"))
    return group_extrema(bad, ["Economy_Label"], F.col("Diff"), keep="max_abs").select(
        "Economy_Code", "Economy_Label", "Year",
        "Deflator_implied", "Deflator_USD", "Diff",
    )
