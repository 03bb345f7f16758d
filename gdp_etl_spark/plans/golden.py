"""Golden replay against the reference's own published artifacts.

The reference repo ships its real inputs (``data/``) and the outputs
its R pipeline actually published (``output/``).  This module loads
those real files with the exact semantics the reference's readers gave
them and re-runs the two recomputable chains:

* :func:`golden_comparison` — the §3.2 release diff
  (``gdp_compare_with_old_data.R:20-51``), which must reproduce
  ``output/gdp_comparison.csv`` row-for-row;
* :func:`golden_group_rollup` — the hierarchy aggregation
  (``gpd_etl_pipeline.R:390-413``) re-applied to the published
  *individual*-economy rows, which must reproduce the published
  *group* rows bit-exactly (values are integer-valued doubles far
  below 2^53, so the re-summation is exact in any order).

Reader-parity notes (each pinned by ``tests/test_golden_reference.py``):

* the R scripts read these feeds with ``readr::read_csv`` /
  base ``read.csv``; both treat the literal ``NA`` as missing in the
  outputs the pipeline wrote (``readr::write_csv`` default), so the
  published CSVs are read back with ``na_values=("NA",)``;
* base ``read.csv`` + ``as.character`` on the hierarchy's numeric
  ``Parent_Code`` column strips leading zeros ("0000" → "0",
  ``gpd_etl_pipeline.R:31-33``) — the World group row is re-padded
  later, exactly like the reference does;  ``Child_Code`` contains
  alphanumeric codes ("2711u"), so R keeps it character and the
  leading zeros survive.  :func:`load_hierarchy` reproduces both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_csv
from .compare import comparison_with_old_release

#: default location of the reference checkout (read-only)
REFERENCE_DIR = os.environ.get("SPARK_GRAFT_REFERENCE_DIR", "/root/reference")


def reference_available(ref_dir: str = None) -> bool:
    """Whether the reference checkout (with its published ``output/``)
    exists on this host — the golden queries/tests/bench rows are
    env-gated on it, the same way tests skip optional dependencies."""
    return os.path.isdir(os.path.join(ref_dir or REFERENCE_DIR, "output"))

GDP_UPDATE_SCHEMA = (
    "Economy_Code string, Economy_Label string, Year int, "
    "Variable string, Value double, CommentEN string, CommentFR string"
)

OLD_RELEASE_SCHEMA = (
    "Economy_Label string, Year int, "
    "US_at_current_prices_Value double, "
    "US_at_current_prices_Footnote string, "
    "US_at_current_prices_MissingValue string, "
    "US_at_constant_prices_2015_Value double, "
    "US_at_constant_prices_2015_Footnote string, "
    "US_at_constant_prices_2015_MissingValue string"
)

GDP_COMPARISON_SCHEMA = (
    "Code string, Economy_Label string, Year int, Variable string, "
    "`Value.old` double, `Value.new` double, "
    "CommentEN string, CommentFR string"
)

HIERARCHY_SCHEMA = (
    "Parent_Code string, Parent_Label string, Parent_ValidFrom string, "
    "Parent_ValidTo string, Parent_IsTarget string, "
    "Child_Code string, Child_Label string, Child_ValidFrom string, "
    "Child_ValidTo string, Child_IsTarget string"
)


def load_gdp_update(spark: SparkSession, ref_dir: str = REFERENCE_DIR) -> DataFrame:
    """The published new release (``output/gdp_update.csv``)."""
    return read_csv(
        spark,
        os.path.join(ref_dir, "output", "gdp_update.csv"),
        GDP_UPDATE_SCHEMA,
        na_values=("NA",),
    )


def load_old_release(spark: SparkSession, ref_dir: str = REFERENCE_DIR) -> DataFrame:
    """The previous published release, wide layout
    (``data/US.GDPTotal_20250718_104458.csv``)."""
    return read_csv(
        spark,
        os.path.join(ref_dir, "data", "US.GDPTotal_20250718_104458.csv"),
        OLD_RELEASE_SCHEMA,
        na_values=("NA",),
    )


def load_labels(spark: SparkSession, ref_dir: str = REFERENCE_DIR) -> DataFrame:
    """The label dimension (``data/lab_all.csv``), unpatched — the
    comparison chain applies the reference's three code-keyed patches
    itself (``plans.compare.patch_label_dim``)."""
    return read_csv(
        spark,
        os.path.join(ref_dir, "data", "lab_all.csv"),
        "Code string, Label string",
    )


def load_hierarchy(spark: SparkSession, ref_dir: str = REFERENCE_DIR) -> DataFrame:
    """``data/Dim_Countries_Hierarchy_All.csv`` with the reference's
    base-R column typing: ``Parent_Code`` loses leading zeros (the
    column is all-numeric, so ``read.csv`` made it integer before
    ``as.character``); child codes keep them (alphanumeric column).
    The zero-strip is expressed per-value because the real column is
    uniformly numeric — a mixed column would stay character wholesale
    in R, which the ``rlike`` guard approximates value-wise."""
    h = read_csv(
        spark,
        os.path.join(ref_dir, "data", "Dim_Countries_Hierarchy_All.csv"),
        HIERARCHY_SCHEMA,
    )
    pc = F.col("Parent_Code")
    return h.withColumn(
        "Parent_Code",
        F.when(pc.rlike("^[0-9]+$"), pc.cast("long").cast("string")).otherwise(pc),
    )


EXCHANGE_RATES_SCHEMA = (
    "Year int, Period_Code string, Period_Label string, "
    "Country_Code string, Country_Label string, Country_ValidFrom int, "
    "Country_ValidTo int, Country_IsTarget string, Value double, "
    "DataSource_Code string, DataSource_Label string, "
    "DataStatus_Code string, DataStatus_Label string, "
    "DataConfidentiality_Code string, DataConfidentiality_Label string, "
    "Comment_English string, Comment_French string, "
    "Comment_Confidentiality_Code string, Comment_Confidentiality_Label string"
)


def load_exchange_rates(
    spark: SparkSession, ref_dir: str = REFERENCE_DIR
) -> DataFrame:
    """The real USIS exchange-rate feed (``data/exchange_rates.csv``,
    11,740 rows, 239 economies × up to 55 years) — the 19-column
    layout ``read_usis`` returns (``08-deflators.Rmd:11-18``)."""
    return read_csv(
        spark,
        os.path.join(ref_dir, "data", "exchange_rates.csv"),
        EXCHANGE_RATES_SCHEMA,
        na_values=("NA",),
    )


def load_gdp_comparison(
    spark: SparkSession, ref_dir: str = REFERENCE_DIR
) -> DataFrame:
    """The golden §3.2 output (``output/gdp_comparison.csv``), with the
    dotted value columns renamed to the engine's ``Value_old`` /
    ``Value_new``."""
    return read_csv(
        spark,
        os.path.join(ref_dir, "output", "gdp_comparison.csv"),
        GDP_COMPARISON_SCHEMA,
        na_values=("NA",),
    ).select(
        "Code",
        "Economy_Label",
        "Year",
        "Variable",
        F.col("`Value.old`").alias("Value_old"),
        F.col("`Value.new`").alias("Value_new"),
        "CommentEN",
        "CommentFR",
    )


def golden_comparison(
    spark: SparkSession,
    ref_dir: str = REFERENCE_DIR,
    keep_old_label: bool = False,
) -> DataFrame:
    """Re-run the §3.2 comparison chain on the reference's real inputs.
    Must equal :func:`load_gdp_comparison` row-for-row."""
    return comparison_with_old_release(
        load_gdp_update(spark, ref_dir),
        load_old_release(spark, ref_dir),
        load_labels(spark, ref_dir),
        keep_old_label=keep_old_label,
    )


def split_update(update: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(individual rows, group rows) of the published release: economy
    codes are 3 characters, every group code is 4 ("0000" + the 2xxx
    group codes — ``gpd_etl_pipeline.R:527`` uses the same length
    split for the USIS export)."""
    is_ind = F.length("Economy_Code") == 3
    return update.filter(is_ind), update.filter(~is_ind)


def golden_comments(
    spark: SparkSession, ref_dir: str = REFERENCE_DIR
) -> DataFrame:
    """Recompute the published ``CommentEN``/``CommentFR`` columns from
    scratch — C1×8 (bilingual successor-economy provenance rules,
    ``gpd_etl_pipeline.R:415-518``) on real data: strip both comment
    columns from the published update and re-derive them from
    (Economy_Code, Year) alone.  Must equal the published file
    bit-for-bit on all rows and all 7 columns."""
    from .gdp import add_comments

    update = load_gdp_update(spark, ref_dir)
    return add_comments(
        update.drop("CommentEN", "CommentFR")
    ).select(*update.columns)


def golden_group_rollup(
    spark: SparkSession, ref_dir: str = REFERENCE_DIR
) -> DataFrame:
    """Recompute every published GROUP row from the published
    INDIVIDUAL rows + the real hierarchy — J7/J8/A1/A2 on real data.
    Returns (Economy_Code, Economy_Label, Year, Variable, Value)."""
    from ..operators.hierarchy import reference_rollup

    individual, _ = split_update(load_gdp_update(spark, ref_dir))
    return reference_rollup(
        individual.select("Economy_Code", "Year", "Variable", "Value"),
        load_hierarchy(spark, ref_dir),
    )
