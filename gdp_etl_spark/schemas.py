"""Explicit schemas for every table the engine touches.

The reference's #1 correctness hazard is silent type corruption of
zero-padded economy codes ("004", "070", "0000") — R coerces freely
(reference ``gpd_etl_pipeline.R:80,154,182``); Spark must declare
``StringType`` for every code column and never use ``inferSchema``
(SURVEY.md §1.3).  All reference-side schemas below follow FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --------------------------------------------------------------------------
# Reference (GDP ETL) tables — FIXTURES.md §1-§9
# --------------------------------------------------------------------------

#: economy validity dimension (reference data/Dim_Countries.csv)
DIM_COUNTRIES = StructType(
    [
        _f("Code", StringType()),
        _f("Label", StringType()),
        _f("ValidFrom", IntegerType()),
        _f("ValidTo", IntegerType()),
        _f("IsTarget", StringType()),  # "True"/"False" *string*, per reference
    ]
)

#: group-membership edge list (reference data/Dim_Countries_Hierarchy_All.csv)
ECONOMY_HIERARCHY = StructType(
    [
        _f("Parent_Code", StringType()),
        _f("Parent_Label", StringType()),
        _f("Parent_ValidFrom", IntegerType()),
        _f("Parent_ValidTo", IntegerType()),
        _f("Parent_IsTarget", StringType()),
        _f("Child_Code", StringType()),
        _f("Child_Label", StringType()),
        _f("Child_ValidFrom", IntegerType()),
        _f("Child_ValidTo", IntegerType()),
        _f("Child_IsTarget", StringType()),
    ]
)

#: code → label lookup (reference data/lab_all.csv)
LABELS = StructType([_f("Code", StringType()), _f("Label", StringType())])

#: canonical long fact table — the grain everything operates on
#: (reference gpd_etl_pipeline.R:83-85)
GDP_LONG = StructType(
    [
        _f("Economy_Code", StringType()),
        _f("Year", IntegerType()),
        _f("Variable", StringType()),
        _f("Value", DoubleType()),
    ]
)

#: USIS long series (CPI / FX / deflators) — consumed columns only
USIS_FEED = StructType(
    [
        _f("Country_Code", StringType()),
        _f("Country_Label", StringType()),
        _f("Year", IntegerType()),
        _f("Value", DoubleType()),
    ]
)

#: previous UNCTADstat release (wide; no code column — label-joined)
OLD_RELEASE = StructType(
    [
        _f("Economy_Label", StringType()),
        _f("Year", IntegerType()),
        _f("US_at_current_prices_Value", DoubleType()),
        _f("US_at_current_prices_Footnote", StringType()),
        _f("US_at_current_prices_MissingValue", StringType()),
        _f("US_at_constant_prices_2015_Value", DoubleType()),
        _f("US_at_constant_prices_2015_Footnote", StringType()),
        _f("US_at_constant_prices_2015_MissingValue", StringType()),
    ]
)

#: final generic output (reference output/gdp_update.csv header)
GDP_UPDATE = StructType(
    [
        _f("Economy_Code", StringType()),
        _f("Economy_Label", StringType()),
        _f("Year", IntegerType()),
        _f("Variable", StringType()),
        _f("Value", DoubleType()),
        _f("CommentEN", StringType()),
        _f("CommentFR", StringType()),
    ]
)


# --------------------------------------------------------------------------
# Driver test tables (TESTDATA.md) — declared for documentation/validation;
# parquet carries its own schema, these are asserted against it in tests.
# --------------------------------------------------------------------------

LINEITEM = StructType(
    [
        _f("l_orderkey", LongType()),
        _f("l_partkey", LongType()),
        _f("l_suppkey", LongType()),
        _f("l_linenumber", IntegerType()),
        _f("l_quantity", DoubleType()),
        _f("l_extendedprice", DoubleType()),
        _f("l_discount", DoubleType()),
        _f("l_tax", DoubleType()),
        _f("l_returnflag", StringType()),
        _f("l_linestatus", StringType()),
        _f("l_shipdate", TimestampType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
