"""End-to-end pipeline stage tests over FIXTURES.md-shaped fixtures."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from gdp_etl_spark.io import write_single_csv
from gdp_etl_spark.plans.gdp import (
    CONSTANT,
    CURRENT,
    add_comments,
    add_labels,
    compute_aggregates,
    estimate_last_year,
    export_usis_layout,
    filter_valid_range,
    melt_wide_gdp,
    remap_dissolved_economies,
    round_values,
    run_pipeline,
)
from gdp_etl_spark.sources import read_csv

from .conftest import rows

FACT_SCHEMA = "Economy_Code string, Year int, Variable string, Value double"


@pytest.fixture()
def fact(spark):
    return spark.createDataFrame(
        [
            ("004", 2022, CONSTANT, 100.0),
            ("004", 2023, CONSTANT, 110.0),
            ("004", 2023, CURRENT, 220.0),
            ("158", 2023, CONSTANT, 500.0),
            # dissolved-economy members: remap -> 834 (1970-2023)
            ("835", 2020, CONSTANT, 30.0),
            ("836", 2020, CONSTANT, 12.0),
            # Czechia+Slovakia 1991 -> Czechoslovakia 200
            ("203", 1991, CONSTANT, 40.0),
            ("703", 1991, CONSTANT, 20.0),
            # out of valid range (dim says 004 valid from 1975)
            ("004", 1960, CONSTANT, 1.0),
        ],
        FACT_SCHEMA,
    )


@pytest.fixture()
def dims(spark):
    dim_countries = spark.createDataFrame(
        [
            ("004", "Afghanistan", 1975, 2102, "True"),
            ("158", "Taiwan", 1940, 2102, "True"),
            ("834", "Tanzania", 1940, 2102, "True"),
            ("200", "Czechoslovakia (Former)", 1940, 1992, "True"),
        ],
        "Code string, Label string, ValidFrom int, ValidTo int, IsTarget string",
    )
    labels = spark.createDataFrame(
        [
            ("004", "Afghanistan"), ("158", "Taiwan"), ("834", "Tanzania"),
            ("200", "Czechoslovakia (Former)"), ("2000", "Asia"), ("1000", "World"),
        ],
        "Code string, Label string",
    )
    economy_groups = spark.createDataFrame(
        [
            # 2-level nest: World -> Asia -> {004, 158}; World -> 834 directly
            ("1000", "World", "2000"),
            ("2000", "Asia", "004"),
            ("2000", "Asia", "158"),
            ("1000", "World", "834"),
        ],
        "Parent_Code string, Parent_Label string, Child_Code string",
    )
    return dim_countries, labels, economy_groups


def test_melt_wide_gdp(spark):
    wide = spark.createDataFrame(
        [(4, "Afghanistan", "GDP", 1.0, 2.0)],
        "CountryID int, Country string, IndicatorName string, `2020` double, `2021` double",
    )
    long = melt_wide_gdp(wide, ["CountryID", "Country", "IndicatorName"], "Value")
    got = rows(long, "Year", "Value")
    assert got == [(2020, 1.0), (2021, 2.0)]


def test_remap_sums_dissolved_parts(spark, fact):
    out = remap_dissolved_economies(fact)
    got = {
        (r["Economy_Code"], r["Year"]): r["Value"]
        for r in out.filter(F.col("Economy_Code").isin("834", "200")).collect()
    }
    assert got[("834", 2020)] == 42.0   # 30 + 12
    assert got[("200", 1991)] == 60.0   # 40 + 20
    assert out.filter(F.col("Economy_Code").isin("835", "836", "203", "703")).count() == 0


def test_estimate_last_year_math(spark, fact):
    growth = spark.createDataFrame([("004", 10.0)], "UNCTcc string, growth_pct double")
    defl = spark.createDataFrame(
        [("004", 2024, 110.0)], "Country_Code string, Year int, Deflator_USD double"
    )
    out = estimate_last_year(fact, growth, defl, last_year=2024)
    got = {
        (r["Variable"]): r["Value"]
        for r in out.filter(
            (F.col("Economy_Code") == "004") & (F.col("Year") == 2024)
        ).collect()
    }
    assert got[CONSTANT] == pytest.approx(121.0)       # 110 * 1.10
    assert got[CURRENT] == pytest.approx(133.1)        # 121 * 110/100


def test_estimate_skip_flag(spark, fact):
    out = estimate_last_year(fact, None, None, 2024, skip_estimation=True)
    assert out is fact


def test_growth_code_alias_applied(spark):
    base = spark.createDataFrame(
        [("840", 2023, CONSTANT, 100.0)], FACT_SCHEMA
    )
    growth = spark.createDataFrame([("842", 5.0)], "UNCTcc string, growth_pct double")
    defl = spark.createDataFrame(
        [], "Country_Code string, Year int, Deflator_USD double"
    )
    out = estimate_last_year(base, growth, defl, last_year=2024)
    est = out.filter((F.col("Year") == 2024) & (F.col("Variable") == CONSTANT)).first()
    assert est["Value"] == pytest.approx(105.0)  # alias 842 -> 840 matched


def test_round_values_bankers(spark):
    df = spark.createDataFrame([("x", 2020, CONSTANT, 0.5)], FACT_SCHEMA)
    assert round_values(df).first()["Value"] == 0.0


def test_filter_valid_range(spark, fact, dims):
    dim_countries, _, _ = dims
    out = filter_valid_range(fact, dim_countries)
    # 004/1960 outside [1975, 2102] -> dropped; unmatched codes dropped too
    assert out.filter((F.col("Economy_Code") == "004") & (F.col("Year") == 1960)).count() == 0
    assert out.filter(F.col("Economy_Code") == "004").count() == 3
    assert out.filter(F.col("Economy_Code") == "835").count() == 0


def test_add_labels(spark, fact, dims):
    _, labels, _ = dims
    out = add_labels(fact, labels)
    assert out.columns[:2] == ["Economy_Code", "Economy_Label"]
    assert out.filter(F.col("Economy_Code") == "004").first()["Economy_Label"] == "Afghanistan"


def test_compute_aggregates_nested_world(spark, dims):
    _, labels, groups = dims
    fact = add_labels(
        spark.createDataFrame(
            [
                ("004", 2023, CONSTANT, 10.0),
                ("158", 2023, CONSTANT, 20.0),
                ("834", 2023, CONSTANT, 5.0),
            ],
            FACT_SCHEMA,
        ),
        labels,
    )
    out = compute_aggregates(fact, groups)
    got = {
        (r["Economy_Code"], r["Economy_Label"]): r["Value"]
        for r in out.filter(F.col("Economy_Label").isin("World", "Asia")).collect()
    }
    assert got[("2000", "Asia")] == 30.0          # 004 + 158
    assert got[("0000", "World")] == 35.0         # nested Asia leaves + 834
    # sum(children)==parent property: World == Asia members + direct member
    assert got[("0000", "World")] == got[("2000", "Asia")] + 5.0


def test_add_comments_rules(spark):
    df = spark.createDataFrame(
        [
            ("834", 2020, CONSTANT, 1.0),
            ("200", 1991, CONSTANT, 1.0),
            ("200", 1960, CONSTANT, 1.0),  # outside the rule's year band
            ("004", 2020, CONSTANT, 1.0),
        ],
        FACT_SCHEMA,
    )
    out = add_comments(df)
    got = {
        (r["Economy_Code"], r["Year"]): (r["CommentEN"], r["CommentFR"])
        for r in out.collect()
    }
    assert got[("834", 2020)] == (
        "Tanzania Mainland 835 + Zanzibar 836",
        "Tanzanie continentale 835 + Zanzibar 836",
    )
    assert got[("200", 1991)][0] == "Czechia 203 + Slovakia 703"
    assert got[("200", 1960)] == (None, None)
    assert got[("004", 2020)] == (None, None)


def test_export_usis_layout(spark):
    df = add_comments(
        spark.createDataFrame(
            [
                ("004", 2023, CONSTANT, 100.0),
                ("158", 2023, CURRENT, 5.0),
                ("004", 2024, CONSTANT, 110.0),
                ("0000", 2023, CONSTANT, 999.0),  # group -> excluded
            ],
            FACT_SCHEMA,
        )
    )
    out = export_usis_layout(df, run_date="2025-08-13")
    assert out.columns == [
        "Series", "Country", "Year", "Period", "NAComponent", "Measure",
        "Source", "DataSource", "Value", "DataStatus", "DataConfidentiality",
        "CommentEN", "CommentFR", "CommentConfidentiality", "RefDate",
    ]
    got = {(r["Country"], r["Year"]): r for r in out.collect()}
    assert ("0000", 2023) not in got
    assert got[("004", 2023)]["Measure"] == "0940"
    assert got[("158", 2023)]["Measure"] == "0100"
    assert got[("158", 2023)]["DataSource"] == "3001"  # Taiwan NSO
    assert got[("004", 2024)]["DataSource"] == "0001"  # estimation year wins
    assert got[("004", 2023)]["DataSource"] == "4809"  # default
    assert got[("004", 2023)]["RefDate"] == "13-Aug-25"


def test_run_pipeline_end_to_end(spark, fact, dims, tmp_path):
    dim_countries, labels, groups = dims
    growth = spark.createDataFrame([("004", 10.0)], "UNCTcc string, growth_pct double")
    defl = spark.createDataFrame(
        [("004", 2024, 110.0)], "Country_Code string, Year int, Deflator_USD double"
    )
    generic, usis = run_pipeline(
        fact, dim_countries, labels, groups, growth, defl,
        last_year=2024, run_date="2025-08-13",
    )
    assert generic.columns == [
        "Economy_Code", "Economy_Label", "Year", "Variable", "Value",
        "CommentEN", "CommentFR",
    ]
    # S6: single-file CSV sink + zero-padded round-trip via explicit schema
    out_dir = str(tmp_path / "gdp_update")
    write_single_csv(generic, out_dir)
    parts = glob.glob(os.path.join(out_dir, "part-*.csv"))
    assert len(parts) == 1
    back = read_csv(
        spark, out_dir,
        "Economy_Code string, Economy_Label string, Year int, Variable string, "
        "Value double, CommentEN string, CommentFR string",
    )
    assert back.filter(F.col("Economy_Code") == "004").count() > 0  # "004" survived
    assert rows(back, "Economy_Code", "Year", "Variable", "Value") == rows(
        generic, "Economy_Code", "Year", "Variable", "Value"
    )
    assert usis.count() > 0


# ---------------------------------------------------------------------------
# §3.1 extraction composition (build_fact / get_* stages)
# ---------------------------------------------------------------------------

def _taiwan_feeds(spark):
    principal = spark.createDataFrame(
        [(2014, 495000.0, 16000.0), (2015, 512000.0, 16000.0),
         (2016, 500000.0, 16129.0)],
        "Period int, GDP_NTD_Current double, GDP_USD_Current double",
    )
    post81 = spark.createDataFrame(
        [(2014, "8. GDP", 475000.0, 480000.0),
         (2015, "8. GDP", 490000.0, 500000.0),
         (2016, "8. GDP", 505000.0, 510000.0),
         (2015, "7. Imports", 2.0, 2.0)],
        "Period int, Expenditure string, Current_NTD double, Chained_NTD double",
    )
    pre81 = spark.createDataFrame(
        [], "Period int, Expenditure string, Current_NTD double, Chained_NTD double"
    )
    return principal, pre81, post81


def test_taiwan_2015_rebase_factor_semantics(spark):
    """The W2 rebase pins Taiwan's base-year identity: rebasing the
    chained-2021 series by (Current/Chained)@2015 and converting at the
    2015 FX makes constant-2015 == current exactly AT 2015
    (gpd_etl_pipeline.R:121-136)."""
    from gdp_etl_spark.plans.gdp import CONSTANT, CURRENT, get_taiwan_gdp_data

    principal, pre81, post81 = _taiwan_feeds(spark)
    empty_fact = spark.createDataFrame(
        [], "Economy_Code string, Year int, Variable string, Value double"
    )
    out = get_taiwan_gdp_data(empty_fact, principal, pre81, post81)
    got = {(r["Year"], r["Variable"]): r["Value"] for r in out.collect()}
    fx_2015 = 512000.0 / 16000.0                       # 32.0
    rebase = 490000.0 / 500000.0                       # 0.98
    # at 2015: chained*rebase == current, so the two variables coincide
    assert got[(2015, CONSTANT)] == pytest.approx(got[(2015, CURRENT)], rel=1e-12)
    assert got[(2015, CURRENT)] == pytest.approx(490000.0 * 1e6 / fx_2015)
    # off-base year: constant uses the 2015 FX for every year,
    # current uses that year's own FX
    assert got[(2014, CONSTANT)] == pytest.approx(480000.0 * 1e6 / fx_2015 * rebase)
    assert got[(2014, CURRENT)] == pytest.approx(475000.0 * 1e6 / (495000.0 / 16000.0))
    # non-GDP expenditure rows never leak through
    assert len(got) == 6


def test_get_unsd_gdp_data_inner_join_and_na(spark):
    from gdp_etl_spark.plans.gdp import CONSTANT, CURRENT, get_unsd_gdp_data

    wide_schema = (
        "CountryID int, Country string, IndicatorName string, "
        "`2015` double, `2016` double"
    )
    const = spark.createDataFrame(
        [(4, "Afghanistan", "Gross Domestic Product (GDP)", None, 21.0),
         (4, "Afghanistan", "Imports of goods and services", 5.0, 5.0),
         (840, "USA", "Gross Domestic Product (GDP)", 17000.0, 17500.0)],
        wide_schema,
    )
    curr = spark.createDataFrame(
        [(4, "Afghanistan", "Gross Domestic Product (GDP)", 20.25, 22.0)],
        wide_schema,
    )
    out = get_unsd_gdp_data(const, curr)
    got = rows(out, "Economy_Code", "Year", "Variable", "Value")
    # USA dropped by the inner measure join; NA constant value KEPT;
    # codes zero-padded
    assert got == [
        ("004", 2015, CONSTANT, None),
        ("004", 2015, CURRENT, 20.25),
        ("004", 2016, CONSTANT, 21.0),
        ("004", 2016, CURRENT, 22.0),
    ]


def test_get_gdp_deflators_union_guard_naomit(spark):
    from gdp_etl_spark.plans.gdp import get_gdp_deflators

    feed = "Country_Code string, Country_Label string, Year int, Value double"
    cpi = spark.createDataFrame(
        [("004", "Afghanistan", 2015, 80.0),
         ("004", "Afghanistan", 2024, 120.0),
         # not in MISSING_DEFLATOR_ECONOMIES -> excluded from CPI branch
         ("076", "Brazil", 2015, 90.0), ("076", "Brazil", 2024, 99.0),
         # duplicate base-year rows -> W1 guard -> NULL -> na.omit drops
         ("192", "Cuba", 2015, 50.0), ("192", "Cuba", 2015, 51.0),
         ("192", "Cuba", 2024, 60.0)],
        feed,
    )
    defl = spark.createDataFrame(
        [("076", "Brazil", 2015, 100.0), ("076", "Brazil", 2024, 140.0),
         # no FX row -> NULL Deflator_exg -> na.omit drops
         ("276", "Germany", 2015, 101.0)],
        feed,
    )
    fx = spark.createDataFrame(
        [("076", "Brazil", 2015, 2.0), ("076", "Brazil", 2024, 2.5)], feed
    )
    out = get_gdp_deflators(cpi, defl, fx)
    got = rows(out, "Country_Code", "Year", "Deflator_USD")
    # CPI branch: 100*120/80 at 2024 only; deflator branch rebased to
    # (100/2.0)=50 at 2015 -> 2015: 100, 2024: 100*(140/2.5)/50 = 112
    assert got == [
        ("004", 2024, 150.0),
        ("076", 2015, 100.0),
        ("076", 2024, 112.0),
    ]


def test_taiwan_base_year_guard(spark):
    """A missing or duplicated base-year row must FAIL LOUDLY (the
    reference errors on a 0- or 2-length vector inside mutate) — a bare
    filter->crossJoin would silently drop or double the whole series."""
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError
    from gdp_etl_spark.plans.gdp import get_taiwan_gdp_data

    principal, pre81, post81 = _taiwan_feeds(spark)
    empty_fact = spark.createDataFrame(
        [], "Economy_Code string, Year int, Variable string, Value double"
    )
    # no base-year row at 2020
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception),
                       match="exactly one base-year row"):
        get_taiwan_gdp_data(
            empty_fact, principal, pre81, post81, base_year=2020
        ).collect()
    # duplicate '8. GDP' base rows
    dup = post81.unionByName(post81.filter(
        (post81["Period"] == 2015) & (post81["Expenditure"] == "8. GDP")
    ))
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception),
                       match="exactly one base-year row"):
        get_taiwan_gdp_data(
            empty_fact, principal, pre81, dup
        ).collect()


def test_compute_aggregates_routes_full_hierarchy_contract(spark, dims):
    """A 10-column reference-contract hierarchy routes through the
    reference-exact expansion (operators.hierarchy): non-target leaf
    children drop unless expanded in the final pass or exempted, unlike
    the plain edge-list closure which keeps every leaf."""
    from gdp_etl_spark.session import local_df

    _, labels, _ = dims
    hier = local_df(
        spark,
        [
            # World -> Asia (group, expandable) and World -> 834 (target)
            ("0000", "World", "1940", "2102", "False",
             "2000", "Asia", "1940", "2102", "False"),
            ("0000", "World", "1940", "2102", "False",
             "834", "U.R. of Tanzania", "1940", "2102", "True"),
            # Asia -> 004 (target) and Asia -> 2000u (non-target NES:
            # present from pass 0, unexpandable -> the filter drops it
            # for Asia while World->Asia is still being expanded)
            ("2000", "Asia", "1940", "2102", "False",
             "004", "Afghanistan", "1940", "2102", "True"),
            ("2000", "Asia", "1940", "2102", "False",
             "2000u", "Asia n.e.s.", "1940", "2102", "False"),
        ],
        "Parent_Code string, Parent_Label string, Parent_ValidFrom string, "
        "Parent_ValidTo string, Parent_IsTarget string, "
        "Child_Code string, Child_Label string, Child_ValidFrom string, "
        "Child_ValidTo string, Child_IsTarget string",
    )
    fact = add_labels(
        spark.createDataFrame(
            [
                ("004", 2023, CONSTANT, 10.0),
                ("834", 2023, CONSTANT, 5.0),
                ("2000u", 2023, CONSTANT, 100.0),   # NES carries data
            ],
            FACT_SCHEMA,
        ),
        labels,
    )
    out = compute_aggregates(fact, hier)
    got = {
        (r["Economy_Code"], r["Economy_Label"]): r["Value"]
        for r in out.filter(
            F.col("Economy_Label").isin("World", "Asia")
        ).collect()
    }
    # Asia: only the target leaf 004 — the pass-1 filter dropped 2000u
    assert got[("2000", "Asia")] == 10.0
    # World: Asia expanded in the FINAL pass, so its n.e.s. child
    # survives the recursion-termination quirk: 004 + 2000u + 834
    assert got[("0000", "World")] == 115.0
