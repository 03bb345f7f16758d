"""Release-diff job + the four bookdown QA queries (§3.2, §3.3)."""

import pytest
from pyspark.sql import functions as F

from gdp_etl_spark.plans.compare import melt_old_release, release_diff
from gdp_etl_spark.plans.qa import (
    added_values,
    deflator_check,
    discrepancies_before_last_year,
    missing_values,
    top_discrepancies_last_year,
)

CONSTANT = "GDP_at_constant_prices_2015"
CURRENT = "GDP_at_current_prices"


@pytest.fixture()
def diff(spark):
    new = spark.createDataFrame(
        [
            ("004", 2020, CONSTANT, 100.0),
            ("004", 2021, CONSTANT, 110.0),
            ("004", 2022, CONSTANT, 120.0),
            ("004", 2024, CONSTANT, 130.0),   # added (not in old)
            ("158", 2024, CONSTANT, 55.0),    # last-year discrepancy
            ("0000", 2020, CONSTANT, 999.0),  # group: excluded from QA
        ],
        "Economy_Code string, Year int, Variable string, Value double",
    )
    old_wide = spark.createDataFrame(
        [
            ("Afghanistan", 2020, 100.5, None),   # within tol=2
            ("Afghanistan", 2021, 150.0, None),   # discrepancy
            ("Afghanistan", 2022, 90.0, None),    # discrepancy
            ("Afghanistan", 2023, 70.0, None),    # missing in new
            ("Taiwan", 2024, 50.0, None),
        ],
        "Economy_Label string, Year int, constant_v double, current_v double",
    )
    old_long = melt_old_release(
        old_wide, "Economy_Label", "Year",
        {"constant_v": CONSTANT, "current_v": CURRENT},
    ).filter(F.col("Value").isNotNull())
    labels = spark.createDataFrame(
        [("004", "Afghanistan"), ("158", "Taiwan"), ("0000", "World")],
        "Code string, Label string",
    )
    return release_diff(new, old_long, labels)


def test_release_diff_recovers_codes(spark, diff):
    r = diff.filter((F.col("Economy_Code") == "004") & (F.col("Year") == 2020)).first()
    assert r["Value_new"] == 100.0 and r["Value_old"] == 100.5
    assert r["Economy_Label"] == "Afghanistan"


def test_discrepancies_before_last_year_compression(spark, diff):
    out = discrepancies_before_last_year(diff, last_year=2024, tol=2.0)
    got = {r["Economy_Code"]: r["Years"] for r in out.collect()}
    # 2020 within tol, 2021-2022 beyond tol -> one compressed run
    assert got == {"004": "2021-2022"}


def test_top_discrepancies_last_year(spark, diff):
    out = top_discrepancies_last_year(diff, last_year=2024, k=5).collect()
    # NULL-ratio rows (added values) sort last, like R's arrange() with NA
    assert [r["Economy_Code"] for r in out] == ["158", "004"]
    assert out[0]["log_ratio"] == pytest.approx(abs(__import__("math").log(55.0 / 50.0)))
    assert out[1]["log_ratio"] is None


def test_missing_and_added(spark, diff):
    miss = {r["Economy_Code"]: r["Years"] for r in missing_values(diff).collect()}
    add = {r["Economy_Code"]: r["Years"] for r in added_values(diff).collect()}
    assert miss == {"004": "2023"}
    assert add == {"004": "2024"}


def test_deflator_check_extrema_and_na_out(spark):
    fact = spark.createDataFrame(
        [
            # implied deflator = 100*current/constant
            ("004", "Afghanistan", 2020, CONSTANT, 100.0),
            ("004", "Afghanistan", 2020, CURRENT, 110.0),   # implied 110
            ("004", "Afghanistan", 2021, CONSTANT, 100.0),
            ("004", "Afghanistan", 2021, CURRENT, 150.0),   # implied 150
            ("004", "Afghanistan", 2024, CONSTANT, 100.0),
            ("004", "Afghanistan", 2024, CURRENT, 500.0),   # est. year -> NA'd out
        ],
        "Economy_Code string, Economy_Label string, Year int, Variable string, Value double",
    )
    ind = spark.createDataFrame(
        [("004", 2020, 105.0), ("004", 2021, 105.0), ("004", 2024, 105.0)],
        "Economy_Code string, Year int, Deflator_USD double",
    )
    out = deflator_check(fact, ind, last_year=2024, tol=1.0).collect()
    # only the max-|diff| row per economy survives; 2024 was NA'd out
    assert len(out) == 1
    assert out[0]["Year"] == 2021 and out[0]["Diff"] == pytest.approx(45.0)


def test_export_comparison_pdf_end_to_end(spark, diff, tmp_path):
    """S8 through the plan wrapper: the release_diff frame renders to a
    structurally valid per-economy PDF with the plan's column names."""
    from gdp_etl_spark.plans.compare import export_comparison_pdf

    path = str(tmp_path / "GDP_comparison.pdf")
    n = export_comparison_pdf(diff, path)
    assert n >= 2                                   # Afghanistan + Taiwan
    data = open(path, "rb").read()
    assert data.startswith(b"%PDF-1.4")
    assert b"(Afghanistan) Tj" in data
