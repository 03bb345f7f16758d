"""S8: the minimal PDF comparison-plot sink (io_pdf) — validates the
document structure without a PDF library: header, object syntax, page
tree, xref byte offsets, and the per-economy chart content."""

import re

import pytest

from gdp_etl_spark.io_pdf import write_comparison_pdf


def _diff_frame(spark, n_economies=4):
    rows = []
    for i in range(n_economies):
        label = f"Economy {chr(65 + i)}"
        for year in range(2010, 2016):
            for var in ("GDP_at_current_prices",
                        "GDP_at_constant_prices_2015"):
                old = 100.0 + i * 10 + (year - 2010) * 2
                rows.append((label, year, var, old, old * 1.05))
    return spark.createDataFrame(
        rows,
        "Economy_Label string, Year int, Variable string, "
        "value_old double, value_new double",
    )


def test_pdf_structure_and_pagination(spark, tmp_path):
    path = str(tmp_path / "cmp.pdf")
    n = write_comparison_pdf(_diff_frame(spark, 4), path)
    assert n == 4
    data = open(path, "rb").read()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    # 4 economies at 3 charts/page -> 2 pages, declared in the tree
    assert b"/Count 2" in data
    assert data.count(b"/Type /Page ") == 2
    # every economy title is drawn
    for c in "ABCD":
        assert f"(Economy {c}) Tj".encode() in data
    # reference palette: old orange / new blue strokes present
    assert b"0.984 0.686 0.090 RG" in data      # FBAF17
    assert b"0.000 0.620 0.859 RG" in data      # 009EDB
    # dashed linetype for the second variable
    assert b"[4 3] 0 d" in data
    # xref offsets actually point at their objects
    xref_at = int(re.search(rb"startxref\n(\d+)\n%%EOF", data).group(1))
    assert data[xref_at:xref_at + 4] == b"xref"
    offsets = re.findall(rb"(\d{10}) 00000 n", data)
    for i, off in enumerate(offsets, start=1):
        at = int(off)
        assert data[at:at + len(f"{i} 0 obj")] == f"{i} 0 obj".encode()


def test_pdf_skips_null_and_single_point_series(spark, tmp_path):
    df = spark.createDataFrame(
        [("X", 2010, "v", None, 1.0), ("X", 2011, "v", None, 2.0),
         ("Y", 2010, "v", 5.0, None)],   # Y: old has ONE point -> no line
        "Economy_Label string, Year int, Variable string, "
        "value_old double, value_new double",
    )
    path = str(tmp_path / "sparse.pdf")
    assert write_comparison_pdf(df, path) == 2
    data = open(path, "rb").read()
    assert b"(X) Tj" in data and b"(Y) Tj" in data


def test_pdf_bounds(spark, tmp_path):
    with pytest.raises(ValueError, match="no economies"):
        write_comparison_pdf(
            spark.createDataFrame(
                [], "Economy_Label string, Year int, Variable string, "
                    "value_old double, value_new double"),
            str(tmp_path / "empty.pdf"))
    with pytest.raises(ValueError, match="max_economies"):
        write_comparison_pdf(
            _diff_frame(spark, 5), str(tmp_path / "cap.pdf"),
            max_economies=3)


def test_pdf_null_year_rows_skipped(spark, tmp_path):
    df = spark.createDataFrame(
        [("X", 2010, "v", 1.0, 1.0), ("X", None, "v", 2.0, 2.0),
         ("X", 2011, "v", 3.0, 3.0)],
        "Economy_Label string, Year int, Variable string, "
        "value_old double, value_new double",
    )
    path = str(tmp_path / "nully.pdf")
    assert write_comparison_pdf(df, path) == 1   # no TypeError, row skipped


def test_pdf_bound_checked_before_collect(spark, tmp_path):
    """The max_economies guard must fire from a distinct-count, before
    any row collect (an un-aggregated frame would OOM the driver
    otherwise)."""
    df = _diff_frame(spark, 5)
    with pytest.raises(ValueError, match="max_economies"):
        write_comparison_pdf(df, str(tmp_path / "x.pdf"), max_economies=3)


def test_pdf_added_economy_labeled_by_code(spark, tmp_path):
    """An economy only in the new release (NULL old-side label) must
    still get a chart, labeled by its code, through the plan wrapper."""
    from gdp_etl_spark.plans.compare import export_comparison_pdf

    df = spark.createDataFrame(
        [("900", None, 2020, "v", None, 7.0),
         ("900", None, 2021, "v", None, 8.0),
         ("004", "Afghanistan", 2020, "v", 1.0, 1.0),
         ("004", "Afghanistan", 2021, "v", 2.0, 2.0)],
        "Economy_Code string, Economy_Label string, Year int, "
        "Variable string, Value_old double, Value_new double",
    )
    path = str(tmp_path / "added.pdf")
    assert export_comparison_pdf(df, path) == 2
    data = open(path, "rb").read()
    assert b"(900) Tj" in data


def test_pdf_three_variables_distinct_linetypes(spark, tmp_path):
    rows = []
    for var, base in (("a", 1.0), ("b", 10.0), ("c", 100.0)):
        for y in (2010, 2011, 2012):
            rows.append(("X", y, var, base + y - 2010, base * 1.1))
    df = spark.createDataFrame(
        rows, "Economy_Label string, Year int, Variable string, "
              "value_old double, value_new double")
    path = str(tmp_path / "tri.pdf")
    write_comparison_pdf(df, path)
    data = open(path, "rb").read()
    assert b"[4 3] 0 d" in data and b"[1 2] 0 d" in data
    assert b"solid = a" in data and b"dashed = b" in data \
        and b"dotted = c" in data


def test_pdf_null_labels_do_not_trip_economy_bound(spark, tmp_path):
    """NULL-label rows are dropped before plotting, so they must not
    count toward max_economies either (guard counts the same frame it
    collects)."""
    rows = [("E1", 2010, "v", 1.0, 1.0), ("E1", 2011, "v", 2.0, 2.0),
            ("E2", 2010, "v", 3.0, 3.0), ("E2", 2011, "v", 4.0, 4.0),
            (None, 2010, "v", 9.0, 9.0)]
    df = spark.createDataFrame(
        rows, "Economy_Label string, Year int, Variable string, "
              "value_old double, value_new double")
    # 2 plottable economies + 1 NULL label: bound of 2 must pass
    assert write_comparison_pdf(
        df, str(tmp_path / "nl.pdf"), max_economies=2) == 2
