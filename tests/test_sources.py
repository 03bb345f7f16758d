"""Ingestion sources: explicit-schema CSV, preamble/footer trim, NA
markers, injectable HTTP fetch, Excel gating (SURVEY.md §2.1 S1-S5)."""

import pytest
from pyspark.sql import functions as F

from gdp_etl_spark.sources import (
    read_csv,
    read_csv_trimmed,
    read_http_csv,
    trim_footer_by_predicate,
    usis_url,
)

from .conftest import rows

TAIWANISH = """fetched from API
unit: millions
Period,At Current Prices,Chained
1970,100.5,90.0
1971,--,95.0
1972,110.0,--
note: footer line 1
note: footer line 2
note: footer line 3
"""


def test_read_csv_explicit_schema_preserves_codes(spark, tmp_path):
    p = tmp_path / "dim.csv"
    p.write_text("Code,Label\n004,Afghanistan\n0000,World\n")
    df = read_csv(spark, str(p), "Code string, Label string")
    assert rows(df) == [("0000", "World"), ("004", "Afghanistan")]


def test_read_csv_trimmed_skip_na_footer(spark, tmp_path):
    p = tmp_path / "taiwan.csv"
    p.write_text(TAIWANISH)
    df = read_csv_trimmed(
        spark, str(p),
        "Period int, `At Current Prices` double, Chained double",
        skip_rows=2, skip_footer=3, na_values=["--"],
    )
    got = rows(df)
    assert got == [
        (1970, 100.5, 90.0),
        (1971, None, 95.0),   # "--" -> NULL
        (1972, 110.0, None),
    ]


def test_trim_footer_by_predicate(spark):
    df = spark.createDataFrame(
        [("1970", 1.0), ("1971", 2.0), ("note: source", None)],
        "Period string, v double",
    )
    out = trim_footer_by_predicate(df, F.col("Period").cast("int").isNotNull())
    assert out.count() == 2


def test_read_http_csv_with_injected_fetcher(spark):
    fetched_urls = []

    def fake_fetch(url):
        fetched_urls.append(url)
        return TAIWANISH.encode()

    df = read_http_csv(
        spark, "https://example.invalid/feed.csv",
        "Period int, `At Current Prices` double, Chained double",
        skip_rows=2, skip_footer=3, na_values=["--"],
        fetcher=fake_fetch,
    )
    assert df.count() == 3
    assert fetched_urls == ["https://example.invalid/feed.csv"]


def test_usis_url_shape():
    url = usis_url("5301", "0101", "6510")
    assert "Series5301" in url and "Source0101" in url and "Measure6510" in url
    assert url.endswith("$format=csv")


def test_read_excel_rejects_garbage_with_clear_error(spark):
    """A non-workbook must fail with a clear ValueError (from either
    the pandas sniffer or the stdlib fallback), never a raw
    BadZipFile/ImportError."""
    from gdp_etl_spark.sources import read_excel

    with pytest.raises(ValueError) as exc:
        read_excel(spark, b"not-really-xlsx", skip_rows=2)
    assert "workbook" in str(exc.value).lower()


def test_read_excel_stdlib_roundtrip(spark, tmp_path):
    """S4 end-to-end without openpyxl: the stdlib SpreadsheetML writer
    + parser round-trip a banner-skipped typed sheet, including an
    empty (None) cell and a shared/inline string column."""
    from gdp_etl_spark.sources import read_excel, write_minimal_xlsx

    path = str(tmp_path / "fixture.xlsx")
    write_minimal_xlsx(
        path,
        [
            ["banner", None],
            ["Code", "Value"],
            ["004", 1.5],
            ["076", None],        # empty cell -> NULL
            ["158", 2.25],
        ],
    )
    df = read_excel(spark, path, skip_rows=1,
                    schema="Code string, Value double")
    got = sorted(tuple(r) for r in df.collect())
    assert got == [("004", 1.5), ("076", None), ("158", 2.25)]


def test_read_http_csv_file_url_default_fetcher(spark, tmp_path):
    """S2 with the REAL default fetcher: file:// goes through the same
    urlopen path as https://, so the whole fetch -> temp -> trimmed
    scan chain runs without injection."""
    from gdp_etl_spark.sources import read_http_csv

    p = tmp_path / "feed.csv"
    p.write_text("banner\na,b\n1,x\n2,y\nfooter\n")
    df = read_http_csv(
        spark, f"file://{p}", "a int, b string",
        skip_rows=1, skip_footer=1,
    )
    assert sorted(tuple(r) for r in df.collect()) == [(1, "x"), (2, "y")]


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql import functions as F

    from gdp_etl_spark.sources import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "lang": "en", "text": "hello"}\n'
        'NOT JSON AT ALL\n'
        '{"doc_id": 2, "lang": "de", "text": "hallo"}\n'
    )
    df = read_jsonl(
        spark, str(p), "doc_id bigint, lang string, text string"
    ).cache()  # Spark disallows querying ONLY _corrupt_record unparsed
    clean = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    assert bad.count() == 1
    assert bad.first()["_corrupt_record"] == "NOT JSON AT ALL"


def test_read_jsonl_does_not_mutate_caller_schema(spark, tmp_path):
    from pyspark.sql.types import StructType, StructField, LongType

    from gdp_etl_spark.sources import read_jsonl

    p = tmp_path / "one.jsonl"
    p.write_text('{"doc_id": 1}\n')
    schema = StructType([StructField("doc_id", LongType())])
    read_jsonl(spark, str(p), schema)
    assert [f.name for f in schema.fields] == ["doc_id"]


class TestFixedWidth:
    FIELDS = [
        ("code", 1, 4, "string"),
        ("year", 5, 4, "int"),
        ("gdp", 9, 10, "double"),
        ("flag", 19, 2, "string"),
    ]

    def test_parses_slices_trims_and_nulls(self, spark, tmp_path):
        from gdp_etl_spark.sources import read_fixed_width

        p = tmp_path / "fw.dat"
        p.write_text(
            "ALB 2020    100.50 A\n"
            "AND 2021      --   B\n"
            "AUT 2022   2000.25   \n"
        )
        rows = {
            r["code"]: r
            for r in read_fixed_width(
                spark, str(p), self.FIELDS, na_values=("--",)
            ).collect()
        }
        assert rows["ALB"]["year"] == 2020 and rows["ALB"]["gdp"] == 100.5
        assert rows["AND"]["gdp"] is None          # NA marker
        assert rows["AUT"]["flag"] is None         # blank -> NULL
        assert rows["ALB"]["flag"] == "A"          # trimmed

    def test_skip_rows(self, spark, tmp_path):
        from gdp_etl_spark.sources import read_fixed_width

        p = tmp_path / "fw2.dat"
        p.write_text(
            "TITLE LINE\n====\nALB 2020    100.50 A\n"
        )
        out = read_fixed_width(spark, str(p), self.FIELDS, skip_rows=2)
        assert out.count() == 1 and out.collect()[0]["code"] == "ALB"


class TestPythonDataSource:
    def test_partition_parallel_and_deterministic(self, spark):
        from gdp_etl_spark.sources_pyds import TickFeedDataSource

        spark.dataSource.register(TickFeedDataSource)
        df = (
            spark.read.format("tick_feed")
            .option("rows", 1000)
            .option("partitions", 8)
            .load()
        )
        assert df.rdd.getNumPartitions() == 8
        assert df.count() == 1000
        # values are a pure function of tick_id: independent of split count
        df1 = (
            spark.read.format("tick_feed")
            .option("rows", 1000)
            .option("partitions", 3)
            .load()
        )
        assert sorted(map(tuple, df.collect())) == sorted(map(tuple, df1.collect()))
        row = df.filter("tick_id = 7").collect()[0]
        assert row["symbol"] == "SYM7" and row["side"] in ("B", "S")


def test_read_excel_stdlib_sparse_rows(spark, tmp_path):
    """sheetData may OMIT blank rows/cells entirely (Excel does for
    blank banner lines) — the parser must place rows by their r
    attribute, not physical element order, or skip_rows consumes a
    data row as the header."""
    import zipfile

    from gdp_etl_spark.sources import read_excel, write_minimal_xlsx

    # build a normal workbook, then rewrite sheet1 with the banner row
    # (r=1) omitted: header at r=2, data at r=3-4
    path = str(tmp_path / "sparse.xlsx")
    write_minimal_xlsx(path, [["ignored"], ["ignored"], ["ignored"]])
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="2">'
        '<c r="A2" t="inlineStr"><is><t>Code</t></is></c>'
        '<c r="B2" t="inlineStr"><is><t>Value</t></is></c></row>'
        '<row r="3">'
        '<c r="A3" t="inlineStr"><is><t>004</t></is></c>'
        '<c r="B3"><v>1.5</v></c></row>'
        '<row r="4">'
        '<c r="A4" t="inlineStr"><is><t>076</t></is></c>'
        '<c r="B4"><v>2.25</v></c></row>'
        "</sheetData></worksheet>"
    )
    rewritten = str(tmp_path / "sparse2.xlsx")
    with zipfile.ZipFile(path) as zin, \
            zipfile.ZipFile(rewritten, "w") as zout:
        for item in zin.namelist():
            data = sheet.encode() if item == "xl/worksheets/sheet1.xml" \
                else zin.read(item)
            zout.writestr(item, data)
    df = read_excel(spark, rewritten, skip_rows=1,
                    schema="Code string, Value double")
    got = sorted(tuple(r) for r in df.collect())
    assert got == [("004", 1.5), ("076", 2.25)]


def test_read_csv_multiple_na_markers(spark, tmp_path):
    """Every marker in na_values must map to NULL — including in string
    columns, which Spark's single nullValue option can't cover alone
    (sources._map_extra_na_markers)."""
    p = tmp_path / "multi_na.csv"
    p.write_text("Code,Note,Value\nA,--,1.5\nB,n/a,--\nC,ok,n/a\nD,--,2.0\n")
    df = read_csv(
        spark, str(p), "Code string, Note string, Value double",
        na_values=["--", "n/a"],
    )
    assert rows(df) == [
        ("A", None, 1.5),
        ("B", None, None),
        ("C", "ok", None),
        ("D", None, 2.0),
    ]


def test_read_csv_trimmed_multiple_na_markers(spark, tmp_path):
    p = tmp_path / "multi_na_trim.csv"
    p.write_text("banner\nPeriod,Note,Value\n1970,--,1.0\n1971,n/a,n/a\n")
    df = read_csv_trimmed(
        spark, str(p), "Period int, Note string, Value double",
        skip_rows=1, na_values=["--", "n/a"],
    )
    assert rows(df) == [(1970, None, 1.0), (1971, None, None)]


def test_read_excel_stdlib_integer_float_headers(spark, tmp_path):
    """Numeric year headers parse as floats in the stdlib path; the
    column names must come out '2015', not '2015.0', matching what
    pandas+openpyxl produces for the same workbook."""
    from gdp_etl_spark.sources import _read_xlsx_stdlib, write_minimal_xlsx

    p = tmp_path / "years.xlsx"
    write_minimal_xlsx(
        str(p),
        [["CountryID", 2015, 2016.5], [4, 20.25, 21.0]],
    )
    pdf = _read_xlsx_stdlib(p.read_bytes(), 0)
    assert list(pdf.columns) == ["CountryID", "2015", "2016.5"]


def test_multiple_na_markers_with_dotted_column_names(spark, tmp_path):
    """Extra-marker mapping must address columns positionally
    (df[name]), not via F.col, which would parse a dotted name like
    `Value.old` as struct access and fail analysis."""
    p = tmp_path / "dotted.csv"
    p.write_text("Code,Value.old\nA,--\nB,ok\nC,n/a\n")
    df = read_csv(
        spark, str(p), "Code string, `Value.old` string",
        na_values=["--", "n/a"],
    )
    assert rows(df) == [("A", None), ("B", "ok"), ("C", None)]


def test_read_wet_records(spark, tmp_path):
    """WET reader: conversion records parse to (uri, date, length,
    text) with interior newlines preserved and the inter-record gap
    stripped; the warcinfo preamble record is filtered; a record with
    a missing optional header yields NULL; gzip decodes transparently."""
    import gzip

    from gdp_etl_spark.sources import read_wet

    body1 = "First page text.\r\nSecond line."
    body2 = "Solo line with trailing spaces   "
    wet = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "Content-Length: 10\r\n"
        "\r\n"
        "robots: x\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://ex.com/a\r\n"
        "WARC-Date: 2024-03-01T12:00:00Z\r\n"
        f"Content-Length: {len(body1.encode())}\r\n"
        "\r\n"
        f"{body1}\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Date: 2024-03-01T13:30:00Z\r\n"          # no URI header
        f"Content-Length: {len(body2.encode())}\r\n"
        "\r\n"
        f"{body2}\r\n"
        "\r\n"
    )
    p = tmp_path / "part.wet"
    p.write_bytes(wet.encode())
    gz = tmp_path / "part2.wet.gz"
    gz.write_bytes(gzip.compress(wet.encode()))

    for path in (p, gz):
        got = sorted(
            read_wet(spark, str(path)).collect(),
            key=lambda r: r.warc_date,
        )
        assert len(got) == 2, path
        a, b = got
        assert a.target_uri == "http://ex.com/a"
        assert a.text == body1                      # interior CRLF kept
        assert a.content_length == len(body1.encode())
        assert str(a.warc_date).startswith("2024-03-01 12:00:00")
        assert b.target_uri is None                 # missing header -> NULL
        assert b.text == body2                      # trailing spaces kept


def test_wet_to_documents_lands_pipeline_shape(spark, tmp_path):
    """The crawl landing stage produces the documents-table shape from
    a WET file: content-addressed stable ids, host as source, language
    id, blank records dropped — and the result feeds an existing
    operator (clean_corpus) unchanged."""
    from gdp_etl_spark.plans.corpus import wet_to_documents

    def rec(uri, body):
        return (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2024-03-01T12:00:00Z\r\n"
            f"Content-Length: {len(body.encode())}\r\n"
            "\r\n"
            f"{body}\r\n"
            "\r\n"
        )

    wet = (
        rec("https://www.ex.com:8080/a",
            "The quick brown fox jumps over the lazy dog and keeps "
            "going with plenty of common English words to classify.")
        + rec("https://other.net/b", "")          # blank -> dropped
        + rec("https://other.net/c", "short text here")
    )
    p = tmp_path / "crawl.wet"
    p.write_bytes(wet.encode())

    docs = wet_to_documents(spark, str(p))
    rows = {r.url: r for r in docs.collect()}
    assert set(rows) == {"https://www.ex.com:8080/a", "https://other.net/c"}
    a = rows["https://www.ex.com:8080/a"]
    assert a.source == "ex.com" and a.lang == "en"
    assert a.n_chars == len(a.text)
    # content-addressed id is stable across re-reads
    again = {r.url: r.doc_id for r in wet_to_documents(spark, str(p)).collect()}
    assert again[a.url] == a.doc_id

    from gdp_etl_spark.plans.corpus import clean_corpus
    cleaned = clean_corpus(docs, langs=None)
    assert cleaned.count() == 2


def test_read_warc_responses_feeds_both_pipeline_sides(spark, tmp_path):
    """WARC response reader: two-block parse (WARC headers, HTTP
    status+headers, body), non-response records filtered, Content-Type
    parameters stripped, status as int — and the payload drives BOTH
    downstream sides (strip_markup text, extract_links graph) from one
    scan."""
    from pyspark.sql import functions as F

    from gdp_etl_spark.functions.text import extract_links, strip_markup
    from gdp_etl_spark.sources import read_warc_responses

    html = ('<html><body><p>Hello crawl world.</p>'
            '<a href="https://ex.com/next">n</a></body></html>')
    warc = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n\r\nsoftware: test\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: request\r\n"
        "WARC-Target-URI: https://ex.com/page\r\n"
        "\r\nGET /page HTTP/1.1\r\nHost: ex.com\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: https://ex.com/page\r\n"
        "WARC-Date: 2024-03-01T12:00:00Z\r\n"
        "\r\n"
        "HTTP/1.1 200 OK\r\n"
        "content-type: text/html; charset=UTF-8\r\n"
        f"Content-Length: {len(html.encode())}\r\n"
        "\r\n"
        f"{html}\r\n"
        "\r\n"
    )
    p = tmp_path / "crawl.warc"
    p.write_bytes(warc.encode())
    got = read_warc_responses(spark, str(p)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.target_uri == "https://ex.com/page"
    assert r.http_status == 200
    assert r.content_type == "text/html"     # parameters stripped
    assert r.payload == html
    both = (
        read_warc_responses(spark, str(p))
        .select(
            strip_markup(F.col("payload")).alias("wet_text"),
            extract_links(F.col("payload")).alias("links"),
        )
        .collect()[0]
    )
    assert "Hello crawl world." in both.wet_text
    assert both.links == ["https://ex.com/next"]


def test_warc_headers_case_insensitive_and_fractional_dates(spark, tmp_path):
    """WARC header NAMES are case-insensitive per the spec, and
    WARC 1.1 / real crawls emit fractional-second WARC-Dates — both
    readers must parse them (the r10 verdict flagged the case-
    sensitive match and the silently-NULLed .SSS timestamps)."""
    from gdp_etl_spark.sources import read_warc_responses, read_wet

    wet = (
        "WARC/1.0\r\n"
        "warc-type: conversion\r\n"                    # lower-case names
        "warc-target-uri: http://ex.com/a\r\n"
        "WARC-DATE: 2024-03-01T12:00:00.123Z\r\n"      # millis
        "content-length: 4\r\n"
        "\r\n"
        "body\r\n"
        "\r\n"
    )
    p = tmp_path / "ci.wet"
    p.write_bytes(wet.encode())
    got = read_wet(spark, str(p)).collect()
    assert len(got) == 1
    assert got[0].target_uri == "http://ex.com/a"
    assert str(got[0].warc_date).startswith("2024-03-01 12:00:00.123")

    warc = (
        "WARC/1.0\r\n"
        "Warc-Type: response\r\n"
        "Warc-Target-Uri: https://ex.com/page\r\n"
        "Warc-Date: 2024-03-01T12:00:00.123456Z\r\n"   # micros
        "\r\n"
        "HTTP/1.1 200 OK\r\n"
        "Content-Type: text/plain\r\n"
        "\r\n"
        "hi\r\n"
        "\r\n"
    )
    q = tmp_path / "ci.warc"
    q.write_bytes(warc.encode())
    got = read_warc_responses(spark, str(q)).collect()
    assert len(got) == 1
    assert got[0].http_status == 200
    assert str(got[0].warc_date).startswith("2024-03-01 12:00:00.123456")


def _warc_response_rec(uri, date, body: bytes, ctype=b"text/html"):
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body
    )
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        b"WARC-Date: " + date.encode() + b"\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )


def test_read_warc_parsed_parity_on_wellformed(spark, tmp_path):
    """On a well-formed multi-record file (incl. gzip), the length-aware
    parser returns exactly what the expression reader returns — the
    swap-in contract."""
    import gzip

    from gdp_etl_spark.sources import read_warc_parsed, read_warc_responses

    warc = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n"
        b"robots: x\r\n\r\n"
        + _warc_response_rec(
            "https://ex.com/a", "2024-03-01T12:00:00Z",
            b"<html><body>Alpha</body></html>")
        + _warc_response_rec(
            "https://ex.com/b", "2024-03-01T13:00:00.123Z",
            b"plain body\r\nsecond line", ctype=b"text/plain; charset=utf-8")
    )
    p = tmp_path / "ok.warc"
    p.write_bytes(warc)
    gz = tmp_path / "ok.warc.gz"
    gz.write_bytes(gzip.compress(warc))

    want = sorted(
        (tuple(r) for r in read_warc_responses(spark, str(p)).collect())
    )
    for path in (p, gz):
        got = sorted(
            (tuple(r) for r in read_warc_parsed(spark, str(path)).collect())
        )
        assert got == want, path


def test_read_warc_parsed_survives_separator_in_body(spark, tmp_path):
    """THE fidelity case: a payload containing the literal record
    separator "WARC/1.0\\r\\n".  The expression reader documents this
    as corruption (truncated body + dropped fragment); the length-aware
    parser must return the payload intact and keep the record count."""
    from gdp_etl_spark.sources import read_warc_parsed, read_warc_responses

    evil_body = (
        b"before the marker\r\nWARC/1.0\r\n"
        b"WARC-Type: response\r\nlooks like a header\r\n\r\n"
        b"after the marker"
    )
    warc = (
        _warc_response_rec("https://ex.com/evil", "2024-03-01T12:00:00Z",
                           evil_body, ctype=b"text/plain")
        + _warc_response_rec("https://ex.com/after",
                             "2024-03-01T13:00:00Z", b"normal")
    )
    p = tmp_path / "evil.warc"
    p.write_bytes(warc)

    got = {r.target_uri: r.payload
           for r in read_warc_parsed(spark, str(p)).collect()}
    assert set(got) == {"https://ex.com/evil", "https://ex.com/after"}
    assert got["https://ex.com/evil"] == evil_body.decode()
    assert got["https://ex.com/after"] == "normal"

    # and the expression reader DOES corrupt it (the documented trade) —
    # if this ever starts passing, promote the expression reader
    naive = {r.target_uri: r.payload
             for r in read_warc_responses(spark, str(p)).collect()}
    assert naive.get("https://ex.com/evil") != evil_body.decode()


def test_read_wet_parsed_parity_and_separator_fidelity(spark, tmp_path):
    """read_wet_parsed matches read_wet on well-formed files and keeps
    a body containing the literal record separator intact (where the
    lineSep reader documents corruption)."""
    from gdp_etl_spark.sources import read_wet, read_wet_parsed

    def rec(uri, body):
        return (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2024-03-01T12:00:00Z\r\n"
            f"Content-Length: {len(body.encode())}\r\n"
            "\r\n"
            f"{body}\r\n\r\n"
        )

    ok = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n"
        "robots: x\r\n\r\n"
        + rec("http://ex.com/a", "First page text.\r\nSecond line.")
        + rec("http://ex.com/b", "Another page entirely.")
    )
    p = tmp_path / "ok.wet"
    p.write_bytes(ok.encode())
    want = sorted(tuple(r) for r in read_wet(spark, str(p)).collect())
    got = sorted(tuple(r) for r in read_wet_parsed(spark, str(p)).collect())
    assert got == want

    evil_body = "quoting a record header:\r\nWARC/1.0\r\nWARC-Type: x\r\n\r\ntail"
    evil = rec("http://ex.com/evil", evil_body) + rec(
        "http://ex.com/after", "normal"
    )
    q = tmp_path / "evil.wet"
    q.write_bytes(evil.encode())
    parsed = {r.target_uri: r.text
              for r in read_wet_parsed(spark, str(q)).collect()}
    assert parsed["http://ex.com/evil"] == evil_body
    assert parsed["http://ex.com/after"] == "normal"
    naive = {r.target_uri: r.text
             for r in read_wet(spark, str(q)).collect()}
    assert naive.get("http://ex.com/evil") != evil_body


def test_parsed_readers_fidelity_edge_cases(spark, tmp_path):
    """Review-found parity gaps, pinned: (1) a body ending with a bare
    LF keeps it (only CRLF PAIRS are record-tail trimmed — matching the
    expression readers' regex); (2) an offset-less WARC-Date is NULL in
    BOTH readers (never executor-local time); (3) a Unicode-digit
    Content-Length degrades to the boundary-scan fallback instead of
    crashing the task; (4) a non-3-digit HTTP status is NULL, matching
    the expression reader's ([0-9]{3}) rule."""
    from gdp_etl_spark.sources import (
        read_warc_parsed,
        read_warc_responses,
        read_wet,
        read_wet_parsed,
    )

    body = b"real content ending with a bare newline\n"
    http = b"HTTP/1.1 99 Weird\r\nContent-Type: text/plain\r\n\r\n" + body
    warc = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://ex.com/a\r\n"
        b"WARC-Date: 2024-03-01T12:00:00\r\n"          # no offset
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )
    p = tmp_path / "edge.warc"
    p.write_bytes(warc)
    for reader in (read_warc_parsed, read_warc_responses):
        got = reader(spark, str(p)).collect()
        assert len(got) == 1, reader
        r = got[0]
        assert r.warc_date is None, reader          # naive date -> NULL
        assert r.http_status is None, reader        # 2-digit status
        assert r.payload == body.decode(), reader   # bare LF preserved

    wet = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://ex.com/u\r\n"
        "WARC-Date: 2024-03-01T12:00:00Z\r\n"
        "Content-Length: ¹²\r\n"            # unicode digits
        "\r\n"
        "text body\r\n\r\n"
    )
    q = tmp_path / "edge.wet"
    q.write_bytes(wet.encode())
    got = read_wet_parsed(spark, str(q)).collect()
    assert len(got) == 1
    assert got[0].content_length is None
    assert got[0].text == "text body"
    naive = read_wet(spark, str(q)).collect()
    assert len(naive) == 1 and naive[0].content_length is None
