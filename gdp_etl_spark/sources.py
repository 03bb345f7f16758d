"""Ingestion sources (SURVEY.md §2.1 S1-S5).

Policy: non-Spark-native ingestion (HTTP fetch, Excel parse, preamble /
footer trimming of small feed files) happens **driver-side**, isolated
behind this module so tests substitute local fixtures and executors only
ever see clean DataFrames.  These feeds are KB-to-MB sized (reference:
largest input is 1.5 MB, ``BASELINE.md``); bulk data belongs in
parquet and never passes through here.

Every reader takes an explicit schema or column spec — ``inferSchema``
is banned repo-wide because it strips leading zeros from code columns
(reference hazard: ``gpd_etl_pipeline.R:80,154,182``).
"""

from __future__ import annotations

import io
import tempfile
import urllib.request
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    na_values: Sequence[str] = (),
) -> DataFrame:
    """S1: local CSV with an explicit schema (reference
    ``gpd_etl_pipeline.R:27,31,35``).  ``na_values`` maps the feed's
    custom NA markers (e.g. Taiwan's ``"--"``) to NULL."""
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    # Spark CSV accepts ONE nullValue option; the first marker goes
    # there and the rest are mapped post-read (string columns need the
    # explicit rewrite; non-string columns already parse any unmapped
    # marker to NULL under PERMISSIVE).
    if na_values:
        reader = reader.option("nullValue", na_values[0])
    return _map_extra_na_markers(reader.csv(path), na_values[1:])


def read_csv_trimmed(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    skip_rows: int = 0,
    skip_footer: int = 0,
    header: bool = True,
    na_values: Sequence[str] = (),
) -> DataFrame:
    """S3 + S5: CSV with a preamble to skip and/or a footer to trim
    (reference Taiwan feeds: ``skip=2`` + 3-6 footer rows,
    ``gpd_etl_pipeline.R:100-122``).

    Implementation: line-index the file once (zipWithIndex — a single
    distributed pass), keep ``[skip_rows, n - skip_footer)``, parse the
    remainder with the normal CSV reader.  Feed files with preambles are
    single-header small files by construction; for bulk data use
    headerless parquet/CSV directories instead."""
    rdd = _trimmed_lines_rdd(spark, path, skip_rows, skip_footer)
    reader = spark.read.schema(schema).option("header", str(header).lower())
    if na_values:
        reader = reader.option("nullValue", na_values[0])
    return _map_extra_na_markers(reader.csv(rdd), na_values[1:])


def _map_extra_na_markers(df: DataFrame, markers: Sequence[str]) -> DataFrame:
    """Map NA markers beyond the one Spark's CSV ``nullValue`` option
    accepts: string columns get an explicit ``value IN markers -> NULL``
    rewrite (one JVM projection, no extra scan); non-string columns need
    nothing — an unmapped marker fails the PERMISSIVE cast and is
    already NULL."""
    if not markers:
        return df
    marks = list(markers)

    def ref(name: str) -> F.Column:
        # backtick-quote: a bare F.col()/df[] parses dots as struct
        # access and would break on dotted column names (e.g. the
        # golden comparison schema's `Value.old`)
        return F.col("`" + name.replace("`", "``") + "`")

    return df.select(
        *[
            F.when(ref(f.name).isin(marks), None)
            .otherwise(ref(f.name))
            .alias(f.name)
            if f.dataType.typeName() == "string"
            else ref(f.name)
            for f in df.schema.fields
        ]
    )


def _trimmed_lines_rdd(spark, path, skip_rows=0, skip_footer=0):
    """Line RDD of ``path`` with ``skip_rows`` leading and
    ``skip_footer`` trailing lines removed — the single shared
    zipWithIndex line-ordering contract for every preamble/footer
    reader (CSV, fixed-width)."""
    rdd = spark.sparkContext.textFile(path)
    if skip_rows or skip_footer:
        n = rdd.count()
        lo, hi = skip_rows, n - skip_footer
        rdd = (
            rdd.zipWithIndex()
            .filter(lambda x: lo <= x[1] < hi)
            .map(lambda x: x[0])
        )
    return rdd


def trim_footer_by_predicate(df: DataFrame, valid_predicate) -> DataFrame:
    """S5 scale-path alternative: footers in real feeds are rows whose
    key column fails a validity test (e.g. ``Period`` not castable to
    int) — a filter keeps the plan fully distributed with no count
    pass."""
    return df.filter(valid_predicate)


def read_http_csv(
    spark: SparkSession,
    url: str,
    schema: StructType | str,
    skip_rows: int = 0,
    skip_footer: int = 0,
    na_values: Sequence[str] = (),
    fetcher: Callable[[str], bytes] | None = None,
) -> DataFrame:
    """S2: HTTP CSV feed → driver-side fetch → temp file → CSV reader.
    ``fetcher`` is injectable so tests never touch the network
    (reference ``read_usis``, ``gpd_etl_pipeline.R:41-49``)."""
    fetch = fetcher or _default_fetcher
    payload = fetch(url)
    tf = tempfile.NamedTemporaryFile(suffix=".csv", delete=False)
    tf.write(payload)
    tf.close()
    return read_csv_trimmed(
        spark, tf.name, schema, skip_rows=skip_rows, skip_footer=skip_footer,
        na_values=na_values,
    )


def _default_fetcher(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=60) as resp:  # noqa: S310
        return resp.read()


def usis_url(series: str, source: str, measure: str) -> str:
    """USIS OData CSV URL for a (series, source, measure) triple —
    mirrors the reference's public endpoint shape
    (``gpd_etl_pipeline.R:41-49``)."""
    return (
        "https://usis.unctad.unctad.org/UsisDWDataService/"
        f"Series{series}Source{source}Measure{measure}"
        "FrequencyA/GetLastVersion()/Data?$format=csv"
    )


#: SpreadsheetML main namespace (ECMA-376 / ISO 29500 part 1)
_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _xlsx_col_index(cell_ref: str) -> int:
    """'A1' → 0, 'B3' → 1, 'AA7' → 26 (base-26 letters prefix)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _read_xlsx_stdlib(data: bytes, skip_rows: int):
    """Pure-stdlib xlsx parser (zipfile + ElementTree over ECMA-376
    SpreadsheetML) for simple dense workbooks — the UNSD AMA feed shape:
    first worksheet, a banner to skip, a header row, typed cells
    (numeric / shared string / inline string).  Exists so S4 ingestion
    runs END-TO-END without openpyxl; anything fancier (formulas, date
    styles, multiple sheets) should go through pandas+openpyxl."""
    import re
    import zipfile
    from xml.etree import ElementTree as ET

    import pandas as pd

    zf = zipfile.ZipFile(io.BytesIO(data))
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{_XLSX_NS}si"):
            shared.append(
                "".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t"))
            )
    sheets = sorted(
        n for n in zf.namelist()
        if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
    )
    if not sheets:
        raise ValueError("workbook has no worksheets")
    root = ET.fromstring(zf.read(sheets[0]))
    # honor the r (reference) attributes: sheetData omits blank rows
    # and cells entirely (Excel and openpyxl both do), so PHYSICAL
    # element order is not row order — a skipped blank banner line
    # would shift skip_rows onto a data row.  Per ECMA-376 an omitted
    # r means "next after the previous one".
    rows_by_idx: dict[int, dict[int, object]] = {}
    prev_row = 0
    for row in root.iter(f"{_XLSX_NS}row"):
        ridx = int(row.get("r", prev_row + 1)) - 1
        prev_row = ridx + 1
        cells = rows_by_idx.setdefault(ridx, {})
        prev_col = -1
        for c in row.findall(f"{_XLSX_NS}c"):
            ref = c.get("r")
            col = _xlsx_col_index(ref) if ref else prev_col + 1
            prev_col = col
            kind = c.get("t", "n")
            if kind == "inlineStr":
                val: object = "".join(
                    t.text or "" for t in c.iter(f"{_XLSX_NS}t")
                )
            else:
                v = c.find(f"{_XLSX_NS}v")
                if v is None or v.text is None:
                    val = None
                elif kind == "s":
                    val = shared[int(v.text)]
                elif kind == "str":
                    val = v.text
                else:
                    val = float(v.text)
            cells[col] = val
    if not rows_by_idx:
        raise ValueError("workbook empty after skip_rows")
    n_rows = max(rows_by_idx) + 1
    # bound the gap fill: a single stray touched cell at r=1048576 (a
    # common Excel artifact) would otherwise materialize a million
    # None-rows.  Dense simple workbooks are this parser's declared
    # scope; anything else goes through pandas+openpyxl.
    if n_rows > 100_000:
        raise ValueError(
            f"stdlib xlsx parser: row reference {n_rows} exceeds the "
            f"dense-workbook bound (100000); install openpyxl or "
            f"convert to CSV"
        )
    width = max(
        (max(r) + 1 for r in rows_by_idx.values() if r), default=0
    )
    matrix = [
        [rows_by_idx.get(ri, {}).get(ci) for ci in range(width)]
        for ri in range(n_rows)
    ]
    matrix = matrix[skip_rows:]
    if not matrix:
        raise ValueError("workbook empty after skip_rows")

    def header_str(h: object) -> str:
        # numeric cells parse as float, so a year header reads 2015.0 —
        # format int-valued floats without the trailing '.0' to match
        # what pandas+openpyxl produces for the same workbook
        if isinstance(h, float) and h.is_integer():
            return str(int(h))
        return str(h)

    header = [header_str(h) for h in matrix[0]]
    return pd.DataFrame(matrix[1:], columns=header)


def write_minimal_xlsx(path: str, rows: Sequence[Sequence[object]]) -> None:
    """Minimal SpreadsheetML writer (one sheet, inline strings, numeric
    cells) — enough to build round-trip fixtures for
    :func:`read_excel` without openpyxl.  Numbers are written as
    numeric cells, everything else as inline strings, ``None`` as an
    empty cell."""
    import zipfile
    from xml.sax.saxutils import escape

    def cell_ref(r: int, c: int) -> str:
        letters = ""
        c += 1
        while c:
            c, rem = divmod(c - 1, 26)
            letters = chr(ord("A") + rem) + letters
        return f"{letters}{r + 1}"

    body = []
    for ri, row in enumerate(rows):
        cells = []
        for ci, val in enumerate(row):
            ref = cell_ref(ri, ci)
            if val is None:
                continue
            if isinstance(val, (int, float)) and not isinstance(val, bool):
                cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>'
                    f"{escape(str(val))}</t></is></c>"
                )
        body.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(body) + "</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/'
        '2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def read_excel(
    spark: SparkSession,
    path_or_bytes: str | bytes,
    skip_rows: int = 0,
    schema: StructType | str | None = None,
) -> DataFrame:
    """S4: Excel → driver-side parse → ``createDataFrame`` (reference
    UNSD AMA files, ``gpd_etl_pipeline.R:53-63,284``).  These files are
    ≤ a few MB; for anything larger, pre-convert to parquet.

    Parse path: pandas+openpyxl when the engine is installed (full
    format coverage); otherwise the pure-stdlib SpreadsheetML parser
    (:func:`_read_xlsx_stdlib` — dense simple workbooks, exactly the
    UNSD feed shape), so S4 ingestion works end-to-end in environments
    without openpyxl."""
    import pandas as pd

    if isinstance(path_or_bytes, bytes):
        data = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    import zipfile

    try:
        pdf = pd.read_excel(io.BytesIO(data), skiprows=skip_rows)
    except ImportError:
        # no Excel engine installed — fall back to the stdlib parser
        try:
            pdf = _read_xlsx_stdlib(data, skip_rows)
        except zipfile.BadZipFile as exc:
            raise ValueError(
                f"not a readable Excel workbook: {exc}. Convert to CSV "
                f"and use read_csv, or pass a fixture DataFrame directly"
            ) from exc
    except ValueError as exc:
        # pandas can't even sniff the format: not a workbook
        raise ValueError(
            f"not a readable Excel workbook: {exc}. Convert to CSV and "
            f"use read_csv, or pass a fixture DataFrame directly"
        ) from exc
    if schema is not None:
        return spark.createDataFrame(pdf, schema=schema)
    # Blank-string cells in otherwise-numeric columns (empty formula
    # results) read as '' from SpreadsheetML but as NaN through
    # pandas+openpyxl; align on NaN so the column is cleanly float64
    # and Arrow conversion succeeds (mixed ''/float object columns trip
    # Spark's slow non-Arrow fallback with a warning).
    for col in pdf.columns:
        s = pdf[col]
        if s.dtype != object:
            continue
        blank = s.map(lambda v: isinstance(v, str) and v.strip() == "")
        if not blank.any():
            continue
        rest = s[~blank].dropna()
        if len(rest) and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in rest
        ):
            pdf[col] = s.mask(blank, None).astype("float64")
    return spark.createDataFrame(pdf)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-Lines corpus reader (the de-facto training-data interchange
    format): explicit schema — never inference, which costs a full extra
    pass at corpus scale and silently widens types between drops — plus
    PERMISSIVE corrupt-record capture so one bad line quarantines into
    ``corrupt_col`` instead of failing a 100-TB job.

    Filter ``col(corrupt_col).isNull()`` for the clean rows and route
    the rest to a quarantine sink; both stay one scan.

    Implementation: text scan + ``from_json`` rather than the raw
    ``spark.read.json`` PERMISSIVE path — the raw path refuses any plan
    whose pruned column set is only the corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which a
    bare ``count()`` after a quarantine filter triggers.  ``from_json``
    runs the same PERMISSIVE parser as an ordinary expression, so every
    downstream plan shape is legal, and the line scan is still one
    whole-stage-codegen pass."""
    if isinstance(schema, str):
        schema = _parse_ddl(spark, schema)
    # copy before .add — StructType.add appends IN PLACE and would
    # mutate a caller-owned schema object
    full = StructType(list(schema.fields)).add(corrupt_col, "string")
    parsed = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
    )
    return spark.read.text(path).select(parsed.alias("__r")).select("__r.*")


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: list[tuple[str, int, int, str]],
    na_values: tuple[str, ...] = (),
    skip_rows: int = 0,
) -> DataFrame:
    """Fixed-width (columnar punch-card / mainframe export) reader —
    the third classic feed format next to CSV and Excel in statistical
    ETL.  ``fields`` is ``(name, start_1_based, width, spark_type)``;
    values are substring-sliced, trimmed, NA-mapped, and cast — all
    JVM-side expressions in one whole-stage-codegen text scan (no
    Python, no per-line UDF; at 100 TB the parse is as cheap as the
    read).  ``skip_rows`` drops a preamble by global line ordinal
    (shared _trimmed_lines_rdd contract; preamble feeds are small
    single files by construction)."""
    if skip_rows:
        rdd = _trimmed_lines_rdd(spark, path, skip_rows).map(lambda v: (v,))
        lines = spark.createDataFrame(rdd, "value string")
    else:
        lines = spark.read.text(path)
    cols = []
    for name, start, width, typ in fields:
        raw = F.trim(F.substring(F.col("value"), start, width))
        for na in na_values:
            raw = F.when(raw == na, None).otherwise(raw)
        raw = F.when(raw == "", None).otherwise(raw)
        cols.append(raw.cast(typ).alias(name))
    return lines.select(*cols)


def _parse_ddl(spark: SparkSession, ddl: str) -> StructType:
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(ddl)


def _warc_timestamp(raw: F.Column) -> F.Column:
    """Parse a WARC-Date header value.  WARC 1.0 mandates
    ``yyyy-MM-ddTHH:mm:ssZ`` but WARC 1.1 (and real crawls) also emit
    fractional seconds (``2024-03-01T12:00:00.123Z``), so the parse
    coalesces the base pattern with milli/micro/nano-second variants.
    ``try_to_timestamp`` (NULL on mismatch regardless of the session's
    ANSI mode) keeps the coalesce semantics independent of config."""
    return F.coalesce(
        *[
            F.try_to_timestamp(raw, F.lit(f"yyyy-MM-dd'T'HH:mm:ss{frac}X"))
            for frac in ("", ".SSS", ".SSSSSS", ".SSSSSSSSS")
        ]
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Common-Crawl WET (extracted-text) reader — the crawl-side ingest
    for a training-data pipeline: each WARC ``conversion`` record
    becomes one row ``(target_uri, warc_date timestamp, content_length
    bigint, text)``, ready for the text/dedup/decontam operators.

    Spark-first shape: the file is read by ``spark.read.text`` with the
    RECORD separator ``"WARC/1.0\\r\\n"`` as ``lineSep`` — one split
    row per WARC record, parsed with pure expressions (header block =
    everything before the first blank line; named headers via
    ``regexp_extract``; body = the rest).  No Python per record, gzip
    members decode transparently (``.wet.gz``), and the scan
    parallelizes per file like any text source.

    Documented trade (the extract_links convention): a record BODY
    containing the literal record separator splits the record — the
    fragment parses as a headerless record and is dropped by the
    ``conversion``-type filter while the true record's body truncates.
    At crawl fidelity use the length-aware scanner
    (:func:`read_warc_parsed` for responses — same recipe applies to
    conversions) behind this column contract.  The
    warcinfo header record and trailing blank splits drop the same
    way.  ``Content-Length`` counts BYTES of the original body, so it
    is reported, not recomputed (multi-byte text makes char length
    differ legitimately).

    Body whitespace contract: exactly one ``\\r\\n\\r\\n`` separates
    headers from body, and each record's trailing ``\\r\\n\\r\\n``
    (the inter-record gap) is stripped; interior newlines are
    preserved verbatim.
    """
    rows = spark.read.text(path, lineSep="WARC/1.0\r\n")

    def header(name: str) -> F.Column:
        # (?i): WARC header names are case-insensitive per the spec
        return F.regexp_extract(
            F.col("__head"), f"(?im)^{name}:[ \\t]*([^\\r\\n]*)", 1
        )

    split_at = F.instr(F.col("value"), "\r\n\r\n")
    parsed = (
        rows.filter(F.length(F.trim(F.col("value"))) > 0)
        .withColumn("__split", split_at)
        .withColumn(
            "__head",
            F.when(F.col("__split") > 0,
                   F.expr("substring(value, 1, __split - 1)")
                   ).otherwise(F.col("value")),
        )
        .withColumn(
            "__body",
            F.when(
                F.col("__split") > 0,
                F.expr("substring(value, __split + 4)"),
            ).otherwise(F.lit("")),
        )
    )
    nullif = lambda c: F.when(c == "", None).otherwise(c)  # noqa: E731
    return (
        parsed.filter(header("WARC-Type") == "conversion")
        .select(
            nullif(header("WARC-Target-URI")).alias("target_uri"),
            _warc_timestamp(nullif(header("WARC-Date"))).alias("warc_date"),
            nullif(header("Content-Length")).cast("bigint").alias(
                "content_length"
            ),
            F.regexp_replace(
                F.col("__body"), "(\\r\\n)+$", ""
            ).alias("text"),
        )
    )


def read_warc_responses(spark: SparkSession, path: str) -> DataFrame:
    """WARC ``response`` record reader — the RAW-crawl sibling of
    :func:`read_wet`: each HTTP response record becomes
    ``(target_uri, warc_date timestamp, http_status int, content_type,
    payload)`` where ``payload`` is the HTTP body (markup) — feed it to
    :func:`~gdp_etl_spark.functions.text.strip_markup` for WET-style
    text and :func:`~gdp_etl_spark.functions.text.extract_links` /
    ``url_host`` for the WAT-style link graph, so one raw-crawl scan
    serves both sides of the pipeline.

    Same record-splitting recipe and the same documented
    separator-in-body trade as :func:`read_wet` (``lineSep`` =
    ``"WARC/1.0\\r\\n"``); :func:`read_warc_parsed` is the
    length-aware swap-in (same columns) when payload fidelity on
    adversarial input matters.
    A response record carries TWO header blocks — WARC headers, blank
    line, HTTP status line + headers, blank line, body — so the parse
    is two ``\\r\\n\\r\\n`` splits: status and Content-Type come from
    the HTTP block (case-insensitive header match, parameters like
    ``; charset=`` stripped), and the body keeps interior newlines
    with the inter-record gap trimmed.  Binary payloads survive only
    if UTF-8-decodable (``spark.read.text`` is a TEXT reader — a
    true image/PDF crawl needs ``binaryFile``/warcio; this reader is
    for HTML/text crawls, which is what the downstream operators eat).
    Non-response records (warcinfo, request, metadata) are filtered.
    """
    rows = spark.read.text(path, lineSep="WARC/1.0\r\n")

    def warc_header(name: str) -> F.Column:
        # (?i): WARC header names are case-insensitive per the spec
        return F.regexp_extract(
            F.col("__warc"), f"(?im)^{name}:[ \\t]*([^\\r\\n]*)", 1
        )

    nullif = lambda c: F.when(c == "", None).otherwise(c)  # noqa: E731
    split1 = F.instr(F.col("value"), "\r\n\r\n")
    parsed = (
        rows.filter(F.length(F.trim(F.col("value"))) > 0)
        .withColumn("__s1", split1)
        .withColumn(
            "__warc",
            F.when(F.col("__s1") > 0,
                   F.expr("substring(value, 1, __s1 - 1)")
                   ).otherwise(F.col("value")),
        )
        .withColumn(
            "__rest",
            F.when(F.col("__s1") > 0,
                   F.expr("substring(value, __s1 + 4)")).otherwise(F.lit("")),
        )
        .filter(warc_header("WARC-Type") == "response")
        .withColumn("__s2", F.instr(F.col("__rest"), "\r\n\r\n"))
        .withColumn(
            "__http",
            F.when(F.col("__s2") > 0,
                   F.expr("substring(__rest, 1, __s2 - 1)")
                   ).otherwise(F.col("__rest")),
        )
        .withColumn(
            "__body",
            F.when(F.col("__s2") > 0,
                   F.expr("substring(__rest, __s2 + 4)")).otherwise(F.lit("")),
        )
    )
    return parsed.select(
        nullif(warc_header("WARC-Target-URI")).alias("target_uri"),
        _warc_timestamp(nullif(warc_header("WARC-Date"))).alias("warc_date"),
        nullif(
            F.regexp_extract(F.col("__http"), "^HTTP/[0-9.]+ ([0-9]{3})", 1)
        ).cast("int").alias("http_status"),
        nullif(
            F.regexp_extract(
                F.col("__http"),
                "(?im)^Content-Type:[ \\t]*([^;\\r\\n]*)", 1,
            )
        ).alias("content_type"),
        F.regexp_replace(F.col("__body"), "(\\r\\n)+$", "").alias("payload"),
    )


def _parse_warc_member(data: bytes):
    """Length-aware WARC record scanner over one (decompressed) file's
    bytes — stdlib only.  Walks record to record using each record's
    ``Content-Length`` to CONSUME the body, so a body containing the
    literal ``"WARC/1.0\\r\\n"`` separator is read intact (the
    corruption the lineSep-split readers document away).  Yields
    ``(headers: dict[lower-name -> value], block: bytes)`` per record;
    tolerant of a missing/garbled Content-Length (falls back to
    scanning for the next record marker)."""
    pos, n = 0, len(data)
    marker = b"WARC/"
    while pos < n:
        idx = data.find(marker, pos)
        if idx < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", idx)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[idx:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("utf-8", "replace")
                )
        block_start = hdr_end + 4
        clen = headers.get("content-length", "")
        # isascii() guard: str.isdigit() accepts Unicode digit chars
        # (e.g. superscripts) that int() rejects — a garbled header
        # must take the fallback, not crash the task
        if clen.isascii() and clen.isdigit():
            block_end = min(block_start + int(clen), n)
        else:
            # no usable length: scan for the next record boundary —
            # degrades to the lineSep readers' separator trade
            nxt = data.find(b"\r\n\r\nWARC/", block_start)
            block_end = nxt if nxt >= 0 else n
        yield headers, data[block_start:block_end]
        pos = block_end


def _maybe_gunzip(fname: str, data: bytes) -> bytes:
    """Decompress one whole-file payload when it is a gzip member
    (by extension or magic) — shared by both length-aware readers."""
    import gzip

    if fname.endswith(".gz") or data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def _warc_ts_py(raw: str | None):
    """Python-side WARC-Date parse for the length-aware readers —
    PARITY with :func:`_warc_timestamp`: offset-less values return
    None (the expression patterns require an X offset; interpreting a
    naive datetime as executor-local time would make the column
    machine-dependent), and unparseable values return None.

    Returns a tz-AWARE UTC datetime: Arrow carries the absolute
    instant, so parity with the expression readers (which parse
    absolute instants via the X offset) holds on ANY session timezone.
    A naive return value would be reinterpreted in
    ``spark.sql.session.timeZone`` at the Arrow boundary — silently
    shifting every warc_date on a non-UTC session (advisor finding)."""
    import datetime as _dt

    if not raw:
        return None
    try:
        d = _dt.datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError:
        return None
    if d.tzinfo is None:
        return None
    return d.astimezone(_dt.timezone.utc)


def _strip_record_tail(body: bytes) -> str:
    """Decode a record body and trim trailing CRLF PAIRS only —
    byte-for-byte the expression readers' ``regexp_replace(body,
    '(\\r\\n)+$', '')`` contract (``rstrip("\\r\\n")`` would also eat
    genuine trailing bare LF/CR bytes, corrupting exactly the payloads
    the fidelity readers exist to preserve)."""
    import re

    return re.sub(b"(\r\n)+$", b"", body).decode("utf-8", "replace")


def read_warc_parsed(spark: SparkSession, path: str) -> DataFrame:
    """Parser-fidelity sibling of :func:`read_warc_responses` — SAME
    column contract ``(target_uri, warc_date timestamp, http_status
    int, content_type, payload)``, but records are consumed by a
    length-aware stdlib scanner (:func:`_parse_warc_member`) over
    ``binaryFile`` whole-file rows inside an Arrow-batched
    ``mapInPandas``, so a payload containing the literal record
    separator ``"WARC/1.0\\r\\n"`` survives intact instead of
    splitting the record (the documented corruption of the expression
    reader on adversarial input).  Gzip members (``.warc.gz``) decode
    via stdlib gzip.

    Scale unit is the FILE (Common-Crawl ships ~1 GB segments in the
    thousands — per-file parallelism is the standard warcio-on-Spark
    shape); ``binaryFile`` materializes one file per task, so executor
    memory must cover max file size.  The expression reader stays the
    default/oracle path for well-formed text crawls; swap this in when
    payload fidelity matters.  Payload bytes decode as UTF-8 with
    replacement (the TEXT-crawl contract); trailing CRLFs are trimmed
    to match the expression reader's column contract."""
    import datetime as _dt

    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("target_uri", StringType()),
            StructField("warc_date", TimestampType()),
            StructField("http_status", IntegerType()),
            StructField("content_type", StringType()),
            StructField("payload", StringType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            rows = []
            for raw, fname in zip(pdf["content"], pdf["path"]):
                data = _maybe_gunzip(fname, bytes(raw))
                for headers, block in _parse_warc_member(data):
                    if headers.get("warc-type") != "response":
                        continue
                    split = block.find(b"\r\n\r\n")
                    http = block[:split] if split >= 0 else block
                    body = block[split + 4:] if split >= 0 else b""
                    status, ctype = None, None
                    lines = http.split(b"\r\n")
                    if lines and lines[0][:5] == b"HTTP/":
                        parts = lines[0].split(b" ")
                        # exactly-3-digit rule: parity with the
                        # expression reader's ([0-9]{3}) pattern
                        if (
                            len(parts) > 1
                            and len(parts[1]) == 3
                            and parts[1].isdigit()
                        ):
                            status = int(parts[1])
                    for line in lines[1:]:
                        k, sep, v = line.partition(b":")
                        if sep and k.strip().lower() == b"content-type":
                            ctype = (
                                v.split(b";")[0].strip()
                                .decode("utf-8", "replace") or None
                            )
                    rows.append(
                        (
                            headers.get("warc-target-uri") or None,
                            _warc_ts_py(headers.get("warc-date")),
                            status,
                            ctype,
                            _strip_record_tail(body),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "target_uri",
                    "warc_date",
                    "http_status",
                    "content_type",
                    "payload",
                ],
            )

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(scan, out_schema)


def read_wet_parsed(spark: SparkSession, path: str) -> DataFrame:
    """Length-aware sibling of :func:`read_wet` — SAME column contract
    ``(target_uri, warc_date timestamp, content_length bigint, text)``
    but records are consumed by the Content-Length-driven scanner
    (:func:`_parse_warc_member`), so extracted text containing the
    literal ``"WARC/1.0\\r\\n"`` separator survives intact.  Same
    whole-file ``binaryFile`` + Arrow-batched ``mapInPandas`` shape,
    trade and scale notes as :func:`read_warc_parsed`."""
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("target_uri", StringType()),
            StructField("warc_date", TimestampType()),
            StructField("content_length", LongType()),
            StructField("text", StringType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            rows = []
            for raw, fname in zip(pdf["content"], pdf["path"]):
                data = _maybe_gunzip(fname, bytes(raw))
                for headers, block in _parse_warc_member(data):
                    if headers.get("warc-type") != "conversion":
                        continue
                    clen = headers.get("content-length", "")
                    rows.append(
                        (
                            headers.get("warc-target-uri") or None,
                            _warc_ts_py(headers.get("warc-date")),
                            int(clen)
                            if clen.isascii() and clen.isdigit()
                            else None,
                            _strip_record_tail(block),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "target_uri", "warc_date", "content_length", "text",
                ],
            )

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(scan, out_schema)
