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
    # Spark CSV accepts one nullValue; normalize extra markers via emptyValue
    for marker in na_values:
        reader = reader.option("nullValue", marker)
    return reader.csv(path)


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
    for marker in na_values:
        reader = reader.option("nullValue", marker)
    return reader.csv(rdd)


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


def read_excel(
    spark: SparkSession,
    path_or_bytes: str | bytes,
    skip_rows: int = 0,
    schema: StructType | str | None = None,
) -> DataFrame:
    """S4: Excel → driver-side pandas parse → ``createDataFrame``
    (reference UNSD AMA files, ``gpd_etl_pipeline.R:53-63,284``).  These
    files are ≤ a few MB; for anything larger, pre-convert to parquet.

    Requires an Excel engine (openpyxl); raises a clear error when the
    environment lacks one — tests then feed the pipeline stage functions
    directly with fixture DataFrames."""
    import pandas as pd

    try:
        if isinstance(path_or_bytes, bytes):
            pdf = pd.read_excel(io.BytesIO(path_or_bytes), skiprows=skip_rows)
        else:
            pdf = pd.read_excel(path_or_bytes, skiprows=skip_rows)
    except (ImportError, ValueError) as exc:
        # pandas raises ImportError for a missing engine on a valid
        # workbook, ValueError when it can't even sniff the format
        raise NotImplementedError(
            "Excel ingestion needs openpyxl (not installed in this "
            f"environment) and a valid workbook; underlying error: {exc}. "
            "Convert the workbook to CSV and use read_csv, or pass a "
            "fixture DataFrame to the pipeline stage directly"
        ) from exc
    if schema is not None:
        return spark.createDataFrame(pdf, schema=schema)
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
