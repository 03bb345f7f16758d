"""Persisted ANN serving state — IVF centroids + cell-posting lists as
stamped, bucketed metastore tables.

``similarity.ivf_topk_fixed`` is honest about its cost: the coarse
quantizer trains IN-QUERY so the result is an engine-replayable
contract.  Production ANN does not retrain per query — FAISS builds the
index once and serves many probes from stored state.  This module is
that shape, applied with the repo's two existing persistence protocols:

* the **dedup index** protocol (``dedup.append_to_dedup_index`` /
  ``_compact_bucketed_table``): posting lists live in a BUCKETED table
  keyed by ``cell``, so a probe is a bucket-pruned scan — no index-side
  Exchange, ever (plan-pinned in pytest);
* the **sketch table** protocol (``sketches.write_ndv_sketch``):
  parameters are stamped as table properties, writes go tmp-then-rename
  so a crash can never leave a live-but-stampless table, and appends
  derive everything from the stamp so the index space cannot silently
  fork.

Lifecycle:

* :func:`write_ivf_index` — train the coarse quantizer ONCE
  (``kmeans.train_kmeans_fixed``: hash-seeded, integer Lloyd updates —
  deterministic and oracle-replayable), store centroids in a companion
  ``<table>__centroids`` table and the quantized corpus as posting
  lists bucketed by cell.
* :func:`append_to_ivf_index` — assign NEW vectors to cells using the
  STORED centroids (one map-only pass over the increment, no retrain,
  no rescan of prior data) and append with the bucket spec preserved.
* :func:`ivf_probe_index` — serve top-k from stored state: centroids
  collect driver-side (model state, kilobytes), probe cells per query
  come from the same integer distances, candidates are the bucket-
  pruned posting rows of the probed cells.  No training, no corpus
  quantization — the query-time cost ``ivf_topk_fixed`` pays on every
  call is paid once at build time.
* :func:`delete_from_ivf_index` / :func:`upsert_to_ivf_index` — churn
  (re-crawled or removed documents) via TOMBSTONES, the ``cdc_apply``
  discipline applied to index tables: every write batch carries a
  monotone ``seq`` (stamped ``next_seq`` property), a tombstone row
  ``(id, seq)`` in the small ``<table>__tombstones`` companion kills
  every posting row of that id with an earlier ``seq``, and an upsert
  is tombstone-then-append at ONE seq (the new rows survive their own
  tombstone).  Probes resolve liveness with one BROADCAST join against
  the per-id max tombstone seq — churn-bounded between compactions, no
  index-side Exchange added.
* :func:`compact_ivf_index` — fold append-accreted files back to one
  per bucket (the ``_compact_bucketed_table`` swap, ``ivf.`` stamp
  carried across), apply the accumulated tombstones physically, and
  clear them; probe results are identical before and after (the
  ``ivf_upsert`` driver query pins post-churn probes against a
  from-scratch logical rebuild, cross-engine).

At 100 TB the posting table is the vector store: bucketed (at rest:
partitioned) by cell, appended per ingest batch, compacted in the
maintenance window; probes read only the ``nprobe`` cells they need.
Semantics (quantization, seeding, tie-breaks) are shared with
``ivf_topk_fixed`` so a stored-state probe is hash-identical to the
in-query path trained on the same rows — the driver query ``ivf_index``
pins exactly that cross-engine.

**Single-writer contract (r14 advisor finding):** ``next_seq``
allocation is a read-modify-write on table properties — this module
assumes ONE mutator per index at a time (the same contract
``sketches.write_ndv_sketch`` documents for its stamp).  The contract
is ENFORCED by detection, not trusted: every mutating batch re-reads
the stamped ``next_seq`` immediately before bumping it and raises
``RuntimeError`` if another writer moved it mid-flight (a shared seq
would let a delete spare a colliding upsert's rows — silent liveness
corruption, the one failure mode tombstones cannot repair).
Compaction likewise runs in a mutation QUIET WINDOW: tombstones that
appear during the rewrite are preserved (never dropped unapplied) and
their presence raises loudly after the swap, because posting rows
appended mid-rewrite may not have been captured (prefer-missing —
re-run the mutation batch).

**Format note:** round 14 added the ``seq`` column, the ``next_seq``
stamp and the ``__tombstones`` companion; round 15 adds the id-keyed
``__vectors`` twin (the store probes fetch query vectors from, bucket-
pruned).  Indexes written before these bumps fail loudly on the stamp
read (missing ``next_seq``) — rebuild with :func:`write_ivf_index`;
an index without the ``__vectors`` twin still probes via the
documented (unpruned) posting-scan fallback.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.expressions import bigint_array_lit
from ..session import local_df
from .dedup import _compact_bucketed_table, _num_buckets
from .kmeans import (
    _dist2,
    _quantize,
    assign_expr,
    train_kmeans_fixed,
    train_pq_codebooks,
)

__all__ = [
    "write_ivf_index",
    "append_to_ivf_index",
    "delete_from_ivf_index",
    "upsert_to_ivf_index",
    "ivf_probe_index",
    "ivf_index_stats",
    "compact_ivf_index",
    "write_pq_index",
    "append_to_pq_index",
    "delete_from_pq_index",
    "upsert_to_pq_index",
    "pq_probe_index",
    "pq_index_stats",
    "compact_pq_index",
]

_P = "ivf."  # table-property namespace
_KEYS = ("num_centroids", "n_iter", "scale", "offset", "seed",
         "id_col", "vec_col", "next_seq")


def _centroids_table(table: str) -> str:
    return f"{table}__centroids"


def _tombstones_table(table: str) -> str:
    return f"{table}__tombstones"


def _vectors_table(table: str) -> str:
    return f"{table}__vectors"


def _bump_next_seq(spark, table: str, prefix: str, expected: int) -> None:
    """Advance the stamped write-sequence counter — one metastore write
    per mutating batch, the price of ordered churn — GUARDED by the
    single-writer tripwire (r14 advisor finding + the
    ``sketches.write_ndv_sketch`` concurrent-append discipline): the
    stamp is re-read immediately before the bump and a ``RuntimeError``
    raised if it is no longer the value this writer planned against.
    Two mutators sharing a seq is silent liveness corruption (a delete
    cannot kill a colliding upsert's rows, ``seq >= tomb_seq`` spares
    them), so a detected race must fail the batch, loudly, AFTER its
    data writes — the batch's rows/tombstones are then at an ambiguous
    seq and the caller must inspect or re-run under the single-writer
    contract the module docstring states."""
    key = f"{prefix}next_seq"
    rows = spark.sql(
        f"SHOW TBLPROPERTIES {table} ('{key}')"
    ).collect()
    current = int(rows[0]["value"]) if rows and not str(
        rows[0]["value"]).startswith("Table") else None
    if current != int(expected):
        raise RuntimeError(
            f"{table}: stamped {key} is {current}, expected "
            f"{int(expected)} — another writer mutated this index "
            f"mid-batch (single-writer contract violated); this "
            f"batch's rows share or skip a write seq and its liveness "
            f"is ambiguous: inspect the __tombstones companion or "
            f"re-run the batch alone"
        )
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('{key}' = '{int(expected) + 1}')"
    )


def _append_tombstones(
    spark, table: str, id_col: str, ids_df: DataFrame, seq: int
) -> None:
    """Append ``(id, seq)`` kill rows to the ``__tombstones`` companion
    (created on first use — an append-only index has none).  A
    tombstone kills every posting/code row of that id with an EARLIER
    seq; rows written at the tombstone's own seq survive it (the
    upsert shape).  The companion is churn-bounded between compactions
    — kilobytes, not corpus-scale — so probes broadcast it."""
    (
        ids_df.select(
            F.col(id_col).cast("bigint").alias(id_col),
            F.lit(int(seq)).cast("bigint").alias("seq"),
        )
        .filter(F.col(id_col).isNotNull())
        .distinct()
        .write.mode("append")
        .format("parquet")
        .saveAsTable(_tombstones_table(table))
    )
    spark.catalog.refreshTable(_tombstones_table(table))


def _tombstone_maxseq(spark, table: str, id_col: str) -> DataFrame | None:
    """Per-id max tombstone seq, or None when no churn has happened.
    Bounded by the churned-id count between compactions."""
    ttable = _tombstones_table(table)
    if not spark.catalog.tableExists(ttable):
        return None
    spark.catalog.refreshTable(ttable)
    return spark.table(ttable).groupBy(id_col).agg(
        F.max("seq").alias("__tomb_seq")
    )


def _reclaim_orphans(spark, table: str, companions: tuple[str, ...]) -> None:
    """Pre-write existence discipline: the main (postings/codes) table
    existing is a hard error — the caller must drop a live index
    deliberately.  A companion (centroids/codebooks/tombstones) existing
    WITHOUT the main table is an orphan from a crash inside a previous
    build's rename window (the main table renames LAST); reclaim it so
    the retry the durability docstring promises actually works."""
    if spark.catalog.tableExists(table):
        raise ValueError(f"table {table} already exists")
    for t in companions:
        if spark.catalog.tableExists(t):
            spark.sql(f"DROP TABLE {t}")


def _resolve_live(rows: DataFrame, tomb: DataFrame | None,
                  id_col: str) -> DataFrame:
    """Drop rows killed by a tombstone: keep a row iff its id has no
    tombstone or the row's ``seq`` is >= the id's max tombstone seq.
    The join is a BROADCAST (tombstones are churn-bounded), so a
    bucket-pruned posting scan stays Exchange-free."""
    if tomb is None:
        return rows
    return (
        rows.join(F.broadcast(tomb), id_col, "left")
        .filter(
            F.col("__tomb_seq").isNull()
            | (F.col("seq") >= F.col("__tomb_seq"))
        )
        .drop("__tomb_seq")
    )


def _twin_query_frame(spark, table: str, id_col: str,
                      query_ids: list[int],
                      asof_seq: int | None) -> DataFrame:
    """The probe's query-vector fetch from the id-keyed ``__vectors``
    twin: ``id IN (...)`` on the bucket key — bucket-pruned to
    |distinct bucket ids of the probe batch| files (plan-pinned in
    pytest) — with liveness/asof resolved against the shared
    tombstone companion."""
    vtable = _vectors_table(table)
    spark.catalog.refreshTable(vtable)
    return _snapshot(
        spark, table, id_col, asof_seq,
        rows=spark.table(vtable).filter(F.col(id_col).isin(query_ids)),
    )


def _twin_query_rows(spark, table: str, id_col: str,
                     query_ids: list[int],
                     asof_seq: int | None) -> list:
    """Collect the twin fetch with bucketed scan FORCED on: Spark's
    ``DisableUnnecessaryBucketedScan`` rule turns bucketed reading off
    for a bare point lookup (no downstream join/agg needs the
    distribution), which also discards the bucket-pruning filter and
    rereads every file — for this |Q|-row fetch, pruning beats the
    parallelism the rule is protecting.  The toggle is scoped to the
    collect and restored."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        return _twin_query_frame(
            spark, table, id_col, query_ids, asof_seq
        ).collect()
    finally:
        spark.conf.set(key, prev)


def _upsert_ids(df: DataFrame, id_col: str, vec_col: str,
                fn_name: str) -> DataFrame:
    """The id frame an upsert's tombstones derive from — guarded so a
    NULL-vector row RAISES instead of silently deleting the id (r14
    advisor finding: the posting/code append drops NULL vectors, so an
    unguarded tombstone would kill the id with no replacement row).
    Deletion is a separate, explicit operation."""
    guard = F.when(
        F.col(vec_col).isNull(),
        F.raise_error(
            F.format_string(
                f"{fn_name}: NULL {vec_col} for {id_col} %s — an "
                f"upsert batch must carry a replacement vector for "
                f"every row; remove ids explicitly with the delete "
                f"operation instead",
                F.col(id_col).cast("string"),
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    return df.filter(guard).select(id_col)


def _snapshot(spark, table: str, id_col: str,
              asof_seq: int | None,
              rows: DataFrame | None = None) -> DataFrame:
    """The index's LIVE rows — at the latest state (``asof_seq=None``)
    or AS OF a write sequence: only rows and tombstones written at
    ``seq <= asof_seq`` participate, so the view is exactly what a
    probe saw when ``next_seq`` was ``asof_seq + 1``.  Later appends,
    upserts, deletes and even compactions cannot change it (compaction
    keeps surviving rows' seqs; it only drops rows that were ALREADY
    dead at every asof where they were tombstoned — asof reads BELOW a
    compaction-applied tombstone are the one thing compaction
    forfeits, which is why it is a maintenance-window decision).
    This is the dataset-versioning contract a training pipeline needs:
    a run pinned to ``asof_seq`` reads the same vector set forever.

    ``rows`` overrides the data side (e.g. the ``__vectors`` twin, or
    a pre-filtered scan); liveness always resolves against ``table``'s
    tombstone companion."""
    if rows is None:
        rows = spark.table(table)
    tomb = _tombstone_maxseq(spark, table, id_col)
    if asof_seq is not None:
        s = int(asof_seq)
        rows = rows.filter(F.col("seq") <= F.lit(s))
        if tomb is not None:
            ttable = _tombstones_table(table)
            tomb = (
                spark.table(ttable)
                .filter(F.col("seq") <= F.lit(s))
                .groupBy(id_col).agg(F.max("seq").alias("__tomb_seq"))
            )
    return _resolve_live(rows, tomb, id_col)


def _index_stats(spark, table: str, id_col: str,
                 next_seq: int) -> DataFrame:
    """One-row observability frame for an index table: total vs live
    vs dead row counts, distinct tombstoned ids, the stamped write
    sequence, and the physical file count.  Aggregate-only — two scans
    of the index (bounded output), one of the kilobyte tombstone
    table; nothing collects but the one result row."""
    spark.catalog.refreshTable(table)
    rows = spark.table(table)
    live = _snapshot(spark, table, id_col, None)
    ttable = _tombstones_table(table)
    if spark.catalog.tableExists(ttable):
        tomb_ids = (
            spark.table(ttable).select(id_col).distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("tombstoned_ids"))
        )
    else:
        tomb_ids = spark.range(1).select(
            F.lit(0).cast("long").alias("tombstoned_ids")
        )
    total = rows.agg(F.count(F.lit(1)).cast("long").alias("rows_total"))
    nlive = live.agg(F.count(F.lit(1)).cast("long").alias("rows_live"))
    n_files = len(rows.inputFiles())
    return (
        total.crossJoin(nlive).crossJoin(tomb_ids)
        .select(
            "rows_total",
            "rows_live",
            (F.col("rows_total") - F.col("rows_live")).cast("long")
            .alias("rows_dead"),
            "tombstoned_ids",
            F.lit(int(next_seq)).cast("long").alias("next_seq"),
            F.lit(int(n_files)).cast("long").alias("files"),
        )
    )


def ivf_index_stats(spark, table: str) -> DataFrame:
    """Ops ledger for an IVF index (one row): ``rows_total`` (physical
    posting rows incl. superseded), ``rows_live`` (what a probe sees),
    ``rows_dead`` (compaction debt), ``tombstoned_ids``, ``next_seq``,
    ``files`` — the churn-cycle dashboard: rows_dead and files say when
    to schedule :func:`compact_ivf_index`; after it, rows_dead and
    tombstoned_ids read 0 and files returns to one per bucket."""
    p = _read_stamp(spark, table)
    return _index_stats(spark, table, p["id_col"], p["next_seq"])


def pq_index_stats(spark, table: str) -> DataFrame:
    """:func:`ivf_index_stats` for the PQ codes table."""
    p = _read_pq_stamp(spark, table)
    return _index_stats(spark, table, p["id_col"], p["next_seq"])


def _stamp(spark, table: str, params: dict) -> None:
    """Quote-escaped property stamp (the _compact_bucketed_table rule:
    a hostile value is a stored string, not a syntax error)."""
    kv = ", ".join(
        "'{}{}' = '{}'".format(_P, k, str(v).replace("'", "''"))
        for k, v in sorted(params.items())
    )
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")


def _read_stamp(spark, table: str) -> dict:
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    missing = [k for k in _KEYS if _P + k not in props]
    if missing:
        raise ValueError(
            f"{table} is not an IVF index table (missing properties "
            f"{[_P + k for k in missing]}); create it with "
            f"write_ivf_index"
        )
    return {
        "num_centroids": int(props[_P + "num_centroids"]),
        "n_iter": int(props[_P + "n_iter"]),
        "scale": float(props[_P + "scale"]),
        "offset": float(props[_P + "offset"]),
        "seed": props[_P + "seed"],
        "id_col": props[_P + "id_col"],
        "vec_col": props[_P + "vec_col"],
        "next_seq": int(props[_P + "next_seq"]),
    }


def _load_centroids(spark, table: str) -> list[list[int]]:
    """Collect the stored coarse centroids — model state, bounded by
    num_centroids × dim, never by data."""
    rows = spark.table(_centroids_table(table)).orderBy("cell").collect()
    if not rows:
        raise ValueError(f"{_centroids_table(table)} is empty")
    return [list(r["c"]) for r in rows]


def _quantized(df: DataFrame, id_col: str, vec_col: str, dim: int,
               scale: float, offset: float, seq: int,
               kind: str = "ivf") -> DataFrame:
    """Quantize one batch of vectors to ``(id, q, seq)`` — map-only,
    whole-stage codegen, NULL vectors dropped (the kmeans_fixed rule).
    Vector dimension is checked per row against the index dimension
    (silent truncation is the failure mode).  Feeds both the cell
    assignment of :func:`_postings` and the id-keyed ``__vectors``
    twin the probe fetches query vectors from."""
    q = _quantize(F.col(vec_col), scale, offset)
    guarded = F.when(
        F.size(F.col(vec_col)) != F.lit(dim),
        F.raise_error(
            F.format_string(
                f"{kind} index: vector for {id_col} %s has dimension "
                f"%s, index dimension is {dim}",
                F.col(id_col).cast("string"),
                F.size(F.col(vec_col)).cast("string"),
            )
        ).cast("array<bigint>"),
    ).otherwise(q)
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), guarded.alias("q"),
        F.lit(int(seq)).cast("bigint").alias("seq"),
    )


def _assign_cells(qdf: DataFrame, id_col: str,
                  centroids: list[list[int]]) -> DataFrame:
    """Cell-assign an already-quantized ``(id, q, seq)`` frame —
    map-only (the shared literal-centroid argmin, whole-stage codegen,
    no shuffle before the bucketed write's own redistribution)."""
    cell, _ = assign_expr(centroids, F.col("q"))
    return qdf.select(
        cell.cast("int").alias("cell"), F.col(id_col), "q", "seq",
    )


def _postings(df: DataFrame, id_col: str, vec_col: str,
              centroids: list[list[int]], scale: float,
              offset: float, seq: int) -> DataFrame:
    """Quantize + assign one batch of vectors (see
    :func:`_assign_cells` for the shared assignment tail)."""
    return _assign_cells(
        _quantized(df, id_col, vec_col, len(centroids[0]),
                   scale, offset, seq),
        id_col, centroids,
    )


def write_ivf_index(
    df: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 8,
    n_iter: int = 2,
    scale: float = 1e6,
    offset: float = 1.0,
    seed: str = "ivf",
    num_buckets: int = 8,
) -> None:
    """Build the IVF index: train the coarse quantizer on ``df`` (the
    deterministic fixed-point Lloyd's of ``train_kmeans_fixed`` — per
    iteration one k-row shuffle + a k·dim driver collect), store the
    centroids in ``<table>__centroids`` and the quantized corpus as
    cell-bucketed posting lists in ``table``.

    Durability (the write_ndv_sketch rule): both tables are written and
    stamped under tmp names, then renamed into place — centroids first,
    postings last, so the index is live only when complete (the
    POSTINGS table, renamed last, is the liveness marker).  A crash
    between the two renames leaves an orphaned companion with no
    postings table; a retry detects that state (companion present,
    postings absent) and reclaims the orphan instead of failing with
    "already exists" (r13 advisor finding) — so a crash at any point
    leaves nothing, a retryable tmp, or a reclaimable orphan, never a
    stampless live index."""
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"write_ivf_index: id column {id_col!r} must be integral "
            f"(probe compares against bigint literals); got {id_type}"
        )
    spark = df.sparkSession
    ctable = _centroids_table(table)
    vtable = _vectors_table(table)
    _reclaim_orphans(
        spark, table, (ctable, vtable, _tombstones_table(table))
    )
    centroids = train_kmeans_fixed(
        df.filter(F.col(vec_col).isNotNull()), id_col, vec_col,
        k=num_centroids, n_iter=n_iter, scale=scale, offset=offset,
        seed=seed,
    )
    if not centroids:
        raise ValueError("empty corpus")
    params = {
        "num_centroids": num_centroids, "n_iter": n_iter,
        "scale": repr(float(scale)), "offset": repr(float(offset)),
        "seed": seed, "id_col": id_col, "vec_col": vec_col,
        "next_seq": 1,
    }
    ctmp, vtmp, ptmp = f"{ctable}__new", f"{vtable}__new", f"{table}__new"
    spark.sql(f"DROP TABLE IF EXISTS {ctmp}")
    spark.sql(f"DROP TABLE IF EXISTS {vtmp}")
    spark.sql(f"DROP TABLE IF EXISTS {ptmp}")
    # centroids are model state (k rows): local_df ships ONE Arrow
    # batch as a LocalRelation (~0.05 s) instead of pickling rows
    # through executor Python workers (~0.5 s warm, 3 s cold — the
    # session.local_df rationale, measured r15)
    local_df(
        spark, [(i, c) for i, c in enumerate(centroids)],
        "cell int, c array<bigint>",
    ).write.mode("overwrite").saveAsTable(ctmp)
    spark.sql(f"ALTER TABLE {ctmp} RENAME TO {ctable}")
    dim = len(centroids[0])
    # id-keyed __vectors twin: the store probes fetch query vectors
    # from with BUCKET PRUNING (id IN (...) on the bucket key) — the
    # id-keyed companion that closes the convenience path's unpruned
    # posting scan (r14 verdict task 5).  Renamed before the postings
    # table, which stays the liveness marker.  Both corpus writes are
    # LAZY scans of the source (measured r15: persisting the shared
    # quantized frame to feed them from cache costs more than the two
    # columnar re-scans at bench scale, and at 100 TB it would write
    # corpus bytes to the cache tier to save two pruned parquet scans
    # — the guide's cache-only-when-recompute-is-costlier rule).
    (
        _quantized(df, id_col, vec_col, dim, scale, offset, seq=0)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, id_col)
        .sortBy(id_col)
        .saveAsTable(vtmp)
    )
    spark.sql(f"ALTER TABLE {vtmp} RENAME TO {vtable}")
    (
        _postings(df, id_col, vec_col, centroids, scale, offset, seq=0)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, "cell")
        .sortBy("cell")
        .saveAsTable(ptmp)
    )
    _stamp(spark, ptmp, params)
    spark.sql(f"ALTER TABLE {ptmp} RENAME TO {table}")


def _append_twin(qdf: DataFrame, table: str, p: dict) -> None:
    """Mirror an already-quantized write batch into the id-keyed
    ``__vectors`` twin — the same ``(id, q, seq)`` frame the caller's
    posting append reads (quantized once, shared) — bucketed by id so
    probe-time query-vector fetches are bucket-pruned.  A pre-twin
    index (format note in the module docstring) skips silently: the
    probe falls back to the documented posting scan."""
    spark = qdf.sparkSession
    vtable = _vectors_table(table)
    if not spark.catalog.tableExists(vtable):
        return
    (
        qdf
        .write.mode("append")
        .format("parquet")
        .bucketBy(_num_buckets(spark, vtable), p["id_col"])
        .sortBy(p["id_col"])
        .saveAsTable(vtable)
    )
    spark.catalog.refreshTable(vtable)


def append_to_ivf_index(df: DataFrame, table: str) -> None:
    """Fold a NEW vector batch into the index: assign cells with the
    STORED centroids (no retrain — one map-only pass over the
    increment, prior data never rescanned) and append with the bucket
    spec preserved (postings AND the id-keyed ``__vectors`` twin —
    two map-only scans of the batch sharing one quantize plan).
    Ids already present are the CALLER's contract (an id-keyed store,
    like the dedup index's admitted-batch cycle); duplicate rows cost
    bytes until :func:`compact_ivf_index`."""
    spark = df.sparkSession
    p = _read_stamp(spark, table)
    centroids = _load_centroids(spark, table)
    n_buckets = _num_buckets(spark, table)
    qdf = _quantized(
        df, p["id_col"], p["vec_col"], len(centroids[0]),
        p["scale"], p["offset"], seq=p["next_seq"],
    )
    (
        _assign_cells(qdf, p["id_col"], centroids)
        .write.mode("append")
        .format("parquet")
        .bucketBy(n_buckets, "cell")
        .sortBy("cell")
        .saveAsTable(table)
    )
    _append_twin(qdf, table, p)
    _bump_next_seq(spark, table, _P, p["next_seq"])
    # the append_to_dedup_index catalog-cache rule: invalidate the
    # cached file listing so a probe in this session sees the new rows
    spark.catalog.refreshTable(table)


def delete_from_ivf_index(spark, table: str, ids: Sequence[int]) -> None:
    """Remove vectors from the index by id — a TOMBSTONE append, not a
    rewrite: ``(id, seq)`` rows land in the ``__tombstones`` companion
    and kill every posting row of those ids with an earlier ``seq``;
    :func:`compact_ivf_index` applies them physically.  Deleting an id
    that was never indexed is a no-op tombstone (idempotent, like a
    CDC delete for an unseen key).  Cost: one kilobyte-scale write +
    two metastore ops — the posting table is never scanned."""
    ids = list(ids)
    bad = [i for i in ids if not isinstance(i, int) or isinstance(i, bool)]
    if bad:
        raise TypeError(
            f"delete_from_ivf_index: ids must be Python ints; got "
            f"{bad[:3]!r}{'…' if len(bad) > 3 else ''}"
        )
    p = _read_stamp(spark, table)
    ids_df = local_df(
        spark, [(int(i),) for i in ids], f"{p['id_col']} bigint"
    )
    _append_tombstones(spark, table, p["id_col"], ids_df, p["next_seq"])
    _bump_next_seq(spark, table, _P, p["next_seq"])


def upsert_to_ivf_index(df: DataFrame, table: str) -> None:
    """Replace-or-insert a vector batch (the re-crawled-document
    shape): tombstone the batch's ids, then append the batch's posting
    rows, BOTH at the same ``seq`` — prior versions die (seq <
    tombstone), the new rows survive their own tombstone (seq ==
    tombstone), and an id new to the index simply inserts.  Cells may
    move: the stale row in the old cell is killed by the tombstone at
    probe time (the liveness join is per-row, not per-cell), so a
    probe never serves the old vector even before compaction.

    Crash discipline: tombstones write FIRST, so a crash between the
    two appends leaves the batch's ids absent rather than stale — the
    prefer-missing bias of the dedup index; retrying the same batch
    (at the next seq) converges.  Both writes are distributed —
    nothing collects.  A NULL-vector row in the batch RAISES (r14
    advisor finding): the posting append drops NULL vectors, so
    tombstoning its id would silently delete instead of replace —
    use :func:`delete_from_ivf_index` to remove ids."""
    spark = df.sparkSession
    p = _read_stamp(spark, table)
    centroids = _load_centroids(spark, table)
    n_buckets = _num_buckets(spark, table)
    seq = p["next_seq"]
    _append_tombstones(
        spark, table, p["id_col"],
        _upsert_ids(df, p["id_col"], p["vec_col"],
                    "upsert_to_ivf_index"),
        seq,
    )
    qdf = _quantized(
        df, p["id_col"], p["vec_col"], len(centroids[0]),
        p["scale"], p["offset"], seq=seq,
    )
    (
        _assign_cells(qdf, p["id_col"], centroids)
        .write.mode("append")
        .format("parquet")
        .bucketBy(n_buckets, "cell")
        .sortBy("cell")
        .saveAsTable(table)
    )
    _append_twin(qdf, table, p)
    _bump_next_seq(spark, table, _P, seq)
    spark.catalog.refreshTable(table)


def ivf_probe_index(
    spark,
    table: str,
    query_ids: Sequence[int],
    k: int = 10,
    nprobe: int = 3,
    queries: DataFrame | None = None,
    max_queries: int = 1024,
    asof_seq: int | None = None,
) -> DataFrame:
    """Serve approximate top-k from STORED state — the production
    probe: centroids collect driver-side, each query's ``nprobe``
    nearest cells come from the same integer distances as
    ``ivf_topk_fixed``, and candidates are the bucket-pruned posting
    rows of the probed cells (a ``cell IN (...)`` scan of the bucketed
    table: no index-side Exchange; the only shuffle is the bounded
    candidate set into the per-query top-k window, which Catalyst
    prunes map-side via WindowGroupLimit).

    Returns ``(query_id, neighbour_id, score_d2, rank)`` — identical
    schema, scoring (exact fixed-point squared L2) and tie-breaks to
    ``ivf_topk_fixed``, so a probe over an index built on the same
    rows is hash-identical to the in-query path (driver-pinned).

    ``queries``: an optional bounded frame of raw ``(id_col,
    vec_col)`` rows for the probed ids — quantized with the stamped
    parameters, so values match the stored postings bit-exactly.
    Without it, query vectors are fetched from the id-keyed
    ``__vectors`` twin the write path maintains: a BUCKET-PRUNED
    ``id IN (...)`` scan (plan-pinned in pytest), tombstone/asof
    resolved like the postings — the id-keyed store that closes the
    r13 self-review finding (the old path scanned the cell-bucketed
    posting table unpruned).  Only a pre-twin index (format note)
    falls back to that documented unpruned scan.

    ``max_queries`` bounds the probe batch loudly (the
    ``pq_probe_index`` discipline): the per-posting-row scoring array
    is |Q| structs wide, so an unbounded batch is a plan-size blowup,
    not a bigger job — probe in bounded batches instead.  Tombstoned
    rows (:func:`delete_from_ivf_index` / :func:`upsert_to_ivf_index`)
    are resolved out with one broadcast join before any fetch or
    scoring, so a probe never serves a deleted or superseded vector.

    ``asof_seq`` pins the probe to a SNAPSHOT: only rows and
    tombstones written at ``seq <= asof_seq`` participate — the view
    a probe saw when ``next_seq`` was ``asof_seq + 1``, immutable
    under later churn (the dataset-versioning contract; see
    ``_snapshot``).  Run compaction only once no consumer needs
    asof reads below the applied tombstones."""
    query_ids = list(query_ids)
    bad = [qi for qi in query_ids
           if not isinstance(qi, int) or isinstance(qi, bool)]
    if bad:
        raise TypeError(
            f"ivf_probe_index: query_ids must be Python ints; got "
            f"{bad[:3]!r}{'…' if len(bad) > 3 else ''}"
        )
    if len(set(query_ids)) != len(query_ids):
        raise ValueError("ivf_probe_index: query_ids contains duplicates")
    if len(query_ids) > max_queries:
        raise ValueError(
            f"ivf_probe_index: {len(query_ids)} query ids, over "
            f"max_queries={max_queries}; probe in bounded batches"
        )
    p = _read_stamp(spark, table)
    centroids = _load_centroids(spark, table)
    dim = len(centroids[0])
    spark.catalog.refreshTable(table)
    post = _snapshot(spark, table, p["id_col"], asof_seq)
    id_col = p["id_col"]
    if queries is not None:
        # raw query vectors, quantized with the STAMPED params — the
        # same expression the postings were written with
        src_rows = queries.filter(
            F.col(p["vec_col"]).isNotNull()
        ).select(
            F.col(id_col),
            _quantize(F.col(p["vec_col"]), p["scale"],
                      p["offset"]).alias("q"),
        ).filter(F.col(id_col).isin(query_ids)).collect()
    elif spark.catalog.tableExists(_vectors_table(table)):
        # id-keyed __vectors twin: bucket-pruned id IN (...) fetch,
        # liveness/asof resolved against the shared tombstones
        src_rows = _twin_query_rows(
            spark, table, id_col, query_ids, asof_seq
        )
    else:
        # pre-twin index (format note): fetch from the postings by id
        # — one unpruned scan, the documented fallback
        src_rows = post.filter(F.col(id_col).isin(query_ids)).collect()
    qrows = {r[id_col]: list(r["q"]) for r in src_rows}
    missing = [qi for qi in query_ids if qi not in qrows]
    if missing:
        where = "queries frame" if queries is not None else "index"
        raise ValueError(f"query ids not in {where}: {missing}")
    # dimension guard AGAINST THE STORED CENTROIDS (r13 advisor
    # finding): the driver-side zip() in the probe-cell ranking
    # silently truncates and _dist2's zip_with null-pads, so a
    # wrong-dimension query would yield wrong cells / biased
    # distances instead of an error — the same condition write/append
    # raise on per row
    wrong = {qi: len(v) for qi, v in qrows.items() if len(v) != dim}
    if wrong:
        raise ValueError(
            f"ivf_probe_index: query vector dimension mismatch against "
            f"index dimension {dim}: "
            f"{dict(sorted(wrong.items())[:3])!r}"
            f"{'…' if len(wrong) > 3 else ''}"
        )

    def _probe_cells(qi):
        qv = qrows[qi]
        ranked = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, c)), ci)
            for ci, c in enumerate(centroids)
        )
        return [ci for _, ci in ranked[: min(nprobe, len(centroids))]]

    all_cells = sorted({c for qi in query_ids for c in _probe_cells(qi)})
    per_query = F.array(*[
        F.struct(
            F.lit(qi).cast("bigint").alias("query_id"),
            F.when(
                F.col("cell").isin(_probe_cells(qi)),
                _dist2(bigint_array_lit(qrows[qi]), F.col("q")),
            ).alias("score_d2"),
        )
        for qi in query_ids
    ])
    scored = (
        post.filter(F.col("cell").isin(all_cells))  # bucket-pruned
        .select(
            F.col(id_col).alias("neighbour_id"),
            F.explode(per_query).alias("__e"),
        )
        .select("__e.query_id", "neighbour_id", "__e.score_d2")
        .filter(
            F.col("score_d2").isNotNull()
            & (F.col("neighbour_id") != F.col("query_id"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_d2").asc(), F.col("neighbour_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbour_id", "score_d2",
                F.col("rank").cast("int").alias("rank"))
    )


def _churn_fold(tomb: DataFrame | None, id_col: str,
                content_cols: list[str]):
    """Compaction transform for a churned index table: tombstone
    resolution, then REDELIVERY dedup — physically identical rows that
    landed at different seqs (a retried append after a lost ack: the
    bump succeeded, the caller saw a failure and re-ran) collapse to
    the max seq (r14 advisor finding: the plain ``.distinct()`` of the
    shared swap no longer collapses them once rows carry a seq, and no
    tombstone ever kills the twin — both would stay live forever and
    consume top-k slots).  Grouping on the content columns restores
    the pre-seq 'distinct full rows' guarantee; keeping the MAX seq
    preserves liveness (the surviving row still outlives every folded
    tombstone of its id)."""
    def fold(df: DataFrame) -> DataFrame:
        live = _resolve_live(df, tomb, id_col)
        return live.groupBy(*content_cols).agg(
            F.max("seq").alias("seq")
        )
    return fold


def _retire_tombstones(spark, table: str, cutoff: int) -> None:
    """Clear the folded tombstones WITHOUT destroying concurrent ones
    (r14 advisor finding: the old unconditional DROP lost any
    tombstone appended between the rewrite's read and the drop — a
    confirmed delete silently un-deleted).  Every tombstone folded
    into the rewrite was written at ``seq < cutoff`` (the stamp
    captured on compaction entry), so only rows at ``seq >= cutoff``
    — appended by a mutator RACING the compaction — survive the
    clear, preserved into a rewritten companion.  Their presence then
    raises (quiet-window enforcement): the racing batch's DATA rows
    may or may not have been captured by the rewrite, so its ids are
    prefer-missing — re-run that mutation batch.  Deletes stay safe
    either way: a preserved tombstone that WAS already folded
    re-applies as a no-op (surviving rows have seq >= it)."""
    ttable = _tombstones_table(table)
    if not spark.catalog.tableExists(ttable):
        return
    spark.catalog.refreshTable(ttable)
    schema = spark.table(ttable).schema
    leftover = spark.table(ttable).filter(
        F.col("seq") >= F.lit(int(cutoff))
    ).collect()
    if not leftover:
        spark.sql(f"DROP TABLE IF EXISTS {ttable}")
        return
    tmp = f"{ttable}__new"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    (
        spark.createDataFrame(leftover, schema)
        .write.mode("overwrite").format("parquet").saveAsTable(tmp)
    )
    spark.sql(f"DROP TABLE {ttable}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {ttable}")
    raise RuntimeError(
        f"compaction on {table}: {len(leftover)} tombstone row(s) at "
        f"seq >= {cutoff} appeared DURING the rewrite — a concurrent "
        f"mutator violated the compaction quiet window (module "
        f"docstring).  Their tombstones were preserved (deletes remain "
        f"effective at probe time), but data rows that batch appended "
        f"may not have been captured by the rewrite (prefer-missing): "
        f"re-run the racing mutation batch"
    )


def compact_ivf_index(spark, table: str) -> tuple[int, int]:
    """Fold append-accreted posting files back to one per bucket via
    the shared bucketed-table swap — self-healing renames, ``ivf.``
    parameter stamp carried across — apply the accumulated tombstones
    PHYSICALLY (dead rows dropped from the rewrite, redelivered
    duplicates collapsed to their max seq — see :func:`_churn_fold`),
    compact the ``__vectors`` twin under the same fold, and clear the
    folded tombstones (concurrent ones are preserved and raise — see
    :func:`_retire_tombstones`).  Crash between the swap and the clear
    is safe: surviving rows all pass the liveness predicate (their seq
    >= their id's tombstone), so re-applying stale tombstones at probe
    time or in the next compaction is a no-op.  Run in a mutation
    quiet window (single-writer contract, module docstring).  Returns
    ``(files_before, files_after)`` for the ops ledger."""
    p = _read_stamp(spark, table)
    id_col = p["id_col"]
    cutoff = p["next_seq"]
    tomb = _tombstone_maxseq(spark, table, id_col)
    out = _compact_bucketed_table(
        spark, table, ["cell"], prop_prefix=_P,
        transform=_churn_fold(tomb, id_col, ["cell", id_col, "q"]),
    )
    vtable = _vectors_table(table)
    if spark.catalog.tableExists(vtable):
        _compact_bucketed_table(
            spark, vtable, [id_col], prop_prefix=_P,
            transform=_churn_fold(tomb, id_col, [id_col, "q"]),
        )
    _retire_tombstones(spark, table, cutoff)
    return out


# ---------------------------------------------------------------------------
# persisted PQ index — the codes-only twin of the IVF lifecycle above:
# per-subspace codebooks are model state (m·k_codes·sub integers), the
# corpus compresses to m codes/vector (4 bytes at the defaults — the
# only representation 100 TB of embeddings fits a memory tier in), and
# probes are ADC lookup-table scans of the codes table.  Unlike IVF
# there is no pruning key — ADC's linear scan IS the design — so the
# table buckets on the id column purely for the append/compact file
# protocol (and bucket-pruned id lookups).
# ---------------------------------------------------------------------------

_PQ = "pq."
_PQ_KEYS = ("m", "k_codes", "n_iter", "scale", "offset", "seed",
            "id_col", "vec_col", "dim", "next_seq")


def _pq_codebooks_table(table: str) -> str:
    return f"{table}__codebooks"


def _read_pq_stamp(spark, table: str) -> dict:
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    missing = [k for k in _PQ_KEYS if _PQ + k not in props]
    if missing:
        raise ValueError(
            f"{table} is not a PQ index table (missing properties "
            f"{[_PQ + k for k in missing]}); create it with "
            f"write_pq_index"
        )
    return {
        "m": int(props[_PQ + "m"]),
        "k_codes": int(props[_PQ + "k_codes"]),
        "n_iter": int(props[_PQ + "n_iter"]),
        "scale": float(props[_PQ + "scale"]),
        "offset": float(props[_PQ + "offset"]),
        "seed": props[_PQ + "seed"],
        "id_col": props[_PQ + "id_col"],
        "vec_col": props[_PQ + "vec_col"],
        "dim": int(props[_PQ + "dim"]),
        "next_seq": int(props[_PQ + "next_seq"]),
    }


def _load_codebooks(spark, table: str, m: int) -> list[list[list[int]]]:
    rows = (
        spark.table(_pq_codebooks_table(table))
        .orderBy("subspace", "code").collect()
    )
    books: list[list[list[int]]] = [[] for _ in range(m)]
    for r in rows:
        books[r["subspace"]].append(list(r["c"]))
    if any(not b for b in books):
        raise ValueError(f"{_pq_codebooks_table(table)} is incomplete")
    return books


def _pq_codes(df: DataFrame, id_col: str, vec_col: str,
              books: list[list[list[int]]], sub: int, scale: float,
              offset: float, seq: int) -> DataFrame:
    """Encode one batch: m argmin codes per row against the literal
    codebooks — nested HOFs, whole-stage codegen, no shuffle before
    the bucketed write's own redistribution.  Vector dimension is
    checked per row (slices truncate silently otherwise)."""
    dim = len(books) * sub
    q = _quantize(F.col(vec_col), scale, offset)
    guarded = F.when(
        F.size(F.col(vec_col)) != F.lit(dim),
        F.raise_error(
            F.format_string(
                f"pq index: vector for {id_col} %s has dimension %s, "
                f"index dimension is {dim}",
                F.col(id_col).cast("string"),
                F.size(F.col(vec_col)).cast("string"),
            )
        ).cast("array<bigint>"),
    ).otherwise(q)
    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), guarded.alias("__q")
    )

    def code_expr(s: int):
        cluster, _ = assign_expr(
            books[s], F.slice(F.col("__q"), s * sub + 1, sub)
        )
        return cluster.cast("int")

    return base.select(
        id_col,
        F.array(*[code_expr(s) for s in range(len(books))]).alias("codes"),
        F.lit(int(seq)).cast("bigint").alias("seq"),
    )


def write_pq_index(
    df: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k_codes: int = 16,
    n_iter: int = 2,
    dim: int = 64,
    scale: float = 1e6,
    offset: float = 1.0,
    seed: str = "pq",
    num_buckets: int = 8,
) -> None:
    """Build the PQ index: train the ``m`` per-subspace codebooks ONCE
    (the deterministic fixed-point Lloyd's of ``pq_topk``), store them
    in ``<table>__codebooks`` and the corpus' code vectors in
    ``table`` — the train/encode halves of ``pq_topk`` paid at build
    time instead of per query.  Same durability protocol as
    :func:`write_ivf_index`: tmp-then-rename, stamped, codebooks live
    first, codes table last (the liveness marker); an orphaned
    codebooks table from a crash inside the rename window is reclaimed
    on retry."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"write_pq_index: id column {id_col!r} must be integral; "
            f"got {id_type}"
        )
    spark = df.sparkSession
    ctable = _pq_codebooks_table(table)
    _reclaim_orphans(spark, table, (ctable, _tombstones_table(table)))
    sub = dim // m
    # fused trainer: one persisted frame + one action per Lloyd's step
    # for ALL m subspaces (vs m persists and m·(n_iter+1) actions =
    # m·(n_iter+1) corpus passes) — bit-identical per-subspace books
    # (tests/test_kmeans_mix.py pins the equivalence)
    books = train_pq_codebooks(
        df, id_col, vec_col, m=m, sub=sub, k=k_codes, n_iter=n_iter,
        scale=scale, offset=offset, seed=seed,
    )
    if any(not b for b in books):
        raise ValueError("empty corpus")
    params = {
        "m": m, "k_codes": k_codes, "n_iter": n_iter,
        "scale": repr(float(scale)), "offset": repr(float(offset)),
        "seed": seed, "id_col": id_col, "vec_col": vec_col, "dim": dim,
        "next_seq": 1,
    }
    ctmp, ptmp = f"{ctable}__new", f"{table}__new"
    spark.sql(f"DROP TABLE IF EXISTS {ctmp}")
    spark.sql(f"DROP TABLE IF EXISTS {ptmp}")
    local_df(
        spark,
        [(s, i, c) for s, book in enumerate(books)
         for i, c in enumerate(book)],
        "subspace int, code int, c array<bigint>",
    ).write.mode("overwrite").saveAsTable(ctmp)
    spark.sql(f"ALTER TABLE {ctmp} RENAME TO {ctable}")
    (
        _pq_codes(df, id_col, vec_col, books, sub, scale, offset, seq=0)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, id_col)
        .sortBy(id_col)
        .saveAsTable(ptmp)
    )
    _stamp_pq(spark, ptmp, params)
    spark.sql(f"ALTER TABLE {ptmp} RENAME TO {table}")


def _stamp_pq(spark, table: str, params: dict) -> None:
    kv = ", ".join(
        "'{}{}' = '{}'".format(_PQ, k, str(v).replace("'", "''"))
        for k, v in sorted(params.items())
    )
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")


def append_to_pq_index(df: DataFrame, table: str) -> None:
    """Encode a NEW vector batch with the STORED codebooks (no
    retrain, one map-only pass over the increment) and append with
    the bucket spec preserved."""
    spark = df.sparkSession
    p = _read_pq_stamp(spark, table)
    books = _load_codebooks(spark, table, p["m"])
    sub = p["dim"] // p["m"]
    n_buckets = _num_buckets(spark, table)
    (
        _pq_codes(df, p["id_col"], p["vec_col"], books, sub,
                  p["scale"], p["offset"], seq=p["next_seq"])
        .write.mode("append")
        .format("parquet")
        .bucketBy(n_buckets, p["id_col"])
        .sortBy(p["id_col"])
        .saveAsTable(table)
    )
    _bump_next_seq(spark, table, _PQ, p["next_seq"])
    spark.catalog.refreshTable(table)


def delete_from_pq_index(spark, table: str, ids: Sequence[int]) -> None:
    """Tombstone-delete code rows by id — :func:`delete_from_ivf_index`
    applied to the codes table; :func:`compact_pq_index` applies the
    tombstones physically."""
    ids = list(ids)
    bad = [i for i in ids if not isinstance(i, int) or isinstance(i, bool)]
    if bad:
        raise TypeError(
            f"delete_from_pq_index: ids must be Python ints; got "
            f"{bad[:3]!r}{'…' if len(bad) > 3 else ''}"
        )
    p = _read_pq_stamp(spark, table)
    ids_df = local_df(
        spark, [(int(i),) for i in ids], f"{p['id_col']} bigint"
    )
    _append_tombstones(spark, table, p["id_col"], ids_df, p["next_seq"])
    _bump_next_seq(spark, table, _PQ, p["next_seq"])


def upsert_to_pq_index(df: DataFrame, table: str) -> None:
    """Replace-or-insert a vector batch in the codes table —
    tombstone-then-append at one ``seq``, encoded with the STORED
    codebooks; same crash discipline (tombstones first, prefer-missing)
    and NULL-vector raise as :func:`upsert_to_ivf_index`."""
    spark = df.sparkSession
    p = _read_pq_stamp(spark, table)
    books = _load_codebooks(spark, table, p["m"])
    sub = p["dim"] // p["m"]
    n_buckets = _num_buckets(spark, table)
    seq = p["next_seq"]
    _append_tombstones(
        spark, table, p["id_col"],
        _upsert_ids(df, p["id_col"], p["vec_col"],
                    "upsert_to_pq_index"),
        seq,
    )
    (
        _pq_codes(df, p["id_col"], p["vec_col"], books, sub,
                  p["scale"], p["offset"], seq=seq)
        .write.mode("append")
        .format("parquet")
        .bucketBy(n_buckets, p["id_col"])
        .sortBy(p["id_col"])
        .saveAsTable(table)
    )
    _bump_next_seq(spark, table, _PQ, seq)
    spark.catalog.refreshTable(table)


def pq_probe_index(
    spark,
    queries: DataFrame,
    table: str,
    k: int = 10,
    max_queries: int = 1024,
    asof_seq: int | None = None,
) -> DataFrame:
    """ADC top-k from STORED state: ``queries`` is a bounded frame of
    ``(id_col, vec_col)`` rows (raw vectors — the PQ index stores
    CODES only, 4 bytes/vector at the defaults; queries arrive as
    vectors, the asymmetric in ADC).  The |Q|·m·k_codes lookup tables
    are exact Python ints built from the stored codebooks driver-side;
    each code row's approximate distance is m array lookups — map-only
    scan of the codes table, per-query top-k WindowGroupLimit-pruned.
    ``max_queries`` bounds the driver collect loudly."""
    p = _read_pq_stamp(spark, table)
    m, sub = p["m"], p["dim"] // p["m"]
    books = _load_codebooks(spark, table, m)
    id_col, vec_col = p["id_col"], p["vec_col"]
    q = _quantize(F.col(vec_col), p["scale"], p["offset"])
    qrows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), q.alias("__q"))
        .limit(int(max_queries) + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_probe_index: more than max_queries={max_queries} "
            f"query rows; probe in bounded batches"
        )
    ids = [r[id_col] for r in qrows]
    if len(set(ids)) != len(ids):
        raise ValueError("pq_probe_index: duplicate query ids")
    qvec = {r[id_col]: list(r["__q"]) for r in qrows}
    # dimension guard against the stamped dim (r13 advisor finding):
    # the driver-side adc() zip would silently truncate a wrong-width
    # query into biased lookup tables instead of raising
    wrong = {qi: len(v) for qi, v in qvec.items() if len(v) != p["dim"]}
    if wrong:
        raise ValueError(
            f"pq_probe_index: query vector dimension mismatch against "
            f"index dimension {p['dim']}: "
            f"{dict(sorted(wrong.items())[:3])!r}"
            f"{'…' if len(wrong) > 3 else ''}"
        )

    def adc(qi, s):
        qs = qvec[qi][s * sub:(s + 1) * sub]
        return [
            sum((a - b) * (a - b) for a, b in zip(qs, c))
            for c in books[s]
        ]

    per_query = F.array(*[
        F.struct(
            F.lit(qi).cast("bigint").alias("query_id"),
            sum(
                F.element_at(
                    bigint_array_lit(adc(qi, s)),
                    F.element_at(F.col("codes"), s + 1) + 1,
                )
                for s in range(m)
            ).cast("bigint").alias("approx_d2"),
        )
        for qi in ids
    ])
    spark.catalog.refreshTable(table)
    live = _snapshot(spark, table, id_col, asof_seq)
    scored = (
        live
        .select(F.col(id_col).alias("neighbour_id"),
                F.explode(per_query).alias("__e"))
        .select("__e.query_id", "neighbour_id", "__e.approx_d2")
        .filter(F.col("neighbour_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbour_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbour_id",
                F.col("approx_d2").alias("score_d2"),
                F.col("rank").cast("int").alias("rank"))
    )


def compact_pq_index(spark, table: str) -> tuple[int, int]:
    """Fold append-accreted code files back to one per bucket via the
    shared bucketed-table swap (``pq.`` stamp carried) — the
    :func:`compact_ivf_index` churn fold on the codes table: dead rows
    dropped, redelivered duplicates collapsed on ``(id, codes)`` to
    their max seq, folded tombstones cleared with concurrent ones
    preserved (loud).  Run in a mutation quiet window."""
    p = _read_pq_stamp(spark, table)
    id_col = p["id_col"]
    cutoff = p["next_seq"]
    tomb = _tombstone_maxseq(spark, table, id_col)
    out = _compact_bucketed_table(
        spark, table, [id_col], prop_prefix=_PQ,
        transform=_churn_fold(tomb, id_col, [id_col, "codes"]),
    )
    _retire_tombstones(spark, table, cutoff)
    return out
