"""Distributed BPE merge training (byte-pair-encoding tokenizer
vocabulary construction) — the missing piece between the repo's
BPE-ish *counting* regex (``functions/text.py:BPE_TOKEN_RE``) and an
actual trained subword vocabulary.

Reference semantics: Sennrich et al. 2016 ("Neural Machine Translation
of Rare Words with Subword Units") — iteratively merge the most
frequent adjacent symbol pair.  This is the algorithm behind the
GPT-2/RoBERTa tokenizers; a 100-TB training-data pipeline needs it to
*build* the tokenizer it later counts tokens with.

Scale shape (the part that matters at 100 TB):

* The ONLY full-corpus stage is the word-frequency aggregate —
  ``regexp_extract_all`` + explode + map-side-combined ``groupBy`` —
  one shuffle whose output is the *vocabulary*, bounded by language
  (≈10⁶–10⁷ rows), not by corpus size.  This is exactly how production
  trainers (HuggingFace ``tokenizers``, SentencePiece) structure it:
  count once, train on counts.
* Every merge round then runs on the vocab-bounded frequency table:
  one explode of adjacent symbol pairs + one aggregate + a 1-row
  ``collect()`` (the kmeans-stats rule: driver actions are
  parameter-bounded, ``num_merges`` of them).  The corpus is never
  touched again.
* The words frame is ``localCheckpoint``-ed per round: the merge fold
  would otherwise nest ``num_merges`` deep in one lineage and blow up
  codegen.

Merge application uses a left-to-right fold (``F.aggregate``): scan
the symbol array once, merging ``(left, right)`` occurrences greedily
and never re-merging a token created in the same pass (the merged
token ``left||right`` is strictly longer than ``left``, so it can
never equal ``left`` and cascade).  For runs of the SAME symbol this
matches the reference implementation's ``i += 2`` scan exactly:
``a a a`` under pair ``(a,a)`` becomes ``aa a``.  The DuckDB oracle
(`__spark_entry__._bpe_sql`) replays the identical fold as a recursive
CTE, making the trained merge table hash-exact across engines.

No counterpart exists in the reference repo (it is a GDP statistics
pipeline); this operator belongs to the beyond-reference LLM-pipeline
surface the brief mandates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import BPE_TOKEN_RE
from ..session import local_df

__all__ = ["bpe_word_freq", "train_bpe_merges", "bpe_encode"]


def _chars(word: Column) -> Column:
    """Split a word into single-character symbols via a portable
    ``transform(sequence(...), substr)`` — identical semantics in
    Spark and DuckDB (``split(w, '')`` differs across engines on
    empty/edge inputs, ``sequence`` does not)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def bpe_word_freq(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_count: int = 1,
) -> DataFrame:
    """The corpus-scale stage: word frequencies plus initial
    character-symbol arrays — ``(word, cnt, syms)``.

    One explode + one map-side-combined groupBy; output is bounded by
    vocabulary, not corpus size.  ``min_count`` prunes the long tail
    (misspellings, URLs) — the standard lever that keeps the training
    table small at web scale."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    toks = F.when(txt.isNull(), F.array().cast("array<string>")).otherwise(
        F.regexp_extract_all(txt, F.lit(BPE_TOKEN_RE), F.lit(0))
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(int(min_count)))
        .withColumn("syms", _chars(F.col("word")))
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """One greedy left-to-right merge pass over a symbol array.

    Fold invariant: a token appended by a merge is ``left||right``,
    strictly longer than ``left``, so it never equals ``left`` and the
    pass never cascades — semantics identical to the reference
    scanner's ``i += 2``."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _train_merges_local(
    rows: list[tuple[int, list[str]]], num_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Driver-side merge loop over collected ``(cnt, syms)`` rows —
    the reference Sennrich scan (``i += 2``), max-count pair, ties
    broken lexicographically on ``(lhs, rhs)``.  Semantics are proven
    identical to the distributed fold by the path-parity pytest."""
    from collections import Counter

    words = [(int(c), list(s)) for c, s in rows if len(s) >= 2]
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        pairs: Counter = Counter()
        for c, syms in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, a, b, a + b, int(c)))
        nxt_words = []
        for c, syms in words:
            nxt, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            if len(nxt) >= 2:
                nxt_words.append((c, nxt))
        words = nxt_words
    return out


def train_bpe_merges(
    words: DataFrame,
    num_merges: int = 8,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Train ``num_merges`` BPE merges on a ``(word, cnt, syms)``
    frequency table (from :func:`bpe_word_freq`).

    Returns the merge table ``(rank int, lhs string, rhs string,
    merged string, pair_count bigint)`` in training order — the
    artifact a tokenizer serves from.  Ties on pair count break
    lexicographically on ``(lhs, rhs)`` (binary collation in both
    engines), so the table is deterministic and engine-portable.

    Stops early when no adjacent pairs remain (fully merged corpus);
    the returned table then has fewer than ``num_merges`` rows.

    Fast path (the ``closure.py`` ``driver_threshold`` rule): when the
    vocabulary is at most ``driver_threshold`` rows, the frequency
    table is collected once and the merge loop runs driver-side — the
    exact structure of production trainers (HuggingFace ``tokenizers``,
    SentencePiece: distributed count, local train), and the collect is
    bounded by the threshold.  Above it, the loop stays distributed:
    per round, one vocab-bounded pair aggregate + a 1-row collect +
    one fold pass, with a ``localCheckpoint`` per round so round k's
    fold does not nest k aggregates deep in one codegen unit.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    spark = words.sparkSession
    cur = words.select("cnt", "syms").filter(F.size("syms") >= 2)
    schema = (
        "rank int, lhs string, rhs string, merged string, pair_count bigint"
    )
    if driver_threshold > 0:
        # checkpoint ONCE, then count: a limit(N+1).collect() peek
        # would plan as single-task CollectLimit and run the whole
        # tokenize+aggregate on one core (measured 3× slower at sf0.1);
        # count() keeps the aggregate parallel and bounds the collect
        cur = cur.localCheckpoint()
        if cur.count() <= driver_threshold:
            local = _train_merges_local(
                [(r["cnt"], r["syms"]) for r in cur.collect()],
                num_merges,
            )
            return local_df(spark, local, schema)
    else:
        cur = cur.localCheckpoint()
    out = []
    for rank in range(1, num_merges + 1):
        pairs = cur.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.expr("slice(syms, 1, size(syms) - 1)"),
                    F.expr("slice(syms, 2, size(syms) - 1)"),
                    lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.lhs", "p.rhs")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, c = best[0]["lhs"], best[0]["rhs"], int(best[0]["c"])
        out.append((rank, lhs, rhs, lhs + rhs, c))
        cur = (
            cur.withColumn("syms", _apply_merge(F.col("syms"), lhs, rhs))
            .filter(F.size("syms") >= 2)
            .localCheckpoint()
        )
    return local_df(spark, out, schema)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Serving path: encode text with a trained merge list — classic
    rank-priority BPE (always apply the LOWEST-rank applicable merge
    next, the Sennrich/GPT-2 encoder), Arrow-batched via
    ``mapInPandas``-style pandas UDF so the per-doc loop never crosses
    the Python boundary row-at-a-time.

    ``merges`` is the driver-side merge list in rank order (bounded by
    construction — a tokenizer has 10⁴–10⁵ merges); it broadcasts into
    the UDF closure.  Python here is the honest choice: priority-queue
    BPE encoding is inherently iterative per word, and this is how
    every production tokenizer runs it (pytest-covered; excluded from
    the SQL-oracle surface by design)."""
    import re

    from pyspark.sql.functions import pandas_udf

    rank_of = {pair: i for i, pair in enumerate(merges)}
    tok_re = re.compile(BPE_TOKEN_RE)

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) >= 2:
            ranked = [
                (rank_of.get((syms[i], syms[i + 1])), i)
                for i in range(len(syms) - 1)
            ]
            ranked = [(r, i) for r, i in ranked if r is not None]
            if not ranked:
                break
            r, _ = min(ranked)
            a, b = merges[r]
            nxt, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            syms = nxt
        cache[word] = syms
        return syms

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        outs = []
        for t in texts:
            if t is None:
                outs.append([])
                continue
            if lowercase:
                t = t.lower()
            row: list[str] = []
            for w in tok_re.findall(t):
                row.extend(encode_word(w, cache))
            outs.append(row)
        return pd.Series(outs)

    return docs.withColumn(out_col, enc(F.col(text_col)))
