"""BPE merge training + encoding (operators/bpe.py) against a
pure-Python reference implementation of Sennrich et al. 2016."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gdp_etl_spark.functions.text import BPE_TOKEN_RE
from gdp_etl_spark.operators.bpe import (
    bpe_encode,
    bpe_word_freq,
    train_bpe_merges,
)


def ref_train(texts, num_merges, lowercase=True, min_count=1):
    """Reference trainer: the literal Sennrich scan (i += 2), max-count
    pair with (lhs, rhs) lexicographic tie-break."""
    tok = re.compile(BPE_TOKEN_RE)
    freq = Counter()
    for t in texts:
        if t is None:
            continue
        freq.update(tok.findall(t.lower() if lowercase else t))
    words = {
        w: [list(w), c] for w, c in freq.items() if c >= min_count and len(w) >= 2
    }
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for syms, c in words.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((rank, a, b, a + b, c))
        for w, (syms, cnt) in list(words.items()):
            nxt, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            if len(nxt) >= 2:
                words[w] = [nxt, cnt]
            else:
                del words[w]
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "the cat sat on the mat, the cat ate 12 rats!",
    "aaa aa aaaa aaa",          # repeated-symbol runs: the i += 2 case
    "widget widgets widgetry",
    None,
    "  ",
]


def _spark_train(spark, texts, num_merges, **kw):
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    words = bpe_word_freq(docs, "text", **kw)
    return [
        tuple(r)
        for r in train_bpe_merges(words, num_merges).orderBy("rank").collect()
    ]


def test_train_matches_reference(spark):
    got = _spark_train(spark, TEXTS, 12)
    want = ref_train(TEXTS, 12)
    assert got == want
    assert len(got) == 12  # corpus is rich enough for all rounds


def test_train_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    a = train_bpe_merges(bpe_word_freq(docs, "text"), 6).collect()
    b = train_bpe_merges(
        bpe_word_freq(docs.repartition(7), "text"), 6
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_train_early_stop_and_min_count(spark):
    # one two-char word: after 1 merge nothing pairs -> early stop
    got = _spark_train(spark, ["ab ab x y z"], 5)
    assert got == [(1, "a", "b", "ab", 2)]
    # min_count prunes the singleton tail before training
    got = _spark_train(spark, ["ab ab cd"], 5, min_count=2)
    assert got == [(1, "a", "b", "ab", 2)]
    with pytest.raises(ValueError, match="min_count"):
        bpe_word_freq(spark.createDataFrame([("x",)], "text string"),
                      "text", min_count=0)
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe_merges(
            bpe_word_freq(spark.createDataFrame([("x",)], "text string")), 0
        )


def test_encode_roundtrip_and_consistency(spark):
    """Encoding with the trained merges re-tokenizes training words to
    their trained symbol state (rank-priority == training order on the
    training corpus itself), and concatenation restores the word."""
    merges = ref_train(TEXTS, 12)
    pairs = [(m[1], m[2]) for m in merges]
    docs = spark.createDataFrame(
        [(t,) for t in TEXTS if t], "text string"
    )
    out = bpe_encode(docs, pairs, "text").collect()
    tok = re.compile(BPE_TOKEN_RE)
    for r in out:
        assert "".join(r.bpe_tokens) == "".join(tok.findall(r.text.lower()))
    # NULL text encodes to an empty array, never NULL
    null_out = bpe_encode(
        spark.createDataFrame([(None,)], "text string"), pairs, "text"
    ).first()
    assert null_out.bpe_tokens == []


def test_encode_rank_priority(spark):
    """The encoder must apply the LOWEST-rank merge first, not scan
    merges in sequence naively: with merges [(b,c), (a,b)], 'abc'
    becomes [a, bc] (rank-0 pair wins), not [ab, c]."""
    docs = spark.createDataFrame([("abc",)], "text string")
    got = bpe_encode(docs, [("b", "c"), ("a", "b")], "text").first()
    assert got.bpe_tokens == ["a", "bc"]


def test_driver_and_distributed_paths_agree(spark):
    """The driver fast path (closure.py driver_threshold rule) and the
    distributed fold loop must train the identical merge table."""
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    words = bpe_word_freq(docs, "text")
    fast = [tuple(r) for r in
            train_bpe_merges(words, 8).orderBy("rank").collect()]
    dist = [tuple(r) for r in
            train_bpe_merges(words, 8, driver_threshold=0)
            .orderBy("rank").collect()]
    assert fast == dist == [tuple(m) for m in ref_train(TEXTS, 8)]
