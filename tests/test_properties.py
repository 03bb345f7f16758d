"""Property-based spot checks (SURVEY.md §5): invariants over random
inputs, batched into one DataFrame per example so each hypothesis case
costs one Spark job, not one per row."""

import math
import re
from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gdp_etl_spark.functions.expressions import bankers_round, dsum, pad_code
from gdp_etl_spark.operators.closure import rollup_hierarchy, transitive_closure
from gdp_etl_spark.operators.windows import gaps_and_islands

from .conftest import rows

_SET = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _parse_ranges(s: str) -> set[int]:
    out: set[int] = set()
    for part in s.split(", "):
        m = re.fullmatch(r"(\d+)-(\d+)", part)
        if m:
            out.update(range(int(m.group(1)), int(m.group(2)) + 1))
        else:
            out.add(int(part))
    return out


@_SET
@given(
    st.lists(
        st.sets(st.integers(1970, 2030), min_size=1, max_size=15),
        min_size=1, max_size=6,
    )
)
def test_gaps_islands_is_lossless(spark, cases):
    data = [(i, y) for i, ys in enumerate(cases) for y in ys]
    df = spark.createDataFrame(data, "g int, y int")
    got = dict(rows(gaps_and_islands(df, ["g"], "y")))
    for i, ys in enumerate(cases):
        assert _parse_ranges(got[i]) == ys  # compression is invertible


@_SET
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=30))
def test_bankers_round_matches_python(spark, halves):
    # Python round() IS banker's rounding — the reference semantic (R round)
    vals = [k / 2.0 for k in halves]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    got = dict(rows(df.select("i", bankers_round(F.col("v")).alias("r"))))
    for i, v in enumerate(vals):
        assert got[i] == float(round(v)), (v, got[i])


@_SET
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=50))
def test_dsum_is_partitioning_independent(spark, vals):
    data = [(float(v),) for v in vals]
    a = spark.createDataFrame(data, "v double").coalesce(1)
    b = spark.createDataFrame(data, "v double").repartition(7)
    sa = a.agg(dsum("v").alias("s")).first()["s"]
    sb = b.agg(dsum("v").alias("s")).first()["s"]
    assert sa == sb  # bit-exact, not approx: decimal accumulation
    expect = float(
        sum(Decimal(str(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP) for v in vals)
    )
    assert sa == pytest.approx(expect, rel=1e-12)


@_SET
@given(st.integers(0, 999))
def test_pad_code_roundtrips(spark, n):
    df = spark.createDataFrame([(n,)], "c int")
    code = df.select(pad_code("c").alias("p")).first()["p"]
    assert len(code) == 3 and int(code) == n


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_closure_and_rollup_invariants(spark, data):
    # random forest: node i>0 gets a parent drawn from 0..i-1 → acyclic
    n = data.draw(st.integers(3, 12))
    parents = {i: data.draw(st.integers(0, i - 1)) for i in range(1, n)}
    weights = {i: data.draw(st.integers(0, 100)) for i in range(n)}
    edges = spark.createDataFrame(
        [(f"n{p}", f"n{c}") for c, p in parents.items()], "parent string, child string"
    )
    closure = transitive_closure(edges)
    got_pairs = set(rows(closure))

    parent_set = set(parents.values())
    leaves = [i for i in range(n) if i not in parent_set and i in parents]

    def ancestors(i):
        while i in parents:
            i = parents[i]
            yield i

    expect_pairs = {
        (f"n{a}", f"n{l}") for l in leaves for a in ancestors(l)
    }
    assert got_pairs == expect_pairs  # exactly the (ancestor, leaf) pairs

    fact = spark.createDataFrame(
        [(f"n{i}", float(w)) for i, w in weights.items()], "code string, v double"
    )
    totals = dict(
        rows(rollup_hierarchy(fact, closure, "code", "parent", "child", [], "v"))
    )
    for a in set(a for a, _ in expect_pairs):
        member_leaves = [l for (x, l) in expect_pairs if x == a]
        assert totals[a] == sum(weights[int(l[1:])] for l in member_leaves)


# ---------------------------------------------------------------------------
# round-2 additions: time-series + distribution operator invariants
# ---------------------------------------------------------------------------

from datetime import datetime, timedelta

from gdp_etl_spark.operators.profile import equiwidth_histogram
from gdp_etl_spark.operators.timeseries import resample_locf, scd2_intervals

BASE = datetime(2024, 1, 1)

#: (hour-offset, value) observations — unique hours per example
series = st.lists(
    st.tuples(st.integers(0, 72), st.floats(-100, 100, allow_nan=False)),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


@_SET
@given(obs=series)
def test_locf_covers_exactly_the_span_and_carries_values(spark, obs):
    df = spark.createDataFrame(
        [("g", BASE + timedelta(hours=h, minutes=30), v) for h, v in obs],
        "g string, ts timestamp, v double",
    )
    out = resample_locf(df, ["g"], "ts", "v", step="1 hour").collect()
    hours = sorted(h for h, _ in obs)
    # one row per hour across the observed span, no more, no fewer
    assert len(out) == hours[-1] - hours[0] + 1
    by_bucket = {r["bucket"]: r for r in out}
    vals = dict(obs)
    carried = None
    for h in range(hours[0], hours[-1] + 1):
        row = by_bucket[BASE + timedelta(hours=h)]
        if h in vals:
            carried = vals[h]
            assert row["was_observed"] is True
        else:
            assert row["was_observed"] is False
        assert row["v"] == carried


@_SET
@given(
    log=st.lists(
        st.tuples(st.integers(0, 20), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_scd2_intervals_tile_the_timeline_without_overlap(spark, log):
    df = spark.createDataFrame(
        [(1, BASE + timedelta(days=d), a) for d, a in log],
        "k int, ts timestamp, attr string",
    )
    out = sorted(
        scd2_intervals(df, ["k"], "ts", "attr").collect(),
        key=lambda r: r["valid_from"],
    )
    # first interval starts at the first observation; last is open
    assert out[0]["valid_from"] == BASE + timedelta(days=min(d for d, _ in log))
    assert out[-1]["valid_to"] is None and out[-1]["is_current"] is True
    for prev, nxt in zip(out, out[1:]):
        assert prev["valid_to"] == nxt["valid_from"]  # contiguous, no gaps
        assert prev["attr"] != nxt["attr"]  # runs truly collapsed


@_SET
@given(
    xs=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=40
    )
)
def test_histogram_conserves_mass_and_brackets_bounds(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    out = equiwidth_histogram(df, "x", nbins=7).collect()
    assert len(out) == 7
    assert sum(r["n"] for r in out) == len(xs)
    lo, hi = min(xs), max(xs)
    assert out[0]["lo"] == pytest.approx(lo)
    assert out[-1]["hi"] == pytest.approx(hi, rel=1e-12, abs=1e-9)


_HIER_SCHEMA = (
    "Parent_Code string, Parent_Label string, Parent_ValidFrom string, "
    "Parent_ValidTo string, Parent_IsTarget string, "
    "Child_Code string, Child_Label string, Child_ValidFrom string, "
    "Child_ValidTo string, Child_IsTarget string"
)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),        # parent index
            st.integers(1, 9),        # child offset (acyclic: child > parent)
            st.booleans(),            # child IsTarget
            st.booleans(),            # parent label is 'Other territories'
        ),
        min_size=1, max_size=10,
    )
)
def test_expand_hierarchy_paths_agree(spark, raw_edges):
    """The driver-side Python mirror and the distributed broadcast-join
    loop implement ONE semantics (the reference's replace-and-filter
    recursion, final-pass quirk included): their outputs must be equal
    as multisets on arbitrary acyclic hierarchies with mixed target
    flags and exemption labels."""
    from gdp_etl_spark.operators.hierarchy import expand_hierarchy
    from gdp_etl_spark.session import local_df

    edges = []
    for p, off, target, other in raw_edges:
        c = p + off                  # strictly increasing -> acyclic
        label = "Other territories" if other else f"L{p}"
        edges.append(
            (f"N{p}", label, "1940", "2102", "False",
             f"N{c}", f"L{c}", "1940", "2102", str(target))
        )
    df = local_df(spark, edges, _HIER_SCHEMA)
    fast = sorted(map(tuple, expand_hierarchy(df).collect()))
    dist = sorted(
        map(tuple, expand_hierarchy(df, driver_threshold=0).collect())
    )
    assert fast == dist


@_SET
@given(
    st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=12),
             min_size=1, max_size=12),
    st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=12),
             min_size=1, max_size=12),
    st.sampled_from([63, 127, 1 << 10]),
)
def test_bloom_screen_never_false_negative(spark, corpus_texts,
                                           batch_texts, num_bits):
    """Bloom-screen invariants over random corpora at every filter
    size, including degenerate 63-bit filters where nearly everything
    collides: is_dup must equal EXACT set membership (coalesced NULL
    semantics: '' is a real text), and NOT bloom_hit implies NOT
    is_dup — a Bloom false negative is structurally impossible."""
    from gdp_etl_spark.operators.dedup import bloom_screen_dedup

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.bloom_hit, r.is_dup)
           for r in bloom_screen_dedup(batch, corpus, "text", "doc_id",
                                       num_bits=num_bits, k=2).collect()}
    members = set(corpus_texts)
    for i, t in enumerate(batch_texts):
        hit, dup = got[100 + i]
        assert dup == (t in members), (t, num_bits)
        assert hit or not dup


@settings(max_examples=200, deadline=None)
@given(
    records=st.lists(
        st.tuples(
            st.sampled_from(["response", "conversion", "metadata"]),
            st.binary(min_size=0, max_size=400),
        ),
        min_size=0,
        max_size=8,
    )
)
def test_warc_scanner_roundtrip_arbitrary_bodies(records):
    """Round-trip property of the length-aware scanner (no Spark):
    ANY byte sequence — including ones embedding the record separator
    "WARC/1.0\\r\\n", stray "WARC/" markers, CRLF runs, NULs — written
    as a record body with a correct Content-Length is recovered
    EXACTLY, with record count and order preserved.  This is the
    guarantee the lineSep-split expression readers document away."""
    from gdp_etl_spark.sources import _parse_warc_member

    # every other record gets the full separator + a fake header block
    # INJECTED mid-body — random bytes alone would almost never hit it
    sep = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 7\r\n\r\n"
    bodies = [
        body[: len(body) // 2] + sep + body[len(body) // 2:]
        if i % 2 else body
        for i, (_, body) in enumerate(records)
    ]
    blob = b""
    for (rtype, _), body in zip(records, bodies):
        blob += (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + rtype.encode() + b"\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            b"\r\n" + body + b"\r\n\r\n"
        )
    got = list(_parse_warc_member(blob))
    assert len(got) == len(records)
    for (rtype, _), body, (headers, block) in zip(records, bodies, got):
        assert headers.get("warc-type") == rtype
        assert block == body


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_pack_segments_staged_matches_reference(spark, data):
    """pack_segments_staged against a pure-Python packer on random
    staged inputs: identical (pack_id, offsets, seg_tokens) layout,
    stage purity, exact tiling — the full spec, not spot values."""
    from gdp_etl_spark.operators.packing import pack_segments_staged

    n = data.draw(st.integers(1, 25))
    seq_len = data.draw(st.integers(1, 9))
    rows_in = [
        (
            i,
            data.draw(st.integers(0, 2)),          # stage
            data.draw(st.integers(0, 3)),          # batch_id
            data.draw(st.integers(0, 50)),         # n_tokens (0 drops)
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows_in, "doc_id long, stage int, batch_id long, n long"
    )
    got = sorted(map(tuple, pack_segments_staged(
        df, "doc_id", "n", seq_len=seq_len, stage_col="stage",
        order_cols=["batch_id"], pack_id_stride=1000,
    ).collect()))

    # pure-Python reference: per stage, lay docs in (batch_id, doc_id)
    # order and cut the token stream every seq_len
    want = []
    for s in sorted({r[1] for r in rows_in}):
        pos = 0
        docs = sorted(
            (r for r in rows_in if r[1] == s and r[3] > 0),
            key=lambda r: (r[2], r[0]),
        )
        for i, _, _, nt in docs:
            off = 0
            while off < nt:
                pk = (pos + off) // seq_len
                take = min(nt - off, (pk + 1) * seq_len - (pos + off))
                want.append((i, s, s * 1000 + pk,
                             off, (pos + off) - pk * seq_len, take))
                off += take
            pos += nt
    assert got == sorted(want)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_preference_pairs_extreme_matches_reference(spark, data):
    """preference_pairs(extreme) against a pure-Python argmax/argmin
    with the documented tie-breaks and gap floor."""
    from gdp_etl_spark.operators.preference import preference_pairs

    n = data.draw(st.integers(1, 24))
    rows_in = [
        (
            i,
            data.draw(st.integers(0, 4)),                    # prompt
            data.draw(st.integers(0, 5)) / 4.0,              # score
        )
        for i in range(n)
    ]
    min_gap = data.draw(st.integers(0, 3)) / 4.0
    df = spark.createDataFrame(
        rows_in, "resp_id long, prompt_id int, score double"
    )
    got = sorted(map(tuple, preference_pairs(
        df, "prompt_id", "resp_id", "score", min_gap=min_gap
    ).collect()))

    want = []
    for g in sorted({r[1] for r in rows_in}):
        grp = [r for r in rows_in if r[1] == g]
        chosen = min(grp, key=lambda r: (-r[2], r[0]))
        rejected = min(grp, key=lambda r: (r[2], r[0]))
        gap = chosen[2] - rejected[2]
        if chosen[0] != rejected[0] and gap >= min_gap and gap > 0:
            want.append((g, chosen[0], rejected[0],
                         chosen[2], rejected[2], gap))
    assert got == sorted(want)
