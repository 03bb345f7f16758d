"""Text-analysis expressions for the documents table.

Everything is built from ``pyspark.sql.functions`` higher-order array
functions — JVM-side, codegen-friendly, no Python UDFs — so each one has
an exact ANSI-SQL mirror for the DuckDB oracle and scales linearly over a
100-TB corpus (per-row expressions, no shuffle).

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length / punctuation / stopword ratios), language-ID (marker-word
heuristic with deterministic tie-break), and document fingerprinting
(min-shingle-hash, a k=1 MinHash).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish tokenizer: letter runs, digit runs, or single non-space symbols.
#: Java's \s spelled out in 2-digit hex (valid in Java, RE2 AND Python
#: re — this literal is compiled by all three): \s itself drifts on
#: \x0B between Java and RE2 and on Unicode whitespace between Java
#: and Python, exactly the class of divergence C4_WS_CLASS exists to
#: eliminate (review finding, round 13).
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

#: non-word, non-space class for punct_ratio — same explicit spelling,
#: same three-engine rationale as BPE_TOKEN_RE above; the oracle
#: imports this constant so the two sides cannot drift.
PUNCT_CLASS = "[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

#: tiny marker-word inventories for the language-ID heuristic.  Real
#: language ID would use char n-gram profiles; the deterministic marker
#: heuristic keeps the operator oracle-checkable and is the shape a
#: production n-gram scorer would take (per-row array ops, no shuffle).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "and", "of", "to", "is", "in", "that"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
}

from .hof import bind_once

#: stopword list for the quality score (EN markers — matches the corpus).
STOPWORDS = LANG_MARKERS["en"]


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens; NULL or empty/blank text yields an empty array
    (the NULL guard keeps legacy ``size(NULL) = -1`` out of every count)."""
    trimmed = F.trim(text)
    return F.when(
        text.isNull() | (F.length(trimmed) == 0), F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, "\\s+"))


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """Count of BPE-ish token matches (letter runs / digit runs / symbols);
    0 for NULL text (never legacy ``size(NULL) = -1``)."""
    return F.when(text.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))
    )


def punct_ratio(text: Column) -> Column:
    """Non-word, non-space characters per character (0 for NULL/empty text)."""
    n = F.size(F.regexp_extract_all(text, F.lit(PUNCT_CLASS), F.lit(0)))
    return F.when(text.isNull() | (F.length(text) == 0), F.lit(0.0)).otherwise(
        n.cast("double") / F.length(text).cast("double")
    )


def _stopword_ratio_ts(ts: Column, stopwords: tuple[str, ...]) -> Column:
    hits = F.size(F.filter(ts, lambda t: t.isin(*stopwords)))
    total = F.size(ts)
    return F.when(total == 0, F.lit(0.0)).otherwise(hits.cast("double") / total.cast("double"))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    # tokenize ONCE per row (bind_once): the unbound form re-split the
    # text per sub-term
    return bind_once(
        ws_tokens(text), lambda ts: _stopword_ratio_ts(ts, stopwords)
    )


def _mean_token_len_ts(ts: Column) -> Column:
    total_chars = F.aggregate(
        ts, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t).cast("bigint")
    )
    return F.when(F.size(ts) == 0, F.lit(0.0)).otherwise(
        total_chars.cast("double") / F.size(ts).cast("double")
    )


def mean_token_len(text: Column) -> Column:
    return bind_once(ws_tokens(text), _mean_token_len_ts)


def quality_score(text: Column) -> Column:
    """Composite [0,1] heuristic quality score: long enough, not
    punctuation-heavy, has some (but not only) stopwords, sane word length.
    Deterministic arithmetic → oracle-checkable.  The token array is
    bound ONCE per row (bind_once) and shared by all three token-based
    sub-scores — the unbound form re-tokenized the text five times per
    row; values are bit-identical (same sub-expressions, same order)."""
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * F.lit(4.0))

    def _score(ts: Column) -> Column:
        n_tok = F.size(ts).cast("double")
        length_ok = F.least(n_tok / F.lit(50.0), F.lit(1.0))
        sw = _stopword_ratio_ts(ts, STOPWORDS)
        sw_ok = F.when((sw >= 0.01) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
        wl = _mean_token_len_ts(ts)
        wl_ok = F.when((wl >= 2.0) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
        # no final rounding: each engine's round(double, n) differs in edge
        # rounding, while the raw IEEE expression is bit-identical everywhere.
        return (
            length_ok * F.lit(0.4) + punct_pen * F.lit(0.2) + sw_ok * F.lit(0.2) + wl_ok * F.lit(0.2)
        )

    return bind_once(ws_tokens(text), _score)


def _marker_filter(markers: tuple[str, ...]):
    """Closure factory returning a 1-arg HOF predicate.  A default-arg
    capture (``lambda t, m=markers:``) would make PySpark build a 2-arg
    (element, index) lambda and bind the index Column to ``m`` — the
    factory keeps the lambda unary."""
    return lambda t: t.isin(*markers)


def lang_id(text: Column) -> Column:
    """Marker-word language ID with deterministic alphabetical tie-break;
    'und' when no marker hits at all."""
    def _pick(ts: Column) -> Column:
        scores = {
            lang: F.size(F.filter(ts, _marker_filter(markers)))
            for lang, markers in sorted(LANG_MARKERS.items())
        }
        best = F.greatest(*scores.values())
        out = F.when(best == 0, F.lit("und"))
        for lang in sorted(LANG_MARKERS):  # alphabetical ⇒ first max wins
            out = out.when(scores[lang] == best, F.lit(lang))
        return out.otherwise(F.lit("und"))

    # one tokenize per row shared by every language score (bind_once)
    return bind_once(ws_tokens(F.lower(text)), _pick)


#: distinctive character trigrams per language for the n-gram heuristic
#: (leading/trailing spaces mark word boundaries, " le" ≠ "le ").
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "de": ("sch", "ich", "der", "ein", "und", "cht", "die", "gen"),
    "en": ("the", "ing", "and", "ion", " th", "he ", "ed ", "of "),
    "es": ("que", "ión", " de", "los", "ado", "la ", "el ", "ent"),
    "fr": ("les", " le", "ent", "eur", "ait", "que", "des", "ois"),
}


def char_trigrams(text: Column) -> Column:
    """All character trigrams of the lowered, whitespace-normalized text
    (occurrences, not distinct — frequency matters for scoring).

    Extraction slices a split-once char array instead of calling
    ``substring(norm, i, 3)`` per position: UTF-8 substring is
    O(position) (it must scan codepoints), which makes the positional
    loop quadratic per document; array slicing is O(k)."""
    norm = F.lower(F.regexp_replace(F.coalesce(text, F.lit("")), "\\s+", " "))

    def _grams(cs: Column) -> Column:
        n = F.size(cs)
        # sequence(1, 0) counts DOWN to [1, 0] and slice rejects start=0,
        # so short texts need an explicit empty-index guard.
        idx = F.when(
            n >= 3, F.sequence(F.lit(1), n - F.lit(2))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: F.concat_ws("", F.slice(cs, i, 3)))

    # split ONCE per row (bind_once): a captured `chars` subtree would
    # re-split per POSITION inside the interpreted lambda — O(len²)/doc
    # (measured 34.5 → 2.0 s over the sf0.1 documents table, r15)
    return bind_once(F.split(norm, ""), _grams)


def _norm_text(text: Column) -> Column:
    """Lowered, whitespace-collapsed text ('' for NULL)."""
    return F.lower(
        F.regexp_replace(F.coalesce(text, F.lit("")), "\\s+", " ")
    )


def _lang_ngram_from_norm(norm: Column) -> Column:
    """Score normalized text against every language trigram profile via
    the replace-count trick: removed-character length per profile
    trigram counts its (non-overlapping) occurrences.  Pure JVM string
    ops — no per-char array allocation, no HOF (so ordinary codegen CSE
    applies to ``norm``).  Alphabetical tie-break; 'und' when nothing
    hits."""
    n = F.length(norm)
    scores = {}
    for lang, profile in sorted(LANG_TRIGRAMS.items()):
        terms = [n - F.length(F.replace(norm, F.lit(t))) for t in profile]
        s = terms[0]
        for t in terms[1:]:
            s = s + t
        scores[lang] = s
    best = F.greatest(*scores.values())
    out = F.when(best <= 0, F.lit("und"))
    for lang in sorted(LANG_TRIGRAMS):
        out = out.when(scores[lang] == best, F.lit(lang))
    return out.otherwise(F.lit("und"))


def lang_id_ngram(text: Column) -> Column:
    """Character-n-gram language ID — complements the marker-word scorer
    (:func:`lang_id`) on text without clean word boundaries.

    Occurrence counting deliberately uses non-overlapping ``replace``
    semantics (matches DuckDB ``replace`` for the oracle).  In per-row
    hot paths materialize ``_norm_text`` into a column first so the
    32-way fan-out shares one normalization."""
    return _lang_ngram_from_norm(_norm_text(text))


#: PII patterns, applied in this order (URL first so its path digits are
#: gone before the phone pass).  Kept to syntax valid in BOTH Java regex
#: (Spark) and RE2 (DuckDB oracle): no backrefs, no lookaround.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Count of replacements each :func:`redact_pii` pass actually makes
    (0 for NULL): every pattern is counted on the text with all PRIOR
    passes applied, so e.g. a URL's digit path is never double-counted
    as a phone number."""
    out: dict[str, Column] = {}
    cur = text
    for kind, pat, tag in PII_PATTERNS:
        out[kind] = F.when(text.isNull(), F.lit(0)).otherwise(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        )
        cur = F.regexp_replace(cur, pat, tag)
    return out


def redact_pii(text: Column) -> Column:
    """Replace URLs, then emails, then phone numbers with typed tags.

    A chain of JVM ``regexp_replace`` calls — per-row, no shuffle, no
    Python; at 100 TB this is pure map work inside whole-stage codegen.
    Pass order matters (and the oracle mirrors it): URL paths often
    contain digit runs a later phone pass would otherwise tag."""
    out = text
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def shingles(text: Column, k: int = 5) -> Column:
    """Distinct k-token shingles (word n-grams) as strings; documents
    shorter than k tokens contribute the whole text as one shingle."""
    def _grams(ts: Column) -> Column:
        n = F.size(ts)
        idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
        gram = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(ts, i, k))
        )
        # tokenless (NULL/empty) docs get NO shingles — otherwise every
        # empty doc would share the fingerprint md5("") and alias as a
        # duplicate.
        return F.when(n == 0, F.array().cast("array<string>")).otherwise(
            F.array_distinct(gram)
        )

    # tokenize ONCE per row (bind_once; the captured-subtree form
    # re-split per shingle — O(len·tokens) per doc)
    return bind_once(ws_tokens(F.lower(text)), _grams)


def fingerprint(text: Column, k: int = 5) -> Column:
    """Document fingerprint: lexicographic min of md5(shingle) — a k=1
    MinHash, stable across engines (md5 is portable, unlike xxhash)."""
    return F.array_min(F.transform(shingles(text, k), F.md5))


#: polynomial rolling-hash parameters (Rabin-Karp shape): small base keeps
#: every intermediate < 2^36, far from bigint overflow under any ANSI mode.
_RH_BASE = 31
_RH_MOD = (1 << 31) - 1


def rolling_content_hash(text: Column) -> Column:
    """Left-to-right polynomial content hash over the character stream
    (``h = (h·B + codepoint) mod M``) — the Rabin-Karp building block for
    document fingerprinting, as a pure JVM fold (no UDF, no shuffle).
    Deterministic and engine-portable: the DuckDB mirror is
    ``list_reduce(list_prepend(0, string_split(text,'')), ...)``.
    NULL text hashes to 0 (the empty-fold value)."""
    codes = F.transform(
        F.split(F.coalesce(text, F.lit("")), ""), lambda c: F.ascii(c).cast("bigint")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: F.pmod(acc * F.lit(_RH_BASE) + x, F.lit(_RH_MOD)),
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """ALL word n-grams (duplicates kept, unlike ``shingles``) — the raw
    material for repetition metrics.  Docs shorter than n tokens yield
    one gram (the whole text); tokenless docs yield an empty array."""
    def _grams(ts: Column) -> Column:
        cnt = F.size(ts)
        idx = F.sequence(F.lit(1), F.greatest(cnt - F.lit(n - 1), F.lit(1)))
        gram = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ts, i, n)))
        return F.when(cnt == 0, F.array().cast("array<string>")).otherwise(gram)

    # tokenize ONCE per row (bind_once; measured 5.3 → 0.5 s over the
    # sf0.1 documents table, r15)
    return bind_once(ws_tokens(F.lower(text)), _grams)


def dup_ngram_ratio(text: Column, n: int = 3) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram —
    the Gopher-style intra-document repetition signal (high value ⇒
    boilerplate / looping generation).  0.0 for docs with no grams."""
    grams = word_ngrams(text, n)
    total = F.size(grams)
    return F.when(total == 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(grams)).cast("double") / total.cast("double")
    )


def top_token_dominance(text: Column) -> Column:
    """Frequency share of the single most common token (1.0 ⇒ the doc is
    one token repeated).  0.0 for tokenless docs.  O(unique·n) per row —
    all JVM HOFs, fine for document-sized arrays."""
    def _dominance(ts: Column) -> Column:
        n = F.size(ts)
        max_cnt = F.array_max(
            F.transform(
                F.array_distinct(ts),
                lambda t: F.size(F.filter(ts, lambda x: x == t)),
            )
        )
        return F.when(n == 0, F.lit(0.0)).otherwise(
            max_cnt.cast("double") / n.cast("double")
        )

    # tokenize ONCE per row (bind_once; the captured form re-split per
    # DISTINCT token — O(unique·len) splits on top of the documented
    # O(unique·n) scan)
    return bind_once(ws_tokens(F.lower(text)), _dominance)


def collapse_repeated_tokens(text: Column) -> Column:
    """Collapse immediate token repeats ("the the the" → "the") — the
    cheap intra-document cleanup step of a corpus pipeline.  Index-aware
    ``filter``: element i survives unless it equals element i-1
    (``element_at`` is 1-based, so ``element_at(toks, i)`` IS the
    previous element for 0-based lambda index i ≥ 1).  NULL text stays
    NULL."""
    def _collapse(ts: Column) -> Column:
        # CASE-gated so element_at(ts, 0) is never evaluated (it raises
        # in every ANSI mode; `|` does not short-circuit, CASE branches
        # do)
        kept = F.filter(
            ts,
            lambda x, i: F.when(i == 0, F.lit(True)).otherwise(
                x != F.element_at(ts, i)
            ),
        )
        return F.array_join(kept, " ")

    # tokenize ONCE per row (bind_once; the captured form re-split per
    # TOKEN inside the predicate's element_at)
    return F.when(text.isNull(), F.lit(None).cast("string")).otherwise(
        bind_once(ws_tokens(text), _collapse)
    )


def pseudonymize(key: Column, salt: str) -> Column:
    """Salted SHA-256 pseudonymous id for a key column — the standard
    GDPR-style keyed de-identification: stable for joins/grouping,
    irreversible without the salt, portable (DuckDB mirror:
    ``sha256(salt || ':' || key)``).  NULL keys stay NULL."""
    return F.when(
        key.isNull(), F.lit(None).cast("string")
    ).otherwise(F.sha2(F.concat_ws(":", F.lit(salt), key.cast("string")), 256))


def trigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: int = 4096,
    quantize: int = 10**6,
) -> DataFrame:
    """Per-document character-trigram language-model score — the CCNet
    / Gopher-style perplexity filter for corpus curation, built from
    the corpus itself (no external model file).

    Model: add-one-smoothed unigram distribution over the ``vocab``
    most frequent trigrams (ties broken lexicographically); any other
    trigram scores as unseen, ``1 / (T + vocab + 1)``.  Score: mean
    log-probability of the document's trigrams — low = unnatural
    character statistics (boilerplate, encoding garbage, wrong
    language), the standard cut for quality filtering.

    Scale shape: ONE explode, immediately collapsed to per-(doc,
    trigram) occurrence counts (the natural-text trigram distribution
    is heavy-tailed, so this cuts the working set several-fold) and
    persisted — the model pass and the scoring pass both read it
    instead of re-deriving the explode.  Model + totals broadcast back;
    the corpus shuffles nothing but trigram keys.  100-TB-safe.

    Determinism: each distinct trigram's log-prob is quantized ONCE as
    ``floor(ln(p) · quantize)`` (bigint); per-doc sums are exact integer
    adds, so scores are bit-identical across runs and partitionings.
    Cross-engine, the recipe additionally assumes both engines' ``ln``
    agree on the ≤ vocab+1 distinct inputs; a 1-ulp ``ln`` discrepancy
    only flips a floor when ``ln(p)·quantize`` lands within ~1e-8 of an
    integer, so the default 1e6 scale keeps the per-corpus flip
    probability < ~1e-4 while still resolving scores to 1e-6 nats
    (1e-6 granularity is far below any quality-cut threshold's
    sensitivity).

    Output: ``(id_col, n_tri, sum_logp_q, avg_logp)`` — docs with no
    trigrams (< 3 chars) report NULL ``avg_logp``.
    """
    doc_tri = (
        docs.select(
            F.col(id_col),
            F.explode_outer(char_trigrams(F.col(text_col))).alias("tri"),
        )
        .groupBy(id_col, "tri")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .persist()
    )
    counts = (
        doc_tri.filter(F.col("tri").isNotNull())
        .groupBy("tri")
        .agg(F.sum("n").alias("c"))
    )
    totals = counts.agg(
        F.sum("c").cast("long").alias("t_total"),
    )
    model = (
        counts.orderBy(F.col("c").desc(), "tri")
        .limit(vocab)
        .join(F.broadcast(totals))
        .select(
            "tri",
            F.floor(
                F.log(
                    (F.col("c") + 1).cast("double")
                    / (F.col("t_total") + vocab + 1).cast("double")
                )
                * quantize
            )
            .cast("long")
            .alias("logp_q"),
        )
    )
    unseen = totals.select(
        F.floor(
            F.log(F.lit(1.0) / (F.col("t_total") + vocab + 1).cast("double"))
            * quantize
        )
        .cast("long")
        .alias("unseen_q")
    )
    scored = (
        doc_tri.join(F.broadcast(model), "tri", "left")
        .join(F.broadcast(unseen))
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("tri").isNotNull(), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_tri"),
            F.sum(
                F.when(
                    F.col("tri").isNotNull(),
                    F.col("n") * F.coalesce(F.col("logp_q"), F.col("unseen_q")),
                )
            )
            .cast("long")
            .alias("sum_logp_q"),
        )
    )
    # hand back a bounded result: scores are one row per doc —
    # materialize them and release the explode-sized per-(doc, trigram)
    # cache instead of pinning it for the application lifetime
    scored = scored.localCheckpoint(eager=True)
    doc_tri.unpersist()
    return scored.select(
        id_col,
        "n_tri",
        "sum_logp_q",
        F.when(
            F.col("n_tri") > 0,
            (F.col("sum_logp_q").cast("double") / quantize)
            / F.col("n_tri").cast("double"),
        ).alias("avg_logp"),
    )


def blocklist_matches(text: Column, blocklist: Sequence[str]) -> Column:
    """Sorted distinct blocklist terms present in the document's
    lowered whitespace-token set — the C4/RefinedWeb "bad words" stage
    as a pure per-row expression.

    Token-set matching (not substring) keeps the classic blocklist
    false-positive family out by construction (the "Scunthorpe
    problem": an innocent word containing a blocked string never
    matches a token equality).  Case-insensitive via lowering; the
    blocklist itself must arrive lowercase (raises otherwise, rather
    than silently never matching).

    Scale shape: ``array_intersect`` against a literal array — map-only
    JVM codegen, zero shuffle, zero UDF, no broadcast needed below a
    few thousand terms (a literal in the plan); past that, switch to a
    broadcast join on exploded tokens.  Mirrors to DuckDB as
    ``list_sort(list_intersect(list_distinct(tokens), [...]))``.
    """
    terms = list(blocklist)
    if not terms:
        raise ValueError("blocklist must be non-empty")
    bad = [
        t for t in terms
        if t != t.lower() or not t or t.strip() != t
        # a term with internal whitespace can never equal a single
        # whitespace token — it would silently never match (the same
        # failure mode this validation exists to catch)
        or len(t.split()) != 1
    ]
    if bad:
        raise ValueError(
            f"blocklist terms must be single lowercase trimmed tokens: "
            f"{bad!r}"
        )
    toks = F.array_distinct(ws_tokens(F.lower(text)))
    return F.array_sort(
        F.array_intersect(toks, F.array(*[F.lit(t) for t in terms]))
    )


def blocklist_flag(
    df: DataFrame,
    text_col: str,
    blocklist: Sequence[str],
    max_matches: int = 0,
) -> DataFrame:
    """Flag (not drop) documents whose token set hits the blocklist:
    appends ``matched_terms`` (sorted CSV — canonical, hashable),
    ``n_matched`` and ``flagged`` (over ``max_matches`` distinct
    terms).  Pipelines keep the evidence columns so the drop decision
    is auditable and re-tunable without re-scanning the corpus.

    Map-only — see :func:`blocklist_matches` for the scale story.
    """
    m = blocklist_matches(F.col(text_col), blocklist)
    return (
        df.withColumn("__m", m)
        .withColumn("matched_terms", F.concat_ws(",", F.col("__m")))
        .withColumn("n_matched", F.size("__m").cast("int"))
        .withColumn("flagged", F.col("n_matched") > F.lit(max_matches))
        .drop("__m")
    )


#: latin-1 accent fold table for dedup normalization (lowercase side
#: only — normalization lowers first).
_ACCENT_FROM = "áàâäãåéèêëíìîïóòôöõúùûüçñýÿ"
_ACCENT_TO = "aaaaaaeeeeiiiiooooouuuucnyy"


def normalize_for_dedup(text: Column) -> Column:
    """The CCNet-style hash normalization (Wenzek et al. 2019 §4.1
    applies it before paragraph hashing): lowercase, fold latin-1
    accents, map every digit run's characters to ``0``, strip all other
    punctuation/symbols, collapse whitespace.  Dedup keyed on this
    catches re-encodes, case variants, counter-stamped mirrors
    ("page 17 of 348") and punctuation-style edits that exact hashing
    misses, while staying far cheaper and more predictable than
    MinHash (it is still EXACT grouping, just on a canonical form).

    Map-only expression chain (lower → translate → two regexp_replace →
    trim); mirrors to DuckDB operator-for-operator (RE2 and Java regex
    agree on ``\\p{L}/\\p{N}/\\s`` for this subset).
    """
    t = F.lower(F.coalesce(text, F.lit("")))
    t = F.translate(t, _ACCENT_FROM, _ACCENT_TO)
    t = F.regexp_replace(t, "[0-9]", "0")
    t = F.regexp_replace(t, "[^\\p{L}\\p{N}\\s]", "")
    t = F.regexp_replace(t, "\\s+", " ")
    return F.trim(t)


#: query parameters that identify a CLICK, not a RESOURCE — the
#: standard tracking families CommonCrawl-style canonicalizers strip
#: (utm_* campaign tags, Google/Facebook click ids, Mailchimp ids).
#: Anchored; a param matches with or without a value.  Bare ``ref`` /
#: ``ref_src`` are deliberately NOT in the list: on major hosts the
#: ``ref`` param is resource-identifying (a GitHub ``?ref=<branch>``
#: names a different tree), and a canonicalizer that over-merges
#: causes the DEDUP STAGE TO DELETE a distinct resource — the
#: unrecoverable direction.  Under-merging only costs a missed dedup.
_TRACKING_PARAM_RE = (
    "^(utm_[A-Za-z_]*|gclid|fbclid|msclkid|mc_cid|mc_eid)"
    "(=.*)?$"
)


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL for deduplication — the CommonCrawl-pipeline
    normalization run BEFORE text dedup so trivially-different links to
    the same resource collapse:

    * scheme and host lowercase; ``www.`` prefix dropped; an explicit
      default port dropped only when it IS the scheme's default
      (``:80`` for http, ``:443`` for https — ``http://host:443/x``
      is a genuinely non-default port and must stay distinct);
    * fragment (``#...``) dropped — never sent to the server;
    * tracking query params removed (``utm_*``, ``gclid``, ``fbclid``,
      ``msclkid``, ``mc_cid``/``mc_eid`` — NOT bare ``ref``, which is
      resource-identifying on e.g. GitHub), remaining params SORTED
      (param order is not resource identity); an emptied query drops
      its ``?``;
    * trailing slashes collapsed off the path; an empty path becomes
      ``/``.

    Values without a ``scheme://`` prefix pass through trimmed and
    unchanged (not a URL — don't guess).  Pure expression chain
    (regexp extract/replace + array filter/sort over the split query):
    map-only, whole-stage-codegen, zero shuffle, and every step is
    replayable in ANSI SQL for the oracle.
    """
    u = F.trim(url)
    has_scheme = u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    nofrag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)
    )
    host = F.regexp_replace(host, "^www\\.", "")
    # strip the port only when it is the SCHEME'S default — :443 on
    # plain http (or :80 on https) is a real, distinct endpoint
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    rest = F.regexp_extract(
        nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$", 1
    )
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, "\\?(.*)$", 1)
    kept_params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    query_c = F.array_join(kept_params, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query_c == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query_c)
        ),
    )
    return F.when(has_scheme, rebuilt).otherwise(u)


def lm_perplexity_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
    vocab: int = 4096,
) -> "DataFrame":
    """CCNet's signature head/middle/tail split: per-LANGUAGE equal-size
    perplexity buckets over the corpus-LM score
    (:func:`trigram_lm_scores`), so each language's own distribution
    defines "good" — a global perplexity cut would label every
    low-resource language "tail" wholesale, which is exactly the bias
    the per-language split exists to avoid.

    Bucket 1 is the head (best mean trigram log-prob); ties break on
    ascending ``id_col`` so buckets are deterministic.  ``ntile``'s
    even-split definition (earlier buckets take the remainder) is
    shared by every SQL engine, so the result is oracle-replayable —
    unlike interpolated quantile thresholds at non-integer positions.
    Documents the model cannot score (< 3 chars, NULL text) get bucket
    NULL / label ``'unscored'`` instead of polluting the tail.

    Returns ``(id_col, lang_col, avg_logp, bucket,
    bucket_label)`` — labels head/middle/tail when ``n_buckets=3``,
    else ``'b<k>'``.

    Scale shape: the LM fit is the vocabulary-bounded aggregation of
    :func:`trigram_lm_scores` (measured flat at 10×, SCALE.md); the
    split uses :func:`~gdp_etl_spark.operators.ids.grouped_ntile` —
    the distributed prefix-sum rank over range partitions — NOT an
    ``ntile`` window partitioned by language: a language-keyed window
    pins a dominant language (~half a web corpus) on one unsplittable
    task, while range partitions stay ~equal-size regardless of
    language skew.  The bucket rule is bit-identical to ``ntile``, so
    the result (and the oracle) is unchanged.
    """
    from ..operators.ids import grouped_ntile

    scores = trigram_lm_scores(docs, text_col, id_col, vocab=vocab)
    joined = docs.select(id_col, lang_col).join(scores, id_col)
    scored = joined.filter(F.col("avg_logp").isNotNull())
    if n_buckets == 3:
        label = (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        )
    else:
        label = F.concat(F.lit("b"), F.col("bucket").cast("string"))
    bucketed = grouped_ntile(
        scored,
        [lang_col],
        [F.col("avg_logp").desc(), F.col(id_col).asc()],
        n_buckets,
    ).withColumn("bucket_label", label)
    unscored = joined.filter(F.col("avg_logp").isNull()).select(
        id_col,
        lang_col,
        "avg_logp",
        F.lit(None).cast("int").alias("bucket"),
        F.lit("unscored").alias("bucket_label"),
    )
    return bucketed.select(
        id_col, lang_col, "avg_logp", "bucket", "bucket_label"
    ).unionByName(unscored)


def strip_markup(text: Column) -> Column:
    """HTML/XML → plain text, the WET-style extraction step run before
    every text-quality/dedup stage when the corpus arrives as crawled
    markup: script/style blocks drop WITH their content (code is not
    prose), comments drop, remaining tags become spaces (so
    ``a<br>b`` keeps its word boundary), and the five core character
    entities plus ``&nbsp;`` decode — ``&amp;`` LAST, the standard
    order that keeps ``&amp;lt;`` from double-decoding into ``<``.
    Whitespace then squeezes to single spaces and trims; NULL text
    yields ``''`` (the extraction contract downstream operators
    expect).

    Deliberately regex-light: every pattern is RE2-compatible (no
    backreferences — script and style close independently), so the
    DuckDB oracle replays the chain operator-for-operator.  Map-only
    expression, whole-stage codegen, zero shuffle; a real pipeline
    swaps in an Arrow-batched parser (trafilatura-class) behind the
    same column contract when fidelity beats throughput.
    """
    t = F.coalesce(text, F.lit(""))
    t = F.regexp_replace(t, "(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, "(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, "(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, "<[^>]+>", " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last: &amp;lt; must yield &lt;, not <
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, "\\s+", " "))


def dedup_lines_in_doc(
    text: Column, sep: str = "\n", min_chars: int = 2
) -> Column:
    """WITHIN-document repeated-line removal (the RefinedWeb per-doc
    rule, complementing the cross-document
    :func:`~gdp_etl_spark.operators.dedup.boilerplate_line_filter`):
    each line survives iff it is the FIRST occurrence of its exact
    text inside the document; lines shorter than ``min_chars`` after
    trimming (blank separators, lone punctuation) always survive —
    they are formatting, not content.  Lines rejoin in original order
    with ``sep``; NULL text yields ``''``.

    Pure expression (split → indexed ``filter`` with an
    ``array_position`` prefix test → ``array_join``): map-only, zero
    shuffle, engine-replayable.  The prefix test is O(lines²) PER
    DOCUMENT — bounded by document size, which is exactly the budget a
    map-side rule may spend at 100 TB; documents are never compared to
    each other here.

    ``sep`` is a LITERAL separator on both sides: ``F.split`` takes a
    regex, so the pattern is escaped — an unescaped ``|`` or ``.``
    would split between every character while the rejoin stayed
    literal, silently corrupting the document.
    """
    import re as _re

    def _dedup(ls: Column) -> Column:
        kept = F.filter(
            ls,
            lambda x, i: (F.length(F.trim(x)) < min_chars)
            | (F.array_position(F.slice(ls, F.lit(1), i), x) == 0),
        )
        return F.array_join(kept, sep)

    # split ONCE per row (bind_once; the captured form re-split per
    # LINE inside the prefix test, stacking an extra O(len) on the
    # documented O(lines²) scan)
    return bind_once(
        F.split(F.coalesce(text, F.lit("")), _re.escape(sep)), _dedup
    )


def extract_links(html: Column) -> Column:
    """Anchor ``href`` targets in document order — the WAT-side
    complement of :func:`strip_markup`'s WET extraction: a crawl
    pipeline keeps the link graph (PageRank-style quality priors,
    anchor-text mining, frontier discovery) from the same markup whose
    prose goes to text dedup.

    One RE2-compatible pattern (no backreferences, engine-replayable):
    ``<a`` + whitespace, any attributes, ``href=`` with either quote
    style.  Two documented trades for single-pass, backreference-free
    extraction: the capture stops at EITHER quote char (a quote of the
    opposite style inside an href truncates the value), and the
    ``[^>]*`` attribute skip cannot cross a ``>`` inside an EARLIER
    quoted attribute (``<a title="a>b" href=...`` silently drops that
    link — the same first-``>``-wins convention :func:`strip_markup`
    pins for tag removal; a crawl pipeline needing that fidelity swaps
    in a real parser behind this column contract).  NULL/blank markup
    yields an empty array.  Map-only expression, zero shuffle; feed
    the result through ``explode`` + :func:`url_host` for the
    host-level graph.
    """
    t = F.coalesce(html, F.lit(""))
    return F.regexp_extract_all(
        t, F.lit("(?is)<a\\s[^>]*href\\s*=\\s*[\"']([^\"']*)[\"']"), F.lit(1)
    )


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute URL — userinfo (``user@``),
    ``www.`` prefix, and port dropped (host identity, unlike
    :func:`canonical_url`'s resource identity, ignores the port: the
    graph node is the site).  Bracketed IPv6 hosts keep their brackets
    and lose only a real ``]:port`` suffix — a bare ``:[0-9]+$`` strip
    would eat the last hextet of ``[::8080]``-shaped addresses.
    Scheme-relative ``//host/...`` links resolve like absolute ones
    (the crawl convention); anything else (relative paths, fragments,
    ``mailto:`` without ``//``) yields NULL — callers decide whether
    intra-site edges matter.  Pure expression, map-only."""
    u = F.trim(F.coalesce(url, F.lit("")))
    host = F.lower(
        F.regexp_extract(
            u, "^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//([^/?#]+)", 1
        )
    )
    host = F.regexp_replace(host, "^[^@]*@", "")
    # port: after ']' (IPv6) or on a bracketless host only — never
    # inside the brackets
    host = F.regexp_replace(
        host, "^(\\[[^\\]]*\\]|[^:\\[]*)(:[0-9]+)$", "$1"
    )
    host = F.regexp_replace(host, "^www\\.", "")
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def extract_links_parsed(df, html_col: str, out_col: str = "links"):
    """Parser-fidelity variant of :func:`extract_links`: appends
    ``out_col array<string>`` of anchor hrefs in document order, via
    an Arrow-batched ``mapInPandas`` over the stdlib
    ``html.parser.HTMLParser`` — the swap-in for crawl pipelines that
    need the cases the single-pass expression documents away:

    * an opposite-style quote INSIDE an href no longer truncates the
      value (``href="it's"`` extracts fully);
    * a ``>`` inside an earlier quoted attribute no longer hides the
      link (``<a title="a>b" href=...`` extracts);
    * character/entity references in attribute values are DECODED
      (``&amp;`` → ``&``), per the HTML spec — the expression form
      keeps them raw, so on entity-bearing hrefs the two variants
      legitimately differ; on plain markup they agree (parity-tested).

    Same column contract as the expression form (NULL/blank markup →
    empty array; first href attribute of each ``<a>`` wins), so the
    two are drop-in swappable.  The expression form stays the
    default/oracle path: it is whole-stage-codegen JVM work and
    engine-replayable, while this variant pays one Arrow round-trip —
    still map-only, zero shuffle, batch-vectorized (never per-row
    Python UDF), so the 100-TB shape is preserved; choose by fidelity
    need.  A malformed document that throws inside the parser keeps
    the hrefs seen up to that point rather than failing the task —
    crawl data is hostile by definition.
    """
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    # a FRESH StructType: StructType.add mutates in place, and df.schema
    # is the DataFrame's CACHED schema object — appending to it makes
    # df.columns disagree with the JVM plan and every later reference
    # fails resolution
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StringType()))]
    )
    names = df.columns

    def _extract(pdfs):
        from html.parser import HTMLParser

        class _Anchors(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.hrefs = []

            def handle_starttag(self, tag, attrs):
                if tag == "a":
                    for k, v in attrs:
                        if k == "href" and v is not None:
                            self.hrefs.append(v)
                            break  # first href attribute wins

            # <a/> parses as startendtag, not starttag
            handle_startendtag = handle_starttag

        for pdf in pdfs:
            links = []
            for t in pdf[html_col]:
                if t is None:
                    links.append([])
                    continue
                p = _Anchors()
                try:
                    p.feed(t)
                    p.close()
                except Exception:
                    pass  # keep hrefs collected before the breakage
                links.append(p.hrefs)
            pdf = pdf[names].copy()
            pdf[out_col] = links
            yield pdf

    return df.mapInPandas(_extract, out_schema)


#: the whitespace characters shared by c4_rules and its oracle mirror —
#: Java's \s ([ \t\n\x0B\f\r]) spelled explicitly in brace-form hex so
#: Spark (Java regex) and DuckDB (RE2, whose \s EXCLUDES \x0B) judge
#: lines identically; also the CRLF fix: trimming \r explicitly keeps
#: Java's "$ matches before a final \r? no — before a final \n only"
#: subtlety out of the terminal-punctuation rule entirely.  The class
#: ALSO trims Java's remaining line terminators (NEL U+0085, LS U+2028,
#: PS U+2029): Java's default-mode $ matches before a FINAL one of
#: these, RE2's $ does not, so a line ending '...done. ' would
#: pass the punctuation rule in Spark and fail it in DuckDB unless the
#: terminator is trimmed first (review finding, round 13).
_C4_WS_CHARS = " \\t\\r\\n\\f\\x{0B}\\x{85}\\x{2028}\\x{2029}"
C4_WS_CLASS = f"[{_C4_WS_CHARS}]"
#: the exact complement — use instead of \S wherever a pattern is
#: shared with the RE2 oracle (\S drifts on \x0B between the engines,
#: and on Unicode whitespace between Java and Python re).
C4_NWS_CLASS = f"[^{_C4_WS_CHARS}]"


def c4_rules(
    text: Column,
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> Column:
    """The C4 heuristic cleaning rules (Raffel et al. 2020, §2.2 —
    the filter set behind the T5 training corpus), as ONE per-row
    struct expression:

    * line level (lines split on ``\\n``, judged after trim): keep a
      line only if it ends in terminal punctuation (``. ! ? "``), has
      at least ``min_words_per_line`` whitespace words, and does not
      contain the word "javascript" (case-insensitive);
    * doc level: ``keep`` is false when the retained text has fewer
      than ``min_sentences`` sentence enders (``[.!?]``), or the
      ORIGINAL text contains "lorem ipsum" (case-insensitive) or a
      curly brace ``{`` (code).

    Returns ``struct(text_c4, n_lines int, n_kept int,
    n_sentences int, keep boolean)`` — callers filter on ``keep`` and
    project ``text_c4``.  Pure higher-order array expressions: per-row
    map work, zero shuffle at any corpus size, and every rule has an
    exact DuckDB mirror (list_filter + regexp), so the cleaned corpus
    is hash-checkable.  The remaining C4 stages are separate
    operators by design: blocklist (``blocklist_flag``), three-
    sentence-span dedup (``dedup.token_window_dedup``), language ID
    (``lang_id``).
    """
    lines = F.split(F.coalesce(text, F.lit("")), "\n")

    def line_ok(line: Column) -> Column:
        # explicit-class trim, NOT F.trim: CRLF text leaves \r at line
        # ends after the \n split, F.trim strips spaces only, and
        # Java's $ matches BEFORE a final line terminator — so
        # 'ends well.\r' would pass the punctuation rule in Spark and
        # fail it in the RE2 oracle (review finding).  The class also
        # spells out Java's \s so \x0B behaves identically in RE2.
        t = F.regexp_replace(
            line, f"^{C4_WS_CLASS}+|{C4_WS_CLASS}+$", ""
        )
        words = F.size(
            F.filter(
                F.split(t, f"{C4_WS_CLASS}+"), lambda w: w != F.lit("")
            )
        )
        return (
            t.rlike('[.!?"]$')
            & (words >= F.lit(int(min_words_per_line)))
            & ~F.lower(t).rlike("javascript")
        )

    kept = F.filter(lines, line_ok)
    text_c4 = F.array_join(kept, "\n")
    n_sentences = F.size(
        F.regexp_extract_all(text_c4, F.lit("[.!?]"), F.lit(0))
    )
    low = F.lower(F.coalesce(text, F.lit("")))
    keep = (
        (n_sentences >= F.lit(int(min_sentences)))
        & ~low.contains("lorem ipsum")
        & ~low.contains("{")
    )
    return F.struct(
        text_c4.alias("text_c4"),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        n_sentences.cast("int").alias("n_sentences"),
        keep.alias("keep"),
    )


#: binary/media extensions a TEXT crawl never fetches (Heritrix/Nutch
#: default-reject class) — shared with the oracle generator.
FRONTIER_BLOCKED_EXT: tuple[str, ...] = (
    "jpg", "jpeg", "png", "gif", "webp", "ico", "svg", "bmp",
    "mp3", "mp4", "avi", "mov", "mkv", "wav", "flac",
    "zip", "gz", "tgz", "bz2", "xz", "rar", "7z",
    "exe", "dmg", "iso", "bin", "apk", "msi",
    "pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx",
    "woff", "woff2", "ttf", "eot", "css", "js",
)


def url_frontier_flags(
    url: Column,
    allowed_schemes: Sequence[str] = ("http", "https"),
    max_url_len: int = 2048,
    max_path_depth: int = 8,
    max_segment_repeats: int = 2,
    blocked_ext: Sequence[str] = FRONTIER_BLOCKED_EXT,
) -> Column:
    """Crawl-frontier admission rules (the Heritrix/Nutch scope-filter
    class) as ONE per-row struct expression — the decision a crawler
    makes per discovered link, at link-stream scale, so it must be
    pure map work:

    * ``scheme_ok`` — scheme in ``allowed_schemes`` (no mailto/ftp/
      javascript/data);
    * ``len_ok`` — total length ≤ ``max_url_len`` (session-id bloat);
    * ``depth_ok`` — path depth ≤ ``max_path_depth`` (deep-tree
      traps);
    * ``trap_ok`` — no single path segment occurs more than
      ``max_segment_repeats`` times (the ``/a/b/a/b/a/b`` calendar/
      mirror-loop trap): the exact per-segment count via
      ``array_max(transform(array_distinct(segs), d -> size(filter(
      segs, s -> s = d))))`` — still pure per-row array work, no
      groupBy (``/x/a/b/a/b`` with two distinct doubled segments is
      ADMITTED at the default cap of 2; round-12 shipped an
      aggregate-duplicate-mass approximation that rejected it);
    * ``ext_ok`` — path extension not in the binary/media blocklist
      (text-crawl scope).

    Returns ``struct(host, ext, depth int, scheme_ok, len_ok,
    depth_ok, trap_ok, ext_ok, admit boolean)``; ``admit`` is the
    conjunction.  NULL url ⇒ ``admit`` false with NULL host.  Compose
    with :func:`canonical_url` (normalize first, then scope) and
    ``url_host`` for per-host politeness budgets.  Every rule has an
    exact ANSI-SQL mirror; zero shuffle at any scale.
    """
    u = F.trim(F.coalesce(url, F.lit("")))
    scheme = F.lower(
        F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host = F.lower(
        F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    path = F.regexp_extract(
        u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    depth = F.size(segs)
    # exact max occurrence count of any one segment — O(distinct ×
    # depth) per row, depth already capped by depth_ok; array_max of
    # the empty path is NULL, coalesced to an admit
    max_rep = F.array_max(
        F.transform(
            F.array_distinct(segs),
            lambda d: F.size(F.filter(segs, lambda s: s == d)),
        )
    )
    ext = F.lower(
        F.regexp_extract(path, "\\.([A-Za-z0-9]{1,5})$", 1)
    )
    scheme_ok = scheme.isin(*[s.lower() for s in allowed_schemes])
    len_ok = F.length(u) <= F.lit(int(max_url_len))
    depth_ok = depth <= F.lit(int(max_path_depth))
    trap_ok = F.coalesce(
        max_rep <= F.lit(int(max_segment_repeats)), F.lit(True)
    )
    ext_ok = ~ext.isin(*[e.lower() for e in blocked_ext])
    admit = (
        scheme_ok & len_ok & depth_ok & trap_ok & ext_ok
        & (host != F.lit(""))
    )
    return F.struct(
        F.when(host == "", F.lit(None)).otherwise(host).alias("host"),
        ext.alias("ext"),
        depth.cast("int").alias("depth"),
        scheme_ok.alias("scheme_ok"),
        len_ok.alias("len_ok"),
        depth_ok.alias("depth_ok"),
        trap_ok.alias("trap_ok"),
        ext_ok.alias("ext_ok"),
        admit.alias("admit"),
    )
