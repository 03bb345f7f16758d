"""Unicode text normalization for corpus cleaning — the standard first
stage of every web-crawl text pipeline (NFC canonicalization so
visually-identical strings hash/dedup identically, control-character
stripping, whitespace collapsing).

Unlike the rest of ``functions/`` this module contains ONE Python
step: Spark SQL has no Unicode-normalization function (the NFC/NFD
tables are not exposed through ``pyspark.sql.functions``), so
:func:`nfc` is a vectorized Arrow-batched ``pandas_udf`` over
``Series.str.normalize`` — per-batch C-speed, never per-row Python.
Everything around it (control strip, whitespace collapse, trim) stays
JVM-side ``regexp_replace`` inside whole-stage codegen.

Oracle parity: DuckDB's ``nfc_normalize`` implements the same Unicode
canonical composition (verified on combining marks, Hangul jamo,
ligatures, and compatibility characters), so the full cleaning chain
is hash-exact across engines.

Scale shape: pure per-row map work — no shuffle at any corpus size;
the single Python boundary is Arrow-batched and column-pruned (only
the text column crosses).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["nfc", "strip_controls", "collapse_whitespace", "clean_unicode"]

#: C0 controls except \t \n \r, plus DEL and the C1 block — the
#: characters that are never legitimate in corpus text.  Kept as ONE
#: class string so the Spark and DuckDB patterns are literally shared.
#: Brace-form hex escapes: the bare ``\x0B`` form silently misparses
#: inside a multi-range class under RE2 (DuckDB), while ``\x{0B}`` is
#: valid in BOTH RE2 and Java regex.
CONTROL_CLASS = (
    "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}-\\x{9F}]"
)


def nfc(text: Column) -> Column:
    """Unicode NFC canonical composition; NULL stays NULL."""

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        # Series.str.normalize is vectorized and NULL-preserving; it
        # matches unicodedata.normalize("NFC", ...) by definition
        return s.str.normalize("NFC")

    return _nfc(text)


def strip_controls(text: Column) -> Column:
    """Remove C0 (except tab/newline/CR), DEL, and C1 controls."""
    return F.regexp_replace(text, CONTROL_CLASS, "")


def collapse_whitespace(text: Column) -> Column:
    """Collapse runs of horizontal whitespace (space/tab) to one
    space, normalize CRLF/CR to LF, and trim the ends."""
    t = F.regexp_replace(text, "\\r\\n?", "\n")
    t = F.regexp_replace(t, "[ \\t]+", " ")
    return F.trim(t)


def clean_unicode(text: Column) -> Column:
    """The full cleaning chain: control strip → NFC → whitespace
    collapse → trim.

    Controls strip FIRST, for two reasons: (a) a control byte between
    a base char and its combining mark would block composition, and
    post-NFC stripping would then leave a DENORMALIZED base+mark pair
    in the output; (b) DuckDB's ``nfc_normalize`` truncates at an
    embedded NUL (C-string semantics), so NUL must be gone before the
    oracle's normalization runs."""
    return collapse_whitespace(nfc(strip_controls(text)))


def clean_unicode_sql(col: str) -> str:
    """The DuckDB mirror of :func:`clean_unicode` — generated from the
    same ``CONTROL_CLASS`` so the patterns can never drift."""
    # trim(x, ' '): DuckDB's default trim strips Unicode spaces (NBSP
    # included) while Spark's trims ASCII space only — pin the charset
    return (
        "trim(regexp_replace(regexp_replace(nfc_normalize("
        f"regexp_replace({col}, '{CONTROL_CLASS}', '', 'g')), "
        "'\\r\\n?', e'\\n', 'g'), '[ \\t]+', ' ', 'g'), ' ')"
    )


def _py_clean(s: str | None) -> str | None:
    """Pure-Python reference of the chain, for property tests."""
    import re

    if s is None:
        return None
    t = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]", "", s)
    t = unicodedata.normalize("NFC", t)
    t = re.sub("\r\n?", "\n", t)
    t = re.sub("[ \t]+", " ", t)
    # engines' trim removes ASCII spaces only — match that, not
    # Python's all-whitespace strip()
    return t.strip(" ")
