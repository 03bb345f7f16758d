"""Unicode cleaning chain (functions/unicode.py): Spark vs the pure
Python reference, plus hypothesis property parity."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gdp_etl_spark.functions.unicode import (
    _py_clean,
    clean_unicode,
    clean_unicode_sql,
)

CASES = [
    "Café  du   Monde",        # decomposed acute + space runs
    "Å ngström",          # ANGSTROM SIGN + combining diaeresis
    "각 han",        # Hangul jamo -> syllable
    "a\x00b\x01c\x9fd",              # C0 + C1 controls
    "tab\t\ttab",
    "crlf\r\nline\rcr",
    "  padded  ",
    "",
    None,
    "plain ascii stays",
    "\xa0nbsp kept\xa0",   # engines must NOT trim Unicode spaces
]


def test_clean_unicode_matches_reference(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "text string")
    got = [r.v for r in
           df.select(clean_unicode(F.col("text")).alias("v")).collect()]
    assert got == [_py_clean(c) for c in CASES]
    # NFC actually composed: the decomposed acute became one codepoint
    assert got[0].startswith("Café")
    assert got[1].startswith("Å")
    assert got[2].startswith("각")
    assert got[3] == "abcd"


def test_clean_unicode_sql_mirror_matches(spark):
    import duckdb

    con = duckdb.connect()
    for c in CASES:
        d = con.execute(
            f"SELECT {clean_unicode_sql('?')}", [c]
        ).fetchone()[0]
        assert d == _py_clean(c), repr(c)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_py_reference_engine_parity_duckdb(s):
    """Property: the generated DuckDB mirror equals the Python
    reference on arbitrary text (cheap engine — the Spark side is
    pinned to the same reference above)."""
    import duckdb

    con = duckdb.connect()
    d = con.execute(f"SELECT {clean_unicode_sql('?')}", [s]).fetchone()[0]
    assert d == _py_clean(s)
