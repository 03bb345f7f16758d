"""Driver-contract structure: the correctness gate verifies the FIRST
50 registered queries, so EXACTLY 50 keys must precede the
end-of-window marker — the r6/r7 windows mis-registered 54 and the
last four entries silently missed their re-check two rounds running.
No Spark session needed: this parses the registration source."""

import re
from pathlib import Path

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
MARKER = "-- end of driver window (50) --"


def _registration_body() -> str:
    s = ENTRY.read_text()
    i = s.index("    return {", s.index("def queries()"))
    return s[i:s.index("\n    }", i)]


def test_exactly_50_keys_precede_the_marker():
    body = _registration_body()
    assert MARKER in body, "window marker comment missing"
    before = body.split(MARKER)[0]
    keys = re.findall(r'^\s+"([a-z0-9_]+)":', before, re.M)
    assert len(keys) == 50, (
        f"driver window is the FIRST 50 keys; {len(keys)} precede the "
        f"marker — the driver would check {'only ' if len(keys) > 50 else ''}"
        f"a different set than the marker claims"
    )


def test_marker_window_matches_runtime_order():
    import __spark_entry__ as e

    body = _registration_body()
    before = body.split(MARKER)[0]
    marked = re.findall(r'^\s+"([a-z0-9_]+)":', before, re.M)
    assert list(e.queries())[:50] == marked


def test_every_window_query_has_an_oracle_or_is_rows_only_by_design():
    import __spark_entry__ as e

    #: rows-only by design (non-SQL-expressible), each with an
    #: oracle-checked companion — keep this list deliberate and short
    rows_only_ok = {"sketch_stats"}
    oracles = e.oracle_sql()
    missing = [
        n for n in list(e.queries())[:50]
        if n not in oracles and n not in rows_only_ok
    ]
    assert not missing, f"window entries without an oracle: {missing}"


def test_window_staleness_compose_ranking():
    """The rotation tool's ranking contract: changed first (in given
    order), then never-checked (alphabetical), then stalest-first by
    last-green round with name tie-break; rows-only queries rotate on
    their last-any round; slots cap respected."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "window_staleness",
        Path(__file__).resolve().parent.parent / "tools" / "window_staleness.py",
    )
    ws = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ws)

    queries = ["a", "b", "c", "d", "e", "f", "g", "r"]
    last_green = {"a": 3, "b": 8, "c": 4, "d": 0, "e": 3, "f": 0, "g": 5,
                  "r": 4}
    last_any = {"a": 3, "b": 8, "c": 4, "d": 0, "e": 3, "f": 7, "g": 5,
                "r": 9}
    # f is rows-only (any=7, green=0); d is never-checked; r REGRESSED
    # (green r4, then a non-green row in r9 — must jump the queue, not
    # sort as r9-fresh)
    window, never = ws.compose(
        queries, last_green, last_any, changed=["g", "zz"], slots=6
    )
    assert never == ["d"]
    # g changed (zz ignored: not registered), r regressed, d never,
    # then a/e (r3, name tie-break), then c (r4)
    assert window == ["g", "r", "d", "a", "e", "c"]
    # full ordering without the cap: rows-only f sorts at its last_any
    window_all, _ = ws.compose(
        queries, last_green, last_any, changed=[], slots=99
    )
    assert window_all == ["r", "d", "a", "e", "c", "g", "f", "b"]
