"""Python UDTF surface: a table function exploding regex matches.

Completes the repo's UDF-surface coverage (scalar pandas UDFs →
simhash/multimodal; grouped map → packing fallback; grouped stateful →
streaming.running_user_stats; and here the table-function form).  A
UDTF returns ROWS per input row — the natural shape for span
extraction, tokenuation with positions, or record splitting — where a
scalar UDF would have to smuggle arrays out and explode after.

The concrete function extracts every non-overlapping match of a
pattern with its ordinal and character offset.  Match ordinals make
the output deterministic and oracle-mirrorable (DuckDB:
``regexp_extract_all`` + a ``range`` unnest).

UDTFs are row-at-a-time Python — the slow path (no Arrow batching in
the lateral-join form).  Production span extraction should prefer the
JVM route (``explode(regexp_extract_all(...))``, as ``pii_redact``
does); this module exists to cover the API surface with working,
tested plumbing, mirroring how multimodal decode covers its stubbed
codecs.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="match string, match_idx int, char_offset int")
class RegexMatches:
    """eval(text, pattern) → one row per non-overlapping match."""

    def eval(self, text: str, pattern: str):  # noqa: D102
        if text is None or pattern is None:
            return
        for i, m in enumerate(re.finditer(pattern, text)):
            yield m.group(0), i, m.start()
