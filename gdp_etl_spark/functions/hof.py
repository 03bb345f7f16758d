"""Single-evaluation binding for higher-order-function operands.

Spark's higher-order functions (``transform``/``filter``/``aggregate``/
``zip_with``) are CodegenFallback: the lambda body is INTERPRETED, and
any column subtree captured from the enclosing Python scope is
re-evaluated on every element — an O(elements × cost(subtree)) blowup
that is invisible in the physical plan (the plan prints one expression;
the interpreter walks the captured subtree per element).  The classic
victim is gram extraction::

    toks = F.split(text, ...)
    F.transform(idx, lambda i: F.slice(toks, i, k))   # re-splits per gram!

``bind_once`` evaluates the operand ONE time per row and hands it to
the body as a named lambda variable — a 1-element ``transform``, the
collapse-proof evaluation point this repo established for the
chunk-embedding digest (CollapseProject cannot re-inline through a
lambda variable, and interpreted evaluation materializes the variable
once).  Values are bit-identical: this is purely an
evaluation-strategy change.  Measured (r15, sf0.1 documents):
``char_trigrams`` 34.5 → 2.0 s, ``word_ngrams`` 5.3 → 0.5 s.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(operand: Column, body: Callable[[Column], Column]) -> Column:
    """``body(var)`` with ``var`` bound to ``operand`` evaluated once
    per row.  ``operand`` may be any expression (array or scalar);
    ``body`` receives the bound lambda variable and returns a Column.
    NULL operands flow through exactly as the inlined expression would
    (the variable is NULL wherever the subtree evaluated NULL)."""
    return F.transform(F.array(operand), body)[0]
