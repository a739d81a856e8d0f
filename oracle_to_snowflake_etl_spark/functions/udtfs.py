"""Python UDTF surface (SURVEY.md §2.10).

The reference registers no UDFs of any kind; the engine's contract is
that the UDx surface EXISTS and composes, while every hot path stays on
built-in JVM expressions. This module holds the table-function corner of
that surface: a ``@udtf`` class usable from both the DataFrame lateral
API and ``spark.sql`` after registration.

UDTFs are the slow path twice over (Python + row materialization per
emitted row); the engine's production twin of this exact computation is
``explode(split(...))`` + groupBy, all JVM-side — see
queries/text_q.vocab_heavy_hitters. Keep UDTFs for logic that genuinely
needs per-row Python with a variable-arity output (custom parsers,
tokenizers with state machines), and enable Arrow
(``spark.sql.execution.pythonUDTF.arrow.enabled``) when batches are
large.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql.functions import udtf

#: lowercase word runs of >= 4 letters — identical semantics to the
#: DuckDB oracle's regexp_extract_all(lower(text), '[a-z]{4,}')
_WORD_RE = re.compile(r"[a-z]{4,}")


@udtf(returnType="tok: string, n: bigint")
class TokenCounts:
    """Emit (token, count) rows for one document's text — a
    variable-arity table function: 0..N output rows per input row.

    Deterministic output contract: tokens are emitted in
    lexicographic order so the row order is stable across runs
    (the differential harness sorts anyway; stability here keeps
    ``limit`` previews reproducible).
    """

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        counts = Counter(_WORD_RE.findall(text.lower()))
        for tok in sorted(counts):
            yield tok, counts[tok]


def register_udtfs(spark) -> None:
    """Make the UDTF callable from SQL (LATERAL token_counts(text))."""
    spark.udtf.register("token_counts", TokenCounts)
