"""Python UDTFs (Spark 4 user-defined TABLE functions): the lateral
row-expanding surface — one input row in, many typed rows out, usable
from SQL as ``FROM t, LATERAL fn(t.col)``. Kept to genuinely
row-expanding logic a builtin explode can't express; anything a
sequence/posexplode/split can do stays codegen (see operators.text).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="idx int, start int, sentence string", useArrow=True)
class SentenceSplit:
    """Sentence segmentation with source offsets: splits on
    [.!?]+-plus-whitespace boundaries, emitting (ordinal, 0-based char
    offset, sentence) per row — offsets make every sentence traceable
    back to its document span (the chunk_text contract, at sentence
    granularity). Deterministic, stateless per row; Arrow-batched
    explicitly (useArrow=True — Spark 4 defaults Python UDTFs to pickle
    rows unless asked); NULL/empty text emits no rows (lateral join
    semantics drop the parent row, matching posexplode)."""

    # boundary = whitespace PRECEDED by terminal punctuation; the full
    # punctuation run ("?!", "...") stays inside its sentence so spans
    # losslessly cover the non-whitespace content
    _BOUNDARY = re.compile(r"(?<=[.!?])\s+")

    def eval(self, text: str | None):  # noqa: D102 — UDTF contract
        if not text:
            return
        pos = 0
        idx = 0
        for m in self._BOUNDARY.finditer(text):
            seg = text[pos : m.start()]
            if seg.strip():
                yield idx, pos, seg
                idx += 1
            pos = m.end()
        tail = text[pos:]
        if tail.strip():
            yield idx, pos, tail


def register_table_functions(spark) -> None:
    """Expose the UDTFs on the SQL surface (idempotent)."""
    spark.udtf.register("sentence_split", SentenceSplit)
