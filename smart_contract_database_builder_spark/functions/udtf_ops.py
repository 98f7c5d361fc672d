"""Python UDTF surface (U-family): table functions for 1-row→N-row
transforms whose logic genuinely needs imperative Python.

Spark 4 UDTFs (`@udtf`) are the third Python boundary after pandas UDFs
and mapInPandas: a class whose ``eval`` yields output rows per input
row, usable in SELECT and LATERAL JOIN. They run row-at-a-time through
Python — the documented SLOW PATH — so the engine only reaches for one
when per-row imperative logic can't be expressed as Catalyst
expressions. The chunker below intentionally CAN (it twins
``llm_chunk_documents``): it exists to pin the UDTF machinery against
the cross-engine oracle, proving the Python-table-function path meets
the same correctness gate as the expression path, and to measure its
cost honestly (see SCALE.md). Production chunking stays on the
expression form.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf


def make_chunk_udtf(chunk_tokens: int, stride: int):
    """Build a chunking UDTF matching ``llm_chunk_documents`` semantics
    bit-for-bit: whitespace tokens of the trimmed lowered text,
    overlapping ``chunk_tokens`` windows every ``stride``, md5 over the
    space-joined chunk."""

    @udtf(
        returnType=(
            "chunk_idx bigint, start_tok bigint, chunk_len bigint, "
            "chunk_hash string"
        )
    )
    class ChunkDocument:
        def eval(self, text: str):
            import re

            toks = re.split(r"\s+", text.strip().lower())
            n = len(toks)
            for idx, start in enumerate(range(0, n, stride)):
                chunk = toks[start : start + chunk_tokens]
                yield (
                    idx,
                    start,
                    min(chunk_tokens, n - start),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    return ChunkDocument
