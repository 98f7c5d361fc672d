"""Winnow kernel equivalence: the Arrow-batched numpy kernel (the
registered scale path) must agree value-for-value with the expression
form (the oracle twin the DuckDB SQL mirrors) — corpus-wide and on the
edge cases that distinguish the two implementations (multibyte
codepoints, short texts, empty strings).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_contract_database_builder_spark.plans.reference_ext import (
    winnow_fp_expr,
    winnow_fp_pandas,
)
from smart_contract_database_builder_spark.sources.tables import load_table

from conftest import SF_SMOKE


def _both(df):
    base = df.select(
        "doc_id",
        winnow_fp_pandas().alias("fast"),
        winnow_fp_expr(
            F.length("text"),
            F.transform(F.split("text", ""), lambda ch: F.ascii(ch).cast("long")),
        ).alias("ref"),
    )
    return base.filter(F.col("fast") != F.col("ref"))


def test_kernels_agree_on_the_corpus(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    assert docs.count() > 0
    assert _both(docs).count() == 0


def test_kernels_agree_on_edge_cases(spark):
    texts = [
        "",  # empty → 0
        "a",  # Horner fallback, single char
        "abcdefg",  # length 7: longest Horner case
        "abcdefgh",  # length 8: exactly one window
        "abcdefghi",  # two windows
        "日本語のテキストです",  # multibyte codepoints beyond BMP range
        "naïve café résumé —ïëü",  # latin-1 supplement
        "\U0001F600" * 10,  # astral plane (surrogate pairs in UTF-16)
        "x" * 500,  # uniform long text
        "ab" * 100 + "Z" + "ab" * 100,  # periodic with one break
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert _both(df).count() == 0
