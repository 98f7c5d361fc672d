"""JSONL document ingestion (S-family EXT): the interchange format LLM
data pipelines actually exchange — one JSON object per line, usually
gzipped in a landing zone.

Mirrors the engine's reference-derived error-routing contract
(cli.py P8 / reference main.rs:107 semantics) on the document side:

- ``PERMISSIVE`` (default): malformed lines land in ``_corrupt`` with
  every data column null — the caller routes them to a quarantine sink
  and keeps the pipeline moving;
- ``DROPMALFORMED``: malformed lines vanish (counted by Spark metrics);
- ``FAILFAST``: the first malformed line fails the job — strict mode.

Scale notes: the explicit schema means NO inference pass over the
corpus (inference reads everything once before the real job); Spark
splits uncompressed JSONL by byte range, while ``.gz`` files are
one-split-per-file — a landing zone of many medium .gz files
parallelizes, one mega-file does not (document the producer contract
accordingly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import TESTDATA_SCHEMAS

#: documents schema + the corrupt-record routing column.
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [*TESTDATA_SCHEMAS["documents"].fields,
     T.StructField("_corrupt", T.StringType(), True)]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> DataFrame:
    """Read a JSONL documents corpus with explicit schema and
    ``mode``-controlled malformed-line routing."""
    if mode not in ("PERMISSIVE", "DROPMALFORMED", "FAILFAST"):
        raise ValueError(f"unknown JSON parse mode {mode!r}")
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def read_documents_csv(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> DataFrame:
    """Read a CSV documents corpus with the SAME explicit schema and
    malformed-line routing contract as the JSONL source (`_corrupt`
    carries the raw offending line under PERMISSIVE).

    CSV-specific hardening: header expected and verified by position
    (enforceSchema=false makes a header/schema mismatch fail loudly
    instead of silently mis-mapping columns), quoted multiline text
    fields are enabled (documents contain newlines), and quotes escape
    by doubling (the RFC-4180 producer contract). Scale notes match
    JSONL: explicit schema ⇒ no inference pass; multiLine=true forces
    one-split-per-file, so the landing-zone contract is many
    medium-sized files, never one mega-file.
    """
    if mode not in ("PERMISSIVE", "DROPMALFORMED", "FAILFAST"):
        raise ValueError(f"unknown CSV parse mode {mode!r}")
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("header", "true")
        .option("enforceSchema", "false")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
