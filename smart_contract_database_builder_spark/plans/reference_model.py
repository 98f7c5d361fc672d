"""Reference-model identity & ingestion queries (SURVEY.md §1.4, S3-S6,
F1-F4, F7-F13, A2).

The reference's core semantic is content-addressed contract identity:
``id = md5(whitespace-stripped source)`` (reference src/utils.rs:12-17),
multi-file contracts re-hash the sorted per-file digests
(src/plain_contract.rs:166-181), and dedup is conflict-ignore on that id
(src/db.rs:174, 208). These queries express exactly those semantics as
Catalyst expressions and prove them two ways:

- at corpus scale over the ``documents`` table (the hash/dedup/bundle
  queries — the shapes that must survive 100 TB), and
- over the in-repo contract fixture (``fixtures.py``), where the DuckDB
  oracle recomputes the identical result from an identical ``VALUES``
  relation — covering layout resolution (S3), Etherscan parse with
  double-brace unwrap + fallback (S4/F10), typed metadata decode
  (S6/F7/F11), the sources-map explode (F9), and CRLF normalization (F13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures
from ..compilestage import stage
from ..schemas import METADATA_SCHEMA
from ..sources import contracts as C
from ..sources.tables import load_table
from .registry import register

_FILES = fixtures.contract_files_values_sql()
_WS = C.SQL_WS_PATTERN  # Rust-\s-compatible class (see sources/contracts.py)
_ESCAN = fixtures.etherscan_values_sql()


# ---------------------------------------------------------------------------
# Corpus-scale identity & dedup (documents as the source corpus)
# ---------------------------------------------------------------------------


@register(
    "ref_content_id_documents",
    oracle=rf"""
    SELECT doc_id,
           md5(regexp_replace(text, '{_WS}', '', 'g')) AS content_id
    FROM documents
    """,
)
def ref_content_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2: content-addressed id per document (utils.rs:12-17 semantics).

    Pure per-row expressions — embarrassingly parallel, no shuffle; at
    100 TB this is a single map stage over the scan.
    """
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", C.contract_id("text").alias("content_id")
    )


@register(
    "ref_dedup_documents",
    oracle=rf"""
    SELECT content_id,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS canonical_doc_id
    FROM (
      SELECT doc_id, md5(regexp_replace(text, '{_WS}', '', 'g')) AS content_id
      FROM documents
    )
    GROUP BY content_id
    """,
)
def ref_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: content-hash dedup — the Spark form of the reference's
    conflict-ignore PK insert (db.rs:174): group by content id, keep a
    canonical representative.

    Scale shape: one shuffle on the 32-char hex id (uniformly
    distributed — no skew by construction); partial aggregation makes
    the map side emit one row per distinct id per partition.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", C.contract_id("text").alias("content_id"))
        .groupBy("content_id")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


@register(
    "ref_bundle_hash_by_source",
    oracle=rf"""
    SELECT source,
           md5(string_agg(h, '' ORDER BY h)) AS bundle_id,
           COUNT(*) AS n_files
    FROM (
      SELECT source, md5(regexp_replace(text, '{_WS}', '', 'g')) AS h
      FROM documents
    )
    GROUP BY source
    """,
)
def ref_bundle_hash_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 at corpus scale: treat each ``source`` bucket as one multi-file
    contract — md5 of the sorted, concatenated per-file digests
    (plain_contract.rs:166-181).

    ``collect_list`` order is nondeterministic across partitions;
    ``array_sort`` inside the id expression restores the reference's
    order-insensitivity, so the result is stable under any partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", C.contract_id("text").alias("h"))
        .groupBy("source")
        .agg(
            C.multifile_contract_id(F.collect_list("h")).alias("bundle_id"),
            F.count(F.lit(1)).alias("n_files"),
        )
    )


# ---------------------------------------------------------------------------
# Fixture-backed ingestion parity (oracle recomputes from identical VALUES)
# ---------------------------------------------------------------------------


@register(
    "ref_ingest_folder_contracts",
    oracle=rf"""
    WITH dirs AS (
      SELECT dir,
             MAX(CASE WHEN filename = 'metadata.json' THEN content END) AS meta,
             bool_or(filename = 'contract.json') AS has_cj,
             bool_or(filename = 'main.sol') AS has_ms,
             bool_or(filename = 'main.vy') AS has_mv
      FROM {_FILES}
      GROUP BY dir
    ),
    typed AS (
      SELECT dir, meta,
             CASE WHEN has_cj THEN 'json'
                  WHEN has_ms THEN 'single_sol'
                  WHEN has_mv THEN 'vyper'
                  ELSE 'multi_sol' END AS source_type
      FROM dirs
      WHERE meta IS NOT NULL
    ),
    sel AS (
      SELECT t.dir, t.source_type, t.meta,
             md5(regexp_replace(f.content, '{_WS}', '', 'g')) AS h
      FROM typed t
      JOIN {fixtures.contract_files_values_sql("f")}
        ON f.dir = t.dir
      WHERE (t.source_type = 'json' AND f.filename = 'contract.json')
         OR (t.source_type = 'single_sol' AND f.filename = 'main.sol')
         OR (t.source_type = 'vyper' AND f.filename = 'main.vy')
         OR (t.source_type = 'multi_sol' AND f.filename LIKE '%.sol')
    )
    SELECT dir, source_type,
           json_extract_string(meta, '$.ContractName') AS contract_name,
           CASE WHEN source_type = 'multi_sol'
                THEN md5(string_agg(h, '' ORDER BY h))
                ELSE MIN(h) END AS id,
           COUNT(*) AS n_files
    FROM sel
    GROUP BY dir, source_type, meta
    """,
)
def ref_ingest_folder_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: folder-layout resolution over the fixture corpus — the
    reference's 4-layout priority cascade (plain_contract.rs:284-320)
    with content-addressed ids; the orphan dir (no metadata.json) is
    dropped, the whitespace-variant duplicate resolves to the same id
    as its original.
    """
    parsed = C.parse_folder_contracts(fixtures.contract_files_df(spark))
    return parsed.select(
        "dir",
        "source_type",
        "contract_name",
        "id",
        F.col("n_files").cast("long").alias("n_files"),
    )


@register(
    "ref_etherscan_parse",
    oracle=rf"""
    WITH base AS (
      SELECT address,
             json_extract_string(content, '$.ContractName') AS contract_name,
             json_extract_string(content, '$.SourceCode') AS sc,
             COALESCE(TRY_CAST(json_extract_string(content, '$.Runs') AS INT), 0)
               AS runs,
             json_extract_string(content, '$.OptimizationUsed') = '1'
               AS optimization_used
      FROM {_ESCAN}
    ),
    unwrapped AS (
      SELECT address, contract_name, runs, optimization_used,
             CASE WHEN substr(sc, 1, 2) = '{{{{'
                  THEN substr(sc, 2, length(sc) - 2)
                  ELSE sc END AS source_code
      FROM base
    ),
    typed AS (
      -- CASE guards every json_* call: DuckDB's vectorized AND does not
      -- short-circuit, so raw-Solidity rows would otherwise error.
      SELECT *,
             CASE WHEN json_valid(source_code)
                  THEN COALESCE(json_keys(source_code, '$.sources'), [])
                  ELSE [] END AS ks
      FROM unwrapped
    )
    SELECT address, contract_name,
           CASE WHEN len(ks) > 0 THEN 'json' ELSE 'single_sol' END AS source_type,
           -- Json variant: id = simple_hash of the WHOLE unwrapped
           -- container (plain_contract.rs:265-271, hash() Json arm :179)
           md5(regexp_replace(source_code, '{_WS}', '', 'g')) AS id,
           CASE WHEN len(ks) > 0 THEN len(ks) ELSE 1 END AS n_sources,
           runs, optimization_used
    FROM typed t
    """,
)
def ref_etherscan_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+F10: Etherscan JSON parse over the fixture — double-brace
    unwrap, standard-json parse with raw-Solidity fallback
    (plain_contract.rs:252-281), lenient Runs/OptimizationUsed casts
    (plain_contract.rs:57-58). Standard-json ids hash the whole
    unwrapped container (the ``Json`` variant, plain_contract.rs:179),
    keeping them dedup-compatible with folder ``contract.json`` rows.
    """
    parsed = C.parse_etherscan_contracts(fixtures.etherscan_df(spark))
    return parsed.select(
        "address",
        "contract_name",
        "source_type",
        "id",
        F.col("n_sources").cast("int").alias("n_sources"),
        "runs",
        "optimization_used",
    )


@register(
    "ref_sources_explode",
    oracle=rf"""
    WITH unwrapped AS (
      SELECT address,
             CASE WHEN substr(json_extract_string(content, '$.SourceCode'), 1, 2)
                       = '{{{{'
                  THEN substr(json_extract_string(content, '$.SourceCode'), 2,
                              length(json_extract_string(content, '$.SourceCode')) - 2)
                  ELSE json_extract_string(content, '$.SourceCode') END AS sc
      FROM {_ESCAN}
    ),
    keyed AS (
      SELECT address, sc,
             CASE WHEN json_valid(sc)
                  THEN COALESCE(json_keys(sc, '$.sources'), [])
                  ELSE [] END AS ks
      FROM unwrapped
    )
    SELECT k.address, u.k AS path,
           md5(regexp_replace(
             json_extract_string(k.sc, '$.sources."' || u.k || '".content'),
             '{_WS}', '', 'g')) AS file_id
    FROM keyed k, unnest(k.ks) u(k)
    """,
)
def ref_sources_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: standard-json ``sources`` map → one row per source file
    (plain_contract.rs:190-198); non-JSON fallback rows contribute no
    rows, mirroring the reference's map iteration.
    """
    return C.explode_standard_json_sources(fixtures.etherscan_df(spark))


@register(
    "ref_metadata_decode",
    oracle=rf"""
    SELECT dir,
           json_extract_string(m, '$.ContractName') AS contract_name,
           json_extract_string(m, '$.CompilerVersion') AS compiler_version,
           regexp_extract(json_extract_string(m, '$.CompilerVersion'),
                          'v?(\d+\.\d+\.\d+)', 1) AS compiler_semver,
           CAST(json_extract_string(m, '$.Runs') AS INT) AS runs,
           CAST(json_extract_string(m, '$.OptimizationUsed') AS BOOLEAN)
             AS optimization_used,
           json_extract_string(m, '$.BytecodeHash') AS bytecode_hash
    FROM (
      SELECT dir,
             MAX(CASE WHEN filename = 'metadata.json' THEN content END) AS m
      FROM {_FILES}
      GROUP BY dir
    )
    WHERE m IS NOT NULL
    """,
)
def ref_metadata_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6+F7+F11: typed decode of the metadata JSON column with
    ``from_json`` (db.rs:35-49 semantics) plus semver normalization
    (plain_contract.rs:334-337).
    """
    files = fixtures.contract_files_df(spark)
    meta = (
        files.filter(F.col("filename") == "metadata.json")
        .select("dir", F.from_json("content", METADATA_SCHEMA).alias("m"))
    )
    return meta.select(
        "dir",
        F.col("m")["ContractName"].alias("contract_name"),
        F.col("m")["CompilerVersion"].alias("compiler_version"),
        C.normalize_version(F.col("m")["CompilerVersion"]).alias("compiler_semver"),
        F.col("m")["Runs"].alias("runs"),
        F.col("m")["OptimizationUsed"].alias("optimization_used"),
        F.col("m")["BytecodeHash"].alias("bytecode_hash"),
    )


@register("ref_extract_functions", oracle=None)
def ref_extract_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U3+F4-F6+F14: the compile/extract stage over the fixture
    corpus — vyper filtered pre-stage (P6), Arrow-batched function
    extraction with keccak selectors and byte-exact body slices,
    conflict-ignore dedup on the function id (rows-only: keccak is not
    computable in the SQL oracle; goldens live in
    tests/test_compilestage.py).
    """
    parsed = C.parse_folder_contracts(fixtures.contract_files_df(spark))
    return stage.extract_functions(parsed)


@register("ref_sink_roundtrip", oracle=None)
def ref_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7-S10: staged-parquet single-writer DuckDB sink round-trip —
    bootstrap DDL, conflict-ignoring bulk load inside the checkpoint
    pragma window, idempotent re-load, read back per-type counts
    (rows-only: the sink DB is a temp file the oracle can't see;
    assertions live in tests/test_duckdb_sink.py).
    """
    import tempfile

    from pyspark.sql import functions as SF

    from ..sinks import duckdb_sink as sink

    parsed = C.parse_folder_contracts(fixtures.contract_files_df(spark))
    with tempfile.TemporaryDirectory(prefix="scdb_sink_q_") as d:
        db = f"{d}/roundtrip.duckdb"
        first = sink.store_contracts(parsed, db)
        second = sink.store_contracts(parsed, db)  # must be a no-op
        back = sink.read_contracts(spark, db)
        return (
            back.groupBy("source_type")
            .agg(SF.count(SF.lit(1)).alias("n_contracts"))
            .withColumn("first_load_rows", SF.lit(first))
            .withColumn("second_load_rows", SF.lit(second))
            .localCheckpoint()  # materialize before the temp dir vanishes
        )


@register(
    "ref_crlf_normalize",
    oracle=rf"""
    SELECT dir, filename,
           length(content) AS raw_len,
           length(regexp_replace(content, chr(13) || chr(10), chr(10), 'g'))
             AS norm_len,
           md5(regexp_replace(
             regexp_replace(content, chr(13) || chr(10), chr(10), 'g'),
             '{_WS}', '', 'g')) AS norm_id
    FROM {_FILES}
    WHERE filename LIKE '%.sol'
    """,
)
def ref_crlf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: CRLF → LF normalization (plain_contract.rs:434) ahead of any
    offset math; the CRLF fixture file shrinks, LF-only files don't.
    """
    files = fixtures.contract_files_df(spark).filter(
        F.col("filename").endswith(".sol")
    )
    norm = C.normalize_crlf(F.col("content"))
    return files.select(
        "dir",
        "filename",
        F.length("content").alias("raw_len"),
        F.length(norm).alias("norm_len"),
        C.contract_id(norm).alias("norm_id"),
    )
