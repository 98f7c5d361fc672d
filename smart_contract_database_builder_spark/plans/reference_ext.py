"""Reference-surface extensions: ABI rendering (F6), error routing
(P8), and the custom-aggregation surface (U5) with its oracle-checkable
fixed-point twin.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# F6: ABI signature render — pure expressions over parsed ABI structs
# ---------------------------------------------------------------------------

#: Small fixture of contract ABI JSON (the solc output shape the
#: reference iterates via alloy's Function::signature, functions.rs:30).
_ABI_FIXTURE: list[tuple[str, str]] = [
    (
        "MiniToken",
        json.dumps(
            [
                {"type": "function", "name": "transfer",
                 "inputs": [{"name": "to", "type": "address"},
                            {"name": "amount", "type": "uint256"}]},
                {"type": "function", "name": "totalSupply", "inputs": []},
                {"type": "event", "name": "Transfer",
                 "inputs": [{"name": "from", "type": "address"}]},
                {"type": "constructor",
                 "inputs": [{"name": "supply", "type": "uint256"}]},
            ]
        ),
    ),
    (
        "Registry",
        json.dumps(
            [
                {"type": "function", "name": "register",
                 "inputs": [{"name": "who", "type": "address"},
                            {"name": "tags", "type": "bytes32[]"}]},
                {"type": "fallback", "inputs": []},
            ]
        ),
    ),
]


def _abi_values_sql(alias: str = "abis") -> str:
    rows = ",\n".join(
        "('{}', '{}')".format(c, j.replace("'", "''")) for c, j in _ABI_FIXTURE
    )
    return f"(VALUES\n{rows}) AS {alias}(contract_name, abi)"


@register(
    "ref_abi_signature_render",
    oracle=f"""
    SELECT contract_name,
           json_extract_string(e.value, '$.name') AS function_name,
           json_extract_string(e.value, '$.name') || '(' ||
             -- array_to_string([]) is NULL in DuckDB — coalesce to ''
             COALESCE(array_to_string(
               COALESCE(list_transform(
                 CAST(json_extract(e.value, '$.inputs') AS JSON[]),
                 x -> json_extract_string(x, '$.type')), []),
               ','), '') || ')' AS signature
    FROM (
      SELECT contract_name, u.v AS value
      FROM {_abi_values_sql()}, unnest(CAST(abi AS JSON[])) u(v)
    ) e
    WHERE json_extract_string(e.value, '$.type') = 'function'
    """,
)
def ref_abi_signature_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: canonical ``name(type1,type2,…)`` rendered with pure
    expressions over the typed ABI array — explode entries, keep
    ``type = 'function'`` (alloy's functions() view excludes
    constructor/fallback/events, functions.rs:24-27), join input types.
    """
    schema = (
        "array<struct<type:string,name:string,"
        "inputs:array<struct<name:string,type:string>>>>"
    )
    abis = spark.createDataFrame(_ABI_FIXTURE, "contract_name string, abi string")
    entries = abis.select(
        "contract_name", F.explode(F.from_json("abi", schema)).alias("e")
    ).filter(F.col("e.type") == "function")
    signature = F.concat(
        F.col("e.name"),
        F.lit("("),
        F.concat_ws(
            ",",
            F.transform(F.coalesce("e.inputs", F.array()), lambda i: i["type"]),
        ),
        F.lit(")"),
    )
    return entries.select(
        "contract_name",
        F.col("e.name").alias("function_name"),
        signature.alias("signature"),
    )


# ---------------------------------------------------------------------------
# P8: error-row routing (PERMISSIVE vs strict)
# ---------------------------------------------------------------------------

_DIRTY_JSON_ROWS: list[tuple[int, str]] = [
    (1, '{"ContractName": "Good1", "Runs": 200}'),
    (2, '{"ContractName": "Good2", "Runs": 500}'),
    (3, "pragma solidity ^0.8.0; // not json at all"),
    (4, '{"ContractName": "Trunc'),
    (5, '{"ContractName": "Good3", "Runs": "not-a-number"}'),
]


def _dirty_values_sql(alias: str = "raw") -> str:
    rows = ",\n".join(
        "({}, '{}')".format(i, c.replace("'", "''")) for i, c in _DIRTY_JSON_ROWS
    )
    return f"(VALUES\n{rows}) AS {alias}(row_id, content)"


@register(
    "ref_error_routing_permissive",
    oracle=f"""
    SELECT row_id,
           CASE WHEN json_valid(content)
                THEN json_extract_string(content, '$.ContractName') END AS name,
           CASE WHEN json_valid(content)
                THEN TRY_CAST(json_extract_string(content, '$.Runs') AS INT)
                END AS runs,
           NOT json_valid(content) AS is_corrupt
    FROM {_dirty_values_sql()}
    """,
)
def ref_error_routing_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: PERMISSIVE-mode parse — malformed rows route to a corrupt
    flag instead of failing the job (the reference's ``--ignore-errors``
    log-and-drop, main.rs:106-111; strict mode ≙ FAILFAST, the panic
    path). Null-on-failure from_json + try_cast keep the lenient
    scalar semantics.
    """
    raw = spark.createDataFrame(_DIRTY_JSON_ROWS, "row_id int, content string")
    # PERMISSIVE from_json never nulls the struct — corrupt input routes
    # to the declared corrupt-record column instead
    parsed = F.from_json(
        "content",
        "struct<ContractName:string,Runs:string,_corrupt_record:string>",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    return raw.select(
        "row_id",
        parsed["ContractName"].alias("name"),
        parsed["Runs"].try_cast("int").alias("runs"),
        parsed["_corrupt_record"].isNotNull().alias("is_corrupt"),
    )


# ---------------------------------------------------------------------------
# U5: centroid aggregation over embeddings
# ---------------------------------------------------------------------------

_FP = 1_000_000


@register(
    "llm_centroid_by_label",
    oracle=f"""
    SELECT label, d AS dim,
           CAST(SUM(CAST(CAST(CAST(embedding[d] AS DOUBLE) AS DECIMAL(18,6))
                         * {_FP} AS BIGINT)) AS DOUBLE)
             / ({_FP} * COUNT(*)) AS centroid
    FROM embeddings, range(1, 65) r(d)
    GROUP BY label, d
    """,
)
def llm_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: per-label centroid of embeddings — the custom-UDAF shape,
    expressed as posexplode + fixed-point integer sums so the result is
    exact and engine-independent (mean = int sum / (scale × count), all
    in one shuffle keyed by (label, dim)). The applyInPandas UDAF
    variant computes the same centroids vectorized; its equivalence is
    pinned in tests/test_centroid_udaf.py.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = F.transform(
        "embedding",
        lambda x: (x.cast("double").cast("decimal(18,6)") * _FP).cast("long"),
    )
    exploded = emb.select("label", F.posexplode(scaled).alias("pos", "v"))
    return (
        exploded.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum("v").cast("double") / (F.lit(_FP) * F.count(F.lit(1)))
            ).alias("centroid")
        )
    )


def centroid_udaf(emb: DataFrame) -> DataFrame:
    """U5 proper: the same centroid as an Arrow-batched applyInPandas
    aggregation — one group per label, numpy mean over the stacked
    vectors. The production path for wide aggregations Spark's built-in
    functions can't express."""
    import numpy as np
    import pandas as pd

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["embedding"].values)
        centroid = mat.mean(axis=0)
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[:1],
                "centroid": [centroid.tolist()],
                "n_vectors": [len(pdf)],
            }
        )

    return emb.select("label", "embedding").groupBy("label").applyInPandas(
        agg, schema="label int, centroid array<double>, n_vectors long"
    )


# ---------------------------------------------------------------------------
# SimHash (dedup family completeness)
# ---------------------------------------------------------------------------

#: SimHash fingerprint width. 64 bits is the production geometry (r8
#: VERDICT item #2): the Hamming-pairs consumer bands the fingerprint
#: into 4 blocks, so the block key space is 2^(_SIM_BITS/4) — at 16
#: bits the 4-bit block keys saturate beyond ~10^4 docs (the 100×
#: probe showed EVERY bucket over the cap → silent zero recall), while
#: 16-bit blocks keep expected occupancy bounded out to ~10^9 docs.
#: Each md5 hex digit contributes TWO fingerprint bits (its low two
#: value bits), so 64 bits consume all 32 digits of one md5 — no
#: second hash per token.
_SIM_BITS = 64

#: Hex digits whose value has bit 0 set (odd digits) / bit 1 set —
#: membership tests give bit extraction that both engines express as a
#: cheap contains() on a constant string.
_SIM_ODD = "13579bdf"
_SIM_EVEN = "2367abef"


def simhash_fp_pandas():
    """Arrow-batched SimHash kernel: token md5 hex list → 64-char bit
    string. Identical integer semantics to the per-bit definitional
    form the DuckDB oracles spell via ``_sql_sim_vote`` (bit j of the
    fingerprint reads md5 hex digit ``(j+1)//2``; odd j → the digit's
    value bit 0, even j → bit 1; vote +1/−1 per token, sign ≥ 0 ⇒ '1').
    Vectorization: all token hashes of a doc concatenate into ONE
    uint8 array reshaped (n_tokens, 32); a 256-entry table maps ASCII
    hex to its value; bit extraction and the vote sum are whole-matrix
    ops. Sign rule via popcount identity: Σ(±1 votes) ≥ 0 ⇔
    2·Σbits ≥ n_tokens."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    hexval = np.zeros(256, dtype=np.int32)
    for i, c in enumerate("0123456789abcdef"):
        hexval[ord(c)] = i

    def one(tokens) -> str:
        n = len(tokens)
        arr = np.frombuffer(
            "".join(tokens).encode("ascii"), dtype=np.uint8
        ).reshape(n, 32)
        vals = hexval[arr]
        bits = np.empty((n, _SIM_BITS), dtype=np.int32)
        bits[:, 0::2] = vals & 1
        bits[:, 1::2] = (vals >> 1) & 1
        ones = bits.sum(axis=0)
        return "".join(np.where(2 * ones >= n, "1", "0"))

    @pandas_udf("string")
    def fp(hs: pd.Series) -> pd.Series:
        return hs.map(one)

    return fp


def _sql_sim_vote(h: str = "h", j: str = "j") -> str:
    """DuckDB vote expression for SimHash bit ``j`` (1-based, 1..64) of
    token hash ``h``: bit j reads md5 hex digit ``(j+1)//2``; odd j
    tests the digit's value bit 0, even j its bit 1. Shared by every
    SimHash oracle so the Spark fold and the SQL can never disagree on
    the bit layout."""
    d = f"substr({h}, (({j})+1)//2, 1)"
    return (
        f"CASE WHEN CASE WHEN ({j}) % 2 = 1 "
        f"THEN contains('{_SIM_ODD}', {d}) "
        f"ELSE contains('{_SIM_EVEN}', {d}) END "
        "THEN 1 ELSE -1 END"
    )

#: Rabin-Karp window hash over character 8-grams: base/modulus chosen so
#: every intermediate stays far under 2^63 (codepoint < 2^21, power < M
#: < 2^31 → one term < 2^51, an 8-term window sum < 2^54). Replaces the
#: per-character md5 fold — a full cryptographic hash per corpus byte is
#: the wrong kernel at 100 TB; polynomial mixing is ~8 integer ops per
#: position with identical containment-detection behavior.
_WIN_B = 257
_WIN_M = 1_000_000_007
_WIN_P = [pow(_WIN_B, k, _WIN_M) for k in range(8)]

#: One window's polynomial sum in DuckDB, over the codepoint list ``cd``
#: at 1-based window start ``i``.
_SQL_WIN_EXPR = " + ".join(f"cd[i+{j}]*{_WIN_P[7 - j]}" for j in range(8))


def winnow_fp_pandas():
    """Arrow-batched winnow kernel — the registered scale path.

    The expression form (``winnow_fp_expr``) runs inside Spark's
    higher-order-function interpreter (no codegen): per window it pays
    8 interpreted ``element_at`` lambda evaluations, ~1 µs/char — the
    measured floor regardless of arithmetic (a rolling-update fold only
    recovered ~10%). The same int64 math vectorizes exactly in numpy:
    codepoints via a single ``utf-32-le`` decode (no per-char Python),
    all window sums as one ``sliding_window_view @ powers`` matrix
    product (max intermediate 8·2^51 < 2^63, so no overflow before the
    mod), one ``min``. Equivalence with the expression form — and so
    with the DuckDB oracle — is pinned corpus-wide plus multibyte edge
    cases in tests/test_winnow_kernels.py.
    """
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql.functions import pandas_udf

    powers = np.array(list(reversed(_WIN_P)), dtype=np.int64)

    def one(t: str) -> int:
        codes = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(
            np.int64
        )
        n = codes.size
        if n >= 8:
            vals = (sliding_window_view(codes, 8) @ powers) % _WIN_M
            return int(vals.min())
        h = 0
        for c in codes:  # <8 chars: Horner fallback, trivially short
            h = (h * _WIN_B + int(c)) % _WIN_M
        return h

    @pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        return texts.map(one)

    return fp("text")


def winnow_fp_expr(n, codes):
    """Expression-form winnow (oracle twin of ``winnow_fp_pandas``):
    min Rabin-Karp hash over character 8-gram windows, Horner fallback
    for short texts."""

    def _win_hash(i):
        s = F.element_at(codes, i) * _WIN_P[7]
        for j in range(1, 8):
            s = s + F.element_at(codes, i + j) * _WIN_P[7 - j]
        return s % _WIN_M

    return (
        F.when(
            n >= 8,
            F.aggregate(
                F.sequence(F.lit(1), n - 7),
                F.lit(_WIN_M).cast("long"),
                lambda acc, i: F.least(acc, _win_hash(i)),
            ),
        )
        .when(
            n >= 1,
            F.aggregate(
                codes,
                F.lit(0).cast("long"),
                lambda a, c: (a * _WIN_B + c) % _WIN_M,
            ),
        )
        .otherwise(F.lit(0).cast("long"))
    )


@register(
    "llm_simhash_documents",
    oracle=rf"""
    SELECT doc_id,
           array_to_string(
             list_transform(range(1, {_SIM_BITS + 1}), j ->
               CASE WHEN list_aggregate(
                 list_transform(hs, h ->
                   {_sql_sim_vote("h", "j")}), 'sum') >= 0
               THEN '1' ELSE '0' END),
             '') AS simhash,
           CASE WHEN length(text) >= 8
                THEN list_aggregate(
                       list_transform(range(1, length(text) - 6),
                                      i -> ({_SQL_WIN_EXPR}) % {_WIN_M}),
                       'min')
                WHEN length(text) >= 1
                THEN list_reduce(cd, (a, c) -> (a * {_WIN_B} + c) % {_WIN_M})
                ELSE 0 END AS winnow_fp
    FROM (
      SELECT doc_id, text,
             list_transform(list_distinct({{tokens}}), x -> md5(x)) AS hs,
             list_transform(range(1, length(text) + 1),
                            i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS cd
      FROM documents
    )
    WHERE len(hs) > 0
    """.format(tokens=r"string_split_regex(trim(lower(text)), '\s+')"),
)
def llm_simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints, two families in one pass.

    SimHash: per token-set hash, vote ±1 on each of ``_SIM_BITS`` (64)
    bit positions — each md5 hex digit contributes its low two value
    bits, so one md5 per distinct token covers the full production
    width (r8 VERDICT #2: the old 16-bit geometry saturated its block
    keys beyond ~10^4 docs). The sign vector is the fingerprint —
    near-identical docs land within a small Hamming distance. Pure
    array expressions; one md5 per distinct token, then 32 digit reads.

    Winnowing-style min-shingle fingerprint: the minimum Rabin-Karp
    polynomial hash over all character 8-gram windows (short docs fall
    back to a Horner hash of the whole text), computed by the
    Arrow-batched numpy kernel ``winnow_fp_pandas`` — character-window
    hashing is the one kernel where Spark's interpreted
    higher-order-function evaluator is the bottleneck, so the scale
    path is a vectorized sliding-window matrix product with the
    identical int64 arithmetic (the expression twin ``winnow_fp_expr``
    and the DuckDB oracle pin equivalence).
    """
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        winnow_fp_pandas().alias("winnow_fp"),
        F.transform(
            F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+")), F.md5
        ).alias("hs"),
    )
    docs = base.select("doc_id", "winnow_fp", "hs")
    hs = F.col("hs")
    # The 64-bit vote accumulation is the second kernel (after winnow)
    # where Spark's interpreted higher-order-function evaluator is the
    # measured bottleneck: a one-fold-over-tokens × 64-counter array
    # expression form costs ~5× the 16-bit version at sf0.1 (the fold
    # pays 32 digit reads + 64 adds per token hash, all interpreted).
    # The Arrow kernel below does the identical integer arithmetic in
    # numpy — one uint8 view over the concatenated md5 hex, a 256-entry
    # value lookup, two bit extractions, one column sum — and the
    # corpus-wide DuckDB oracle (generated from the same
    # ``_sql_sim_vote`` layout) pins equivalence exactly as the winnow
    # kernel's oracle does. Bit layout: digit (j+1)//2, odd j → value
    # bit 0, even j → bit 1.
    return docs.filter(F.size(hs) > 0).select(
        "doc_id", simhash_fp_pandas()("hs").alias("simhash"), "winnow_fp"
    )


@register(
    "llm_winnow_collisions",
    oracle=rf"""
    WITH fp AS (
      SELECT doc_id,
             CASE WHEN length(text) >= 8
                  THEN list_aggregate(
                         list_transform(range(1, length(text) - 6),
                                        i -> ({_SQL_WIN_EXPR}) % {_WIN_M}),
                         'min')
                  WHEN length(text) >= 1
                  THEN list_reduce(cd, (a, c) -> (a * {_WIN_B} + c) % {_WIN_M})
                  ELSE 0 END AS winnow_fp
      FROM (
        SELECT doc_id, text,
               list_transform(range(1, length(text) + 1),
                              i -> CAST(ord(substr(text, i, 1)) AS BIGINT))
                 AS cd
        FROM documents
      )
    )
    SELECT winnow_fp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS canonical_doc_id
    FROM fp
    GROUP BY winnow_fp
    HAVING COUNT(*) >= 2
    """,
)
def llm_winnow_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-EXT: WINNOWING-fingerprint collision groups — documents whose
    minimum character-8-gram Rabin-Karp hash coincides share at least
    one 8-char span with near-certainty (the MOSS plagiarism-detection
    primitive): a CHARACTER-level near-copy grouping that catches
    shared passages whitespace-canonical exact dedup misses, at hash
    cost instead of pairwise comparison.

    Scale shape: the fingerprint is the existing vectorized numpy
    kernel (one Arrow pass per document); grouping is ONE hash agg on
    the uniform int64 fingerprint — no pair expansion anywhere; the
    canonical pick is a min-agg, same policy as exact dedup.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", winnow_fp_pandas().alias("winnow_fp"))
    return (
        fp.groupBy("winnow_fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )
