"""Reference-semantics tests: identity hashing, layout resolution, and
the filesystem scan paths (S1/S2) against tmp-dir corpora.

The md5 goldens are computed with Python ``hashlib``/``re`` — an oracle
independent of both Spark and DuckDB — pinning the reference's
content-addressing semantics (reference src/utils.rs:12-17,
src/plain_contract.rs:166-181).
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from smart_contract_database_builder_spark import fixtures
from smart_contract_database_builder_spark.sources import contracts as C


def py_contract_id(content: str) -> str:
    return hashlib.md5(re.sub(C.PY_WS_PATTERN, "", content).encode()).hexdigest()


def py_multifile_id(contents: list[str]) -> str:
    hashes = sorted(py_contract_id(c) for c in contents)
    return hashlib.md5("".join(hashes).encode()).hexdigest()


@pytest.fixture(scope="module")
def parsed(spark):
    df = C.parse_folder_contracts(fixtures.contract_files_df(spark))
    return {r["dir"]: r.asDict() for r in df.collect()}


def test_layout_priority_resolution(parsed):
    assert parsed["demo_json"]["source_type"] == "json"
    assert parsed["demo_single"]["source_type"] == "single_sol"
    assert parsed["demo_vyper"]["source_type"] == "vyper"
    assert parsed["demo_multi"]["source_type"] == "multi_sol"
    # dirs without metadata.json are dropped (main.rs:96-104)
    assert "orphan_dir" not in parsed


def test_multi_sol_excludes_non_sol_files(parsed):
    names = [f["filename"] for f in parsed["demo_multi"]["files"]]
    assert sorted(names) == ["ITally.sol", "SafeTallyLib.sol", "Tally.sol"]


def test_single_file_id_matches_python_oracle(parsed):
    vault = next(c for d, f, c in fixtures.CONTRACT_FILES
                 if d == "demo_single" and f == "main.sol")
    assert parsed["demo_single"]["id"] == py_contract_id(vault)


def test_multifile_id_is_sorted_digest_rehash(parsed):
    contents = [c for d, f, c in fixtures.CONTRACT_FILES
                if d == "demo_multi" and f.endswith(".sol")]
    assert parsed["demo_multi"]["id"] == py_multifile_id(contents)


def test_whitespace_variant_dedups_to_same_id(parsed):
    """The reference's core dedup semantic: whitespace-only differences
    hash identically (utils.rs:12-17)."""
    assert parsed["demo_single"]["id"] == parsed["demo_single_dup"]["id"]


def test_etherscan_parse_variants(spark):
    rows = {
        r["address"]: r.asDict()
        for r in C.parse_etherscan_contracts(fixtures.etherscan_df(spark)).collect()
    }
    wrapped = rows["0xaaaa00000000000000000000000000000000aa01"]
    bare = rows["0xbbbb00000000000000000000000000000000bb02"]
    fallback = rows["0xcccc00000000000000000000000000000000cc03"]
    assert wrapped["source_type"] == "json" and wrapped["n_sources"] == 2
    assert bare["source_type"] == "json" and bare["n_sources"] == 3
    assert fallback["source_type"] == "single_sol" and fallback["n_sources"] == 1
    # lenient Runs parse: "" → 0 (plain_contract.rs:57)
    assert fallback["runs"] == 0 and bare["runs"] == 500
    assert wrapped["optimization_used"] is True
    assert fallback["optimization_used"] is False


def test_etherscan_json_id_is_container_hash(spark):
    """Standard-json Etherscan contracts are the Json variant: id =
    simple_hash of the WHOLE unwrapped container (plain_contract.rs:
    265-271; hash() Json arm :179) — NOT the multi-file sorted-digest
    re-hash. Pinned against a Python md5 oracle, and against the
    folder-ingested contract.json layout so cross-source dedup holds."""
    rows = {
        r["address"]: r.asDict()
        for r in C.parse_etherscan_contracts(fixtures.etherscan_df(spark)).collect()
    }
    container = fixtures._WRAPPED_STD_JSON
    expect = hashlib.md5(
        re.sub(C.PY_WS_PATTERN, "", container).encode()
    ).hexdigest()
    assert rows["0xaaaa00000000000000000000000000000000aa01"]["id"] == expect

    # The demo_json folder layout holds the identical container in
    # contract.json — same content, same id across ingestion sources.
    folder = {
        r["dir"]: r.asDict()
        for r in C.parse_folder_contracts(
            fixtures.contract_files_df(spark)
        ).collect()
    }
    assert folder["demo_json"]["id"] == expect


def test_function_id_composition(spark):
    """F4: simple_hash(contract_id ‖ filename ‖ selector) — functions.rs:31
    via utils.rs:12-17: whitespace in the key (e.g. an Etherscan source
    path containing a space) is stripped before md5."""
    df = spark.createDataFrame(
        [
            ("cid123", "Tally.sol", "0xdeadbeef"),
            ("cid123", "src dir/My Token.sol", "0xdeadbeef"),
        ],
        "cid string, fn string, sel string",
    ).select(C.function_id(F.col("cid"), F.col("fn"), F.col("sel")).alias("fid"))
    got = [r["fid"] for r in df.collect()]
    assert got[0] == hashlib.md5(b"cid123Tally.sol0xdeadbeef").hexdigest()
    assert got[1] == hashlib.md5(b"cid123srcdir/MyToken.sol0xdeadbeef").hexdigest()


def test_filesystem_folder_scan_matches_inmemory(spark, tmp_path):
    """S1 end-to-end: the binaryFile recursive scan + parse produces the
    same contracts (same ids) as the in-memory fixture path."""
    for d, f, content in fixtures.CONTRACT_FILES:
        p = tmp_path / d
        p.mkdir(exist_ok=True)
        (p / f).write_bytes(content.encode())
    scanned = C.parse_folder_contracts(
        C.read_contract_files(spark, str(tmp_path))
    )
    got = {r["dir"].rsplit("/", 1)[-1]: r["id"] for r in scanned.collect()}
    want = {
        r["dir"]: r["id"]
        for r in C.parse_folder_contracts(
            fixtures.contract_files_df(spark)
        ).collect()
    }
    assert got == want


def test_filesystem_etherscan_scan_filters_filenames(spark, tmp_path):
    """S2: keep only files starting with the parent dir name and ending
    .json case-insensitively (main.rs:124-142)."""
    addr = "0xaaaa00000000000000000000000000000000aa01"
    d = tmp_path / addr
    d.mkdir()
    content = dict(fixtures.ETHERSCAN_FILES)[addr]
    (d / f"{addr}_Wrapped.JSON").write_bytes(content.encode())
    (d / "unrelated.json").write_bytes(b"{}")  # wrong prefix — dropped
    raw = C.read_etherscan_files(spark, str(tmp_path))
    rows = raw.collect()
    assert len(rows) == 1 and rows[0]["address"] == addr
    parsed = C.parse_etherscan_contracts(raw).collect()[0]
    assert parsed["source_type"] == "json" and parsed["n_sources"] == 2
