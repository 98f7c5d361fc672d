"""DuckDB sink round-trip: DDL bootstrap, staged-parquet single-writer
load, conflict-ignore idempotence, and source export (S7-S11)."""

from __future__ import annotations

import duckdb
import pytest

from smart_contract_database_builder_spark import fixtures
from smart_contract_database_builder_spark.compilestage import stage
from smart_contract_database_builder_spark.sinks import duckdb_sink as sink
from smart_contract_database_builder_spark.sources import contracts as C


@pytest.fixture()
def parsed(spark):
    return C.parse_folder_contracts(fixtures.contract_files_df(spark))


def test_store_contracts_and_idempotent_reload(spark, parsed, tmp_path):
    db = str(tmp_path / "sink.duckdb")
    n1 = sink.store_contracts(parsed, db)
    # 6 dirs parse (orphan dropped); the whitespace-variant dup shares
    # its id with demo_single, so only 5 unique contracts land
    assert n1 == 5
    # re-storing the same batch is a no-op (INSERT OR IGNORE, db.rs:174)
    n2 = sink.store_contracts(parsed, db)
    assert n2 == 0
    con = duckdb.connect(db)
    types = dict(
        con.execute(
            "SELECT source_type::VARCHAR, COUNT(*) FROM contract GROUP BY 1"
        ).fetchall()
    )
    con.close()
    assert types == {"json": 1, "single_sol": 2, "vyper": 1, "multi_sol": 1}


def test_storage_shape_is_tagged_union(spark, parsed, tmp_path):
    import json

    db = str(tmp_path / "sink.duckdb")
    sink.store_contracts(parsed, db)
    con = duckdb.connect(db)
    src = con.execute(
        "SELECT source FROM contract WHERE name = 'Tally'"
    ).fetchone()[0]
    con.close()
    tagged = json.loads(src)
    assert list(tagged) == ["MultiSolidity"]
    assert sorted(f["name"] for f in tagged["MultiSolidity"]) == [
        "ITally.sol", "SafeTallyLib.sol", "Tally.sol",
    ]


def test_store_functions_and_read_back(spark, parsed, tmp_path):
    db = str(tmp_path / "sink.duckdb")
    sink.store_contracts(parsed, db)
    fns = stage.extract_functions(parsed)
    n = sink.store_functions(fns, db)
    assert n == fns.count() > 0
    assert sink.store_functions(fns, db) == 0  # idempotent
    con = duckdb.connect(db)
    # the declarative FK join works end-to-end
    joined = con.execute(
        "SELECT COUNT(*) FROM function f JOIN contract c ON f.contract_id = c.id"
    ).fetchone()[0]
    con.close()
    assert joined == n


def test_read_contracts_roundtrip(spark, parsed, tmp_path):
    db = str(tmp_path / "sink.duckdb")
    sink.store_contracts(parsed, db)
    back = sink.read_contracts(spark, db)
    assert back.count() == 5
    ids_stored = {r["id"] for r in sink.contracts_storage_shape(parsed).collect()}
    ids_back = {r["id"] for r in back.collect()}
    assert ids_back == ids_stored


def test_export_source_code_sanitizes_paths(spark, tmp_path):
    import json

    db = str(tmp_path / "sink.duckdb")
    con = sink.connect(db)
    source = json.dumps(
        {
            "MultiSolidity": [
                {"name": "../../evil/escape.sol", "content": "contract E {}"},
                {"name": "src/Ok", "content": "contract Ok {}"},
            ]
        }
    )
    con.execute(
        "INSERT INTO contract VALUES ('cid1', 'E', '{}', ?, 'multi_sol')",
        [source],
    )
    con.close()
    out = tmp_path / "export"
    written = sink.export_source_code(db, "cid1", str(out))
    assert len(written) == 2
    for path in written:
        # F15: no traversal outside the export root
        assert str(out) in path and ".." not in path
    # F16: extensionless name gets .sol appended
    assert any(p.endswith("src/Ok.sol") for p in written)


def test_sanitize_path():
    assert sink.sanitize_path("../../a/b.sol") == "a/b.sol"
    assert sink.sanitize_path("/abs/path.sol") == "abs/path.sol"
    assert sink.sanitize_path("./x/./y.sol") == "x/y.sol"
