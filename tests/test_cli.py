"""End-to-end CLI parity: pre-process → index-functions → export-source
over a tmp contract tree, mirroring the reference's documented workflow
(reference README.md:43-49)."""

from __future__ import annotations

import duckdb
import pytest

from smart_contract_database_builder_spark import cli, fixtures


@pytest.fixture()
def contract_tree(tmp_path):
    root = tmp_path / "contracts"
    for d, f, content in fixtures.CONTRACT_FILES:
        p = root / d
        p.mkdir(parents=True, exist_ok=True)
        (p / f).write_bytes(content.encode())
    return str(root)


def test_full_cli_workflow(spark, contract_tree, tmp_path):
    db = str(tmp_path / "cli.duckdb")

    rc = cli.main(
        ["pre-process", "--contracts-root", contract_tree, "--db-file", db]
    )
    assert rc == 0
    con = duckdb.connect(db)
    n_contracts = con.execute("SELECT COUNT(*) FROM contract").fetchone()[0]
    assert n_contracts == 5  # 6 parsed dirs, whitespace-dup collapses

    rc = cli.main(["index-functions", "--db-file", db])
    assert rc == 0
    n_funcs = con.execute("SELECT COUNT(*) FROM function").fetchone()[0]
    assert n_funcs > 0
    # functions join back to stored contracts through the FK
    orphans = con.execute(
        "SELECT COUNT(*) FROM function f WHERE NOT EXISTS "
        "(SELECT 1 FROM contract c WHERE c.id = f.contract_id)"
    ).fetchone()[0]
    assert orphans == 0

    some_id = con.execute(
        "SELECT id FROM contract WHERE source_type = 'multi_sol'"
    ).fetchone()[0]
    con.close()
    out = tmp_path / "export"
    rc = cli.main(
        ["export-source", "--db-file", db, "--contract-id", some_id,
         "--output-folder", str(out)]
    )
    assert rc == 0
    exported = sorted(p.name for p in out.rglob("*.sol"))
    assert exported == ["ITally.sol", "SafeTallyLib.sol", "Tally.sol"]


def test_cli_etherscan_path(spark, tmp_path):
    root = tmp_path / "escan"
    for addr, content in fixtures.ETHERSCAN_FILES:
        d = root / addr
        d.mkdir(parents=True)
        (d / f"{addr}.json").write_bytes(content.encode())
    db = str(tmp_path / "escan.duckdb")
    rc = cli.main(
        ["pre-process", "--etherscan", "--contracts-root", str(root),
         "--db-file", db]
    )
    assert rc == 0
    con = duckdb.connect(db)
    types = dict(
        con.execute(
            "SELECT source_type::VARCHAR, COUNT(*) FROM contract GROUP BY 1"
        ).fetchall()
    )
    con.close()
    assert types == {"json": 2, "single_sol": 1}


def test_cli_strict_mode_fails_on_corrupt_metadata(spark, contract_tree, tmp_path):
    """Default (no flag) ≙ the reference's panic on malformed input
    (main.rs:107): a broken metadata.json fails the job with a nonzero
    exit; --ignore-errors keeps the lenient skip-and-continue path."""
    import pathlib

    broken = pathlib.Path(contract_tree) / "broken_dir"
    broken.mkdir()
    (broken / "metadata.json").write_text('{"ContractName": "Trunc')
    (broken / "main.sol").write_text("contract X {}")
    db = str(tmp_path / "strict.duckdb")

    rc = cli.main(
        ["pre-process", "--contracts-root", contract_tree, "--db-file", db]
    )
    assert rc == 1

    rc = cli.main(
        ["pre-process", "--contracts-root", contract_tree, "--db-file", db,
         "--ignore-errors"]
    )
    assert rc == 0
    con = duckdb.connect(db)
    n = con.execute("SELECT COUNT(*) FROM contract").fetchone()[0]
    con.close()
    assert n >= 5  # lenient path still loads the healthy dirs


def test_cli_strict_mode_fails_on_corrupt_contract_json(spark, contract_tree, tmp_path):
    """A corrupt standard-json CONTAINER must fail strict pre-process up
    front: without the probe it would load fine and only surface at
    index-functions time as silently-zero function rows (the sources
    explode yields null), where the reference errors at its serde parse
    (get_source_files)."""
    import pathlib

    broken = pathlib.Path(contract_tree) / "broken_json_dir"
    broken.mkdir()
    (broken / "metadata.json").write_text('{"ContractName": "B"}')
    (broken / "contract.json").write_text('{"sources": {"a.sol": ')  # truncated
    db = str(tmp_path / "strict_cj.duckdb")

    rc = cli.main(
        ["pre-process", "--contracts-root", contract_tree, "--db-file", db]
    )
    assert rc == 1

    rc = cli.main(
        ["pre-process", "--contracts-root", contract_tree, "--db-file", db,
         "--ignore-errors"]
    )
    assert rc == 0


def test_cli_strict_mode_fails_on_corrupt_etherscan_dump(spark, tmp_path):
    root = tmp_path / "escan"
    addr = "0xdeadbeef00000000000000000000000000000001"
    d = root / addr
    d.mkdir(parents=True)
    (d / f"{addr}.json").write_text('{"ContractName": "nope"')  # truncated
    db = str(tmp_path / "strict_escan.duckdb")
    rc = cli.main(
        ["pre-process", "--etherscan", "--contracts-root", str(root),
         "--db-file", db]
    )
    assert rc == 1


def test_cli_export_missing_contract(tmp_path):
    db = str(tmp_path / "empty.duckdb")
    rc = cli.main(
        ["export-source", "--db-file", db, "--contract-id", "nope",
         "--output-folder", str(tmp_path / "x")]
    )
    assert rc == 1


def test_cli_download_solc_gated():
    rc = cli.main(["download-solc"])
    assert rc in (0, 1)  # 1 in this environment (no solcx)


def test_curate_command_exports_training_shards(spark, tmp_path, capsys):
    """The EXT curate command: documents parquet in, sorted training
    shards out, one-line JSON summary on stdout."""
    import glob
    import json
    import os

    from smart_contract_database_builder_spark.cli import main
    from conftest import SF_SMOKE

    out = str(tmp_path / "shards")
    rc = main([
        "curate",
        "--documents", f"{SF_SMOKE}/documents.parquet",
        "--output", out,
        "--shards", "4",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["kept_docs"] > 0
    assert summary["kept_tokens"] > 0
    shard_dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(shard_dirs) == 4
    back = spark.read.parquet(out)
    assert back.count() == summary["kept_docs"]
    # payload carries the surviving text and the training order
    assert {"doc_id", "text", "lang", "source", "n_tok",
            "shuffle_key", "pos_in_shard"} <= set(back.columns)


def test_curate_jsonl_drops_docid_null_lines(spark, tmp_path, capsys):
    """A valid-JSON line MISSING doc_id is as unusable as a corrupt
    line: the curate command must both COUNT it as malformed and
    actually FILTER it (previously it was reported dropped but only
    disappeared later inside joins on the null key)."""
    import json
    import glob
    import os

    from smart_contract_database_builder_spark.cli import main
    from conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(60)
    lines = [
        json.dumps(
            {k: (v.isoformat() if hasattr(v, "isoformat") else v)
             for k, v in r.asDict().items()}
        )
        for r in docs.collect()
    ]
    lines.insert(3, "{ this is not json")          # corrupt
    lines.insert(7, json.dumps({"text": "no id"}))  # valid JSON, no doc_id
    src = tmp_path / "docs.jsonl"
    src.write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "shards")
    rc = main([
        "curate", "--jsonl",
        "--documents", str(src),
        "--output", out,
        "--shards", "2",
    ])
    assert rc == 0
    captured = capsys.readouterr()
    assert "dropping 2 malformed line(s)" in captured.err
    summary = json.loads(captured.out.strip().splitlines()[-1])
    assert summary["kept_docs"] > 0
    back = spark.read.parquet(out)
    # nothing with a null doc_id survives anywhere in the export
    assert back.filter("doc_id IS NULL").count() == 0
    assert len(glob.glob(os.path.join(out, "shard=*"))) == 2


def test_curate_interleave_order_round_robins_sources(spark, tmp_path, capsys):
    """--order interleave: reading the shards back in (shard, pos)
    order must reproduce the deterministic source round-robin — checked
    EXACTLY against a pandas re-derivation of the same rule."""
    import glob
    import hashlib
    import json
    import os

    from smart_contract_database_builder_spark.cli import main
    from conftest import SF_SMOKE

    out = str(tmp_path / "shards")
    rc = main([
        "curate",
        "--documents", f"{SF_SMOKE}/documents.parquet",
        "--output", out,
        "--shards", "4",
        "--order", "interleave",
    ])
    assert rc == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(glob.glob(os.path.join(out, "shard=*"))) == 4

    back = (
        spark.read.parquet(out)
        .orderBy("shard", "pos_in_shard")
        .select("doc_id", "source")
        .collect()
    )
    got = [(r.doc_id, r.source) for r in back]

    # independent model: rank within source by (md5(seed||id), id),
    # then order by (intra, source, key, id)
    def key(doc_id):
        return hashlib.md5(f"seed42:{doc_id}".encode()).hexdigest()

    rows = [(r.doc_id, r.source) for r in
            spark.read.parquet(out).select("doc_id", "source").collect()]
    by_source: dict = {}
    for d, src in sorted(rows, key=lambda t: (key(t[0]), t[0])):
        by_source.setdefault(src, []).append(d)
    model = []
    for d, src in rows:
        intra = by_source[src].index(d) + 1
        model.append((intra, src, key(d), d))
    model.sort()
    want = [(d, src) for _, src, _, d in model]
    assert got == want
    # the head of the order cycles through distinct sources
    n_src = len(by_source)
    head = [s for _, s in got[:n_src]]
    assert len(set(head)) == n_src


def test_analyze_emits_corpus_profile(spark, capsys):
    """EXT `analyze`: one JSON object composing the report operators —
    languages/sources enumerated, envelopes ordered, pass rate in
    (0, 1]."""
    import json

    rc = cli.main(["analyze", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["lang"] for r in out["length_by_lang"]}
    assert {r["source"] for r in out["dup_rate_by_source"]}
    for key in ("entropy_nats", "surprisal_nats"):
        env = out[key]
        assert env["min"] <= env["mean"] <= env["max"]
    g = out["gopher"]
    assert 0 < g["docs"] and 0 <= g["kept"] <= g["docs"]
    assert g["pass_rate"] is not None


def test_analyze_profiles_jsonl_corpus(spark, tmp_path, capsys):
    """`analyze --jsonl`: the same profile over a JSONL corpus,
    malformed lines excluded before profiling."""
    import json

    lines = [
        json.dumps({"doc_id": i, "text": f"alpha beta gamma doc{i}",
                    "lang": "en", "source": "s1", "n_chars": 20})
        for i in range(30)
    ] + ["{not json", json.dumps({"text": "no id"})]
    path = tmp_path / "corpus.jsonl"
    path.write_text("\n".join(lines))

    rc = cli.main(["analyze", "--jsonl", str(path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["gopher"]["docs"] == 30  # malformed + id-less excluded
    assert {r["lang"] for r in out["length_by_lang"]} == {"en"}
    # the scratch parquet copy of the corpus must not leak (ADVICE r6)
    import glob
    import tempfile

    assert glob.glob(f"{tempfile.gettempdir()}/analyze_jsonl_*") == []


def test_analyze_requires_a_source_flag(capsys):
    """`analyze` with neither --sf-dir nor --jsonl must fail at the
    parser with a usage error (exit 2), not an opaque traceback from
    load_table(None) (ADVICE r6)."""
    import pytest

    with pytest.raises(SystemExit) as ei:
        cli.main(["analyze"])
    assert ei.value.code == 2
    assert "--sf-dir" in capsys.readouterr().err


def test_curate_readability_band_drops_docs(spark, tmp_path, capsys):
    """`curate --min-flesch/--max-flesch`: the v2 readability stage is
    reachable from the CLI, and a band must keep a strict subset of the
    unbanded run's documents."""
    import glob
    import os

    out_all = str(tmp_path / "all")
    rc = cli.main([
        "curate", "--documents", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_all, "--shards", "2",
    ])
    assert rc == 0
    out_band = str(tmp_path / "band")
    rc = cli.main([
        "curate", "--documents", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_band, "--shards", "2",
        "--min-flesch", "0", "--max-flesch", "80",
    ])
    assert rc == 0

    def _ids(path):
        files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        df = spark.read.parquet(*files) if files else None
        return {r["doc_id"] for r in df.select("doc_id").collect()} if df is not None else set()

    a, b = _ids(out_all), _ids(out_band)
    assert b and b < a
