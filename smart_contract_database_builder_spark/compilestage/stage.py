"""The compile/extract Spark stage (SURVEY.md U1/U3, §3.2).

The reference's ``index-functions`` entry point pages contracts out of
storage, compiles each with solc in a spawned task, and extracts ABI
function rows (reference src/main.rs:273-331). The Spark shape is:

    contracts DF → filter(≠vyper)           # P6, BEFORE the costly stage
                → mapInPandas(extract)       # Arrow-batched Python stage
                → dropDuplicates("id")       # INSERT OR IGNORE (db.rs:208)

``mapInPandas`` is the right tool for the one irreducibly-external step:
Arrow moves columns to Python in batches (not per row), each partition
runs independently on its executor, and stragglers (huge contracts) are
handled by Spark's normal task machinery — mirroring the reference's
task-per-contract parallelism without a driver-side loop.

Real solc compilation (via py-solc-x) is gated behind an import: when
available, ``compile_standard_json`` invokes solc with AST output and
the U2 AST slicer takes over; in this environment it is NOT installed,
so the dependency-free scanner in ``solidity.py`` provides the
deterministic extraction path (same row shape, byte-exact slices).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import FUNCTION_SCHEMA
from .solidity import extract_file_functions

try:  # pragma: no cover - not installed in this environment
    import solcx  # type: ignore
except ImportError:
    solcx = None


def compile_standard_json(standard_json: str, version: str) -> dict:
    """U1: run real solc on a standard-json input with AST output
    enabled (reference src/plain_contract.rs:327-377). Requires
    py-solc-x + a solc binary on the executor."""
    if solcx is None:
        raise NotImplementedError(
            "py-solc-x is not installed; the extraction stage uses the "
            "dependency-free Solidity scanner instead (solidity.py)"
        )
    solcx.install_solc(version)  # cached per executor after first call
    return solcx.compile_standard(json.loads(standard_json), solc_version=version)


def _function_rows(contract_id: str, files: list[dict]) -> Iterator[tuple]:
    for f in files:
        name, content = f.get("filename") or f.get("name"), f.get("content")
        if not name or content is None:
            continue
        if name.endswith(".json"):
            # standard-json container (source_type 'json'): extract from
            # its embedded sources map
            try:
                std = json.loads(content)
                inner = [
                    {"name": path, "content": entry.get("content", "")}
                    for path, entry in (std.get("sources") or {}).items()
                ]
            except (ValueError, AttributeError):
                continue
            yield from _function_rows(contract_id, inner)
            continue
        if not name.endswith(".sol"):
            continue
        for fn in extract_file_functions(content):
            # F4: md5(contract_id ‖ filename ‖ selector) — functions.rs:31
            fid = hashlib.md5(
                (contract_id + name + fn.selector).encode()
            ).hexdigest()
            yield (
                fid,
                contract_id,
                fn.contract_name,
                fn.function_name,
                name,
                fn.signature,
                fn.selector,
                fn.source_code,
            )


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in FUNCTION_SCHEMA.fields]
    for pdf in batches:
        rows = [
            row
            for contract_id, files_json in zip(pdf["id"], pdf["files_json"])
            for row in _function_rows(contract_id, json.loads(files_json))
        ]
        yield pd.DataFrame(rows, columns=cols)


def extract_functions(contracts: DataFrame) -> DataFrame:
    """U3: contracts (id, source_type, files array) → deduped function
    rows in the reference's ``function`` table shape (db.rs:74-84).

    The vyper filter sits BEFORE the Python stage so Catalyst never
    ships skipped rows across the Arrow boundary (main.rs:298-300).
    """
    packed = contracts.filter(F.col("source_type") != "vyper").select(
        "id", F.to_json("files").alias("files_json")
    )
    extracted = packed.mapInPandas(_extract_batches, schema=FUNCTION_SCHEMA)
    # conflict-ignore dedup (db.rs:208): two contracts in one file
    # sharing a selector collide on id; first wins, rest drop
    return extracted.dropDuplicates(["id"])
