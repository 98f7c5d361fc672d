"""In-memory contract corpus fixture (FIXTURES.md Group B).

A small, deterministic corpus exercising every ingestion layout the
reference resolves (reference src/plain_contract.rs:284-320):

- ``contract.json`` (solc standard-json) → source_type ``json``
- ``main.sol``                           → ``single_sol``
- ``main.vy``                            → ``vyper``
- multiple ``*.sol``                     → ``multi_sol``

plus Etherscan-API-shaped JSON rows for the S2/S4 path (reference
src/plain_contract.rs:38-50, 252-281): double-brace-wrapped standard
json, bare standard json, and a raw-Solidity fallback.

All contract sources here are original fixture content written for this
engine's tests (the reference's own fixtures are not copied). The same
rows are exposed twice: as a Spark DataFrame (``*_df``) and as a DuckDB
``VALUES`` relation (``*_values_sql``) so the driver's oracle can
compute the identical result from the identical input.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Folder-layout corpus: (dir, filename, content)
# ---------------------------------------------------------------------------

_TALLY_SOL = """// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

import "./SafeTallyLib.sol";
import "./ITally.sol";

contract Tally is ITally {
    using SafeTallyLib for uint256;

    uint256 public total;

    function bump() public override {
        total = total.inc(1);
    }

    function drop() public override {
        total = total.dec(1);
    }
}
"""

_SAFE_TALLY_LIB_SOL = """// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

library SafeTallyLib {
    function inc(uint256 a, uint256 b) internal pure returns (uint256) {
        return a + b;
    }

    function dec(uint256 a, uint256 b) internal pure returns (uint256) {
        require(a >= b, "tally: underflow");
        return a - b;
    }
}
"""

_ITALLY_SOL = """// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

interface ITally {
    function bump() external;

    function drop() external;
}
"""

_VAULT_SOL = """// SPDX-License-Identifier: MIT
pragma solidity ^0.8.20;

contract Vault {
    mapping(address => uint256) public balances;

    function deposit() public payable {
        balances[msg.sender] += msg.value;
    }

    function withdraw(uint256 amount) public {
        require(balances[msg.sender] >= amount, "vault: insufficient");
        balances[msg.sender] -= amount;
        payable(msg.sender).transfer(amount);
    }
}
"""

# Whitespace variant of _VAULT_SOL: same tokens, different spacing — must
# hash to the SAME id (reference src/utils.rs:12-17 strips all whitespace).
_VAULT_SOL_WS_VARIANT = _VAULT_SOL.replace("\n", "\n\n").replace("    ", "\t")

_POOL_VY = """# @version ^0.3.7

pool_total: public(uint256)

@external
def add_liquidity(amount: uint256):
    self.pool_total += amount
"""

_WRAPPED_SOL = """// SPDX-License-Identifier: MIT
pragma solidity ^0.8.18;

contract Wrapped {
    string public name = "Wrapped Token";

    function unwrap(uint256 amount) public pure returns (uint256) {
        return amount;
    }
}
"""

_IWRAPPED_SOL = """// SPDX-License-Identifier: MIT
pragma solidity ^0.8.18;

interface IWrapped {
    function unwrap(uint256 amount) external pure returns (uint256);
}
"""

_GATE_SOL = """// SPDX-License-Identifier: MIT
pragma solidity ^0.8.21;

contract BridgeGate {
    address public guardian;

    constructor() {
        guardian = msg.sender;
    }

    function open(bytes32 proof) public view returns (bool) {
        return proof != bytes32(0) && msg.sender == guardian;
    }
}
"""

_CRLF_SOL = (
    "// SPDX-License-Identifier: MIT\r\n"
    "pragma solidity ^0.8.19;\r\n"
    "\r\n"
    "contract CrLf {\r\n"
    "    uint256 public x;\r\n"
    "}\r\n"
)


def _meta(name: str, version: str, runs: int = 200, opt: bool = False) -> str:
    return json.dumps(
        {
            "ContractName": name,
            "CompilerVersion": version,
            "Runs": runs,
            "OptimizationUsed": opt,
            "BytecodeHash": "ipfs",
        }
    )


def _standard_json(sources: dict[str, str]) -> str:
    return json.dumps(
        {
            "language": "Solidity",
            "sources": {path: {"content": content} for path, content in sources.items()},
            "settings": {"optimizer": {"enabled": True, "runs": 200}},
        }
    )


#: (dir, filename, content) — the S1/S3 folder-scan corpus.
CONTRACT_FILES: list[tuple[str, str, str]] = [
    # multi_sol: three .sol files + a non-.sol file that must be excluded
    ("demo_multi", "metadata.json", _meta("Tally", "v0.8.19+commit.7dd6d404")),
    ("demo_multi", "Tally.sol", _TALLY_SOL),
    ("demo_multi", "SafeTallyLib.sol", _SAFE_TALLY_LIB_SOL),
    ("demo_multi", "ITally.sol", _ITALLY_SOL),
    ("demo_multi", "README.md", "Tally demo contract bundle.\n"),
    # single_sol
    ("demo_single", "metadata.json", _meta("Vault", "v0.8.20+commit.a1b79dfb")),
    ("demo_single", "main.sol", _VAULT_SOL),
    # whitespace-variant duplicate of demo_single — same content id
    ("demo_single_dup", "metadata.json", _meta("Vault", "v0.8.20+commit.a1b79dfb")),
    ("demo_single_dup", "main.sol", _VAULT_SOL_WS_VARIANT),
    # vyper
    ("demo_vyper", "metadata.json", _meta("LiquidityPool", "vyper:0.3.7")),
    ("demo_vyper", "main.vy", _POOL_VY),
    # json (solc standard-json in contract.json)
    ("demo_json", "metadata.json", _meta("Wrapped", "v0.8.18+commit.87f61d96")),
    (
        "demo_json",
        "contract.json",
        _standard_json(
            {"src/Wrapped.sol": _WRAPPED_SOL, "src/IWrapped.sol": _IWRAPPED_SOL}
        ),
    ),
    # CRLF line endings (F13 normalize target)
    ("demo_crlf", "metadata.json", _meta("CrLf", "v0.8.19+commit.7dd6d404")),
    ("demo_crlf", "main.sol", _CRLF_SOL),
    # orphan dir without metadata.json — S1 must drop it
    ("orphan_dir", "Orphan.sol", "contract Orphan {}\n"),
]

CONTRACT_FILES_SCHEMA = T.StructType(
    [
        T.StructField("dir", T.StringType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Etherscan-API corpus: (address, content) — one JSON file per address
# ---------------------------------------------------------------------------


def _etherscan_row(
    source_code: str, name: str, version: str, runs: str, opt: str
) -> str:
    return json.dumps(
        {
            "SourceCode": source_code,
            "OptimizationUsed": opt,
            "Runs": runs,
            "ContractName": name,
            "CompilerVersion": version,
        }
    )


_WRAPPED_STD_JSON = _standard_json(
    {"src/Wrapped.sol": _WRAPPED_SOL, "src/IWrapped.sol": _IWRAPPED_SOL}
)

ETHERSCAN_FILES: list[tuple[str, str]] = [
    # (a) double-brace-wrapped standard json (plain_contract.rs:258-263)
    (
        "0xaaaa00000000000000000000000000000000aa01",
        _etherscan_row(
            "{" + _WRAPPED_STD_JSON + "}", "Wrapped", "v0.8.18+commit.87f61d96",
            "200", "1",
        ),
    ),
    # (b) bare standard json
    (
        "0xbbbb00000000000000000000000000000000bb02",
        _etherscan_row(
            _standard_json({"contracts/Tally.sol": _TALLY_SOL,
                            "contracts/SafeTallyLib.sol": _SAFE_TALLY_LIB_SOL,
                            "contracts/ITally.sol": _ITALLY_SOL}),
            "Tally", "v0.8.19+commit.7dd6d404", "500", "1",
        ),
    ),
    # (c) raw Solidity fallback (plain_contract.rs:273-280); lenient Runs=""
    (
        "0xcccc00000000000000000000000000000000cc03",
        _etherscan_row(_GATE_SOL, "BridgeGate", "v0.8.21+commit.d9974bed", "", "0"),
    ),
]

ETHERSCAN_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# DataFrame / SQL-VALUES adapters
# ---------------------------------------------------------------------------


def contract_files_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(CONTRACT_FILES, CONTRACT_FILES_SCHEMA)


def etherscan_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ETHERSCAN_FILES, ETHERSCAN_SCHEMA)


def _sql_str(s: str) -> str:
    """SQL single-quoted literal (DuckDB standard strings: no backslash
    escapes, so only the quote needs doubling; newlines embed raw)."""
    return "'" + s.replace("'", "''") + "'"


def contract_files_values_sql(alias: str = "files") -> str:
    """The corpus as a DuckDB ``(VALUES ...) alias(dir, filename, content)``."""
    rows = ",\n".join(
        f"({_sql_str(d)}, {_sql_str(f)}, {_sql_str(c)})"
        for d, f, c in CONTRACT_FILES
    )
    return f"(VALUES\n{rows}) AS {alias}(dir, filename, content)"


def etherscan_values_sql(alias: str = "escan") -> str:
    rows = ",\n".join(
        f"({_sql_str(a)}, {_sql_str(c)})" for a, c in ETHERSCAN_FILES
    )
    return f"(VALUES\n{rows}) AS {alias}(address, content)"
