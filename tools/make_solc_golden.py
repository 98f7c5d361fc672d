"""Generate the real-solc golden fixture (U1/U2 closure; VERDICT r13 #3).

This sandbox has no solc binary and no network, so the one genuinely
external stage — a real solc compile (reference
src/plain_contract.rs:327-377) — cannot be exercised here. This script
is the missing half: run it ONCE on any host with ``solc`` (>= 0.8.19)
on PATH (or ``SOLC=/path/to/solc``), commit the file it writes, and
``tests/test_solc_golden.py`` switches from skip to active — asserting
the dependency-free scanner and the U2 AST slicer reproduce the
function rows byte-for-byte against solc's OWN AST, including the
reference's documented inherited-member / getter miss semantics
(plain_contract.rs:454-456, asserted by its golden test at :542-576).

Usage (on the solc-bearing host, from the repo root):

    python tools/make_solc_golden.py          # writes output.json
    git add tests/fixtures/solc_golden/output.json && git commit

The standard-json request mirrors the reference's compile() call:
ast + abi output for every source, no optimizer (slices are source
bytes; codegen settings are irrelevant to the AST src offsets).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

FIXTURE = pathlib.Path(__file__).resolve().parent.parent / (
    "tests/fixtures/solc_golden"
)


def main() -> int:
    solc = os.environ.get("SOLC", "solc")
    sources = {
        p.name: {"content": p.read_text()}
        for p in sorted((FIXTURE / "input").glob("*.sol"))
    }
    if not sources:
        print("no .sol inputs under tests/fixtures/solc_golden/input",
              file=sys.stderr)
        return 2
    request = {
        "language": "Solidity",
        "sources": sources,
        "settings": {
            "outputSelection": {"*": {"*": ["abi"], "": ["ast"]}},
        },
    }
    try:
        proc = subprocess.run(
            [solc, "--standard-json"],
            input=json.dumps(request),
            capture_output=True,
            text=True,
            check=True,
        )
    except FileNotFoundError:
        print(
            f"solc binary not found ({solc!r}); install solc >= 0.8.19 or "
            "set SOLC=/path/to/solc",
            file=sys.stderr,
        )
        return 2
    out = json.loads(proc.stdout)
    errors = [
        e for e in out.get("errors", []) if e.get("severity") == "error"
    ]
    if errors:
        print(json.dumps(errors, indent=2), file=sys.stderr)
        return 1
    version = subprocess.run(
        [solc, "--version"], capture_output=True, text=True, check=True
    ).stdout.strip().splitlines()[-1]
    golden = {"solc_version": version, "request": request, "output": out}
    target = FIXTURE / "output.json"
    target.write_text(json.dumps(golden, indent=1, sort_keys=True))
    n_asts = sum(1 for s in out.get("sources", {}).values() if "ast" in s)
    print(f"wrote {target} ({version}; {n_asts} source ASTs) — commit it "
          "to activate tests/test_solc_golden.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
