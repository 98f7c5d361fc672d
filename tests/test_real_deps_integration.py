"""Skip-if-absent integration tests for the two import-gated real
paths: solc compilation (py-solc-x) and image codecs (Pillow).

This environment pins its package set, so these SKIP here — but the day
an environment carries the packages, the real paths light up and get
asserted against the same goldens the dependency-free stand-ins pass:

- real solc: ``compile_standard_json`` (reference
  plain_contract.rs:327-377 semantics) must produce an AST from which
  ``function_source_from_ast`` slices the exact bytes the scanner
  slices, and an ABI listing the same external members.
- real codecs: ``extract_image_features(use_codec=True)`` and
  ``resize_images(use_codec=True)`` must decode real PNG payloads and
  report pixel-true dims/statistics through the identical Arrow stage.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DEMO = "/root/reference/contracts/demo"


# ---------------------------------------------------------------------------
# Real solc (py-solc-x) — U1/S12/U2 active path
# ---------------------------------------------------------------------------


@pytest.mark.skipif(
    not os.path.isdir(_DEMO), reason="reference fixtures not available"
)
def test_real_solc_ast_slice_matches_scanner_golden():
    solcx = pytest.importorskip("solcx")
    from smart_contract_database_builder_spark.compilestage.solidity import (
        extract_file_functions,
        function_source_from_ast,
    )
    from smart_contract_database_builder_spark.compilestage.stage import (
        compile_standard_json,
    )

    version = "0.8.19"  # demo metadata.json CompilerVersion
    try:
        solcx.install_solc(version)
    except Exception as e:  # no network / arch unsupported
        pytest.skip(f"solc {version} not installable here: {e}")

    sources = {
        fn: {"content": open(f"{_DEMO}/{fn}", encoding="utf-8").read()}
        for fn in os.listdir(_DEMO)
        if fn.endswith(".sol")
    }
    std = {
        "language": "Solidity",
        "sources": sources,
        "settings": {
            "outputSelection": {"*": {"*": ["abi"], "": ["ast"]}}
        },
    }
    out = compile_standard_json(json.dumps(std), version)

    counter_src = sources["Counter.sol"]["content"]
    ast = out["sources"]["Counter.sol"]["ast"]

    # The AST slice of Counter.decrement must equal the scanner's slice
    # (which the reference golden plain_contract.rs:560-563 pins).
    scanner = {
        f.function_name: f for f in extract_file_functions(counter_src)
    }
    sliced = function_source_from_ast(counter_src, ast, "Counter", "decrement")
    assert sliced == scanner["decrement"].source_code

    # The compiled ABI's external functions == the scanner's member view
    # for Counter (increment/decrement/getCount + the count getter).
    abi = out["contracts"]["Counter.sol"]["Counter"]["abi"]
    abi_fns = {e["name"] for e in abi if e.get("type") == "function"}
    assert abi_fns == set(scanner)


def test_solc_gate_raises_cleanly_when_absent():
    """The inactive path must fail loudly, not wrongly: without solcx
    the compile entry raises NotImplementedError (the scanner is the
    documented fallback), never a silent empty result."""
    from smart_contract_database_builder_spark.compilestage import stage

    if stage.solcx is not None:
        pytest.skip("solcx installed — gate inactive")
    with pytest.raises(NotImplementedError):
        stage.compile_standard_json("{}", "0.8.19")


# ---------------------------------------------------------------------------
# Real image codec (Pillow) — U4 active path
# ---------------------------------------------------------------------------


def _real_png_corpus(spark, n: int = 6):
    """Media rows whose payloads are REAL encoded PNGs (solid-color
    images of varying dims) — only constructible when Pillow exists."""
    import io

    from PIL import Image

    from smart_contract_database_builder_spark.sources.multimodal import (
        MEDIA_SCHEMA,
    )

    rows = []
    for i in range(n):
        w, h = 8 + 4 * i, 6 + 2 * i
        img = Image.new("L", (w, h), color=(i * 40) % 256)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append(
            (
                i,
                "image",
                buf.getvalue(),
                {
                    "width": w,
                    "height": h,
                    "sample_rate": None,
                    "duration_ms": None,
                    "format": "png",
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_real_codec_image_features(spark):
    pytest.importorskip("PIL")
    from smart_contract_database_builder_spark.sources.multimodal import (
        extract_image_features,
    )

    media = _real_png_corpus(spark)
    rows = {
        r["media_id"]: r
        for r in extract_image_features(media, use_codec=True).collect()
    }
    assert len(rows) == 6
    for i, r in rows.items():
        # dims from ACTUAL pixels, not metadata
        assert (r["width"], r["height"]) == (8 + 4 * i, 6 + 2 * i)
        # solid-color image: mean pixel == the fill color exactly
        assert r["mean_byte"] == pytest.approx((i * 40) % 256)


def test_real_codec_resize_roundtrip(spark):
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from smart_contract_database_builder_spark.sources.multimodal import (
        resize_images,
    )

    media = _real_png_corpus(spark)
    rows = resize_images(media, 16, 12, use_codec=True).collect()
    assert len(rows) == 6
    for r in rows:
        back = Image.open(io.BytesIO(bytes(r["data"])))
        assert back.size == (16, 12)  # re-decodable real PNG at target dims
        assert (r["src_width"], r["src_height"]) == (
            8 + 4 * r["media_id"],
            6 + 2 * r["media_id"],
        )
