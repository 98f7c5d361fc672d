"""Unicode-whitespace hash parity (property-based).

The reference normalizes with Rust's ``\\s`` (Unicode White_Space); a
naive Java/RE2 ``\\s`` is ASCII-only and would hash any source
containing a no-break space differently from the reference. The engine
uses an explicit White_Space class on all three surfaces — this test
drives Spark, DuckDB, and Python over hypothesis-generated strings
(seeded with every White_Space code point) and requires identical ids.
"""

from __future__ import annotations

import hashlib
import re

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from smart_contract_database_builder_spark.sources import contracts as C

_WS_CHARS = (
    "\t\n\x0b\x0c\r \x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)

_corpus = st.lists(
    st.text(
        alphabet=st.one_of(
            st.sampled_from(_WS_CHARS),
            st.characters(min_codepoint=33, max_codepoint=0x2FFF),
        ),
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


def _py_id(s: str) -> str:
    return hashlib.md5(re.sub(C.PY_WS_PATTERN, "", s).encode()).hexdigest()


def test_every_whitespace_char_is_stripped_everywhere(spark):
    """Each White_Space code point, surrounded by letters, must strip
    to the same id on Spark, DuckDB, and Python."""
    samples = [f"a{ch}b{ch} c" for ch in _WS_CHARS]
    _assert_three_way(spark, samples)


@settings(max_examples=10, deadline=None)
@given(_corpus)
def test_random_unicode_strings_hash_identically(spark, samples):
    _assert_three_way(spark, samples)


def _assert_three_way(spark, samples):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i int, s string")
    got = {
        r["i"]: r["cid"]
        for r in df.select("i", C.contract_id("s").alias("cid")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        expect = _py_id(s)
        assert got[i] == expect, f"spark≠python for {samples[i]!r}"
        duck = con.execute(
            "SELECT md5(regexp_replace(?, ?, '', 'g'))",
            [s, C.SQL_WS_PATTERN],
        ).fetchone()[0]
        assert duck == expect, f"duckdb≠python for {samples[i]!r}"
    con.close()
