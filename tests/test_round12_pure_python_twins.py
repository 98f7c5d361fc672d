"""Pure-Python third implementations of three round-12 operators.

The DuckDB oracle is a second implementation of each operator; these
driver-side recomputations from the RAW parquet are a third, written
against the operator's DEFINITION rather than its SQL — a same-bug in
the shared SQL shape cannot survive all three agreeing. Run at
sf0.001 so the Python side stays honest about being a reference, not
a path.
"""

from __future__ import annotations

import collections
import hashlib
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

#: Java-regex-\s-compatible whitespace (the engines tokenize with
#: Java/RE2 \s; Python's re is unicode-aware by default, so the class
#: is spelled out).
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_tokens(text: str) -> list[str]:
    return _WS.split(text.strip().lower())


def _docs(spark):
    return [
        (r.doc_id, r.source, r.text)
        for r in load_table(spark, SF, "documents").collect()
    ]


def test_heaps_law_pure_python_twin(spark):
    counts: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for _doc, source, text in _docs(spark):
        counts[source].update(_py_tokens(text))
    got = {
        r.source: r
        for r in plans.QUERIES["llm_heaps_law_by_source"].fn(spark, SF).collect()
    }
    assert set(got) == set(counts)
    for source, c in counts.items():
        n, v = sum(c.values()), len(c)
        hapax = sum(1 for x in c.values() if x == 1)
        r = got[source]
        assert (r.n_tokens, r.n_types, r.n_hapax) == (n, v, hapax), source
        assert r.heaps_beta == math.log(v) / math.log(n)


def test_bloom_dedup_audit_pure_python_twin(spark):
    K, HEX = 3, 4

    def key(text: str) -> str:
        canon = _WS.sub(" ", text.strip().lower())
        return hashlib.md5(canon.encode()).hexdigest()

    def positions(k: str):
        return {
            hashlib.md5(f"{k}#{i}".encode()).hexdigest()[:HEX]
            for i in range(K)
        }

    docs = _docs(spark)
    existing = [(d, s, key(t)) for d, s, t in docs if d % 2 == 0]
    incoming = [(d, s, key(t)) for d, s, t in docs if d % 2 == 1]
    bits = set().union(*(positions(k) for _, _, k in existing))
    existing_keys = {k for _, _, k in existing}
    per = collections.defaultdict(lambda: [0, 0, 0, 0])  # new/rej/dup/fp
    for _d, s, k in incoming:
        rejected = positions(k) <= bits
        dup = k in existing_keys
        row = per[s]
        row[0] += 1
        row[1] += rejected
        row[2] += dup
        row[3] += rejected and not dup
    got = {
        r.source: r
        for r in plans.QUERIES["llm_bloom_dedup_audit"].fn(spark, SF).collect()
    }
    assert set(got) == set(per)
    for s, (n, rej, dup, fp) in per.items():
        r = got[s]
        assert (r.n_new, r.n_rejected, r.n_true_dup, r.n_false_positive) == (
            n,
            rej,
            dup,
            fp,
        ), s


def test_js_divergence_pure_python_twin(spark):
    LN2_MICRO = 693_147
    counts: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for _d, source, text in _docs(spark):
        counts[source].update(_py_tokens(text))
    totals = {s: sum(c.values()) for s, c in counts.items()}
    got = {
        (r.source_a, r.source_b): r
        for r in plans.QUERIES["llm_js_divergence_source_pairs"]
        .fn(spark, SF)
        .collect()
    }
    for sa in counts:
        for sb in counts:
            if not sa < sb:
                continue
            ca, cb = counts[sa], counts[sb]
            na, nb = totals[sa], totals[sb]
            shared = set(ca) & set(cb)
            if not shared:
                assert (sa, sb) not in got
                continue
            sa_mic = sum(
                ca[t]
                * math.floor(
                    math.log(2 * ca[t] * nb / (ca[t] * nb + cb[t] * na))
                    * 1_000_000
                )
                for t in shared
            )
            sb_mic = sum(
                cb[t]
                * math.floor(
                    math.log(2 * cb[t] * na / (ca[t] * nb + cb[t] * na))
                    * 1_000_000
                )
                for t in shared
            )
            ca_sum = sum(ca[t] for t in shared)
            cb_sum = sum(cb[t] for t in shared)
            js = 0.5 * (
                (sa_mic + (na - ca_sum) * LN2_MICRO) / (na * 1_000_000.0)
                + (sb_mic + (nb - cb_sum) * LN2_MICRO) / (nb * 1_000_000.0)
            )
            r = got[(sa, sb)]
            assert r.n_shared_terms == len(shared), (sa, sb)
            assert abs(r.js_nats - js) < 1e-12, (sa, sb)


def test_bloom_oracle_subset_semantics_under_self_collision():
    """The oracle's rejection test must use SUBSET semantics (every
    probe position set), not a matched-row COUNT(*)=k — the two
    diverge when a key's k md5-prefix positions self-collide. With
    the production 16^4-slot geometry a collision is ~4.6e-5/doc
    (absent from the checked-in corpora), so this pins the ORACLE
    EXPRESSION SHAPE at a shrunken 16-slot geometry (HEX=1) where
    collisions are common, against Python subset semantics."""
    import duckdb

    K, HEX = 3, 1

    def pos_sql(key: str, i: int) -> str:
        return f"substr(md5({key} || '#{i}'), 1, {HEX})"

    keys = [f"key-{i}" for i in range(400)]
    existing, incoming = keys[::2], keys[1::2]

    def positions(k: str):
        return {
            hashlib.md5(f"{k}#{i}".encode()).hexdigest()[:HEX] for i in range(K)
        }

    # the shrunken geometry must actually exercise the collision path
    assert any(len(positions(k)) < K for k in incoming)

    bits = set().union(*(positions(k) for k in existing))
    want = {k: positions(k) <= bits for k in incoming}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE existing AS SELECT * FROM (VALUES %s) t(k)"
        % ", ".join(f"('{k}')" for k in existing)
    )
    con.execute(
        "CREATE TABLE incoming AS SELECT * FROM (VALUES %s) t(k)"
        % ", ".join(f"('{k}')" for k in incoming)
    )
    rejected_expr = " AND ".join(
        f"{pos_sql('n.k', i)} IN (SELECT pos FROM bits)" for i in range(K)
    )
    got = dict(
        con.execute(
            f"""
            WITH bits AS (
              SELECT DISTINCT pos FROM existing, UNNEST([{
                ", ".join(pos_sql("k", i) for i in range(K))
              }]) AS t(pos)
            )
            SELECT n.k, {rejected_expr} AS rejected FROM incoming n
            """
        ).fetchall()
    )
    assert got == want
    # and the COUNT(*)-of-matched-bits formulation the oracle moved
    # away from really does diverge on the colliding keys
    colliding = [k for k in incoming if len(positions(k)) < K]
    count_form = dict(
        con.execute(
            f"""
            WITH bits AS (
              SELECT DISTINCT pos FROM existing, UNNEST([{
                ", ".join(pos_sql("k", i) for i in range(K))
              }]) AS t(pos)
            )
            SELECT n.k,
                   (SELECT COUNT(*) FROM bits b WHERE b.pos IN ({
                     ", ".join(pos_sql("n.k", i) for i in range(K))
                   })) = {K} AS rejected
            FROM incoming n
            """
        ).fetchall()
    )
    assert any(count_form[k] != want[k] for k in colliding if want[k])
