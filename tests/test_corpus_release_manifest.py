"""The corpus-release capstone (`corpus_release_manifest`): exact
dedup → benchmark 8-gram decontamination → token-count gate →
hash-deterministic per-language quota → release manifest, every stage
a certified operator, the CHAIN certified here (VERDICT r06 #6).
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect


def test_corpus_release_registry_parity(spark):
    from yougile_etl_pipeline_spark.registry import ORACLES, QUERIES

    con = duck_connect(SF_SMOKE)
    issues = compare(QUERIES["corpus_release_manifest"](spark, SF_SMOKE),
                     con, ORACLES["corpus_release_manifest"])
    assert not issues, issues


def test_corpus_release_plan_shape(spark):
    """100 TB plan pins: the benchmark-gram side rides a broadcast
    hash join (the corpus gram stream must never shuffle for the
    contamination check), the decontam subtraction is a left-anti
    join, and no cartesian/nested-loop appears anywhere in the
    chain."""
    from yougile_etl_pipeline_spark.registry import QUERIES

    df = QUERIES["corpus_release_manifest"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan           # bench grams broadcast
    assert "LeftAnti" in plan                    # decontam subtraction
    # Per-language quota is the TWO-PHASE top-k (VERDICT r07 #1): the
    # partition-local mapInPandas combiner must sit in the plan so no
    # task ever sorts a whole language's corpus — the phase-2 window
    # only ranks the <= |langs|*k*partitions survivors.
    assert "MapInPandas" in plan                 # quota combiner phase


def test_corpus_release_quota_and_gate_hold(spark):
    """Release invariants a 100 TB run would be audited on: no
    language exceeds its quota in DOC COUNT (manifest rows split per
    source), every doc counted passed the token gate (total_tokens >=
    5 * n_docs), and no benchmark source appears."""
    from yougile_etl_pipeline_spark.registry import QUERIES

    m = QUERIES["corpus_release_manifest"](spark, SF_SMOKE).collect()
    per_lang: dict[str, int] = {}
    for r in m:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_docs"]
        assert r["source"] not in ("src0", "src1")
        assert r["total_tokens"] >= 5 * r["n_docs"]
    assert per_lang and all(n <= 30 for n in per_lang.values()), per_lang
