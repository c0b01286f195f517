"""Physical-plan regression tests: the perf properties PERF.md claims
must survive refactors (pushdown, pruning, broadcast, window-limit)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def em():
    import __spark_entry__ as entrymod

    return entrymod


def test_filter_pushdown_and_pruning(spark, em):
    plan = _plan(spark, em.q_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # exactly the needed columns reach the scan — no full-width read
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }


def test_dim_joins_broadcast(spark, em):
    plan = _plan(spark, em.q_region_revenue(spark, SF))
    # formatted mode lists each node in the tree and in the details
    assert plan.count("BroadcastHashJoin") == 6
    assert "SortMergeJoin" not in plan


def test_semi_and_anti_join_strategies(spark, em):
    assert "LeftSemi" in _plan(spark, em.q_semi_join(spark, SF))
    assert "LeftAnti" in _plan(spark, em.q_anti_join(spark, SF))


def test_window_group_limit(spark, em):
    # Spark 4 pushes rank<=k into the window sort
    assert "WindowGroupLimit" in _plan(spark, em.q_topk_per_group(spark, SF))


def test_ann_corpus_not_shuffled(spark, em):
    plan = _plan(spark, em.q_ann_brute_topk(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan  # queries broadcast
    assert "WindowGroupLimit" in plan  # per-query top-k limited


def test_pipeline_no_cartesian(spark, transcripts, lexicon):
    from kgflow.plans import pipeline as P

    terms, isa = lexicon
    triples = P.build_triples(transcripts, terms, isa)
    plan = _plan(spark, triples)
    assert "CartesianProduct" not in plan
