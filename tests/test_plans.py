"""Physical-plan quality gates: the 100 TB properties (pushdown, column
pruning, broadcast choice, true top-k) asserted against `.explain` output
so a regression in plan shape fails CI even while results stay correct."""

import pytest

from tests.conftest import SF_DIR


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def queries(entry_mod):
    return entry_mod.queries()


def test_agg_scan_prunes_columns(spark, queries):
    # revenue_by_flag touches 6 lineitem columns; the scan must not read
    # the rest (l_comment is the fat one).
    plan = plan_of(queries["revenue_by_flag"](spark, SF_DIR))
    assert "l_comment" not in plan
    assert "l_partkey" not in plan


def test_lang_filter_pushed_to_scan(spark, queries):
    plan = plan_of(queries["ingest_tagged_records"](spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "EqualTo(lang,en)" in plan.replace(" ", "").replace("'", "")


def test_dim_join_broadcasts(spark, queries):
    plan = plan_of(queries["customers_per_region"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_topk_is_take_ordered_not_global_sort(spark, queries):
    plan = plan_of(queries["word_freq_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_having_join_preaggregates_lineitem(spark, queries):
    # The lineitem side must be aggregated before the orders join so the
    # shuffle moves per-order rows, not per-lineitem rows.
    plan = plan_of(queries["order_revenue_having"](spark, SF_DIR))
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    # the query has no post-join aggregate, so any HashAggregate in the
    # plan is the pre-join lineitem rollup
    assert "HashAggregate" in plan


def test_exact_dedup_no_python_in_path(spark, queries):
    plan = plan_of(queries["dedup_docs"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_ann_lsh_is_equi_join_not_nested_loop(spark, queries):
    # The multi-probe candidate join must be an equi-join on the exploded
    # probe buckets; a BroadcastNestedLoopJoin would evaluate every
    # (vector, probe) pair and void the LSH bucketing at scale.
    plan = plan_of(queries["ann_lsh_topk"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_running_revenue_fact_window_is_partitioned(spark, queries):
    # The per-order running sum must be windowed inside range buckets;
    # only the |buckets|-row offset table may see a global window.
    import re

    plan = plan_of(queries["running_revenue"](spark, SF_DIR))
    assert re.search(r"windowspecdefinition\(_bkt#\d+L?, o_orderkey", plan), plan


def test_stop_after_cumsum_prunes_before_global_window(spark, queries):
    # The sequential window must run after the per-day semi-join prune,
    # never over the full events table.
    plan = plan_of(queries["stop_after_cumsum"](spark, SF_DIR))
    assert "LeftSemi" in plan


def test_ingest_clean_chain_evaluated_once(spark, queries):
    # The regex cleaning pipeline must appear exactly once in the plan:
    # the pushed-down word_count filter previously re-substituted the
    # whole chain and evaluated it twice per document.
    plan = plan_of(queries["ingest_tagged_records"](spark, SF_DIR))
    assert plan.count("regexp_replace(regexp_replace(regexp_replace") == 1, plan


def test_similarity_partial_topk_before_probe_window(spark, queries):
    # Both similarity queries pre-reduce to a per-(partition, probe) top-k
    # so the final per-probe window sees a bounded row count.
    for name in ("cosine_topk", "ann_lsh_topk"):
        plan = plan_of(queries[name](spark, SF_DIR))
        assert "SPARK_PARTITION_ID" in plan.upper() or "_pp" in plan, name


def test_dedup_signatures_are_vectorized_arrow(spark, queries):
    # r22: the minhash/simhash signature stages run as one vectorized
    # mapInArrow pass (numpy), not as interpreted per-element HOF
    # lambdas — the plan must contain the Arrow map stage.
    for name in ("minhash_near_dups", "simhash_near_dups"):
        plan = plan_of(queries[name](spark, SF_DIR))
        assert "MapInArrow" in plan, name


def test_ngram_length_prune_before_verify(spark, queries):
    # r22: candidate pairs whose shingle-set size ratio bounds Jaccard
    # below the threshold must be dropped before the array-shipping
    # verify join (guide §2.3 — decide with metadata, ship payloads once).
    plan = plan_of(queries["ngram_jaccard_pairs"](spark, SF_DIR))
    assert "least(" in plan and "greatest(" in plan, plan
