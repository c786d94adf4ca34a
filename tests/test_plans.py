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
