"""Regression pins for the r11 flagship-pair shared lane-info memo
(queries._shared_lane_info; VERDICT r10 item 5).

The memo caches a DataFrame OBJECT per (applicationId, sf_dir) so the
flagship pair stops re-building/re-analyzing the ~400-expression parse
subtree per query. Its invalidation contract — cachereg.cleanup()
releases the persist AND drops the memo, so later callers rebuild
against a live persist instead of silently running unpersisted — is
exactly the kind of module-global state that silently rots, so pin it:

1. memo hit: two calls return the SAME object, and it is persisted;
2. cleanup(): memo emptied, old frame unpersisted, next call rebuilds
   a NEW persisted frame;
3. the memo-backed flagship output is row-identical to the standalone
   traffic_pipeline graph (the pre-r11 construction);
4. a raising on_cleanup callback never breaks cleanup (cachereg's
   best-effort contract).
"""

from __future__ import annotations

from dataflow_example_spark import queries as Q
from dataflow_example_spark.config import TrafficConfig
from dataflow_example_spark.functions import cachereg
from dataflow_example_spark.operators.traffic import traffic_pipeline
from dataflow_example_spark.synth import synth_traffic_lines

SF = "/root/testdata/sf0.001"


def test_memo_hit_and_persisted(spark):
    cachereg.cleanup()
    a = Q._shared_lane_info(spark, SF)
    b = Q._shared_lane_info(spark, SF)
    assert a is b
    assert a.storageLevel.useMemory
    key = (spark.sparkContext.applicationId, SF)
    assert key in Q._LANE_INFO_MEMO


def test_cleanup_invalidates_and_rebuilds(spark):
    cachereg.cleanup()
    old = Q._shared_lane_info(spark, SF)
    assert old.storageLevel.useMemory
    cachereg.cleanup()
    # memo dropped and the persist released together (the contract:
    # never hand out a memoized frame whose persist is gone)
    assert Q._LANE_INFO_MEMO == {}
    assert not old.storageLevel.useMemory
    fresh = Q._shared_lane_info(spark, SF)
    assert fresh is not old
    assert fresh.storageLevel.useMemory
    cachereg.cleanup()


def test_memo_path_matches_standalone_pipeline(spark):
    """The memo-backed flagship graph is the same graph traffic_pipeline
    builds (queries.py r11 refactor is plumbing, not semantics)."""
    cachereg.cleanup()
    via_memo = sorted(
        map(tuple, Q.QUERIES["traffic_max_lane_flow"](spark, SF).collect())
    )
    standalone = sorted(
        map(
            tuple,
            traffic_pipeline(
                synth_traffic_lines(spark, SF),
                TrafficConfig(cache_lane_info=False),
            ).collect(),
        )
    )
    assert via_memo == standalone
    cachereg.cleanup()


def test_raising_cleanup_callback_is_contained(spark):
    calls = []

    def boom():
        calls.append("boom")
        raise RuntimeError("callback failure must not escape cleanup")

    def after():
        calls.append("after")

    cachereg.on_cleanup(boom)
    cachereg.on_cleanup(after)
    try:
        cachereg.cleanup()  # must not raise
        assert calls == ["boom", "after"]
    finally:
        # callbacks are permanent by contract; strip the test's own so
        # the session's later cleanups stay quiet
        cachereg._ON_CLEANUP.remove(boom)
        cachereg._ON_CLEANUP.remove(after)
