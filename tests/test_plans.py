"""Physical-plan regression guards: the properties that make the engine's
plans survive a 100x scale-up, asserted over the real contract queries.

- no CartesianProduct anywhere, ever;
- BroadcastNestedLoopJoin only where a theta join against a tiny broadcast
  catalog is the INTENDED plan (the interval+spatial bbox join — ~25 events
  broadcast; at catalog scale the cell join replaces it);
- relational scans push their filters into the parquet reader and prune
  columns (q1 must not read l_comment).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.001"

# bbox theta join vs broadcast event catalog: BNLJ is the right physical
# plan for a ~25-row broadcast side; everything else must be hash/equi
# vocab_topk: Catalyst constant-folds the literal join key of the 1-row
# global-total attach into an Identity broadcast -> BNLJ with a ONE-row
# build side over k<=256 probe rows (O(k) work, the optimal scalar attach)
BNLJ_ALLOWED = {"interval_spatial_join", "interval_spatial_join_exact", "vocab_topk"}


def _all_queries():
    # plan laws cover the demoted cross-strategy twins too — they remain
    # shipped code paths
    return {**E.queries(), **E.extra_queries()}


def _plan(spark, name):
    return (
        _all_queries()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    )


class TestPlanShapes:
    def test_no_cartesian_products(self, spark):
        for name in _all_queries():
            plan = _plan(spark, name)
            assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
            if name not in BNLJ_ALLOWED:
                assert "BroadcastNestedLoopJoin" not in plan, (
                    f"{name} plans a nested-loop join"
                )

    def test_q1_pushdown_and_pruning(self, spark):
        plan = _plan(spark, "q1_pricing_summary")
        assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
        # column pruning: the wide comment column must not be read
        assert "l_comment" not in plan

    def test_banded_joins_are_equi(self, spark):
        for name in ("simhash_hamming_pairs", "dedup_minhash_lsh"):
            plan = _plan(spark, name)
            assert (
                "SortMergeJoin" in plan
                or "ShuffledHashJoin" in plan
                or "BroadcastHashJoin" in plan
            ), f"{name} lost its equi join"

    def test_small_dims_broadcast(self, spark):
        plan = _plan(spark, "q5_local_supplier")
        assert "BroadcastHashJoin" in plan  # nation/region dims

    def test_banded_pair_joins_have_no_distinct(self, spark):
        """Report-once replaced every terminal distinct() on pair outputs —
        at candidate scale that distinct is the dominant shuffle."""
        import re

        for name in ("dedup_minhash_lsh", "simhash_hamming_pairs", "embedding_lsh_pairs"):
            plan = _plan(spark, name)
            assert not re.search(r"HashAggregate\(keys=\[doc_a", plan), name
            assert not re.search(r"HashAggregate\(keys=\[id_a", plan), name

    def test_skew_stages_absent_when_no_hot_buckets(self, spark):
        """VERDICT r3 #2 pay-as-you-go: the contract fixtures have no hot
        bucket, so the plan must be the plain equi-join — no anti/semi
        (hot-split) stages, no salt explode."""
        for name in ("dedup_minhash_lsh", "simhash_hamming_pairs", "ngram_jaccard_pairs"):
            plan = _plan(spark, name)
            assert "LeftAnti" not in plan, f"{name} kept the hot-split anti join"
            assert "LeftSemi" not in plan, f"{name} kept the hot-split semi join"
