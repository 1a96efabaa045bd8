"""End-to-end PPRL pipeline tests on the deterministic synthetic repos table.

Mirrors the reference's local end-to-end blocking test
(``lib-test/test/HammingLSHBlockingTest.java:42-82``): derive (C, L) from
theory (D1), run encode->HLSH->FPS->score->classify, evaluate against the
uid-embedded ground truth — target pairwise F1 >= 0.99 (BASELINE.json).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pprl_scaling_framework_spark.encoding import schemes
from pprl_scaling_framework_spark.pipeline.linkage import (
    LinkageConfig,
    pairwise_f1,
    run_dedup_pipeline,
    run_linkage_pipeline,
)
from pprl_scaling_framework_spark.sources import repos as repos_src


@pytest.fixture(scope="module")
def records(spark):
    df = repos_src.with_uid_and_sha(
        repos_src.synth_repos(spark, n_entities=300, seed=42, skew_every=50)
    ).cache()
    df.count()
    return df


CFG = LinkageConfig(
    encoding=schemes.clk(["content"], N=4096, K=8, Q=2),
    hlsh_K=30,
    hlsh_seed=420,
    delta=0.01,
    theta=164,
    method="dice",
    threshold=0.8,
    hot_threshold=50,
    salt_shards=4,
)


def test_synth_repos_deterministic(spark):
    a = repos_src.synth_repos(spark, n_entities=50, seed=42).collect()
    b = repos_src.synth_repos(spark, n_entities=50, seed=42).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = repos_src.synth_repos(spark, n_entities=50, seed=43).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_sha256_invariant(records):
    # X13: native sha2 must equal python hashlib on every row
    import hashlib

    rows = records.select("content", "sha256").limit(20).collect()
    for r in rows:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["sha256"]


def test_dedup_pipeline_f1(spark, records):
    from pprl_scaling_framework_spark.pipeline.linkage import expand_matched_pairs

    res = run_dedup_pipeline(spark, records, CFG)
    predicted = expand_matched_pairs(res.matched_pairs, res.uid_to_rep)
    truth = repos_src.true_pairs(records)
    stats = pairwise_f1(predicted, truth)
    assert stats["f1"] >= 0.99, stats
    # candidate reduction: far fewer candidates than n^2/2
    n = records.count()
    assert res.candidate_pairs.count() < 0.05 * n * (n - 1) / 2


def test_dedup_pipeline_f1_no_collapse(spark, records):
    """Same F1 without the exact-collapse fast path (cross-check)."""
    res = run_dedup_pipeline(spark, records, CFG, collapse_exact=False)
    truth = repos_src.true_pairs(records)
    stats = pairwise_f1(res.matched_pairs, truth)
    assert stats["f1"] >= 0.99, stats


def test_dedup_clusters_match_entities(spark, records):
    res = run_dedup_pipeline(spark, records, CFG, cluster=True)
    clusters = res.clusters
    # every same-entity record pair must land in the same cluster
    ents = records.select("uid", repos_src.entity_of_uid().alias("entity"),
                          "sha256")
    joined = clusters.join(ents, "uid")
    # non-skew entities: one cluster per entity
    per_entity = (
        joined.filter(F.col("entity") % 50 != 0)
        .groupBy("entity").agg(F.countDistinct("entity_id").alias("k"))
    )
    bad = per_entity.filter(F.col("k") > 1).count()
    assert bad == 0
    # skew-probe rows (identical content) all share one cluster
    skew = joined.filter(F.col("entity") % 50 == 0)
    assert skew.select("entity_id").distinct().count() == 1


def test_two_party_linkage(spark, records):
    # split variants: variant 0 -> party A, others -> party B (overlapping entities)
    a = records.filter(F.col("path").rlike(r"_0\.\w+$"))
    b = records.filter(~F.col("path").rlike(r"_0\.\w+$"))
    res = run_linkage_pipeline(spark, a, b, CFG)

    def cross_restrict(pairs):
        """Keep pairs with one end in A and the other in B (either order)."""
        al = a.select(F.col("uid").alias("id_a"))
        bl = b.select(F.col("uid").alias("id_b"))
        ar = a.select(F.col("uid").alias("id_b"))
        br = b.select(F.col("uid").alias("id_a"))
        p1 = pairs.join(al, "id_a", "left_semi").join(bl, "id_b", "left_semi")
        p2 = pairs.join(br, "id_a", "left_semi").join(ar, "id_b", "left_semi")
        return p1.unionByName(p2).distinct()

    truth = cross_restrict(repos_src.true_pairs(records))
    stats = pairwise_f1(res.matched_pairs, truth)
    assert stats["f1"] >= 0.99, stats


def test_salting_preserves_pair_counts(spark, records):
    """Candidate multiset with salting == without salting (hot_threshold huge)."""
    from pprl_scaling_framework_spark.blocking import fps, hlsh

    cfg = CFG
    plan = cfg.plan()
    from pprl_scaling_framework_spark.encoding.encode import encode_dataframe

    enc = encode_dataframe(records.limit(200), cfg.encoding, included=["uid"])
    pos = hlsh.position_matrix(plan.L, cfg.hlsh_K, cfg.encoding.total_bits, cfg.hlsh_seed)
    keys = hlsh.blocking_keys(enc, "uid", "bf", pos, cfg.encoding.total_bits).cache()
    salted = fps.candidate_pairs(keys, None, C=plan.C, hot_threshold=5, shards=4,
                                 self_join=True)
    unsalted = fps.candidate_pairs(keys, None, C=plan.C, hot_threshold=10**9,
                                   shards=1, self_join=True)
    s = {(r["id_a"], r["id_b"], r["collisions"]) for r in salted.collect()}
    u = {(r["id_a"], r["id_b"], r["collisions"]) for r in unsalted.collect()}
    assert s == u


def test_two_party_keeps_equal_uid_pairs(spark):
    """Parties sharing an id space must not lose their equal-uid true pairs.

    GenerateIdPairsReducer emits every (a, b) cross-product pair; a rid_a !=
    rid_b filter would silently drop exactly the true matches when both
    parties use the same uid for the same entity.
    """
    from pprl_scaling_framework_spark.blocking import fps

    rows = [("e1", 0, "k1"), ("e2", 0, "k1"), ("e1", 1, "k9"), ("e2", 1, "k9")]
    ka = spark.createDataFrame(rows, "uid string, group_id int, key string")
    kb = spark.createDataFrame(rows, "uid string, group_id int, key string")
    pairs = fps.candidate_pairs(ka, kb, C=2, self_join=False)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # cross-product per (group, key): all 4 ordered combos appear, including
    # the equal-uid ones
    assert ("e1", "e1") in got and ("e2", "e2") in got
    assert ("e1", "e2") in got and ("e2", "e1") in got


def test_natural_bigint_uids_candidate_pairs(spark):
    """Natural LONG uids must survive the surrogate round-trip (ADVICE r5).

    Before the explicit ``uids_hashed`` flag, dtype sniffing treated ANY
    bigint uid as an xxhash64 surrogate — a caller with natural numeric ids
    got raw ids joined against xxhash64(id) in the re-attach and a silently
    EMPTY candidate set. The flag defaults to False: bigint uids are hashed
    like every other dtype and the original values come back out.
    """
    from pprl_scaling_framework_spark.blocking import fps

    rows = [(101, 0, "k1"), (202, 0, "k1"), (101, 1, "k9"), (202, 1, "k9")]
    keys = spark.createDataFrame(rows, "uid long, group_id int, key string")
    pairs = fps.candidate_pairs(keys, None, C=2, self_join=True)
    # canonical order is by xxhash64 surrogate, not by natural value —
    # compare the unordered pair
    got = {(frozenset((r["id_a"], r["id_b"])), r["collisions"])
           for r in pairs.collect()}
    assert got == {(frozenset((101, 202)), 2)}, got


def test_uids_hashed_requires_bigint_surrogates(spark):
    """uids_hashed=True asserts the uid column is the xxhash64 surrogate."""
    from pprl_scaling_framework_spark.blocking import fps

    rows = [("e1", 0, "k1"), ("e2", 0, "k1")]
    keys = spark.createDataFrame(rows, "uid string, group_id int, key string")
    with pytest.raises(ValueError, match="uids_hashed"):
        fps.candidate_pairs(keys, None, C=1, self_join=True, uids_hashed=True)


def test_pipeline_scoped_release(spark, records):
    """A pipeline run can release exactly ITS stage caches (round-6 verdict:
    the library persisted but never released; round-6 advice: the global
    sweep drops other consumers' caches). Another operator's tracked persist
    must survive res.release()."""
    from pprl_scaling_framework_spark.ops import bucket_join

    bucket_join.release_persists()  # start clean
    other = bucket_join.track_persist(records.select("uid"))
    other.count()
    res = run_dedup_pipeline(spark, records, CFG, cluster=False)
    res.matched_pairs.count()
    assert len(res.tracked) >= 1  # the multi-consumer encode cache
    cached_before = [df for df in res.tracked if df.storageLevel.useMemory]
    assert cached_before
    released = res.release()
    assert released >= 1
    assert res.tracked == []
    for df in cached_before:
        assert not df.storageLevel.useMemory  # actually unpersisted
    # the unrelated operator cache is untouched by the scoped release...
    assert other.storageLevel.useMemory
    assert other in bucket_join._TRACKED_PERSISTS
    # ...and a second scoped release is a no-op while the global sweep
    # still covers the leftover
    assert res.release() == 0
    assert bucket_join.release_persists() >= 1
    # a fresh pipeline run leaves nothing of its own behind either
    res2 = run_dedup_pipeline(spark, records, CFG, cluster=False)
    res2.matched_pairs.count()
    assert res2.release() >= 1
    assert res2.tracked == []
    bucket_join.release_persists()
