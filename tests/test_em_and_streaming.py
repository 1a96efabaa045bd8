"""Tests: plaintext similarity (K6), agreement vectors (K7), EM stage (A5-A7),
FBF/RBF pipeline variants, and structured-streaming encode/block."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pprl_scaling_framework_spark.matching import em_pipeline, plaintext


# --- jaro-winkler ----------------------------------------------------------

def test_jaro_winkler_known_values():
    # classic textbook values
    assert plaintext.jaro("MARTHA", "MARHTA") == pytest.approx(0.944444, abs=1e-5)
    assert plaintext.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.961111, abs=1e-5)
    assert plaintext.jaro("DIXON", "DICKSONX") == pytest.approx(0.766667, abs=1e-5)
    assert plaintext.jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.813333, abs=1e-5)
    assert plaintext.jaro_winkler("abc", "abc") == 1.0
    assert plaintext.jaro_winkler("", "abc") == 0.0
    assert plaintext.jaro_winkler("xyz", "abc") == 0.0


def test_plaintext_methods_spark(spark):
    df = spark.createDataFrame(
        [("conner", "connor"), ("abc", "abc"), ("abc", "xyz")], ["x", "y"]
    )
    for method in ["jaro_winkler", "exact", "jaccard_bigrams", "dice_trigrams",
                   "cosine_quadgrams"]:
        col = plaintext.similarity_column(method, F.col("x"), F.col("y"))
        vals = [r[0] for r in df.select(col).collect()]
        assert vals[1] == pytest.approx(1.0), method     # identical
        assert vals[2] < 0.5, method                      # disjoint
        assert 0.0 <= vals[0] <= 1.0, method


def test_agreement_vector(spark):
    a = spark.createDataFrame([("x1", "john", "smith")], ["uid", "name", "surname"])
    b = spark.createDataFrame([("x2", "john", "smythe")], ["uid", "name", "surname"])
    pairs = a.alias("a").crossJoin(b.alias("b"))
    vec = plaintext.agreement_vector_column(["name", "surname"], "exact", 1.0)
    assert pairs.select(vec.alias("v")).collect()[0]["v"] == 1  # name agrees only


# --- EM stage --------------------------------------------------------------

def test_calc_data_stats_e2e(spark):
    """Near-dup names -> EM must find a high-m/low-u match class."""
    import random

    rnd = random.Random(7)
    first = ["john", "maria", "wei", "aisha", "ivan", "sofia", "liam", "noor"]
    last = ["smith", "garcia", "chen", "khan", "petrov", "rossi", "kim", "ali"]
    rows = []
    uid = 0
    for e in range(150):
        f, l = rnd.choice(first), rnd.choice(last)
        city = rnd.choice(["irving", "mebane", "dallas"])
        for v in range(rnd.choice([1, 2])):
            fn = f if v == 0 else f[:-1] + rnd.choice("aeiou")
            rows.append((f"u{uid:04d}", fn, l, city))
            uid += 1
    df = spark.createDataFrame(rows, ["uid", "name", "surname", "city"])

    res = em_pipeline.calc_data_stats(
        spark, df, "uid", ["name", "surname", "city"], sample_size=200, seed=1
    )
    # q-gram stats present and sane
    assert res.qgram_stats["name"]["avg_2grams"] > 0
    assert len(res.dynamic_fbf_sizes) == 3
    assert all(s > 0 for s in res.dynamic_fbf_sizes)
    # histogram covers 2^3 cells and sums to pair count
    assert len(res.frequencies) == 8
    assert res.frequencies.sum() == res.em.pair_count
    assert res.em.pair_count > 1000
    # weights: agreement must be positive evidence for at least name/surname
    assert np.isfinite(res.agree_weights).all()
    assert res.normalized_range.sum() == pytest.approx(1.0)


# --- FBF / RBF pipeline variants -------------------------------------------

def test_fbf_and_rbf_pipeline_variants(spark):
    from pprl_scaling_framework_spark.encoding import schemes
    from pprl_scaling_framework_spark.pipeline.linkage import (
        LinkageConfig, pairwise_f1, run_dedup_pipeline, expand_matched_pairs,
    )
    from pprl_scaling_framework_spark.sources import repos as repos_src

    records = repos_src.with_uid_and_sha(
        repos_src.synth_repos(spark, n_entities=120, seed=7, skew_every=0)
    ).cache()
    truth = repos_src.true_pairs(records)

    fbf = schemes.fbf_static(["content"], N=4096, K=8, Q=2)
    rbf = schemes.rbf_uniform(["path", "content"], fbf_sizes=[512, 4096],
                              rbf_n=4096, K=8, Q=2, permutation_seed=5)
    # RBF's with-replacement bit sampling densifies the filter -> higher
    # cross-entity dice baseline; calibrate the threshold per scheme
    for enc, thr in ((fbf, 0.75), (rbf, 0.84)):
        cfg = LinkageConfig(encoding=enc, hlsh_K=30, hlsh_seed=420, delta=0.01,
                            theta=164, method="dice", threshold=thr,
                            hot_threshold=100, salt_shards=4)
        res = run_dedup_pipeline(spark, records, cfg, cluster=False)
        predicted = expand_matched_pairs(res.matched_pairs, res.uid_to_rep)
        stats = pairwise_f1(predicted, truth)
        assert stats["f1"] >= 0.97, (enc.scheme, stats)


# --- streaming -------------------------------------------------------------

def test_streaming_encode_and_block(spark, tmp_path):
    from pprl_scaling_framework_spark.blocking import hlsh
    from pprl_scaling_framework_spark.encoding import schemes
    from pprl_scaling_framework_spark.encoding.encode import encode_dataframe
    from pprl_scaling_framework_spark.sources import repos as repos_src
    from pprl_scaling_framework_spark.streaming import stream_linkage

    cfg = schemes.clk(["content"], N=1024, K=5, Q=2)
    records = repos_src.with_uid_and_sha(
        repos_src.synth_repos(spark, n_entities=40, seed=3, skew_every=0)
    )
    src = str(tmp_path / "stream_src")
    records.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(records.schema).parquet(src)
    enc_stream = stream_linkage.encode_stream(stream, cfg)
    pos = hlsh.position_matrix(8, 10, 1024, 42)
    key_stream = stream_linkage.blocking_keys_stream(enc_stream, pos, 1024)

    q = (
        key_stream.writeStream.format("memory")
        .queryName("keys_mem").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM keys_mem")
    n_records = records.count()
    assert got.count() == n_records * 8

    # batch/stream parity: identical keys for the same rows
    batch_keys = hlsh.blocking_keys(
        encode_dataframe(records, cfg, included=["uid"]), "uid", "bf", pos, 1024
    )
    diff = got.exceptAll(batch_keys).count() + batch_keys.exceptAll(got).count()
    assert diff == 0

    # rid-surrogate variant: the stream's hash_uid must be the batch one
    q2 = (
        stream_linkage.blocking_keys_stream(
            stream_linkage.encode_stream(stream, cfg), pos, 1024, hash_uid=True)
        .writeStream.format("memory").queryName("keys_mem_rid")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    got_rid = spark.sql("SELECT * FROM keys_mem_rid")
    batch_rid = hlsh.blocking_keys(
        encode_dataframe(records, cfg, included=["uid"]), "uid", "bf", pos,
        1024, hash_uid=True)
    assert got_rid.schema["uid"].dataType.simpleString() == "bigint"
    diff = got_rid.exceptAll(batch_rid).count() + batch_rid.exceptAll(got_rid).count()
    assert diff == 0


def test_streaming_windowed_counts(spark, tmp_path):
    from pprl_scaling_framework_spark.streaming import stream_linkage

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = stream_linkage.windowed_event_counts(stream, window="1 day",
                                               watermark="2 days")
    q = (
        agg.writeStream.format("memory").queryName("ev_mem")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n) AS total FROM ev_mem").collect()[0]["total"]
    # append mode emits only closed windows (watermark) — some rows may be
    # held back, but the bulk must flow through
    assert got is not None and got > 0


def test_stream_candidates_cap_parity(spark, tmp_path):
    """max_bucket on the stream-static candidate join: identical pairs to an
    independently-computed capped batch join, and the cap actually bites
    (uncapped emits MORE pairs on the skewed corpus). The cap is what keeps
    the per-batch join output bounded at scale — see cap_static_index."""
    from pprl_scaling_framework_spark.blocking import hlsh
    from pprl_scaling_framework_spark.encoding import schemes
    from pprl_scaling_framework_spark.encoding.encode import encode_dataframe
    from pprl_scaling_framework_spark.sources import repos as repos_src
    from pprl_scaling_framework_spark.streaming import stream_linkage

    cfg = schemes.clk(["content"], N=1024, K=5, Q=2)
    # heavy skew: every 2nd entity shares near-identical content -> hot keys
    records = repos_src.with_uid_and_sha(
        repos_src.synth_repos(spark, n_entities=60, seed=3, skew_every=2)
    )
    src = str(tmp_path / "cap_src")
    records.write.mode("overwrite").parquet(src)
    pos = hlsh.position_matrix(8, 10, 1024, 42)
    index = hlsh.blocking_keys(
        encode_dataframe(records, cfg, included=["uid"]), "uid", "bf", pos, 1024
    ).select("uid", "group_id", "key")
    cap, C = 4, 2
    sizes = index.groupBy("group_id", "key").count()
    assert sizes.agg(F.max("count")).first()[0] > cap  # cap must bite

    stream = spark.readStream.schema(records.schema).parquet(src)
    key_stream = stream_linkage.blocking_keys_stream(
        stream_linkage.encode_stream(stream, cfg), pos, 1024)
    q = (
        stream_linkage.stream_candidates_against_index(
            key_stream, index, C, max_bucket=cap)
        .writeStream.format("memory").queryName("cap_mem")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cap_mem")

    # independent batch oracle: plain joins + HAVING-style size filter
    kept = index.join(
        sizes.filter(F.col("count") <= cap).select("group_id", "key"),
        ["group_id", "key"])
    want = (
        index.select(F.col("uid").alias("id_new"), "group_id", "key")
        .join(kept.select(F.col("uid").alias("id_indexed"), "group_id", "key"),
              ["group_id", "key"])
        .filter(F.col("id_new") != F.col("id_indexed"))
        .groupBy("id_new", "id_indexed")
        .agg(F.count("*").alias("collisions"))
        .filter(F.col("collisions") >= C)
    )
    assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0
    assert got.count() > 0
    # and the uncapped join emits strictly more pairs on this corpus
    uncapped = (
        index.select(F.col("uid").alias("id_new"), "group_id", "key")
        .join(index.select(F.col("uid").alias("id_indexed"), "group_id", "key"),
              ["group_id", "key"])
        .filter(F.col("id_new") != F.col("id_indexed"))
        .groupBy("id_new", "id_indexed").agg(F.count("*").alias("collisions"))
        .filter(F.col("collisions") >= C)
    )
    assert uncapped.count() > got.count()
