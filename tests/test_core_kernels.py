"""Unit/parity tests for the pure-numpy kernels.

Java-semantics parity is asserted against tests/java_golden.json, generated
by tests/gen_java_golden.java using the JDK only (HMAC + BigInteger +
java.util.Random) — bit-exact evidence without copying reference code.
"""

import json
import os

import numpy as np
import pytest

from pprl_scaling_framework_spark.core import bloom, em, hashing, planner, qgrams, similarity
from pprl_scaling_framework_spark.core.javarandom import (
    JavaRandom,
    next_int_stream,
    shuffled_range_prefix,
)

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "java_golden.json")))


# --- java.util.Random parity ------------------------------------------------

def test_java_random_next_int_parity():
    for case in GOLDEN["next_int"]:
        assert next_int_stream(20, case["bound"], case["seed"]) == case["draws"]


def test_collections_shuffle_prefix_parity():
    for case in GOLDEN["shuffle_prefix"]:
        got = shuffled_range_prefix(case["N"], case["K"], case["seed"])
        assert got == case["prefix"], (case["seed"], case["N"])


# --- hashing V3 parity ------------------------------------------------------

def test_hashes_v3_parity_with_java():
    for case in GOLDEN["v3"]:
        got = hashing.hashes_v3(case["gram"].encode("utf-8"), case["N"], case["K"])
        assert got.tolist() == case["hashes"], case
        # digest truncations match BigInteger.intValue()
        import hashlib, hmac as hm
        sha1 = int.from_bytes(
            hm.new(b"ZIKRETQI", case["gram"].encode(), hashlib.sha1).digest()[-4:],
            "big", signed=True)
        assert sha1 == case["sha1_int"]


def test_hashes_in_range_and_deterministic():
    for data in [b"_a", b"xy", b"", b"\xff\xfe"]:
        for n, k in [(64, 3), (1024, 30), (4096, 15)]:
            h1 = hashing.hashes_v3(data, n, k)
            h2 = hashing.hashes_v3(data, n, k)
            assert (h1 == h2).all()
            assert (h1 >= 0).all() and (h1 < n).all()
            assert hashing.hashes_v1(data, n, k).max() < n
            assert hashing.hashes_v2(data, n, k).max() < n


def test_hash_unique_grams_matches_scalar():
    grams = ["_a", "ab", "b_"]
    mat = hashing.hash_unique_grams(grams, 1024, 10)
    for i, g in enumerate(grams):
        assert (mat[i] == hashing.hashes_v3(g.encode(), 1024, 10)).all()


# --- q-grams ----------------------------------------------------------------

def test_proper_string():
    assert qgrams.proper_string("john smith") == "_john_smith_"
    assert qgrams.proper_string("_x_") == "_x_"
    assert qgrams.proper_string("a  b\tc") == "_a_b_c_"


def test_proper_string_non_ascii_whitespace_preserved():
    # Java \s is ASCII-only: NBSP / LINE SEPARATOR must NOT collapse to '_'
    cases = ["a\u00a0b", "a\u2028b", "a\u2003b", "a \u00a0 b"]
    expect = ["_a\u00a0b_", "_a\u2028b_", "_a\u2003b_", "_a_\u00a0_b_"]
    for s, e in zip(cases, expect):
        assert qgrams.proper_string(s) == e
    # ASCII vertical tab / form feed DO collapse (in Java \s, unlike RE2 \s)
    assert qgrams.proper_string("a\x0bb\x0cc") == "_a_b_c_"


def test_gram_windows_matches_scalar_proper_string():
    """The vectorized joined-buffer properString inside gram_windows must
    reproduce the scalar reference (core.qgrams) gram-for-gram, including
    non-ASCII fallback rows, empty/blank strings and '_'-boundary cases."""
    import random
    import string

    import pandas as pd
    from pprl_scaling_framework_spark.encoding.batch_kernel import gram_windows

    rng = random.Random(7)
    chars = string.ascii_letters + string.digits + " \t\n\x0b\f\r_" + "  "
    cases = ["", " ", "  ", "_", "a", " a", "a ", "  a  b  ", "_a_", "\t\n",
             "a\tb\nc", "ab", "_ _", "  _  ", "a\u00a0b", "h\u00e9llo w\u00f6rld"]
    cases += ["".join(rng.choice(chars) for _ in range(rng.randint(0, 30)))
              for _ in range(500)]
    for q in (2, 3):
        windows, row_of, fb = gram_windows(pd.Series(cases, dtype=object), q)
        got: dict[int, list[bytes]] = {}
        for w, r in zip(windows, row_of):
            got.setdefault(int(r), []).append(bytes(w.tobytes()))
        for r, grams in fb:
            got.setdefault(r, []).extend(grams)
        for i, s in enumerate(cases):
            expect = [g.encode("utf-8") for g in qgrams.qgrams_of_string(s, q)]
            assert got.get(i, []) == expect, (q, i, repr(s))


def test_qgrams_string():
    assert qgrams.qgrams_of_string("", 2) == []
    assert qgrams.qgrams_of_string("ab", 2) == ["_a", "ab", "b_"]
    assert qgrams.qgram_count("ab", 2) == 3
    assert qgrams.qgram_count("john smith", 2) == len("_john_smith_") - 1
    # unique
    assert qgrams.unique_qgrams("aaa", 2) == ["_a", "aa", "a_"]
    assert qgrams.unique_qgram_count("aaa", 2) == 3


def test_qgrams_number_and_bool():
    assert qgrams.qgrams_of_number(5, 2) == ["_5", "5_"]
    assert qgrams.qgrams_of_number(5.0, 2) == ["_5", "5.", ".0", "0_"]
    assert qgrams.qgrams_of_bool(True, 2) == ["_T", "T_"]
    assert qgrams.qgrams_of_bool(True, 3) == ["_T_"]
    assert qgrams.qgrams_of_bool(False, 4) == ["_F_"]
    assert qgrams.qgrams(None, 2) == []


# --- bloom bit layout -------------------------------------------------------

def test_lsb_first_bit_layout():
    bits = np.zeros((1, 16), dtype=np.uint8)
    bits[0, 0] = 1   # bit 0 -> byte 0 mask 0x01
    bits[0, 9] = 1   # bit 9 -> byte 1 mask 0x02
    packed = bloom.pack_bits(bits)
    assert packed[0, 0] == 0x01 and packed[0, 1] == 0x02
    back = bloom.unpack_bits(packed, 16)
    assert (back == bits).all()


def test_bf_from_grams_roundtrip():
    grams = ["_a", "ab", "b_"]
    pos = hashing.hash_unique_grams(grams, 256, 5)
    packed = bloom.bf_from_grams([np.array([0, 1, 2]), np.array([], dtype=int)], pos, 256)
    assert packed.shape == (2, 32)
    assert bloom.popcount_rows(packed)[1] == 0
    ones = bloom.popcount_rows(packed)[0]
    assert 0 < ones <= 15
    bits = bloom.unpack_bits(packed[:1], 256)
    assert set(np.flatnonzero(bits[0])) == set(pos.ravel().tolist())


def test_fpp():
    assert bloom.false_positive_probability(1024, 10, 0) == 0.0
    assert 0 < bloom.false_positive_probability(1024, 10, 30) < 1


# --- similarity kernels: fast == naive (reference test strategy) ------------

def test_similarity_fast_equals_naive():
    rng = np.random.default_rng(42)
    n_bits = 1024
    a = rng.integers(0, 256, size=(64, n_bits // 8), dtype=np.uint8)
    b = rng.integers(0, 256, size=(64, n_bits // 8), dtype=np.uint8)
    assert (similarity.hamming(a, b) == similarity.hamming_naive(a, b, n_bits)).all()
    np.testing.assert_allclose(similarity.jaccard(a, b), similarity.jaccard_naive(a, b, n_bits), atol=1e-12)
    np.testing.assert_allclose(similarity.dice(a, b), similarity.dice_naive(a, b, n_bits), atol=1e-12)


def test_similarity_identities():
    a = np.frombuffer(bytes([0b1111, 0]), dtype=np.uint8).reshape(1, 2)
    b = np.frombuffer(bytes([0b0011, 0]), dtype=np.uint8).reshape(1, 2)
    assert similarity.hamming(a, b)[0] == 2
    assert similarity.jaccard(a, b)[0] == pytest.approx(0.5)
    assert similarity.dice(a, b)[0] == pytest.approx(2 * 2 / 6)
    assert similarity.inter_cardinality(a, b)[0] == 2
    # threshold dispatch (K5)
    assert similarity.passes_threshold("dice", np.array([0.7]), 0.7).all()
    assert similarity.passes_threshold("hamming", np.array([3.0]), 3).all()
    assert not similarity.passes_threshold("jaccard", np.array([0.69]), 0.7).any()


# --- planner ----------------------------------------------------------------

def test_binom_cdf_exact():
    # vs direct summation for a tiny case
    assert planner.binom_cdf(4, 0.5, 2) == pytest.approx(11 / 16)
    assert planner.binom_cdf(10, 0.0, 0) == 1.0
    assert planner.binom_cdf(10, 0.3, 10) == 1.0


def test_plan_blocking_reasonable():
    # bench-like config: theta=0.1*N dynamic, S=4096, K=30
    plan = planner.plan_blocking(theta=409, s_bits=4096, delta=0.005, K=30)
    assert plan.L >= plan.L_opt
    assert 1 <= plan.C <= plan.L
    assert planner.binom_cdf(plan.L, plan.p_theta_k, plan.C) < plan.delta or plan.L == plan.L_max
    # p_theta formula
    assert plan.p_theta == pytest.approx(1 - 409 / 4096)


def test_fbf_dynamic_size():
    # matches reference formula ceil(1/(1-0.5^(1/(g*K))))
    assert planner.fbf_dynamic_size(10.0, 15) == 217
    assert planner.rbf_weighted_size([1024, 512], [0.5, 0.5]) == 2048
    # reference composition semantics (RowBloomFilterEncoding.java:86-90,
    # 112-121,141-144): ceil-first/floor-rest uniform, (int)(w*N) weighted,
    # NO remainder redistribution — counts may sum to LESS than rbf_n and the
    # leftover permutation slots stay unset.
    assert planner.rbf_uniform_composition(3, 4096) == [1366, 1365, 1365]
    assert planner.rbf_uniform_composition(3, 11) == [4, 3, 3]  # sums to 10
    assert planner.rbf_weighted_composition([0.3, 0.7], 1000) == [300, 700]
    assert planner.rbf_weighted_composition([0.4, 0.2, 0.4], 272) == [108, 54, 108]


# --- EM ---------------------------------------------------------------------

def test_vector_index_roundtrip():
    agr = np.array([[True, False, True], [False, False, False]])
    idx = em.vector_to_index(agr)
    assert idx.tolist() == [5, 0]
    assert (em.index_to_vector(5, 3) == np.array([True, False, True])).all()


def test_em_recovers_planted_mixture():
    rng = np.random.default_rng(7)
    f = 3
    m_true, u_true, p_true = np.array([0.95, 0.9, 0.85]), np.array([0.1, 0.2, 0.05]), 0.05
    n = 200_000
    is_match = rng.random(n) < p_true
    probs = np.where(is_match[:, None], m_true, u_true)
    agree = rng.random((n, f)) < probs
    idx = em.vector_to_index(agree)
    freq = np.bincount(idx, minlength=1 << f)
    # NOTE: the reference's default init m0=u0=0.9 is a symmetric fixed point
    # (m stays equal to u in exact arithmetic) — we keep those defaults for
    # parity but estimate with an asymmetric u0 here.
    res = em.run_em(freq, f, m0=0.9, u0=0.1, p0=0.001)
    assert res.converged
    np.testing.assert_allclose(res.m, m_true, atol=0.05)
    np.testing.assert_allclose(res.u, u_true, atol=0.05)
    assert res.p == pytest.approx(p_true, abs=0.02)
    assert (res.agree_weights() > 0).all()
    assert (res.disagree_weights() < 0).all()
    nr = res.normalized_range()
    assert nr.sum() == pytest.approx(1.0)


def test_fs_log_likelihood_sign():
    res = em.EMResult(
        m=np.array([0.9, 0.9]), u=np.array([0.1, 0.1]), p=0.01,
        iterations=1, converged=True, field_count=2, pair_count=10,
    )
    ll = em.fs_log_likelihood(np.array([[True, True], [False, False]]), res)
    assert ll[0] > 0 > ll[1]


def test_xxhash64_spec_vectors():
    """Pure-Python XXH64 sanity on the published reference test vectors."""
    from pprl_scaling_framework_spark.core.xxhash64 import hash_bytes

    # xxHash reference: XXH64("", seed=0) and known short-string vectors
    assert hash_bytes(b"", 0) == 0xEF46DB3751D8E999
    assert hash_bytes(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert hash_bytes(b"abc", 0) == 0x44BC2CF5AD770999
