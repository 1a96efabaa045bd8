"""Property-based tests (hypothesis) for the pure kernels — beyond the
reference's example-based suite (SURVEY §5 notes it has no property tests)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pprl_scaling_framework_spark.core import bloom, em, qgrams, similarity
from pprl_scaling_framework_spark.core.hashing import hashes_v1, hashes_v2, hashes_v3
from pprl_scaling_framework_spark.core.javarandom import JavaRandom

TEXT = st.text(max_size=60)


@given(TEXT, st.integers(2, 4))
def test_qgram_count_equals_generation(s, q):
    assert qgrams.qgram_count(s, q) == len(qgrams.qgrams_of_string(s, q))
    assert qgrams.unique_qgram_count(s, q) == len(set(qgrams.qgrams_of_string(s, q)))


@given(TEXT)
def test_proper_string_idempotent(s):
    p = qgrams.proper_string(s)
    assert qgrams.proper_string(p) == p
    assert p.startswith("_") and p.endswith("_")
    assert " " not in p and "\t" not in p


@given(st.binary(min_size=1, max_size=40), st.integers(8, 2048), st.integers(1, 30))
@settings(max_examples=60)
def test_hash_versions_in_range(data, n, k):
    for fn in (hashes_v1, hashes_v2, hashes_v3):
        h = fn(data, n, k)
        assert len(h) == k
        assert (h >= 0).all() and (h < n).all()
        assert (h == fn(data, n, k)).all()  # deterministic


@given(st.lists(st.lists(st.integers(0, 1), min_size=64, max_size=64), min_size=1, max_size=8))
def test_pack_unpack_roundtrip(rows):
    bits = np.array(rows, dtype=np.uint8)
    assert (bloom.unpack_bits(bloom.pack_bits(bits), 64) == bits).all()


@given(st.binary(min_size=16, max_size=16), st.binary(min_size=16, max_size=16))
def test_similarity_properties(a_bytes, b_bytes):
    a = np.frombuffer(a_bytes, np.uint8).reshape(1, 16)
    b = np.frombuffer(b_bytes, np.uint8).reshape(1, 16)
    n_bits = 128
    # fast == naive
    assert similarity.hamming(a, b)[0] == similarity.hamming_naive(a, b, n_bits)[0]
    assert abs(similarity.dice(a, b)[0] - similarity.dice_naive(a, b, n_bits)[0]) < 1e-12
    assert abs(similarity.jaccard(a, b)[0] - similarity.jaccard_naive(a, b, n_bits)[0]) < 1e-12
    # identities and bounds
    assert similarity.hamming(a, a)[0] == 0
    assert 0.0 <= similarity.jaccard(a, b)[0] <= 1.0
    assert 0.0 <= similarity.dice(a, b)[0] <= 1.0
    # symmetry
    assert similarity.hamming(a, b)[0] == similarity.hamming(b, a)[0]
    assert similarity.dice(a, b)[0] == similarity.dice(b, a)[0]


@given(st.integers(-(2**40), 2**40), st.integers(1, 10_000))
@settings(max_examples=100)
def test_java_random_bounds(seed, bound):
    r = JavaRandom(seed)
    for _ in range(10):
        v = r.next_int(bound)
        assert 0 <= v < bound


@given(st.lists(st.integers(0, 10_000), min_size=8, max_size=8))
@settings(max_examples=40)
def test_em_outputs_are_probabilities(freqs):
    freq = np.array(freqs, dtype=np.int64)
    if freq.sum() == 0:
        freq[0] = 1
    res = em.run_em(freq, 3, m0=0.9, u0=0.1, p0=0.01)
    # degenerate histograms legitimately push estimates to the boundary;
    # allow float-accumulation epsilon past it
    eps = 1e-9
    assert np.isfinite(res.m).all() and ((res.m >= -eps) & (res.m <= 1 + eps)).all()
    assert np.isfinite(res.u).all() and ((res.u >= -eps) & (res.u <= 1 + eps)).all()
    assert -eps <= res.p <= 1 + eps


@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=32))
@settings(max_examples=80, deadline=None)
def test_jaro_winkler_batch_equals_scalar(pairs):
    from pprl_scaling_framework_spark.matching.plaintext import (
        jaro_winkler,
        jaro_winkler_batch,
    )

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    fast = jaro_winkler_batch(a, b)
    slow = np.array([jaro_winkler(x, y) for x, y in zip(a, b)])
    np.testing.assert_allclose(fast, slow, atol=1e-12)
