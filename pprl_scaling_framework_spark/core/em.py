"""Fellegi-Sunter Expectation-Maximization over a similarity-vector
frequency histogram (driver-side numpy; the histogram has only 2^F cells).

Parity target ``lib/matching/ExpectationMaximization.java:82-127`` and
``lib/matching/SimilarityVectorFrequencies.java:28-54``:

- vector index: bit j set <=> field j agrees; ``vector2Index`` packs with
  bit j = (1 << j);
- E step: for each index i, ``a = p * prod_j(m_j or 1-m_j)``,
  ``b = (1-p) * prod_j(u_j or 1-u_j)``, ``g_m = a/(a+b)``;
- M step: ``m_j = sum_{i: bit j set} g_m[i]*freq[i] / sum_i g_m[i]*freq[i]``
  (same for u with g_u), ``p = mSum / pairCount``;
- convergence: max |delta| over (m, u, p) <= 1e-5, at most 1000 iterations;
- defaults m0=u0=0.9, p0=0.001
  (``service/service/matching/LocalMatchingService.java:167-169``).

Agree/disagree weights (A7, ``lib/datasets/DatasetStatistics.java:292-318``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

MAX_ITERATIONS = 1000
CONVERGENCE = 1e-5


def vector_to_index(agreements: np.ndarray) -> np.ndarray:
    """bool[B, F] -> int64[B] bit-packed index (bit j <-> field j)."""
    f = agreements.shape[1]
    powers = (1 << np.arange(f, dtype=np.int64))
    return agreements.astype(np.int64) @ powers


def index_to_vector(index: int, field_count: int) -> np.ndarray:
    return np.array([(index >> j) & 1 for j in range(field_count)], dtype=bool)


@dataclass
class EMResult:
    m: np.ndarray
    u: np.ndarray
    p: float
    iterations: int
    converged: bool
    field_count: int
    pair_count: int

    def agree_weights(self) -> np.ndarray:
        return np.log(self.m / self.u)

    def disagree_weights(self) -> np.ndarray:
        return np.log((1.0 - self.m) / (1.0 - self.u))

    def weight_range(self) -> np.ndarray:
        return self.agree_weights() - self.disagree_weights()

    def normalized_range(self) -> np.ndarray:
        r = np.abs(self.weight_range())
        return r / r.sum()


def run_em(
    frequencies: np.ndarray,
    field_count: int,
    m0: float = 0.9,
    u0: float = 0.9,
    p0: float = 0.001,
) -> EMResult:
    """EM over the 2^F histogram ``frequencies`` (long[2^F])."""
    assert len(frequencies) == (1 << field_count)
    freq = np.asarray(frequencies, dtype=np.float64)
    pair_count = int(freq.sum())

    # rows[i, j] = bit j of index i (agreement pattern table)
    idx = np.arange(1 << field_count, dtype=np.int64)
    rows = ((idx[:, None] >> np.arange(field_count)) & 1).astype(bool)

    m = np.full(field_count, m0, dtype=np.float64)
    u = np.full(field_count, u0, dtype=np.float64)
    p = float(p0)

    iteration = 0
    converged = False
    for iteration in range(1, MAX_ITERATIONS + 1):
        a = p * np.prod(np.where(rows, m, 1.0 - m), axis=1)
        b = (1.0 - p) * np.prod(np.where(rows, u, 1.0 - u), axis=1)
        denom = a + b
        # cells with zero total density (possible once estimates hit the
        # boundary) get zero posterior — they carry no frequency mass
        g_m = np.divide(a, denom, out=np.zeros_like(a), where=denom > 0)
        g_u = np.divide(b, denom, out=np.zeros_like(b), where=denom > 0)
        m_sum = float((g_m * freq).sum())
        u_sum = float((g_u * freq).sum())
        if m_sum <= 0.0 or u_sum <= 0.0:
            # degenerate posterior (all mass in one class) — the reference
            # would divide by zero here; keep the last finite estimates
            converged = True
            break

        prev_m, prev_u, prev_p = m.copy(), u.copy(), p
        m = (rows.T * (g_m * freq)).sum(axis=1) / m_sum
        u = (rows.T * (g_u * freq)).sum(axis=1) / u_sum
        p = m_sum / pair_count
        # exact arithmetic keeps these in [0,1]; the numerator and
        # denominator sum in different float orders, so the ratio can land
        # epsilon above 1 and poison log(1-m) downstream — clip float error
        m = np.clip(m, 0.0, 1.0)
        u = np.clip(u, 0.0, 1.0)
        p = min(max(p, 0.0), 1.0)

        if (
            np.abs(m - prev_m).max() <= CONVERGENCE
            and np.abs(u - prev_u).max() <= CONVERGENCE
            and abs(p - prev_p) <= CONVERGENCE
        ):
            converged = True
            break

    return EMResult(m=m, u=u, p=p, iterations=iteration, converged=converged,
                    field_count=field_count, pair_count=pair_count)


def fs_log_likelihood(agreements: np.ndarray, em: EMResult) -> np.ndarray:
    """A8: sum of agree/disagree log-weights per pair (bool[B, F] input)."""
    wa, wd = em.agree_weights(), em.disagree_weights()
    return np.where(agreements, wa, wd).sum(axis=1)
