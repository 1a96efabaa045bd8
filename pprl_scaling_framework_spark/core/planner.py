"""Driver-side parameter planning (SURVEY.md section 2.8).

Parity target ``lib/blocking/HammingLSHBlockingUtil.java:41-151`` (D1) and
``lib/encoding/FieldBloomFilterEncoding.java:318-348`` (D2),
``lib/encoding/RowBloomFilterEncoding.java:398-405`` (weighted RBF size):

- ``p_theta = 1 - theta/S``; ``p = p_theta^K``;
- ``L_opt = ceil(ln(delta)/ln(1-p))``;
- ``C = round(L_opt*p - sqrt(L_opt*p*(1-p)))`` (mean minus one stddev of a
  Binomial(L_opt, p));
- ``L_c = round(((C-1) - ln(delta) + sqrt(ln(delta)^2 - 2(C-1)ln(delta)))/p)``;
- search the first L in [L_opt, L_c) with ``BinomCDF(L, p, C) < delta``.

Binomial CDF is computed exactly in pure python (no scipy dependency).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


def prob_of_base_hash_match(theta: int, s_bits: int) -> float:
    return 1.0 - (theta / float(s_bits))


def prob_hash_match(p_theta: float, k: int) -> float:
    return p_theta**k


def binom_cdf(n: int, p: float, k: int) -> float:
    """P[X <= k] for X ~ Binomial(n, p); stable log-space accumulation."""
    if k < 0:
        return 0.0
    if k >= n:
        return 1.0
    if p <= 0.0:
        return 1.0
    if p >= 1.0:
        return 0.0
    logp, log1p_ = math.log(p), math.log1p(-p)
    total = 0.0
    for i in range(0, k + 1):
        lg = (
            math.lgamma(n + 1)
            - math.lgamma(i + 1)
            - math.lgamma(n - i + 1)
            + i * logp
            + (n - i) * log1p_
        )
        total += math.exp(lg)
    return min(total, 1.0)


@dataclass(frozen=True)
class FPSPlan:
    C: int
    L: int
    L_opt: int
    L_max: int
    p_theta: float
    p_theta_k: float
    delta: float
    K: int
    theta: int
    S: int


def optimal_fps_parameters(delta: float, p: float) -> tuple[int, int, int, int]:
    """(C, L, L_opt, L_c) from confidence delta and collision prob p."""
    l_opt = math.ceil(math.log(delta) / math.log(1.0 - p))
    avg = l_opt * p
    std = math.sqrt(avg * (1.0 - p))
    c = round(avg - std)
    ln_d = math.log(delta)
    l_c = round(((c - 1) - ln_d + math.sqrt(ln_d * ln_d - 2 * (c - 1) * ln_d)) / p)
    l = l_opt
    while l < l_c:
        if binom_cdf(l, p, c) < delta:
            break
        l += 1
    return int(c), int(l), int(l_opt), int(l_c)


def plan_blocking(theta: int, s_bits: int, delta: float, K: int) -> FPSPlan:
    """D1: full FPS plan from hamming threshold / BF size / confidence / K."""
    k = K
    p_theta = prob_of_base_hash_match(theta, s_bits)
    p = prob_hash_match(p_theta, k)
    c, l, l_opt, l_c = optimal_fps_parameters(delta, p)
    return FPSPlan(
        C=max(c, 1), L=l, L_opt=l_opt, L_max=l_c,
        p_theta=p_theta, p_theta_k=p, delta=delta, K=k, theta=theta, S=s_bits,
    )


def fbf_dynamic_size(g: float, k: int) -> int:
    """D2: ``ceil(1/(1 - 0.5^(1/(g*K))))`` from avg q-gram count g."""
    return math.ceil(1.0 / (1.0 - 0.5 ** (1.0 / (g * k))))


def fbf_dynamic_sizes(gs: list[float], k: int) -> list[int]:
    return [fbf_dynamic_size(g, k) for g in gs]


def rbf_weighted_size(fbf_ns: list[int], weights: list[float]) -> int:
    """Weighted RBF length: ``max_i(fbfN_i / w_i)`` (int-truncated per ref)."""
    return max(int(n / w) for n, w in zip(fbf_ns, weights))


def rbf_uniform_composition(fbf_count: int, rbf_n: int) -> list[int]:
    """Uniform split of rbf_n bit draws: ceil for the first field, floor for
    the rest (``RowBloomFilterEncoding.java:112-121``). When rbf_n is not a
    multiple of fbf_count the counts may sum to LESS than rbf_n — the
    leftover permutation slots stay unset (0), matching the reference bit
    layout exactly."""
    per = rbf_n / float(fbf_count)
    return [math.ceil(per) if i == 0 else math.floor(per) for i in range(fbf_count)]


def rbf_weighted_composition(weights: list[float], rbf_n: int) -> list[int]:
    """Weighted draw counts ``(int)(w_i * rbfN)`` with NO remainder
    redistribution (``RowBloomFilterEncoding.java:86-90,141-144``): leftover
    permutation slots beyond ``sum(counts)`` stay unset (0)."""
    return [int(w * rbf_n) for w in weights]
