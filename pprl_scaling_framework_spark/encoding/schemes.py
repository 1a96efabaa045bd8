"""Encoding configuration — explicit params object instead of the reference's
schema-name mangling.

The reference smuggles all encoding parameters through Avro names/doc strings
(``lib/encoding/BloomFilterEncoding.java:237-241``,
``FieldBloomFilterEncoding.java:150-165``, ``RowBloomFilterEncoding.java:260-268``).
We store an explicit :class:`EncodingConfig` (JSON-serializable, checkpointed
per run) instead — the 7 scheme variants of the factory
(``lib/encoding/BloomFilterEncodingUtil.java:141-190``) map to:

- ``clk``                         one BF over pooled q-grams of all fields;
- ``fbf`` static / dynamic        per-field BFs concatenated in field order;
- ``rbf`` uniform / weighted  x  fbf static / dynamic
                                  per-field FBFs, seeded random bit sampling
                                  + seeded random permutation.

Dual-party alignment (``BloomFilterEncodingUtil.basedOnExistingSchema``,
:276-318): both parties must encode with the *same* config object — enforced
by :meth:`EncodingConfig.aligned_with`.
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass, field
from typing import Optional

from ..core import planner
from ..core.javarandom import next_int_stream, shuffled_range_prefix

SCHEMES = ("clk", "fbf", "rbf")


@dataclass(frozen=True)
class EncodingConfig:
    scheme: str                      # clk | fbf | rbf
    fields: tuple[str, ...]          # selected (encoded) source fields
    K: int                           # hash functions per q-gram
    Q: int                           # q-gram length
    N: int = 1024                    # clk: total bits; fbf/rbf: per-field default
    fbf_sizes: Optional[tuple[int, ...]] = None   # per-field bits (fbf/rbf)
    rbf_n: Optional[int] = None                   # rbf output bits
    rbf_composition: Optional[tuple[int, ...]] = None  # bits sampled per field
    rbf_selection_seeds: Optional[tuple[int, ...]] = None
    rbf_permutation_seed: int = 1
    hash_version: str = "v3"        # v3 = reference active; v1 = old fixtures

    def __post_init__(self):
        if self.scheme not in SCHEMES:
            raise ValueError(f"unknown scheme {self.scheme!r}")
        if self.scheme in ("fbf", "rbf") and self.fbf_sizes is None:
            object.__setattr__(self, "fbf_sizes", tuple([self.N] * len(self.fields)))
        if self.scheme == "rbf":
            if self.rbf_n is None:
                object.__setattr__(self, "rbf_n", sum(self.fbf_sizes))
            if self.rbf_composition is None:
                object.__setattr__(
                    self, "rbf_composition",
                    tuple(planner.rbf_uniform_composition(len(self.fields), self.rbf_n)),
                )
            if self.rbf_selection_seeds is None:
                object.__setattr__(
                    self, "rbf_selection_seeds",
                    tuple(range(1, len(self.fields) + 1)),
                )

    @property
    def total_bits(self) -> int:
        if self.scheme == "clk":
            return self.N
        if self.scheme == "fbf":
            return sum(self.fbf_sizes)
        return self.rbf_n

    @property
    def n_bytes(self) -> int:
        return (self.total_bits + 7) // 8

    def aligned_with(self, other: "EncodingConfig") -> bool:
        """Dual-party bit-layout alignment check (field *names* may differ)."""
        return (
            self.scheme == other.scheme
            and self.K == other.K
            and self.Q == other.Q
            and self.total_bits == other.total_bits
            and self.fbf_sizes == other.fbf_sizes
            and self.rbf_composition == other.rbf_composition
            and self.rbf_selection_seeds == other.rbf_selection_seeds
            and self.rbf_permutation_seed == other.rbf_permutation_seed
            and len(self.fields) == len(other.fields)
        )

    def rbf_plan(self) -> tuple[list[list[int]], list[int]]:
        """(selected_bits per field, bit permutation) — seeded Java streams.

        Parity: selection ``Random(seed).nextInt(fbfN)`` stream
        (``RowBloomFilterEncoding.java:352-367``), permutation
        ``Collections.shuffle(0..rbfN, Random(seed))`` (:369-388).
        """
        assert self.scheme == "rbf"
        selected = [
            next_int_stream(cnt, self.fbf_sizes[i], self.rbf_selection_seeds[i])
            for i, cnt in enumerate(self.rbf_composition)
        ]
        perm = shuffled_range_prefix(self.rbf_n, self.rbf_n, self.rbf_permutation_seed)
        return selected, perm

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "EncodingConfig":
        d = json.loads(s)
        for key in ("fields", "fbf_sizes", "rbf_composition", "rbf_selection_seeds"):
            if d.get(key) is not None:
                d[key] = tuple(d[key])
        return EncodingConfig(**d)


def clk(fields: list[str], N: int = 1024, K: int = 10, Q: int = 2) -> EncodingConfig:
    return EncodingConfig(scheme="clk", fields=tuple(fields), N=N, K=K, Q=Q)


def fbf_static(fields: list[str], N: int = 1024, K: int = 10, Q: int = 2) -> EncodingConfig:
    return EncodingConfig(scheme="fbf", fields=tuple(fields), N=N, K=K, Q=Q)


def fbf_dynamic(fields: list[str], avg_qgrams: list[float], K: int = 10, Q: int = 2) -> EncodingConfig:
    sizes = tuple(planner.fbf_dynamic_sizes(avg_qgrams, K))
    return EncodingConfig(scheme="fbf", fields=tuple(fields), K=K, Q=Q, fbf_sizes=sizes)


def rbf_uniform(
    fields: list[str], fbf_sizes: list[int], rbf_n: int | None = None,
    K: int = 10, Q: int = 2, permutation_seed: int = 1,
    selection_seeds: list[int] | None = None,
) -> EncodingConfig:
    rbf_n = rbf_n or sum(fbf_sizes)
    return EncodingConfig(
        scheme="rbf", fields=tuple(fields), K=K, Q=Q,
        fbf_sizes=tuple(fbf_sizes), rbf_n=rbf_n,
        rbf_composition=tuple(planner.rbf_uniform_composition(len(fields), rbf_n)),
        rbf_selection_seeds=tuple(selection_seeds) if selection_seeds else None,
        rbf_permutation_seed=permutation_seed,
    )


def rbf_weighted(
    fields: list[str], fbf_sizes: list[int], weights: list[float],
    K: int = 10, Q: int = 2, permutation_seed: int = 1,
    selection_seeds: list[int] | None = None,
) -> EncodingConfig:
    rbf_n = planner.rbf_weighted_size(list(fbf_sizes), list(weights))
    return EncodingConfig(
        scheme="rbf", fields=tuple(fields), K=K, Q=Q,
        fbf_sizes=tuple(fbf_sizes), rbf_n=rbf_n,
        rbf_composition=tuple(planner.rbf_weighted_composition(list(weights), rbf_n)),
        rbf_selection_seeds=tuple(selection_seeds) if selection_seeds else None,
        rbf_permutation_seed=permutation_seed,
    )
