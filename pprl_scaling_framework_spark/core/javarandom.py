"""Bit-exact re-implementation of ``java.util.Random`` (a documented 48-bit
LCG) plus ``java.util.Collections.shuffle``.

Needed because the reference derives Hamming-LSH bit selections and RBF
bit-sampling/permutations from seeded Java PRNG streams:

- HLSH group bits: ``Collections.shuffle(bitList, new Random(seed))`` then
  take the first K (reference ``lib/blocking/HammingLSHBlockingGroup.java:43-50``,
  per-group seed ``(i+1)*seed`` at ``lib/blocking/HammingLSHBlocking.java:101-111``).
- RBF bit selection ``Random(seed).nextInt(maxBit)`` stream and bit
  permutation ``Collections.shuffle(..., new Random(seed))``
  (reference ``lib/encoding/RowBloomFilterEncoding.java:352-388``).

Only the documented LCG semantics of the JDK javadoc are reproduced; no code
is copied.
"""

from __future__ import annotations

_MULT = 0x5DEECE66D
_ADD = 0xB
_MASK = (1 << 48) - 1


class JavaRandom:
    """java.util.Random: 48-bit linear congruential generator."""

    def __init__(self, seed: int) -> None:
        self.seed = (seed ^ _MULT) & _MASK

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * _MULT + _ADD) & _MASK
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        """Random int in [0, bound) with java.util.Random.nextInt(bound) semantics."""
        if bound <= 0:
            raise ValueError("bound must be positive")
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            # Java retries when `bits - val + (bound - 1)` overflows int32.
            if bits - val + (bound - 1) < (1 << 31):
                return val


def collections_shuffle(items: list, rnd: JavaRandom) -> list:
    """In-place Fisher-Yates exactly as java.util.Collections.shuffle."""
    for i in range(len(items) - 1, 0, -1):
        j = rnd.next_int(i + 1)
        items[i], items[j] = items[j], items[i]
    return items


def shuffled_range_prefix(n: int, k: int, seed: int) -> list[int]:
    """First ``k`` elements of ``shuffle([0..n), Random(seed))``.

    This is exactly the seeded HLSH blocking-group bit selection and the RBF
    bit permutation primitive of the reference.
    """
    items = list(range(n))
    collections_shuffle(items, JavaRandom(seed))
    return items[:k]


def next_int_stream(n: int, bound: int, seed: int) -> list[int]:
    """``n`` draws of ``Random(seed).nextInt(bound)`` (RBF bit selection)."""
    rnd = JavaRandom(seed)
    return [rnd.next_int(bound) for _ in range(n)]
