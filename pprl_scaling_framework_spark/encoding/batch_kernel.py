"""Vectorized batch Bloom-filter encoding kernel (numpy; no Spark imports).

This is the Arrow-batch engine behind the encode pandas UDFs. Semantics are
the reference's exactly (see core.qgrams / core.hashing / core.bloom):

- q-grams over the proper string (whitespace->`_`, `_`-padded);
- HMAC-SHA1/MD5 double hashing V3 per *unique* q-gram (dictionary-memoized
  across batches, mirroring ``lib/encoding/BloomFilter.java:202-242``);
- CLK (``lib/encoding/CLKEncoding.java:120-143``): one BF over the pooled
  grams of all selected fields, no clear between fields;
- FBF (``lib/encoding/FieldBloomFilterEncoding.java:181-215``): per-field BF
  (cleared per field) concatenated in declared field order;
- RBF (``lib/encoding/RowBloomFilterEncoding.java:296-329``): per-field FBFs,
  seeded random bit sampling per field, placed through a seeded random
  permutation. (Divergence note: the reference iterates fields in Java
  HashMap order; we use the declared field order.)

Vectorization strategy: each batch's strings are concatenated into one byte
buffer; q-gram windows become a strided (T, Q) uint8 matrix; ``np.unique``
over a void view dedupes grams so HMAC runs once per unique gram; bits are
set with one fancy-indexed assignment. Non-ASCII rows fall back to per-row
character slicing (identical results — reference grams are per *character*).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..core.bloom import pack_bits
from ..core.hashing import GramHashCache
from ..core.qgrams import proper_string, qgrams_of_string
from .schemes import EncodingConfig


def _proper_series(col: pd.Series) -> pd.Series:
    """Vectorized properString: collapse whitespace runs to '_', pad '_'."""
    s = col.fillna("").astype(str)
    p = s.str.replace(r"\s+", "_", regex=True)
    no_start = ~p.str.startswith("_")
    no_end = ~p.str.endswith("_")
    p = np.where(no_start, "_" + p, p)
    p = pd.Series(p, index=col.index).astype(str)
    p = pd.Series(np.where(no_end, p + "_", p), index=col.index).astype(str)
    # empty source string -> zero grams (QGramUtil: isEmpty -> [])
    return p.mask(s == "", "")


def gram_windows(col: pd.Series, q: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract all q-gram windows of a string column.

    Returns ``(windows, row_of_window, unique_fallback)`` where ``windows`` is
    a (T, q) uint8 matrix of gram bytes, ``row_of_window`` maps each window to
    its batch row. Non-ASCII rows are handled via the scalar path and returned
    as a third element (list of (row, [gram bytes])) — empty on the fast path.
    """
    proper = _proper_series(col)
    vals = proper.to_numpy(dtype=object)
    is_ascii = np.fromiter((v.isascii() for v in vals), dtype=bool, count=len(vals))

    fallback: list[tuple[int, list[bytes]]] = []
    if not is_ascii.all():
        for r in np.flatnonzero(~is_ascii):
            s = vals[r]
            grams = [g.encode("utf-8") for g in
                     (s[i:i + q] for i in range(max(len(s) - q + 1, 0)))] if s else []
            fallback.append((int(r), grams))
            vals[r] = ""

    joined = "".join(vals.tolist())
    buf = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
    lengths = np.array([len(v) for v in vals], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    counts = np.where(lengths >= q, lengths - q + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty((0, q), dtype=np.uint8), np.empty(0, dtype=np.int64), fallback
    row_of_window = np.repeat(np.arange(len(vals), dtype=np.int64), counts)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
    win_start = starts[row_of_window] + within
    windows = buf[win_start[:, None] + np.arange(q, dtype=np.int64)[None, :]]
    return windows, row_of_window, fallback


def _set_field_bits(
    bits: np.ndarray,
    col: pd.Series,
    q: int,
    cache: GramHashCache,
    bit_offset: int = 0,
) -> None:
    """OR the hashed gram positions of ``col`` into ``bits`` (B, >=N) at offset."""
    windows, row_of_window, fallback = gram_windows(col, q)
    k = cache.k
    if len(windows):
        void = np.ascontiguousarray(windows).view(np.dtype((np.void, q))).ravel()
        uniq, inv = np.unique(void, return_inverse=True)
        uniq_bytes = uniq.tobytes()
        posmat = np.empty((len(uniq), k), dtype=np.int64)
        for i in range(len(uniq)):
            posmat[i] = cache.positions_bytes(uniq_bytes[i * q:(i + 1) * q])
        flat_rows = np.repeat(row_of_window, k)
        flat_pos = posmat[inv].ravel() + bit_offset
        bits[flat_rows, flat_pos] = 1
    for r, grams in fallback:
        for g in grams:
            bits[r, cache.positions_bytes(g) + bit_offset] = 1


class BatchEncoder:
    """Stateful (per python-worker) encoder for one EncodingConfig."""

    def __init__(self, config: EncodingConfig) -> None:
        self.config = config
        c = config
        if c.scheme == "clk":
            self._caches = [GramHashCache(c.N, c.K)] * len(c.fields)
        else:
            self._caches = [GramHashCache(n, c.K) for n in c.fbf_sizes]
        if c.scheme == "rbf":
            selected, perm = c.rbf_plan()
            self._rbf_selected = [np.array(s, dtype=np.int64) for s in selected]
            total = sum(len(s) for s in selected)
            self._rbf_dst = np.array(perm[:total], dtype=np.int64)

    def encode(self, cols: list[pd.Series]) -> pd.Series:
        c = self.config
        batch = len(cols[0])
        if c.scheme == "clk":
            bits = np.zeros((batch, c.N), dtype=np.uint8)
            for i, col in enumerate(cols):
                _set_field_bits(bits, col, c.Q, self._caches[i])
            packed = pack_bits(bits)
        elif c.scheme == "fbf":
            bits = np.zeros((batch, sum(c.fbf_sizes)), dtype=np.uint8)
            off = 0
            for i, col in enumerate(cols):
                _set_field_bits(bits, col, c.Q, self._caches[i], bit_offset=off)
                off += c.fbf_sizes[i]
            packed = pack_bits(bits)
        else:  # rbf
            field_bits = []
            for i, col in enumerate(cols):
                fb = np.zeros((batch, c.fbf_sizes[i]), dtype=np.uint8)
                _set_field_bits(fb, col, c.Q, self._caches[i])
                field_bits.append(fb)
            out = np.zeros((batch, c.rbf_n), dtype=np.uint8)
            # gather source bits in field order, scatter through permutation
            src = np.hstack([
                field_bits[i][:, sel] for i, sel in enumerate(self._rbf_selected)
            ]) if self._rbf_selected else np.zeros((batch, 0), dtype=np.uint8)
            out[:, self._rbf_dst] = src
            packed = pack_bits(out)
        nb = self.config.n_bytes
        assert packed.shape[1] == nb, (packed.shape, nb)
        data = packed.tobytes()
        return pd.Series([data[i * nb:(i + 1) * nb] for i in range(batch)])
