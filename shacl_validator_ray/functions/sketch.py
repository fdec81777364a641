"""Mergeable sketches (SURVEY.md A9 note: approximate distinct at 10^12).

HyperLogLog with 2^p registers: each batch emits one serialized sketch
row; sketches merge by elementwise max — the canonical
pre-aggregate-then-merge shape from the Ray guide (no shuffle of raw
values at all).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.reg = np.zeros(self.m, dtype=np.uint8)

    def add_all(self, values) -> None:
        for v in values:
            h = int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "little")
            idx = h & (self.m - 1)
            w = h >> self.p
            rank = (64 - self.p) - w.bit_length() + 1
            if rank > self.reg[idx]:
                self.reg[idx] = rank

    def merge(self, other: "HLL") -> "HLL":
        out = HLL(self.p)
        out.reg = np.maximum(self.reg, other.reg)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.reg.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.reg == 0))
            if zeros:
                est = m * np.log(m / zeros)  # small-range correction
        return float(est)


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12) -> float:
    """Distributed approximate count-distinct: one HLL partial per batch
    (serialized registers), merged on the driver. Standard error ≈
    1.04/√(2^p) ≈ 1.6% at p=12."""

    def partial(b: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_all(b[col].to_pylist())
        return pa.table({"sketch": pa.array([h.reg.tobytes()], pa.binary())})

    merged = HLL(p)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        for blob in b["sketch"].to_pylist():
            other = HLL(p)
            other.reg = np.frombuffer(blob, dtype=np.uint8).copy()
            merged = merged.merge(other)
    return merged.estimate()


class BloomFilter:
    """Fixed-size membership sketch — the broadcast swap for entity-scale
    Python sets (SURVEY.md §2.3 scale note; a set entry costs ~120 B,
    a bloom slot ``bits_per_item/8`` B). Mergeable by bitwise OR, so it
    composes as per-batch partials exactly like :class:`HLL`.

    False positives SUPPRESS findings (a value wrongly "in" a class set,
    a focus wrongly "conformant") — sized at 64 bits/item, k=10 the FP
    rate is ~4e-9, i.e. zero expected over 1e8 membership probes.
    Hashing is the pandas string hash (process-stable) with two keys →
    double hashing; vectorized add/contains over numpy object arrays.
    """

    __slots__ = ("n_bits", "k", "bits")
    _KEY2 = "fedcba9876543210"

    def __init__(self, n_bits: int, k: int = 10, bits: np.ndarray | None = None):
        self.n_bits = int(max(8, n_bits))
        self.k = k
        self.bits = (bits if bits is not None
                     else np.zeros((self.n_bits + 7) // 8, dtype=np.uint8))

    @classmethod
    def from_items(cls, items, bits_per_item: int = 64, k: int = 10) -> "BloomFilter":
        bf = cls(max(1, len(items)) * bits_per_item, k)
        bf.add_array(np.fromiter(items, dtype=object, count=len(items)))
        return bf

    def _hashes(self, values: np.ndarray):
        import pandas as pd

        s = pd.Series(values)
        h1 = pd.util.hash_pandas_object(s, index=False).to_numpy(np.uint64)
        h2 = pd.util.hash_pandas_object(
            s, index=False, hash_key=self._KEY2).to_numpy(np.uint64)
        return h1, h2 | np.uint64(1)  # odd step → full-cycle double hashing

    def add_array(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        h1, h2 = self._hashes(values)
        nb = np.uint64(self.n_bits)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % nb
            # bitwise_or.at: repeated byte indices must all land
            np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))

    def contains_array(self, values: np.ndarray) -> np.ndarray:
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._hashes(values)
        nb = np.uint64(self.n_bits)
        out = np.ones(len(values), dtype=bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % nb
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            out &= ((byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
        return out

    def __contains__(self, item) -> bool:
        return bool(self.contains_array(np.array([item], dtype=object))[0])

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        self.bits |= other.bits
        return self


def contains_mask(container, values: np.ndarray) -> np.ndarray:
    """Vectorized membership for either a plain set or a BloomFilter."""
    if hasattr(container, "contains_array"):
        return container.contains_array(values)
    return np.fromiter((v in container for v in values), dtype=bool,
                       count=len(values))


class QuantileSketch:
    """Mergeable approximate quantiles: each partial keeps ``k``
    equally-spaced order statistics of its input (weight = rows/point);
    merge concatenates and re-compresses. Rank error is bounded by
    n/(2k) summed over merges — the cheap cousin of KLL/t-digest, and
    the streaming swap for :func:`~..pipelines.relational.quantiles_qty`
    when three scans are too many."""

    __slots__ = ("k", "points", "weights")

    def __init__(self, k: int = 256):
        self.k = k
        self.points = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)

    @classmethod
    def from_values(cls, values, k: int = 256) -> "QuantileSketch":
        s = cls(k)
        v = np.sort(np.asarray(values, dtype=np.float64))
        if len(v) == 0:
            return s
        take = min(k, len(v))
        idx = ((np.arange(take) + 0.5) * len(v) / take).astype(np.int64)
        s.points = v[np.clip(idx, 0, len(v) - 1)]
        s.weights = np.full(take, len(v) / take, dtype=np.float64)
        return s

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        pts = np.concatenate([self.points, other.points])
        wts = np.concatenate([self.weights, other.weights])
        order = np.argsort(pts, kind="stable")
        pts, wts = pts[order], wts[order]
        if len(pts) > 2 * self.k:  # re-compress to k weighted points
            cum = np.cumsum(wts)
            total = cum[-1]
            targets = (np.arange(self.k) + 0.5) * total / self.k
            sel = np.searchsorted(cum, targets)
            out = QuantileSketch(self.k)
            out.points = pts[np.clip(sel, 0, len(pts) - 1)]
            out.weights = np.full(self.k, total / self.k, dtype=np.float64)
            return out
        out = QuantileSketch(self.k)
        out.points, out.weights = pts, wts
        return out

    def quantile(self, q: float) -> float:
        if len(self.points) == 0:
            return float("nan")
        cum = np.cumsum(self.weights)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target))
        return float(self.points[min(i, len(self.points) - 1)])


def approx_quantiles(ds: rd.Dataset, col: str, qs, k: int = 256) -> list[float]:
    """ONE pass: per-batch QuantileSketch partials (k floats each), merged
    on the driver — fixed-size structures only."""
    def partial(b: pa.Table) -> pa.Table:
        s = QuantileSketch.from_values(
            np.asarray(b[col], dtype=np.float64), k)
        return pa.table({"pts": pa.array([s.points.tolist()],
                                         pa.list_(pa.float64())),
                         "wts": pa.array([s.weights.tolist()],
                                         pa.list_(pa.float64()))})

    merged = QuantileSketch(k)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        for pts, wts in zip(b["pts"].to_pylist(), b["wts"].to_pylist()):
            part = QuantileSketch(k)
            part.points = np.asarray(pts, dtype=np.float64)
            part.weights = np.asarray(wts, dtype=np.float64)
            merged = merged.merge(part)
    return [merged.quantile(q) for q in qs]


class CountMin:
    """Mergeable Count-Min sketch: ``depth × width`` int64 counters;
    adds/queries are vectorized over value arrays (one stable hash per
    depth row, the pandas hash with a per-row salt). Estimates NEVER
    undercount, so values whose estimate clears a threshold are a
    SUPERSET of the true heavy hitters — the sketch gates a cheap exact
    verification pass (see relational.heavy_hitters)."""

    def __init__(self, width: int = 4096, depth: int = 4,
                 table: "np.ndarray | None" = None):
        self.width, self.depth = width, depth
        self.table = (table if table is not None
                      else np.zeros((depth, width), dtype=np.int64))

    def _idx(self, values, j: int) -> "np.ndarray":
        import pandas as pd

        s = pd.Series(values).astype(str) + f"\x1f{j}"
        h = pd.util.hash_pandas_object(s, index=False).to_numpy()
        return (h % self.width).astype(np.int64)

    def add_array(self, values, counts=None) -> None:
        counts = (np.ones(len(values), dtype=np.int64)
                  if counts is None else np.asarray(counts, dtype=np.int64))
        for j in range(self.depth):
            np.add.at(self.table[j], self._idx(values, j), counts)

    def estimate_array(self, values) -> "np.ndarray":
        est = None
        for j in range(self.depth):
            v = self.table[j][self._idx(values, j)]
            est = v if est is None else np.minimum(est, v)
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        self.table += other.table
        return self
