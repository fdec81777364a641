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
