"""Mergeable sketches: HyperLogLog approximate distinct count.

Standard HLL (Flajolet et al.): md5-hash each value, bucket by the first
``p`` bits, track the max leading-zero rank per bucket; merge = elementwise
max — the mergeability is what makes it a per-batch partial aggregate
(ray_guide.md "Aggregation at scale": emit one serialized sketch per batch,
merge in a tiny second stage).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add(self, value: str) -> None:
        h = int.from_bytes(hashlib.md5(value.encode("utf-8")).digest()[:8], "big")
        bucket = h >> (64 - self.p)
        rest = h & ((1 << (64 - self.p)) - 1)
        rank = (64 - self.p) - rest.bit_length() + 1
        if rank > self.registers[bucket]:
            self.registers[bucket] = rank

    def add_many(self, values) -> "HyperLogLog":
        for v in values:
            if v is not None:
                self.add(str(v))
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        s = np.sum(2.0 ** -self.registers.astype(np.float64))
        e = alpha * m * m / s
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                e = m * math.log(m / zeros)
        return e

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        h = cls(p=data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h


class MisraGries:
    """Misra-Gries heavy-hitters summary (the deterministic frequent-items
    sketch): at most ``k`` counters; any item with true frequency
    > n/(k+1) is guaranteed present, and each estimate undercounts by at
    most n/(k+1). Mergeable (Agarwal et al.'s merge: sum counters, then
    subtract the (k+1)-th largest and drop non-positives), so per-batch
    partials fold on the driver — counters, never rows."""

    def __init__(self, k: int = 64) -> None:
        self.k = k
        self.counters: dict = {}

    def add_many(self, items) -> "MisraGries":
        c = self.counters
        k = self.k
        for x in items:
            if x in c:
                c[x] += 1
            elif len(c) < k:
                c[x] = 1
            else:
                dead = []
                for key in c:
                    c[key] -= 1
                    if c[key] == 0:
                        dead.append(key)
                for key in dead:
                    del c[key]
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        c = dict(self.counters)
        for x, n in other.counters.items():
            c[x] = c.get(x, 0) + n
        if len(c) > self.k:
            cut = sorted(c.values(), reverse=True)[self.k]
            c = {x: n - cut for x, n in c.items() if n - cut > 0}
        self.counters = c
        return self

    def serialize(self) -> bytes:
        import json

        # default=int coerces numpy integer keys/counts; key=str orders
        # deterministically across mixed key types
        return json.dumps(
            sorted(([x, n] for x, n in self.counters.items()),
                   key=lambda kv: str(kv[0])),
            default=int).encode()

    @classmethod
    def deserialize(cls, data: bytes, k: int = 64) -> "MisraGries":
        import json

        s = cls(k=k)
        s.counters = {x: n for x, n in json.loads(data.decode())}
        return s


class QuantileSketch:
    """Mergeable streaming quantile sketch (KLL-style hierarchical
    compaction, DETERMINISTIC variant: compaction keeps alternating
    odd/even survivors per level instead of coin flips, so partials are
    reproducible across runs and merge orders at the cost of a biased —
    but still O(log(n)/k)-bounded — rank error; pair with a rank-band
    check against the exact column, the same indicator pattern as
    HyperLogLog). Level i holds items of weight 2^i; each level compacts
    at capacity ``k`` by sorting and keeping every other item one level
    up."""

    def __init__(self, k: int = 256) -> None:
        self.k = k
        self.levels: list = [[]]
        self._parity = 0

    def _compact(self) -> None:
        for i, buf in enumerate(self.levels):
            if len(buf) >= self.k:
                buf.sort()
                self._parity ^= 1
                survivors = buf[self._parity::2]
                if i + 1 == len(self.levels):
                    self.levels.append([])
                self.levels[i + 1].extend(survivors)
                self.levels[i] = []

    def add_many(self, values) -> "QuantileSketch":
        for v in values:
            if v is None:
                continue
            v = float(v)
            if v != v:            # NaN
                continue
            self.levels[0].append(v)
            if len(self.levels[0]) >= self.k:
                self._compact()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, buf in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append([])
            self.levels[i].extend(buf)
        self._compact()
        return self

    def quantile(self, q: float) -> float:
        import numpy as np

        vals, wts = [], []
        for i, buf in enumerate(self.levels):
            vals.extend(buf)
            wts.extend([1 << i] * len(buf))
        if not vals:
            return float("nan")
        v = np.asarray(vals)
        w = np.asarray(wts, dtype=np.int64)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        target = max(1, int(np.ceil(q * cum[-1])))
        return float(v[np.searchsorted(cum, target, side="left")])

    def serialize(self) -> bytes:
        import json

        return json.dumps({"k": self.k, "p": self._parity,
                           "levels": self.levels}).encode()

    @classmethod
    def deserialize(cls, data: bytes) -> "QuantileSketch":
        import json

        d = json.loads(data.decode())
        s = cls(k=d["k"])
        s._parity = d["p"]
        s.levels = d["levels"]
        return s


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan): a ``d x w`` counter
    matrix; item estimate = min over the d rows; never undercounts, and
    overcounts by at most eps*N (eps = e/w) with probability >= 1-e^-d
    per item. Merge = elementwise add — a per-batch partial aggregate
    like HLL/Misra-Gries (kilobytes per batch, rows never ship).

    Hashing is the fixed-key vectorized siphash (``hash_pandas_object``
    with a distinct 16-byte key per row — process-stable; Python
    ``hash()`` is salted per process and would break merging across
    workers), one C pass per row instead of a per-item md5 loop."""

    def __init__(self, w: int = 4096, d: int = 5) -> None:
        self.w = w
        self.d = d
        self.table = np.zeros((d, w), dtype=np.int64)
        self._keys = [f"cmsketchrow{j:04d}"[:16].ljust(16, "0")
                      for j in range(d)]

    def _indices(self, values) -> "np.ndarray":
        """(d, n) bucket indices for a sequence of non-null values."""
        import pandas as pd

        s = pd.Series(list(values), dtype="object").astype(str)
        return np.stack([
            (pd.util.hash_pandas_object(s, index=False, hash_key=k)
             .to_numpy() % np.uint64(self.w)).astype(np.int64)
            for k in self._keys])

    def add_many(self, items) -> "CountMin":
        vals = [x for x in items if x is not None]
        if not vals:
            return self
        idx = self._indices(vals)
        for j in range(self.d):
            self.table[j] += np.bincount(idx[j], minlength=self.w)
        return self

    def estimate(self, value) -> int:
        idx = self._indices([value])
        return int(min(self.table[j, idx[j, 0]] for j in range(self.d)))

    def estimate_many(self, values) -> "np.ndarray":
        idx = self._indices(list(values))
        return np.min(
            np.stack([self.table[j, idx[j]] for j in range(self.d)]),
            axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        assert self.w == other.w and self.d == other.d
        self.table += other.table
        return self

    def serialize(self) -> bytes:
        return (self.w.to_bytes(4, "big") + self.d.to_bytes(4, "big")
                + self.table.tobytes())

    @classmethod
    def deserialize(cls, data: bytes) -> "CountMin":
        w = int.from_bytes(data[:4], "big")
        d = int.from_bytes(data[4:8], "big")
        s = cls(w=w, d=d)
        s.table = np.frombuffer(data[8:], dtype=np.int64).reshape(d, w).copy()
        return s
