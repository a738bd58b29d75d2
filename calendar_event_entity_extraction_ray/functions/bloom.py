"""Vectorized Bloom filter over 63-bit key hashes — the shuffle-volume
pre-filter for semi/anti joins.

Keys are first reduced to the engine's process-stable content hash
(``stages/dedup.py:hash64_columns``); the filter derives its k probe
positions from that hash with splitmix64-style mixing (pure uint64
arithmetic — stable across processes and nodes, no Python ``hash()``).
No false negatives by construction (equal keys → equal hash → equal
bits), so a join can safely route definite-miss rows around the
exchange; false positives only send extra rows INTO the exact exchange,
never corrupt results.

Size guidance: n_bits = 16x expected distinct keys gives ~0.6% false
positives at k=4; the bit array ships once via ray.put (2 MB for 16M
bits) and per-batch partial filters OR-fold on the driver.
"""

from __future__ import annotations

import numpy as np

_MIX_SEEDS = (0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
              0xD6E8FEB86659FD93)


def _mix(h: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer with a seed offset — one independent probe
    stream per seed."""
    with np.errstate(over="ignore"):
        z = (h + np.uint64(seed)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 24, k: int = 4) -> None:
        assert n_bits % 64 == 0
        self.n_bits = n_bits
        self.k = min(k, len(_MIX_SEEDS))
        self.words = np.zeros(n_bits // 64, dtype=np.uint64)

    def add_hashes(self, hashes: np.ndarray) -> "BloomFilter":
        h = hashes.astype(np.uint64)
        for i in range(self.k):
            pos = _mix(h, _MIX_SEEDS[i]) % np.uint64(self.n_bits)
            np.bitwise_or.at(self.words, (pos >> np.uint64(6)),
                             np.uint64(1) << (pos & np.uint64(63)))
        return self

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        mask = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            pos = _mix(h, _MIX_SEEDS[i]) % np.uint64(self.n_bits)
            bit = (self.words[(pos >> np.uint64(6))]
                   >> (pos & np.uint64(63))) & np.uint64(1)
            mask &= bit.astype(bool)
        return mask

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert other.n_bits == self.n_bits and other.k == self.k
        self.words |= other.words
        return self

    def serialize(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, k: int = 4) -> "BloomFilter":
        f = cls(n_bits=len(data) * 8, k=k)
        f.words = np.frombuffer(data, dtype=np.uint64).copy()
        return f
