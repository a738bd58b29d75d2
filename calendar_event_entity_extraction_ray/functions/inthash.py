"""Vectorized integer avalanche hash with exact DuckDB parity.

The engine's rule (CLAUDE.md): never per-row hash in hot paths. The md5
hex-prefix recipe in ``functions/textsig.py`` is DuckDB-matchable but a
Python loop per row; for INTEGER keys (doc ids, event ids) this module
provides the same 32-bit key strength fully vectorized on BOTH sides:

- numpy: uint64 lanes with ``& 0xFFFFFFFF`` masks — one pass, no loop;
- DuckDB: the identical chain in BIGINT arithmetic. The multiplier
  0x45d9f3b < 2^27 keeps every intermediate under 2^59, so signed
  BIGINT never overflows and no HUGEINT casts are needed.

The mix is the public-domain "lowbias32" double-round
(``h = ((h >> 16) ^ h) * 0x45d9f3b`` twice, then a final fold) — the
well-known murmur3-finalizer family with constants small enough for
64-bit signed SQL arithmetic. High doc-id bits fold in via
``low32 XOR high32`` so ids above 2^32 still spread.

32 bits is the SAME key strength as the md5 hex-prefix it replaces
(``hexdigest()[:8]`` = 32 bits); shuffle consumers tie-break on the id,
so collisions only pin a deterministic order, never correctness.
"""

from __future__ import annotations

import numpy as np

_M32 = 0xFFFFFFFF
_MULT = 0x45D9F3B          # < 2^27: BIGINT-safe through the whole chain
_GOLDEN = 0x9E3779B9


def shuffle_key32(ids: np.ndarray, seed: int = 42) -> np.ndarray:
    """Seeded 32-bit avalanche key per id, vectorized. Accepts any
    integer dtype (values must be >= 0, the id contract everywhere in
    this engine); returns int64 (values in [0, 2^32))."""
    x = np.asarray(ids).astype(np.uint64)
    seedmix = np.uint64((seed * _GOLDEN) & _M32)
    m32 = np.uint64(_M32)
    mult = np.uint64(_MULT)
    h = (x & m32) ^ (x >> np.uint64(32)) ^ seedmix
    h = ((h >> np.uint64(16)) ^ h) * mult & m32
    h = ((h >> np.uint64(16)) ^ h) * mult & m32
    h = (h >> np.uint64(16)) ^ h
    return h.astype(np.int64)


def shuffle_key32_sql(col: str, seed: int = 42) -> str:
    """The DuckDB expression computing EXACTLY shuffle_key32(col, seed)
    for a non-negative integer column — bit-identical, all in BIGINT."""
    seedmix = (seed * _GOLDEN) & _M32
    h0 = (f"xor(xor(CAST({col} AS BIGINT) % 4294967296, "
          f"CAST({col} AS BIGINT) // 4294967296), {seedmix})")
    h1 = f"(xor({h0} // 65536, {h0}) * {_MULT}) % 4294967296"
    h2 = f"(xor({h1} // 65536, {h1}) * {_MULT}) % 4294967296"
    return f"xor({h2} // 65536, {h2})"
