"""Deterministic, dependency-free hashing helpers.

``h64`` is a pure-Python counter-based 64-bit hash (md5-backed) used by the
synthetic page generator so every row is a pure function of (seed, doc_id)
— no RNG state, so generation parallelizes arbitrarily and is identical
regardless of partitioning. The reference's analogous discipline is its
seeded Zipf test-data generator (/root/reference/tests/utils/mod.rs:17-26).
"""

from __future__ import annotations

import hashlib


def h64(*parts: object) -> int:
    """64-bit deterministic hash of the '/'-joined string parts."""
    s = "/".join(str(p) for p in parts).encode("utf-8")
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big")


def uniform01(*parts: object) -> float:
    """Deterministic uniform in [0, 1) from parts."""
    return h64(*parts) / 2**64
