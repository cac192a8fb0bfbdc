"""Stable 64-bit vertex-id encoding for transcript entities.

The reference uses dense ``vertex_id_t`` (uint32) assigned at graph
construction (``flash-graph/vertex.h``; SURVEY.md §1.1). At 10^12-turn scale
a global dictionary encode is itself a full shuffle, so the default here is
a *stable hash* (FIXTURES.md §3): ids are identical across runs, processes
and parallelism levels, with no coordination.

Two-level scheme, chosen so the hot path is fully vectorized:

- entity vertices (few): ``id64("tool:" + name)`` / ``id64("role:" + name)``
  / ``id64("conv:" + conv_id)`` — SHA-1 truncated to 63 bits.
- turn vertices (one per turn, the bulk): ``splitmix64`` finalizer applied to
  ``conv_hash + GOLDEN * (turn_idx + 1)`` — numpy-vectorized; only the
  per-unique-conversation SHA-1 touches Python.

All ids are masked to [0, 2^63) so they fit Arrow int64 and ``id % P`` is a
valid partition key. Collision odds at 10^12 keys in 2^63 space are the
birthday bound ~ (10^12)^2 / 2^64 ≈ 5% per graph — acceptable for the
benchmark path; correctness-critical deployments can run the split-hash
collision-check job (two independent 64-bit hashes, join on first, compare
second) described in SURVEY.md §7.3.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MASK63 = np.uint64(0x7FFF_FFFF_FFFF_FFFF)
_GOLDEN = np.uint64(0x9E37_79B9_7F4A_7C15)


def id64(key: str) -> int:
    """Stable 63-bit id of a namespaced entity key (e.g. ``"tool:search"``)."""
    digest = hashlib.sha1(key.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain, Steele et al. 2014) — vectorized."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _GOLDEN
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58_476D_1CE4_E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D0_49BB_1331_11EB)
        z = z ^ (z >> np.uint64(31))
    return z


def id64_array(keys) -> np.ndarray:
    """Stable ids for an array of entity-key strings (hashes unique values
    once; fine for low-cardinality columns like role/tool)."""
    arr = np.asarray(keys, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    ids = np.fromiter((id64(k) for k in uniq), dtype=np.int64, count=len(uniq))
    return ids[inv]


def conv_hashes(conv_ids) -> np.ndarray:
    """Per-row 63-bit hash of ``"conv:" + conv_id`` (unique convs hashed once)."""
    arr = np.asarray(conv_ids, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    ids = np.fromiter(
        (id64("conv:" + c) for c in uniq), dtype=np.int64, count=len(uniq)
    )
    return ids[inv]


def turn_vertex_ids(conv_ids, turn_idx) -> np.ndarray:
    """Vectorized stable id of a (conv_id, turn_idx) turn vertex."""
    ch = conv_hashes(conv_ids).astype(np.uint64)
    t = np.asarray(turn_idx).astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = _splitmix64(ch + _GOLDEN * (t + np.uint64(1)))
    return (mixed & _MASK63).view(np.int64).copy()


def turn_vertex_ids_from_hashes(conv_hash: np.ndarray, turn_idx: np.ndarray) -> np.ndarray:
    """Same as :func:`turn_vertex_ids` given precomputed conv hashes."""
    ch = np.asarray(conv_hash).astype(np.uint64)
    t = np.asarray(turn_idx).astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = _splitmix64(ch + _GOLDEN * (t + np.uint64(1)))
    return (mixed & _MASK63).view(np.int64).copy()


def tool_vertex(name: str) -> int:
    return id64("tool:" + name)


def role_vertex(name: str) -> int:
    return id64("role:" + name)


def id64_chunked(arr: pa.ChunkedArray) -> np.ndarray:
    """Arrow string column -> stable id array."""
    return id64_array(arr.to_numpy(zero_copy_only=False))
