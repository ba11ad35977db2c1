"""Shared vectorized helpers: hashing, partitioning, arrow utilities.

The consistent-hash partitioner replaces dstream's per-table stream isolation
(one goroutine + one topic per table, internal/publisher/messaging/azure/
servicebus/utils.go:14-27): here the unit of isolation is a hash bucket of
``conv_id``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)


def fnv1a_u64(strings: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """Vectorized FNV-1a 64-bit hash of a string array.

    Works column-wise over the Arrow string buffers: one numpy pass per
    character position (strings in a batch are short keys, so the number of
    passes is max key length). Deterministic across processes/nodes — unlike
    Python's seeded ``hash()`` — which the checkpoint/resume contract needs.
    """
    if isinstance(strings, list):
        strings = pa.array(strings, type=pa.string())
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if pa.types.is_large_string(strings.type):
        strings = strings.cast(pa.string())
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    arr = strings
    # Arrow string layout: buffers = [validity, offsets(int32), data(bytes)]
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    out = np.full(n, FNV_OFFSET, dtype=np.uint64)
    maxlen = int(lengths.max()) if n else 0
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            mask = lengths > i
            if not mask.any():
                break
            idx = starts[mask] + i
            ch = data[idx].astype(np.uint64)
            h = out[mask]
            h = (h ^ ch) * FNV_PRIME
            out[mask] = h
    return out


def fnv1a_u64_py(s: str) -> int:
    """Scalar reference implementation (for tests)."""
    h = 14695981039346656037
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def partition_ids(conv_ids: pa.Array | pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    """partition_id = fnv1a(conv_id) % P, as int32."""
    return (fnv1a_u64(conv_ids) % np.uint64(num_partitions)).astype(np.int32)


def ts_to_us(ts_col) -> np.ndarray:
    """Arrow timestamp[us] column -> int64 microseconds numpy array."""
    if isinstance(ts_col, pa.ChunkedArray):
        ts_col = ts_col.combine_chunks()
    return ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Indices where a new key-run starts in a sorted key array."""
    if len(sorted_keys) == 0:
        return np.empty(0, dtype=np.int64)
    return np.flatnonzero(np.r_[True, sorted_keys[1:] != sorted_keys[:-1]])


def segmented_cumcount(group_codes: np.ndarray) -> np.ndarray:
    """0-based position within each run of equal, already-contiguous codes."""
    n = len(group_codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    starts = segment_starts(group_codes)
    idx = np.arange(n, dtype=np.int64)
    return idx - np.repeat(idx[starts], np.diff(np.r_[starts, n]))
