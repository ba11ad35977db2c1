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


def utf8_view(strings: pa.Array | pa.ChunkedArray | list[str]):
    """Zero-copy view of a string array's UTF-8 bytes.

    Returns ``(data, starts, ends)`` where ``data`` is the uint8 byte buffer
    sliced to cover exactly the array's strings, and ``starts``/``ends`` are
    int64 per-string ranges into it (contiguous: ``ends[i] == starts[i+1]``).
    The building block for every byte-level vectorized kernel (tokenization,
    rolling hashes) — no per-doc ``encode()`` calls.
    """
    if isinstance(strings, list):
        strings = pa.array(strings, type=pa.string())
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if pa.types.is_large_string(strings.type):
        strings = strings.cast(pa.string())
    n = len(strings)
    if n == 0:
        return (
            np.empty(0, dtype=np.uint8),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
    bufs = strings.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=np.int32, count=n + 1, offset=strings.offset * 4
    ).astype(np.int64)
    base = offsets[0]
    data = np.frombuffer(bufs[2], dtype=np.uint8)[base : offsets[-1]]
    return data, offsets[:-1] - base, offsets[1:] - base


def hash_spans(data: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64 over arbitrary byte spans of one buffer.

    One numpy pass per character position (bounded by the longest span), the
    same technique as :func:`fnv1a_u64` but span-addressed — used to hash
    every token of every doc in a batch in a handful of passes instead of a
    per-byte Python loop.
    """
    n = len(starts)
    out = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    maxlen = int(lengths.max())
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            mask = lengths > i
            if not mask.any():
                break
            ch = data[starts[mask] + i].astype(np.uint64)
            out[mask] = (out[mask] ^ ch) * FNV_PRIME
    return out


# ASCII whitespace lookup for byte-level tokenization. Matches Python's
# ``str.split()`` for ASCII text (the oracle's regex ``\s`` is narrower
# still); documents in non-ASCII scripts would need a codepoint-level path.
WS_LUT = np.zeros(256, dtype=bool)
WS_LUT[[9, 10, 11, 12, 13, 32]] = True


def token_spans(data: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Whitespace-token boundaries for a batch of docs sharing one buffer.

    Returns ``(tok_starts, tok_lengths, doc_offsets)``: span positions into
    ``data`` (ordered by doc) and an int64 ``doc_offsets`` of length n+1
    delimiting each doc's tokens. Fully vectorized; tokens never span docs.
    """
    n = len(starts)
    empty = (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.zeros(n + 1, dtype=np.int64),
    )
    if n == 0 or len(data) == 0:
        return empty
    nonws = ~WS_LUT[data]
    prev = np.empty(len(data), dtype=bool)
    prev[0] = False
    prev[1:] = nonws[:-1]
    # a token never continues across a doc boundary; trailing empty docs
    # have starts[i] == len(data), which must not be indexed
    prev[starts[starts < len(data)]] = False
    nxt = np.empty(len(data), dtype=bool)
    nxt[-1] = False
    nxt[:-1] = nonws[1:]
    last_byte = ends[ends > starts] - 1
    nxt[last_byte] = False
    tok_starts = np.flatnonzero(nonws & ~prev)
    tok_ends = np.flatnonzero(nonws & ~nxt) + 1
    if len(tok_starts) == 0:
        return empty
    doc_of = np.searchsorted(starts, tok_starts, side="right") - 1
    counts = np.bincount(doc_of, minlength=n)
    doc_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=doc_offsets[1:])
    return tok_starts, tok_ends - tok_starts, doc_offsets


def token_hash_arrays(strings) -> tuple[np.ndarray, np.ndarray]:
    """Batch variant of per-doc token hashing: FNV-1a 64 of every whitespace
    token of every doc, flat + doc offsets. Bit-identical to hashing each
    ``doc.split()`` token separately, at ~vector speed."""
    data, starts, ends = utf8_view(strings)
    tok_starts, tok_lengths, doc_offsets = token_spans(data, starts, ends)
    return hash_spans(data, tok_starts, tok_lengths), doc_offsets


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
