"""Hot-key salting for skewed mega-conversations (north-rule W5/skew).

A conversation with 1000× the median turn count would make one partition the
straggler in any conv-keyed shuffle. Salting splits the hot key by a
deterministic sub-key and merges in a second, tiny pass:

- **Tumbling** aggregates are trivially decomposable: partial counts per
  ``(conv, window)`` computed per BATCH (no conv co-location at all), then a
  global groupby over the much smaller partials — the pre-aggregation
  pattern; a hot (conv, window) key contributes at most one partial row per
  batch.

- **Session** windows need ordered scans, so the salt must respect turn
  order: ``chunk = turn_idx // C`` (contiguous turn ranges; turn_idx is
  dense per conv, so chunk numbers are contiguous too). Phase 1 sessionizes
  each ``(conv, chunk)`` independently (keyed by ``hash(conv, chunk)`` —
  the salted shuffle); sessions can only span CHUNK BOUNDARIES, so phase 2
  merges each conv's island summaries (tiny: one row per island) where the
  boundary gap ≤ the session gap. Outputs are identical to the unsalted
  kernel — verified against the same DuckDB oracle.

Cited reference analog: dstream has per-table isolation only and no skew
handling (SURVEY.md §4); this is new engineering the 10^12-turn target
requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dstream_ray.common import fnv1a_u64

US = 1_000_000


def phase1_sessionize_chunks(batch: pa.Table, *, gap_s: int, chunk_turns: int) -> pa.Table:
    """Vectorized: rows of one or more whole (conv, chunk) groups -> island
    summary rows. Requires each (conv, chunk) fully contained in the batch
    (guaranteed by the salted groupby)."""
    gap_us = gap_s * US
    conv = batch["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    enc = conv.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    role = batch["role"]
    if isinstance(role, pa.ChunkedArray):
        role = role.combine_chunks()
    is_user = pc.equal(role, "user").to_numpy(zero_copy_only=False)
    is_tool = pc.equal(role, "tool").to_numpy(zero_copy_only=False)

    chunk = turn // chunk_turns
    order = np.lexsort((turn, chunk, codes))
    codes, turn, ts = codes[order], turn[order], ts[order]
    chunk = chunk[order]
    is_user, is_tool = is_user[order], is_tool[order]

    n = len(codes)
    if n == 0:
        return _EMPTY_ISLANDS
    new_group = np.zeros(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = (codes[1:] != codes[:-1]) | (chunk[1:] != chunk[:-1])
    gap_break = np.zeros(n, dtype=bool)
    gap_break[1:] = (~new_group[1:]) & ((ts[1:] - ts[:-1]) > gap_us)
    starts = np.flatnonzero(new_group | gap_break)
    ones = np.ones(n, dtype=np.int64)
    return pa.table(
        {
            "conv_id": pa.DictionaryArray.from_arrays(
                pa.array(codes[starts].astype(np.int32)), enc.dictionary
            ).cast(pa.string()),
            "chunk": pa.array(chunk[starts]),
            "n_turns": pa.array(np.add.reduceat(ones, starts)),
            "n_user_turns": pa.array(np.add.reduceat(is_user.astype(np.int64), starts)),
            "n_tool_turns": pa.array(np.add.reduceat(is_tool.astype(np.int64), starts)),
            "first_turn_idx": pa.array(turn[starts]),
            "last_turn_idx": pa.array(np.maximum.reduceat(turn, starts)),
            "min_ts": pa.array(ts[starts]),
            "max_ts": pa.array(np.maximum.reduceat(ts, starts)),
        }
    )


_EMPTY_ISLANDS = pa.table(
    {
        "conv_id": pa.array([], type=pa.string()),
        "chunk": pa.array([], type=pa.int64()),
        "n_turns": pa.array([], type=pa.int64()),
        "n_user_turns": pa.array([], type=pa.int64()),
        "n_tool_turns": pa.array([], type=pa.int64()),
        "first_turn_idx": pa.array([], type=pa.int64()),
        "last_turn_idx": pa.array([], type=pa.int64()),
        "min_ts": pa.array([], type=pa.int64()),
        "max_ts": pa.array([], type=pa.int64()),
    }
)


def phase2_merge_islands(batch: pa.Table, *, gap_s: int) -> pa.Table:
    """Merge island summaries per conv (one row per island — tiny even for a
    mega-conversation) into final session rows. An island continues the
    previous session iff its min_ts is within gap of the previous island's
    max_ts (only possible at chunk boundaries by construction)."""
    gap_us = gap_s * US
    conv = batch["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    enc = conv.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    first_turn = batch["first_turn_idx"].to_numpy(zero_copy_only=False)
    order = np.lexsort((first_turn, codes))
    codes = codes[order]
    cols = {
        c: batch[c].to_numpy(zero_copy_only=False)[order]
        for c in [
            "n_turns", "n_user_turns", "n_tool_turns",
            "first_turn_idx", "last_turn_idx", "min_ts", "max_ts",
        ]
    }
    n = len(codes)
    if n == 0:
        return _EMPTY_SESSIONS
    new_conv = np.zeros(n, dtype=bool)
    new_conv[0] = True
    new_conv[1:] = codes[1:] != codes[:-1]
    gap_ok = np.zeros(n, dtype=bool)
    gap_ok[1:] = (~new_conv[1:]) & (
        (cols["min_ts"][1:] - cols["max_ts"][:-1]) <= gap_us
    )
    starts = np.flatnonzero(~gap_ok)
    # session_id = 0-based index within conv
    sess_seq = np.cumsum(~gap_ok) - 1
    conv_starts = np.flatnonzero(new_conv)
    conv_base = np.repeat(
        sess_seq[conv_starts], np.diff(np.r_[conv_starts, n])
    )
    session_id = sess_seq - conv_base
    return pa.table(
        {
            "conv_id": pa.DictionaryArray.from_arrays(
                pa.array(codes[starts].astype(np.int32)), enc.dictionary
            ).cast(pa.string()),
            "session_id": pa.array(session_id[starts]),
            "n_turns": pa.array(np.add.reduceat(cols["n_turns"], starts)),
            "n_user_turns": pa.array(np.add.reduceat(cols["n_user_turns"], starts)),
            "n_tool_turns": pa.array(np.add.reduceat(cols["n_tool_turns"], starts)),
            "first_turn_idx": pa.array(cols["first_turn_idx"][starts]),
            "last_turn_idx": pa.array(np.maximum.reduceat(cols["last_turn_idx"], starts)),
            "duration_us": pa.array(
                np.maximum.reduceat(cols["max_ts"], starts) - cols["min_ts"][starts]
            ),
        }
    )


_EMPTY_SESSIONS = pa.table(
    {
        "conv_id": pa.array([], type=pa.string()),
        "session_id": pa.array([], type=pa.int64()),
        "n_turns": pa.array([], type=pa.int64()),
        "n_user_turns": pa.array([], type=pa.int64()),
        "n_tool_turns": pa.array([], type=pa.int64()),
        "first_turn_idx": pa.array([], type=pa.int64()),
        "last_turn_idx": pa.array([], type=pa.int64()),
        "duration_us": pa.array([], type=pa.int64()),
    }
)


def add_salted_partition(
    batch: pa.Table, *, chunk_turns: int, num_partitions: int
) -> pa.Table:
    """salt_partition = hash(conv_id, turn_idx // chunk_turns) % P — splits a
    mega-conversation's turn ranges across partitions."""
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    chunk = turn // chunk_turns
    h = fnv1a_u64(batch["conv_id"])
    with np.errstate(over="ignore"):
        mixed = h ^ (chunk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    return batch.append_column(
        "salt_partition",
        pa.array((mixed % np.uint64(num_partitions)).astype(np.int32)),
    )


def salted_session_windows(
    transcripts_ds,
    *,
    gap_s: int,
    chunk_turns: int = 512,
    num_partitions: int = 64,
):
    """Dataset pipeline: salted shuffle -> per-chunk sessionize -> per-conv
    island merge. Output schema identical to ``session_kernel`` (flush)."""
    ds = transcripts_ds.map_batches(
        lambda b: add_salted_partition(
            b, chunk_turns=chunk_turns, num_partitions=num_partitions
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    islands = ds.groupby("salt_partition").map_groups(
        lambda g: phase1_sessionize_chunks(g, gap_s=gap_s, chunk_turns=chunk_turns),
        batch_format="pyarrow",
    )
    # phase 2: tiny shuffle over island summaries, keyed by conv hash
    def add_conv_part(b: pa.Table) -> pa.Table:
        h = fnv1a_u64(b["conv_id"]) % np.uint64(num_partitions)
        return b.append_column("conv_partition", pa.array(h.astype(np.int32)))

    return (
        islands.map_batches(add_conv_part, batch_format="pyarrow")
        .groupby("conv_partition")
        .map_groups(
            lambda g: phase2_merge_islands(g, gap_s=gap_s), batch_format="pyarrow"
        )
    )
