"""Event-time window + stream-stream-join kernels, keyed by ``conv_id``.

These are the north-star operators layered on dstream's capture→route→sink
loop (SURVEY.md §2.5; the reference itself has no relational operators —
/root/reference/docs/design/design.md:159-166). Every kernel is a pure
vectorized function over ONE partition's rows, sorted by
``(conv_id, turn_idx)``, plus a small carried state, so the same code path
serves:

- batch mode (single epoch, ``flush=True``) — verified against DuckDB oracles;
- streaming mode (micro-batch epochs with state carried through the
  checkpoint store) — verified by resume-equivalence tests.

Closure rule: because ``ts`` is monotonically non-decreasing per conversation
(the feed contract, ≙ per-table `(lsn, seqval)` order in the reference,
/root/reference/docs/plugins/mssql-ingester.md:70-71), a window of a
conversation closes exactly when that conversation produces a row beyond it.
State per partition is therefore just the raw rows of still-open windows
("residual") plus tiny per-conv counters — a file-backed RocksDB-style store.

All aggregates here are recomputed from residual+new rows at emission time;
residual size is bounded by open-window row counts per conversation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000

# Residual row layout carried in state (text replaced by its length: window
# aggregates never need the bytes, keeping state small).
RESIDUAL_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("ts_us", pa.int64()),
        ("n_chars", pa.int64()),
    ]
)


def to_residual_rows(batch: pa.Table) -> pa.Table:
    """Project a transcripts batch to the residual/kernel row layout."""
    return pa.table(
        {
            "conv_id": batch["conv_id"].cast(pa.string()),
            "turn_idx": batch["turn_idx"].cast(pa.int32()),
            "role": batch["role"].cast(pa.string()),
            "tool": batch["tool"].cast(pa.string()),
            "ts_us": batch["ts"].cast(pa.int64())
            if pa.types.is_timestamp(batch.schema.field("ts").type)
            else batch["ts"].cast(pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
        }
    )


@dataclass
class Cols:
    """Sorted column arrays for one partition-epoch (+ carried residual)."""

    conv: np.ndarray  # object array of conv_id strings, sorted
    codes: np.ndarray  # int codes, contiguous runs per conv
    turn: np.ndarray
    role: np.ndarray
    tool: np.ndarray
    ts: np.ndarray  # int64 µs
    n_chars: np.ndarray
    starts: np.ndarray = field(init=False)  # conv segment starts
    ends: np.ndarray = field(init=False)

    def __post_init__(self):
        n = len(self.codes)
        self.starts = np.flatnonzero(np.r_[True, self.codes[1:] != self.codes[:-1]]) if n else np.empty(0, np.int64)
        self.ends = np.r_[self.starts[1:], n] if n else np.empty(0, np.int64)


def prep(table: pa.Table) -> Cols:
    """Sort one partition's residual-layout rows by (conv_id, turn_idx)."""
    conv = np.asarray(table["conv_id"].to_pandas(), dtype=object)
    turn = table["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, codes = np.unique(conv, return_inverse=True)
    order = np.lexsort((turn, codes))
    return Cols(
        conv=conv[order],
        codes=codes[order],
        turn=turn[order],
        role=np.asarray(table["role"].to_pandas(), dtype=object)[order],
        tool=np.asarray(table["tool"].to_pandas(), dtype=object)[order],
        ts=table["ts_us"].to_numpy(zero_copy_only=False)[order],
        n_chars=table["n_chars"].to_numpy(zero_copy_only=False)[order],
    )


def _concat_residual(residual: pa.Table | None, new: pa.Table) -> pa.Table:
    if residual is None or residual.num_rows == 0:
        return new
    return pa.concat_tables([residual, new.select(residual.column_names)])


def _take(table_like: Cols, mask: np.ndarray) -> pa.Table:
    """Rows of a Cols view back into a residual-layout arrow table."""
    return pa.table(
        {
            "conv_id": pa.array(table_like.conv[mask], type=pa.string()),
            "turn_idx": pa.array(table_like.turn[mask].astype(np.int32)),
            "role": pa.array(table_like.role[mask], type=pa.string()),
            "tool": pa.array(table_like.tool[mask], type=pa.string()),
            "ts_us": pa.array(table_like.ts[mask]),
            "n_chars": pa.array(table_like.n_chars[mask]),
        }
    )


def _group_agg(keys: list[np.ndarray], cols: Cols) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Aggregate counts over contiguous (conv, key...) runs.

    ``keys`` are arrays non-decreasing within each conv segment, so runs of the
    composite key are contiguous -> segment reduction via np.add.reduceat.
    Returns (run_start_indices, aggregates dict).
    """
    n = len(cols.codes)
    if n == 0:
        return np.empty(0, np.int64), {}
    change = np.zeros(n, dtype=bool)
    change[0] = True
    change[1:] |= cols.codes[1:] != cols.codes[:-1]
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    ones = np.ones(n, dtype=np.int64)
    agg = {
        "n_turns": np.add.reduceat(ones, starts),
        "n_user_turns": np.add.reduceat((cols.role == "user").astype(np.int64), starts),
        "n_tool_turns": np.add.reduceat((cols.role == "tool").astype(np.int64), starts),
        "n_chars": np.add.reduceat(cols.n_chars, starts),
        "min_ts": np.minimum.reduceat(cols.ts, starts),
        "max_ts": np.maximum.reduceat(cols.ts, starts),
        "first_turn_idx": cols.turn[starts],
        "last_turn_idx": np.maximum.reduceat(cols.turn, starts),
    }
    return starts, agg


def _conv_last(values: np.ndarray, cols: Cols) -> np.ndarray:
    """Last value per conv segment (requires non-empty cols)."""
    return values[cols.ends - 1]


# ---------------------------------------------------------------------------
# Tumbling window
# ---------------------------------------------------------------------------


def tumbling_kernel(
    new_rows: pa.Table,
    state: dict,
    *,
    width_s: int,
    flush: bool,
) -> tuple[pa.Table, dict]:
    """Fixed ``width_s`` buckets per conv. window_id = floor(ts_sec/width).

    Oracle SQL shape:
    ``GROUP BY conv_id, CAST(floor(epoch(ts)/width) AS BIGINT)``.
    """
    w_us = width_s * US
    data = _concat_residual(state.get("residual"), new_rows)
    cols = prep(data)
    n = len(cols.codes)
    empty = pa.table(
        {
            "conv_id": pa.array([], type=pa.string()),
            "window_id": pa.array([], type=pa.int64()),
            "n_turns": pa.array([], type=pa.int64()),
            "n_user_turns": pa.array([], type=pa.int64()),
            "n_tool_turns": pa.array([], type=pa.int64()),
            "n_chars": pa.array([], type=pa.int64()),
        }
    )
    if n == 0:
        return empty, state
    bucket = cols.ts // w_us
    starts, agg = _group_agg([bucket], cols)
    # open bucket per conv = bucket of the conv's last row
    open_bucket = np.repeat(_conv_last(bucket, cols), cols.ends - cols.starts)
    if flush:
        emit_run = np.ones(len(starts), dtype=bool)
        residual = None
    else:
        row_open = bucket == open_bucket
        emit_run = ~row_open[starts]
        residual = _take(cols, row_open)
    em = starts[emit_run]
    out = pa.table(
        {
            "conv_id": pa.array(cols.conv[em], type=pa.string()),
            "window_id": pa.array(bucket[em]),
            "n_turns": pa.array(agg["n_turns"][emit_run]),
            "n_user_turns": pa.array(agg["n_user_turns"][emit_run]),
            "n_tool_turns": pa.array(agg["n_tool_turns"][emit_run]),
            "n_chars": pa.array(agg["n_chars"][emit_run]),
        }
    )
    return out, {"residual": residual}


# ---------------------------------------------------------------------------
# Sliding window
# ---------------------------------------------------------------------------


def sliding_kernel(
    new_rows: pa.Table,
    state: dict,
    *,
    width_s: int,
    slide_s: int,
    flush: bool,
) -> tuple[pa.Table, dict]:
    """Overlapping windows [b*slide, b*slide+width); each row joins
    k = width/slide windows. Emits (conv_id, window_id=b, counts).

    Carried state: residual rows that still touch an open window, plus a
    per-conv ``emitted_below`` cursor so recomputation never re-emits a closed
    window (the analog of the dual LSN+seqval dedup cursor,
    /root/reference/docs/capability-inventory.md:133).
    """
    assert width_s % slide_s == 0, "width must be a multiple of slide"
    k = width_s // slide_s
    s_us = slide_s * US
    data = _concat_residual(state.get("residual"), new_rows)
    cols = prep(data)
    emitted_below: dict = dict(state.get("emitted_below", {}))
    empty = pa.table(
        {
            "conv_id": pa.array([], type=pa.string()),
            "window_id": pa.array([], type=pa.int64()),
            "n_turns": pa.array([], type=pa.int64()),
            "n_chars": pa.array([], type=pa.int64()),
        }
    )
    n = len(cols.codes)
    if n == 0:
        return empty, state
    b = cols.ts // s_us
    # fan out each row to its k windows
    rep_idx = np.repeat(np.arange(n), k)
    offs = np.tile(np.arange(k, dtype=np.int64), n)
    win = b[rep_idx] - offs
    codes_r = cols.codes[rep_idx]
    order = np.lexsort((win, codes_r))
    rep_idx, win, codes_r = rep_idx[order], win[order], codes_r[order]
    change = np.zeros(len(win), dtype=bool)
    change[0] = True
    change[1:] = (codes_r[1:] != codes_r[:-1]) | (win[1:] != win[:-1])
    rstarts = np.flatnonzero(change)
    ones = np.ones(len(win), dtype=np.int64)
    n_turns = np.add.reduceat(ones, rstarts)
    n_chars = np.add.reduceat(cols.n_chars[rep_idx], rstarts)
    run_conv_code = codes_r[rstarts]
    run_win = win[rstarts]
    run_conv = cols.conv[rep_idx[rstarts]]

    # per conv: max bucket and closure threshold
    maxb_per_conv = _conv_last(b, cols)  # b is non-decreasing within conv
    conv_uniq_codes = cols.codes[cols.starts]
    thresh_map = {}
    low_map = {}
    for cc, mb, cname in zip(conv_uniq_codes, maxb_per_conv, cols.conv[cols.starts]):
        lo = emitted_below.get(cname, np.iinfo(np.int64).min)
        hi = np.iinfo(np.int64).max if flush else mb - k + 1
        thresh_map[cc] = hi
        low_map[cc] = lo
        if not flush:
            emitted_below[cname] = max(lo, hi) if lo != np.iinfo(np.int64).min else hi
        else:
            emitted_below.pop(cname, None)
    hi_arr = np.array([thresh_map[c] for c in run_conv_code])
    lo_arr = np.array([low_map[c] for c in run_conv_code])
    emit_run = (run_win < hi_arr) & (run_win >= np.where(lo_arr == np.iinfo(np.int64).min, np.iinfo(np.int64).min, lo_arr))
    out = pa.table(
        {
            "conv_id": pa.array(run_conv[emit_run], type=pa.string()),
            "window_id": pa.array(run_win[emit_run]),
            "n_turns": pa.array(n_turns[emit_run]),
            "n_chars": pa.array(n_chars[emit_run]),
        }
    )
    if flush:
        return out, {"residual": None, "emitted_below": {}}
    # residual: rows whose top bucket still touches an open window
    keep_thresh = np.repeat(maxb_per_conv - k + 1, cols.ends - cols.starts)
    residual = _take(cols, b >= keep_thresh)
    return out, {"residual": residual, "emitted_below": emitted_below}


# ---------------------------------------------------------------------------
# Session window + session-scoped stream-stream join
# ---------------------------------------------------------------------------


def _assign_sessions(cols: Cols, gap_us: int) -> np.ndarray:
    """0-based session index within conv (gap-and-islands over sorted ts)."""
    n = len(cols.codes)
    if n == 0:
        return np.empty(0, np.int64)
    is_start = np.zeros(n, dtype=bool)
    is_start[0] = True
    is_start[1:] = cols.codes[1:] != cols.codes[:-1]
    gap_break = np.zeros(n, dtype=bool)
    gap_break[1:] = (~is_start[1:]) & ((cols.ts[1:] - cols.ts[:-1]) > gap_us)
    brk = (is_start | gap_break).astype(np.int64)
    csum = np.cumsum(brk)
    # subtract cumsum value at conv start so each conv restarts at 0
    conv_base = np.repeat(csum[cols.starts], cols.ends - cols.starts)
    return csum - conv_base


def session_kernel(
    new_rows: pa.Table,
    state: dict,
    *,
    gap_s: int,
    flush: bool,
) -> tuple[pa.Table, dict]:
    """Gap-based session windows. session_id = number of closed sessions of
    the conv before this one (carried across epochs via ``closed_count``).

    Oracle SQL shape: gap-and-islands with
    ``lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)``.
    """
    gap_us = gap_s * US
    data = _concat_residual(state.get("residual"), new_rows)
    cols = prep(data)
    closed_count: dict = dict(state.get("closed_count", {}))
    empty = pa.table(
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
    if len(cols.codes) == 0:
        return empty, state
    sess = _assign_sessions(cols, gap_us)
    starts, agg = _group_agg([sess], cols)
    last_sess_per_conv = np.repeat(_conv_last(sess, cols), cols.ends - cols.starts)
    run_conv = cols.conv[starts]
    run_sess = sess[starts]
    base = np.array([closed_count.get(c, 0) for c in run_conv], dtype=np.int64)
    if flush:
        emit_run = np.ones(len(starts), dtype=bool)
        residual = None
        closed_count = {}
    else:
        row_open = sess == last_sess_per_conv
        emit_run = ~row_open[starts]
        residual = _take(cols, row_open)
        # advance closed_count: sessions 0..last-1 closed this epoch
        for cc_name, last_s in zip(cols.conv[cols.starts], _conv_last(sess, cols)):
            if last_s > 0:
                closed_count[cc_name] = closed_count.get(cc_name, 0) + int(last_s)
    out = pa.table(
        {
            "conv_id": pa.array(run_conv[emit_run], type=pa.string()),
            "session_id": pa.array((base + run_sess)[emit_run]),
            "n_turns": pa.array(agg["n_turns"][emit_run]),
            "n_user_turns": pa.array(agg["n_user_turns"][emit_run]),
            "n_tool_turns": pa.array(agg["n_tool_turns"][emit_run]),
            "first_turn_idx": pa.array(agg["first_turn_idx"][emit_run].astype(np.int64)),
            "last_turn_idx": pa.array(agg["last_turn_idx"][emit_run].astype(np.int64)),
            "duration_us": pa.array((agg["max_ts"] - agg["min_ts"])[emit_run]),
        }
    )
    return out, {"residual": residual, "closed_count": closed_count}


def session_join_kernel(
    new_rows: pa.Table,
    state: dict,
    *,
    gap_s: int,
    flush: bool,
) -> tuple[pa.Table, dict]:
    """Stream-stream join: each ``tool`` turn pairs with the most recent
    ``user`` turn in the SAME session of the same conv (north-star W5,
    user-turn ↔ tool-turn within a session window).

    Emitted when the session closes (deterministic w.r.t. epoch boundaries).
    Oracle SQL shape: running ``max(CASE WHEN role='user' THEN turn_idx END)
    OVER (PARTITION BY conv_id, session ORDER BY turn_idx)`` filtered to
    tool rows.
    """
    gap_us = gap_s * US
    data = _concat_residual(state.get("residual"), new_rows)
    cols = prep(data)
    closed_count: dict = dict(state.get("closed_count", {}))
    empty = pa.table(
        {
            "conv_id": pa.array([], type=pa.string()),
            "session_id": pa.array([], type=pa.int64()),
            "user_turn_idx": pa.array([], type=pa.int64()),
            "tool_turn_idx": pa.array([], type=pa.int64()),
            "tool": pa.array([], type=pa.string()),
        }
    )
    if len(cols.codes) == 0:
        return empty, state
    sess = _assign_sessions(cols, gap_us)
    # running max of user turn_idx within (conv, session) — pandas cummax is
    # a C kernel; key = composite run id
    run_id = np.cumsum(
        np.r_[True, (cols.codes[1:] != cols.codes[:-1]) | (sess[1:] != sess[:-1])]
    )
    user_turn = np.where(cols.role == "user", cols.turn, -1).astype(np.float64)
    last_user = (
        pd.Series(user_turn).groupby(run_id).cummax().to_numpy()
    )
    last_sess_per_conv = np.repeat(_conv_last(sess, cols), cols.ends - cols.starts)
    is_pair = (cols.role == "tool") & (last_user >= 0)
    if flush:
        emit = is_pair
        residual = None
        new_closed = {}
    else:
        closed_row = sess != last_sess_per_conv
        emit = is_pair & closed_row
        residual = _take(cols, ~closed_row)
        new_closed = dict(closed_count)
        for cc_name, last_s in zip(cols.conv[cols.starts], _conv_last(sess, cols)):
            if last_s > 0:
                new_closed[cc_name] = new_closed.get(cc_name, 0) + int(last_s)
    base = np.array([closed_count.get(c, 0) for c in cols.conv[emit]], dtype=np.int64) if emit.any() else np.empty(0, np.int64)
    out = pa.table(
        {
            "conv_id": pa.array(cols.conv[emit], type=pa.string()),
            "session_id": pa.array(base + sess[emit]),
            "user_turn_idx": pa.array(last_user[emit].astype(np.int64)),
            "tool_turn_idx": pa.array(cols.turn[emit].astype(np.int64)),
            "tool": pa.array(cols.tool[emit], type=pa.string()),
        }
    )
    if flush:
        return out, {"residual": None, "closed_count": {}}
    return out, {"residual": residual, "closed_count": new_closed}
