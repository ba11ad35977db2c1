"""CEP-style sequence pattern matching over conversation role streams.

A complex-event-processing operator the reference lacks entirely (SURVEY.md
§2.5): detect ordered event patterns per key. Events are a conversation's
turns in ``turn_idx`` order, symbolized by the first letter of ``role``
(u/a/t); patterns are regular expressions over that symbol string — e.g.
``ua*tt`` = "a user turn, any assistants, then two consecutive tool calls".

The SQL oracle mirrors it exactly with
``string_agg(substr(role,1,1), '' ORDER BY turn_idx)`` +
``regexp_extract_all`` (both engines count non-overlapping matches
left-to-right).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from dstream_ray.stages.windows import prep, to_residual_rows

DEFAULT_PATTERN = "ua*tt"



def _symbols_u8(cols) -> np.ndarray:
    """Per sorted row: first letter of role as a uint8 byte.

    Goes through the role DICTIONARY (few distinct roles), so no per-row
    Python string objects are created — per-conv sequences come out of
    ``bytes(...).decode()`` over contiguous slices.

    Empty/null roles map to byte 0, which :func:`_conv_seq` DROPS from the
    sequence (matching the old codeunit-slice path, where an empty role
    contributed no character — a 0 byte in the middle would otherwise break
    symbol adjacency and change match counts). A role whose first character
    is outside latin-1 (ord > 255) maps to byte 1 — a private non-letter
    placeholder that preserves the row's position without crashing the
    uint8 conversion (patterns are ASCII letters, so it can never match)."""
    role_col = cols.origin["role"]
    if isinstance(role_col, pa.ChunkedArray):
        role_col = role_col.combine_chunks()
    enc = role_col.dictionary_encode()
    dsym = np.array(
        [(ord(x[0]) if ord(x[0]) <= 255 else 1) if x else 0
         for x in enc.dictionary.to_pylist()],
        dtype=np.uint8,
    )
    codes = enc.indices.to_numpy(zero_copy_only=False)
    return dsym[codes][cols.order]


def _conv_seq(sym_u8: np.ndarray, s: int, e: int) -> str:
    """One conversation's symbol string; 0 bytes (empty roles) are skipped
    entirely so they neither match nor break adjacency."""
    seg = sym_u8[s:e]
    seg = seg[seg != 0]
    return seg.tobytes().decode("latin-1")


def _count_matches(rx, seq: str, ts_seq, within_us: int | None) -> tuple[int, int]:
    """(n matches passing the time constraint, end of last scanned match).

    The scan is the plain leftmost non-overlapping regex pass; ``within_us``
    filters COUNTING to matches whose first→last event-time span fits the
    budget (the CEP 'pattern completes WITHIN T' constraint). ``ts_seq``
    aligns 1:1 with ``seq``'s symbols."""
    n = 0
    last_end = 0
    for m in rx.finditer(seq):
        last_end = m.end()
        if (
            within_us is None
            or m.end() == m.start()  # zero-width: no span, always within
            or ts_seq[m.end() - 1] - ts_seq[m.start()] <= within_us
        ):
            n += 1
    return n, last_end


def cep_pattern_kernel(
    transcripts: pa.Table,
    *,
    pattern: str = DEFAULT_PATTERN,
    within_s: int | None = None,
) -> pa.Table:
    """One partition's transcripts -> (conv_id, n_matches) for the pattern.

    Vectorized up to the per-conv symbol strings; the regex scan is C via
    ``re`` over one short string per conversation. ``within_s``: only count
    matches whose first→last event-time span is ≤ the budget (time-
    constrained CEP; pytest-validated — per-match timing is not
    SQL-expressible in one query)."""
    rows = to_residual_rows(transcripts)
    cols = prep(rows)
    if len(cols.codes) == 0:
        return pa.table(
            {
                "conv_id": pa.array([], type=pa.string()),
                "n_matches": pa.array([], type=pa.int64()),
            }
        )
    sym_u8 = _symbols_u8(cols)
    rx = re.compile(pattern)
    names = cols.conv_names()
    counts = np.zeros(len(names), dtype=np.int64)
    within_us = within_s * 1_000_000 if within_s is not None else None
    for code, (s, e) in zip(cols.codes[cols.starts], zip(cols.starts, cols.ends)):
        seg = sym_u8[s:e]
        keep = seg != 0
        seq = seg[keep].tobytes().decode("latin-1")
        if within_us is None:
            counts[code] = len(rx.findall(seq))
        else:
            ts_seq = cols.ts[s:e][keep]
            counts[code], _ = _count_matches(rx, seq, ts_seq, within_us)
    return pa.table(
        {
            "conv_id": pa.array(names, type=pa.string()),
            "n_matches": pa.array(counts),
        }
    )


def cep_kernel(
    new_rows: pa.Table,
    state: dict,
    *,
    pattern: str = DEFAULT_PATTERN,
    flush: bool = False,
    max_suffix: int = 4096,
    within_s: int | None = None,
    evict_idle_us: int | None = None,
    watermark_us: int | None = None,
) -> tuple[pa.Table, dict]:
    """STREAMING CEP: count non-overlapping pattern matches per conv across
    micro-batch epochs. Carried state per conv = (match count so far, the
    unmatched symbol suffix after the last completed match) — leftmost
    non-overlapping regex matching is prefix-composable when the full
    unmatched suffix is retained. The suffix is capped at ``max_suffix``
    symbols (a conv whose gap between matches exceeds it would undercount;
    documented bound, analogous to a CEP engine's buffer limit).

    Exactness caveat: streamed counts equal batch counts when a completed
    match cannot be EXTENDED by later symbols into a longer single match
    that changes the match count (true for terminal-symbol patterns like
    'ua*t' / 'ua*tt'; a pattern like 'ut+' may split one batch match into
    two streamed matches at an epoch boundary). Epoch-split invariance for
    the supported patterns is pinned by tests.

    Emits (conv_id, n_matches) for every conv seen, at flush — plus, when
    ``evict_idle_us`` is set, EARLY for convs whose last event time falls
    more than that far behind ``watermark_us`` (the engine supplies the
    partition watermark): their count is published now and their state
    dropped, so a forever-running follow job both bounds its state and
    keeps publishing results instead of staying silent until idle. A conv
    that reappears after eviction emits an additional row; counts are
    additive per segment (sum per conv on read), modulo matches that would
    have spanned the eviction boundary — the standard CEP buffer-timeout
    tradeoff.
    """
    counts: dict = dict(state.get("counts", {}))
    suffix: dict = dict(state.get("suffix", {}))
    track_ts = evict_idle_us is not None
    last_ts: dict = dict(state.get("last_ts", {})) if track_ts else {}
    within_us = within_s * 1_000_000 if within_s is not None else None
    # per-symbol event times aligned with each conv's carried suffix — only
    # kept when the time constraint is active
    suffix_ts: dict = (
        dict(state.get("suffix_ts", {})) if within_us is not None else {}
    )
    rx = re.compile(pattern)

    if new_rows.num_rows:
        rows = to_residual_rows(new_rows) if "ts" in new_rows.column_names else new_rows
        cols = prep(rows)
        sym_u8 = _symbols_u8(cols)
        ts_sorted = cols.ts  # residual-layout µs, already sort-permuted
        names = cols.conv_names()
        for code, (s, e) in zip(
            cols.codes[cols.starts], zip(cols.starts, cols.ends)
        ):
            nm = names[code]
            seg = sym_u8[s:e]
            keep = seg != 0
            new_seq = seg[keep].tobytes().decode("latin-1")
            seq = suffix.get(nm, "") + new_seq
            ts_seq = None
            if within_us is not None:
                prev_ts = suffix_ts.get(nm)
                ts_seq = np.concatenate(
                    [
                        prev_ts if prev_ts is not None else np.empty(0, np.int64),
                        ts_sorted[s:e][keep],
                    ]
                )
            n, last_end = _count_matches(rx, seq, ts_seq, within_us)
            counts[nm] = counts.get(nm, 0) + n
            tail = seq[last_end:][-max_suffix:]
            suffix[nm] = tail
            if within_us is not None:
                suffix_ts[nm] = ts_seq[len(seq) - len(tail):]
            if track_ts:
                last_ts[nm] = max(int(ts_sorted[s:e].max()), last_ts.get(nm, -1))

    emit_names: list[str] = []
    emit_counts: list[int] = []
    if track_ts and watermark_us is not None and not flush:
        cutoff = watermark_us - evict_idle_us
        for nm in [n for n, t in last_ts.items() if t < cutoff]:
            emit_names.append(nm)
            emit_counts.append(counts.pop(nm, 0))
            suffix.pop(nm, None)
            suffix_ts.pop(nm, None)
            del last_ts[nm]

    if flush:
        emit_names.extend(counts.keys())
        emit_counts.extend(counts.values())
        counts, suffix, last_ts, suffix_ts = {}, {}, {}, {}
    out = pa.table(
        {
            "conv_id": pa.array(emit_names, type=pa.string()),
            "n_matches": pa.array(emit_counts, type=pa.int64()),
        }
    )
    new_state = {"counts": counts, "suffix": suffix}
    if track_ts:
        new_state["last_ts"] = last_ts
    if within_us is not None:
        new_state["suffix_ts"] = suffix_ts
    return out, new_state
