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


def cep_pattern_kernel(
    transcripts: pa.Table, *, pattern: str = DEFAULT_PATTERN
) -> pa.Table:
    """One partition's transcripts -> (conv_id, n_matches) for the pattern.

    Vectorized up to the per-conv symbol strings; the regex scan is C via
    ``re`` over one short string per conversation."""
    rows = to_residual_rows(transcripts)
    cols = prep(rows)
    if len(cols.codes) == 0:
        return pa.table(
            {
                "conv_id": pa.array([], type=pa.string()),
                "n_matches": pa.array([], type=pa.int64()),
            }
        )
    role_col = cols.origin["role"]
    if isinstance(role_col, pa.ChunkedArray):
        role_col = role_col.combine_chunks()
    # symbol per sorted row = first letter of role
    import pyarrow.compute as pc

    sym_sorted = np.asarray(
        pc.utf8_slice_codeunits(role_col, 0, 1).take(pa.array(cols.order)).to_pylist(),
        dtype=object,
    )
    rx = re.compile(pattern)
    names = cols.conv_names()
    counts = np.zeros(len(names), dtype=np.int64)
    for code, (s, e) in zip(cols.codes[cols.starts], zip(cols.starts, cols.ends)):
        seq = "".join(sym_sorted[s:e])
        counts[code] = len(rx.findall(seq))
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

    Emits (conv_id, n_matches) for every conv seen, at flush only.
    """
    counts: dict = dict(state.get("counts", {}))
    suffix: dict = dict(state.get("suffix", {}))
    rx = re.compile(pattern)

    if new_rows.num_rows:
        cols = prep(to_residual_rows(new_rows) if "ts" in new_rows.column_names else new_rows)
        import pyarrow.compute as pc

        role_col = cols.origin["role"]
        if isinstance(role_col, pa.ChunkedArray):
            role_col = role_col.combine_chunks()
        sym_sorted = np.asarray(
            pc.utf8_slice_codeunits(role_col, 0, 1)
            .take(pa.array(cols.order))
            .to_pylist(),
            dtype=object,
        )
        names = cols.conv_names()
        for code, (s, e) in zip(
            cols.codes[cols.starts], zip(cols.starts, cols.ends)
        ):
            nm = names[code]
            seq = suffix.get(nm, "") + "".join(sym_sorted[s:e])
            last_end = 0
            n = 0
            for m in rx.finditer(seq):
                n += 1
                last_end = m.end()
            counts[nm] = counts.get(nm, 0) + n
            suffix[nm] = seq[last_end:][-max_suffix:]

    if not flush:
        return (
            pa.table(
                {
                    "conv_id": pa.array([], type=pa.string()),
                    "n_matches": pa.array([], type=pa.int64()),
                }
            ),
            {"counts": counts, "suffix": suffix},
        )
    out = pa.table(
        {
            "conv_id": pa.array(list(counts.keys()), type=pa.string()),
            "n_matches": pa.array(list(counts.values()), type=pa.int64()),
        }
    )
    return out, {"counts": {}, "suffix": {}}
