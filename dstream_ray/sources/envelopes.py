"""dstream JSON-envelope source adapter.

The reference's wire format is one JSON object per line:
``{"data": {...}, "metadata": {"TableName": ..., "LSN": ..., "Seq": ...,
"OperationID": ..., "OperationType": ...}}``
(/root/reference/readme.md:250-272; representative CDC envelope
pkg/executor/benchmark_test.go:154-176). This adapter lets a dstream user
point their existing envelope stream at this engine:

- each monitored TABLE becomes one conversation/stream key (per-table
  isolation ≙ topic-per-table routing);
- the dual ``(LSN, Seq)`` hex cursor becomes the dense positional
  ``turn_idx`` (same ordering: lexicographic on the zero-padded hex pair);
- the ``data`` payload is re-serialized with sorted keys into ``text`` —
  byte-stable through the relay (the payload-fidelity contract);
- ``OperationType`` rides in ``tool``.

The resulting table is a valid engine feed: capture → windows → exactly-once
sink run unchanged on it.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


def parse_envelope_lines(lines: list[str]) -> pa.Table:
    """JSON-line envelopes -> transcript-shaped feed table.

    Malformed lines are kept with conv_id=None so the engine's quarantine
    filter routes them (≙ the E2E harness dropping non-JSON lines)."""
    recs = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        try:
            env = json.loads(line)
            meta = env["metadata"]
            data = env["data"]
            recs.append(
                {
                    "table": str(meta["TableName"]),
                    "lsn": str(meta.get("LSN", "")),
                    "seq": str(meta.get("Seq", "")),
                    "op": str(meta.get("OperationType", "")),
                    "payload": json.dumps(data, sort_keys=True, separators=(",", ":")),
                }
            )
        except (json.JSONDecodeError, KeyError, TypeError):
            recs.append(
                {"table": None, "lsn": "", "seq": "", "op": "", "payload": line}
            )
    tables = np.array([r["table"] for r in recs], dtype=object)
    # order per table by the (LSN, Seq) hex cursor, zero-padded for a
    # lexicographic order equal to the numeric order
    def pad(x: str) -> str:
        return x.rjust(32, "0")

    keys = np.array(
        [pad(r["lsn"]) + "|" + pad(r["seq"]) for r in recs], dtype=object
    )
    valid = tables != None  # noqa: E711
    order = np.lexsort((keys, np.where(valid, tables, "~~invalid")))
    # dense turn_idx per table over the sorted valid rows
    turn = np.zeros(len(recs), dtype=np.int32)
    prev_table, counter = None, 0
    ts_base = 1_700_000_000_000_000
    ts = np.zeros(len(recs), dtype=np.int64)
    global_pos = 0
    for i in order:
        if not valid[i]:
            continue
        if tables[i] != prev_table:
            prev_table, counter = tables[i], 0
        turn[i] = counter
        counter += 1
        ts[i] = ts_base + global_pos * 1_000_000  # arrival order ≙ LSN order
        global_pos += 1
    return pa.table(
        {
            "conv_id": pa.array(tables, type=pa.string()),
            "turn_idx": pa.array(turn),
            "role": pa.array(
                np.where(valid, "change", "invalid").astype(object), type=pa.string()
            ),
            "text": pa.array([r["payload"] for r in recs], type=pa.string()),
            "tool": pa.array([r["op"] for r in recs], type=pa.string()),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            # the dual (LSN, Seq) cursor itself, zero-padded so lexicographic
            # order == numeric order; the relay dedups envelope feeds on THIS
            # (not the per-file positional turn_idx, which restarts per
            # shard — a continuation shard must not look like a replay)
            "cdc_key": pa.array(
                [k if v else "" for k, v in zip(keys, valid)], type=pa.string()
            ),
        }
    )


def read_envelope_file(path: str) -> pa.Table:
    with open(path) as fh:
        return parse_envelope_lines(fh.readlines())
