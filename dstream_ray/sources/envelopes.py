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


def parse_envelope_bytes_raw(raw: bytes) -> pa.Table:
    """Vectorized envelope parse with RAW-LINE payload fidelity — the
    reference's actual relay semantics (bytes pass through untouched;
    providers.go relays lines verbatim, it never re-serializes).

    The metadata fields are parsed by Arrow's C++ multithreaded NDJSON
    reader against an explicit schema (unexpected fields — i.e. the whole
    ``data`` payload — are skipped, so heterogeneous payload schemas cost
    nothing); ``text`` is the raw line itself, built zero-copy-ish from the
    byte buffer; ordering/turn/ts assignment is the same (TableName,
    (LSN, Seq)) contract as :func:`parse_envelope_lines`, fully numpy.
    Falls back to the scalar path (with raw payloads) if any line is not
    valid JSON — the quarantine contract is preserved either way."""
    import pyarrow.compute as pc
    import pyarrow.json as pj

    from dstream_ray.common import segmented_cumcount

    if not raw:
        return parse_envelope_lines([])
    schema = pa.schema(
        [
            # the empty struct captures data's PRESENCE (null when the key
            # is missing) while its inner fields are skipped — an envelope
            # without "data" must quarantine exactly as in the scalar path
            pa.field("data", pa.struct([])),
            pa.field(
                "metadata",
                pa.struct(
                    [
                        ("TableName", pa.string()),
                        ("LSN", pa.string()),
                        ("Seq", pa.string()),
                        ("OperationType", pa.string()),
                    ]
                ),
            ),
        ]
    )
    try:
        tbl = pj.read_json(
            pa.BufferReader(raw),
            parse_options=pj.ParseOptions(
                explicit_schema=schema, unexpected_field_behavior="ignore"
            ),
        )
    except pa.ArrowInvalid:
        # malformed line(s): scalar fallback, raw payload semantics.
        # split on \n ONLY — str.splitlines() would also break on
        # U+2028/U+2029/U+0085, which are legal unescaped inside JSON
        # strings and must not fragment a valid line.
        lines = raw.decode("utf-8", errors="replace").split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        slow = parse_envelope_lines(lines)
        idx = slow.column_names.index("text")
        return slow.set_column(idx, "text", pa.array(lines, type=pa.string()))

    # raw line strings sharing the input buffer (offsets exclude each '\n')
    data = np.frombuffer(raw, dtype=np.uint8)
    nl = np.flatnonzero(data == 10)
    terminated = len(raw) and raw[-1:] == b"\n"
    ends = nl if terminated else np.r_[nl, len(raw)]
    n_lines = len(ends)
    offs = np.zeros(n_lines + 1, dtype=np.int64)
    offs[1:] = ends + 1 if terminated else np.r_[nl + 1, len(raw)]
    data2 = np.delete(data, nl)
    offs2 = (offs - np.searchsorted(nl, offs, side="left")).astype(np.int64)
    lines_arr = pa.LargeStringArray.from_buffers(
        n_lines, pa.py_buffer(offs2.tobytes()), pa.py_buffer(data2.tobytes())
    ).cast(pa.string())
    if n_lines != tbl.num_rows:
        # blank lines or reader/line-count drift: take the scalar fallback
        lines = [str(x) for x in lines_arr.to_pylist()]
        slow = parse_envelope_lines([l for l in lines if l.strip()])
        keep = [l for l in lines if l.strip()]
        idx = slow.column_names.index("text")
        return slow.set_column(idx, "text", pa.array(keep, type=pa.string()))

    meta = tbl["metadata"]
    if isinstance(meta, pa.ChunkedArray):
        meta = meta.combine_chunks()
    tn = pc.struct_field(meta, "TableName")
    key = pc.binary_join_element_wise(
        pc.utf8_lpad(pc.fill_null(pc.struct_field(meta, "LSN"), ""), 32, "0"),
        pc.utf8_lpad(pc.fill_null(pc.struct_field(meta, "Seq"), ""), 32, "0"),
        "|",
    )
    op = pc.fill_null(pc.struct_field(meta, "OperationType"), "")
    data_col = tbl["data"]
    if isinstance(data_col, pa.ChunkedArray):
        data_col = data_col.combine_chunks()
    # valid ⇔ BOTH keys present, matching the scalar parser's KeyError path
    valid = pc.and_(pc.is_valid(tn), pc.is_valid(data_col))
    valid_np = valid.to_numpy(zero_copy_only=False)
    n = n_lines
    turn = np.zeros(n, dtype=np.int32)
    ts = np.zeros(n, dtype=np.int64)
    vpos = np.flatnonzero(valid_np)
    if len(vpos):
        sub = pa.table({"conv": tn.filter(valid), "key": key.filter(valid)})
        order = pc.sort_indices(
            sub, sort_keys=[("conv", "ascending"), ("key", "ascending")]
        ).to_numpy(zero_copy_only=False)
        conv_sorted = sub["conv"].combine_chunks().take(pa.array(order))
        codes = (
            conv_sorted.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sorted_global = vpos[order]
        turn[sorted_global] = segmented_cumcount(codes).astype(np.int32)
        ts[sorted_global] = 1_700_000_000_000_000 + np.arange(
            len(vpos), dtype=np.int64
        ) * 1_000_000
    return pa.table(
        {
            "conv_id": tn,
            "turn_idx": pa.array(turn),
            "role": pc.if_else(valid, "change", "invalid"),
            "text": lines_arr,
            "tool": pc.if_else(valid, op, ""),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "cdc_key": pc.if_else(valid, key, ""),
        }
    )


def read_envelope_file(path: str, *, payload: str = "canonical") -> pa.Table:
    """``payload="canonical"``: data re-serialized with sorted keys (the
    envelope→transcript adapter contract). ``payload="raw"``: text is the
    raw line, parsed vectorized — the reference's byte-relay semantics and
    the fast path for high-volume envelope feeds."""
    if payload == "raw":
        with open(path, "rb") as fh:
            return parse_envelope_bytes_raw(fh.read())
    with open(path) as fh:
        return parse_envelope_lines(fh.readlines())
