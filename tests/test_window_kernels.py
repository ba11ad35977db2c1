"""Kernel-level tests: pure window/join kernels vs DuckDB oracles on seeded
synthetic transcripts, in both single-flush and multi-epoch (state-carrying)
modes. No Ray needed — kernels are pure functions over Arrow tables."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from dstream_ray.sources.transcripts import generate_transcripts
from dstream_ray.stages.windows import (
    session_join_kernel,
    session_kernel,
    sliding_kernel,
    to_residual_rows,
    tumbling_kernel,
)

GAP_S = 120
WIDTH_S = 300
SLIDE_S = 150


@pytest.fixture(scope="module")
def feed() -> pa.Table:
    return generate_transcripts(n_convs=60, mean_turns=12, seed=3, session_gap_s=GAP_S)


def run_epochs(kernel, feed: pa.Table, n_epochs: int, **kw) -> pa.Table:
    """Split the feed into n sequential epochs (per-conv order preserved),
    run the kernel with carried state, flush at the end, concat emissions."""
    rows = to_residual_rows(feed)
    bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
    state: dict = {}
    outs = []
    for i in range(n_epochs):
        chunk = rows.slice(bounds[i], bounds[i + 1] - bounds[i])
        flush = i == n_epochs - 1
        out, state = kernel(chunk, state, flush=flush, **kw)
        outs.append(out)
    return pa.concat_tables(outs)


def oracle(feed: pa.Table, sql: str):
    con = duckdb.connect()
    con.register("transcripts", feed)
    return con.execute(sql).fetch_arrow_table()


def assert_same(result: pa.Table, expected: pa.Table, keys: list[str]):
    import pandas as pd

    r = result.to_pandas().sort_values(keys).reset_index(drop=True)
    e = expected.to_pandas().sort_values(keys).reset_index(drop=True)
    r = r[sorted(r.columns)]
    e = e[sorted(e.columns)]
    pd.testing.assert_frame_equal(r, e, check_dtype=False)


TUMBLING_SQL = f"""
SELECT conv_id, CAST(floor(epoch(ts)/{WIDTH_S}) AS BIGINT) AS window_id,
       count(*) AS n_turns,
       count(*) FILTER (WHERE role='user') AS n_user_turns,
       count(*) FILTER (WHERE role='tool') AS n_tool_turns,
       sum(length(text)) AS n_chars
FROM transcripts GROUP BY 1, 2
"""

SESSION_SQL = f"""
WITH flagged AS (
  SELECT conv_id, turn_idx, role, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_S}*1000000
              THEN 1 ELSE 0 END AS brk
  FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), sess AS (
  SELECT *, sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS session_id
  FROM flagged
)
SELECT conv_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_turns,
       count(*) FILTER (WHERE role='user') AS n_user_turns,
       count(*) FILTER (WHERE role='tool') AS n_tool_turns,
       CAST(min(turn_idx) AS BIGINT) AS first_turn_idx,
       CAST(max(turn_idx) AS BIGINT) AS last_turn_idx,
       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
FROM sess GROUP BY 1, 2
"""

JOIN_SQL = f"""
WITH flagged AS (
  SELECT conv_id, turn_idx, role, tool, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_S}*1000000
              THEN 1 ELSE 0 END AS brk
  FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), sess AS (
  SELECT *, sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS session_id
  FROM flagged
), attributed AS (
  SELECT conv_id, CAST(session_id AS BIGINT) AS session_id, turn_idx, role, tool,
         max(CASE WHEN role='user' THEN turn_idx END)
           OVER (PARTITION BY conv_id, session_id ORDER BY turn_idx
                 ROWS UNBOUNDED PRECEDING) AS user_turn_idx
  FROM sess
)
SELECT conv_id, session_id, CAST(user_turn_idx AS BIGINT) AS user_turn_idx,
       CAST(turn_idx AS BIGINT) AS tool_turn_idx, tool
FROM attributed WHERE role='tool' AND user_turn_idx IS NOT NULL
"""

SLIDING_SQL = f"""
WITH fan AS (
  SELECT conv_id, CAST(floor(epoch(ts)/{SLIDE_S}) AS BIGINT) AS window_id, length(text) AS lc FROM transcripts
  UNION ALL
  SELECT conv_id, CAST(floor(epoch(ts)/{SLIDE_S}) AS BIGINT) - 1 AS window_id, length(text) AS lc FROM transcripts
)
SELECT conv_id, window_id, count(*) AS n_turns, sum(lc) AS n_chars
FROM fan GROUP BY 1, 2
"""


@pytest.mark.parametrize("n_epochs", [1, 4])
def test_tumbling(feed, n_epochs):
    out = run_epochs(tumbling_kernel, feed, n_epochs, width_s=WIDTH_S)
    exp = oracle(feed, TUMBLING_SQL)
    assert_same(out, exp, ["conv_id", "window_id"])


@pytest.mark.parametrize("n_epochs", [1, 5])
def test_session(feed, n_epochs):
    out = run_epochs(session_kernel, feed, n_epochs, gap_s=GAP_S)
    exp = oracle(feed, SESSION_SQL)
    assert_same(out, exp, ["conv_id", "session_id"])


@pytest.mark.parametrize("n_epochs", [1, 3])
def test_session_join(feed, n_epochs):
    out = run_epochs(session_join_kernel, feed, n_epochs, gap_s=GAP_S)
    exp = oracle(feed, JOIN_SQL)
    assert_same(out, exp, ["conv_id", "session_id", "tool_turn_idx"])


@pytest.mark.parametrize("n_epochs", [1, 4])
def test_sliding(feed, n_epochs):
    out = run_epochs(sliding_kernel, feed, n_epochs, width_s=WIDTH_S, slide_s=SLIDE_S)
    exp = oracle(feed, SLIDING_SQL)
    assert_same(out, exp, ["conv_id", "window_id"])


def test_epoch_invariance_matches_single_pass(feed):
    """Multi-epoch (any split) emissions must equal the single-flush result —
    the replay/exactly-once foundation."""
    for kernel, kw, keys in [
        (tumbling_kernel, {"width_s": WIDTH_S}, ["conv_id", "window_id"]),
        (session_kernel, {"gap_s": GAP_S}, ["conv_id", "session_id"]),
        (session_join_kernel, {"gap_s": GAP_S}, ["conv_id", "session_id", "tool_turn_idx"]),
        (sliding_kernel, {"width_s": WIDTH_S, "slide_s": SLIDE_S}, ["conv_id", "window_id"]),
    ]:
        single = run_epochs(kernel, feed, 1, **kw)
        multi = run_epochs(kernel, feed, 7, **kw)
        assert_same(multi, single, keys)


@pytest.mark.parametrize("n_epochs", [1, 4])
def test_fused_session_join_equals_standalone(feed, n_epochs):
    """The fused kernel's two outputs must equal the standalone kernels for
    any epoch split."""
    from dstream_ray.stages.windows import session_with_join_kernel

    rows = to_residual_rows(feed)
    bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
    state = {}
    sess_out, join_out = [], []
    for i in range(n_epochs):
        chunk = rows.slice(bounds[i], bounds[i + 1] - bounds[i])
        out, state = session_with_join_kernel(
            chunk, state, gap_s=GAP_S, flush=(i == n_epochs - 1)
        )
        sess_out.append(out["session"])
        join_out.append(out["session_join"])
    assert_same(pa.concat_tables(sess_out), oracle(feed, SESSION_SQL),
                ["conv_id", "session_id"])
    assert_same(pa.concat_tables(join_out), oracle(feed, JOIN_SQL),
                ["conv_id", "session_id", "tool_turn_idx"])


def test_tumbling_watermark_closure():
    """Watermark closure: on a GLOBALLY ts-ordered feed, multi-epoch output
    equals the oracle AND windows of idle convs emit before the flush."""
    from dstream_ray.stages.windows import tumbling_kernel

    feed = generate_transcripts(n_convs=40, mean_turns=10, seed=29)
    rows = to_residual_rows(feed)
    order = np.argsort(rows["ts_us"].to_numpy(zero_copy_only=False), kind="stable")
    rows = rows.take(pa.array(order))  # globally time-ordered arrival

    bounds = np.linspace(0, rows.num_rows, 5).astype(int)
    state: dict = {}
    outs = []
    emitted_before_flush = 0
    for i in range(4):
        chunk = rows.slice(bounds[i], bounds[i + 1] - bounds[i])
        wm = int(chunk["ts_us"].to_numpy(zero_copy_only=False).max()) if chunk.num_rows else -1
        prev_wm = state.get("_wm", -1)
        wm = max(wm, prev_wm)
        out, state = tumbling_kernel(
            chunk, state, width_s=WIDTH_S, flush=(i == 3),
            closure="watermark", watermark_us=wm,
        )
        state["_wm"] = wm
        if i < 3:
            emitted_before_flush += out.num_rows
        outs.append(out)
    got = pa.concat_tables(outs)
    assert state.get("late_drops", 0) == 0  # ordered feed: nothing dropped
    assert emitted_before_flush > 0  # watermark closed windows early
    exp = oracle(feed, TUMBLING_SQL)
    assert_same(got, exp, ["conv_id", "window_id"])


def test_tumbling_watermark_closure_drops_late_rows():
    from dstream_ray.stages.windows import tumbling_kernel

    t0 = 1_700_000_000_000_000
    def rows_at(conv, turns, base):
        return pa.table({
            "conv_id": pa.array([conv]*turns), "turn_idx": pa.array(range(turns), type=pa.int32()),
            "role": pa.array(["user"]*turns), "tool": pa.array([""]*turns),
            "ts_us": pa.array([base + i*1_000_000 for i in range(turns)]),
            "n_chars": pa.array([1]*turns),
        })
    state: dict = {}
    out1, state = tumbling_kernel(rows_at("a", 3, t0 + 10_000_000_000), state,
                                  width_s=60, flush=False, closure="watermark",
                                  watermark_us=t0 + 10_002_000_000)
    # a conv arriving far behind the emitted cursor gets dropped, not re-emitted
    out2, state = tumbling_kernel(rows_at("late", 3, t0), state,
                                  width_s=60, flush=True, closure="watermark",
                                  watermark_us=t0 + 10_002_000_000)
    assert state["late_drops"] == 3
    all_convs = set(pa.concat_tables([out1, out2])["conv_id"].to_pylist())
    assert "late" not in all_convs


def test_sliding_watermark_closure():
    """Sliding watermark closure: on a globally ts-ordered feed, multi-epoch
    output == the batch oracle, windows emit before the flush, and nothing
    is late-dropped."""
    feed = generate_transcripts(n_convs=40, mean_turns=10, seed=31)
    rows = to_residual_rows(feed)
    order = np.argsort(rows["ts_us"].to_numpy(zero_copy_only=False), kind="stable")
    rows = rows.take(pa.array(order))

    bounds = np.linspace(0, rows.num_rows, 5).astype(int)
    state: dict = {}
    outs = []
    emitted_before_flush = 0
    wm = -1
    for i in range(4):
        chunk = rows.slice(bounds[i], bounds[i + 1] - bounds[i])
        if chunk.num_rows:
            wm = max(wm, int(chunk["ts_us"].to_numpy(zero_copy_only=False).max()))
        out, state = sliding_kernel(
            chunk, state, width_s=WIDTH_S, slide_s=SLIDE_S, flush=(i == 3),
            closure="watermark", watermark_us=wm,
        )
        if i < 3:
            emitted_before_flush += out.num_rows
        outs.append(out)
    got = pa.concat_tables(outs)
    assert state.get("late_drops", 0) == 0
    assert emitted_before_flush > 0
    assert_same(got, oracle(feed, SLIDING_SQL), ["conv_id", "window_id"])


def test_sliding_watermark_drops_late_rows():
    t0 = 1_700_000_000_000_000

    def rows_at(conv, turns, base):
        return pa.table({
            "conv_id": pa.array([conv] * turns),
            "turn_idx": pa.array(range(turns), type=pa.int32()),
            "role": pa.array(["user"] * turns),
            "tool": pa.array([""] * turns),
            "ts_us": pa.array([base + i * 1_000_000 for i in range(turns)]),
            "n_chars": pa.array([1] * turns),
        })

    state: dict = {}
    out1, state = sliding_kernel(
        rows_at("a", 3, t0 + 10_000_000_000), state, width_s=300, slide_s=150,
        flush=False, closure="watermark", watermark_us=t0 + 10_002_000_000)
    out2, state = sliding_kernel(
        rows_at("late", 3, t0), state, width_s=300, slide_s=150,
        flush=True, closure="watermark", watermark_us=t0 + 10_002_000_000)
    assert state["late_drops"] == 3
    assert "late" not in set(pa.concat_tables([out1, out2])["conv_id"].to_pylist())
