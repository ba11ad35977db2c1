"""Per-row running window functions ('running' operator): SQL
ROW_NUMBER/LAG/running-SUM oracle parity under any epoch split, O(1)
per-conv state, immediate emission, and the engine path end-to-end."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.stages.windows import running_kernel, to_residual_rows

T0 = 1_700_000_000_000_000


def _feed(seed=0, n_convs=6, n_turns=40):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        ts = T0 + int(rng.integers(0, 3600)) * 1_000_000
        for t in range(n_turns):
            ts += int(rng.integers(1, 1800)) * 1_000_000
            role = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            tool = f"tool{rng.integers(0, 5)}" if role == "tool" else ""
            text = "x" * int(rng.integers(0, 40))
            rows.append((f"c{c}", t, role, text, tool, ts))
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([r[5] for r in rows], type=pa.int64()).cast(pa.timestamp("us")),
    })


ORACLE = """
    SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
           CAST(row_number() OVER w AS BIGINT) AS row_number,
           COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w,
                    CAST(-1 AS BIGINT)) AS dt_prev_us,
           CAST(sum(length(text)) OVER w AS BIGINT) AS cum_chars
    FROM feed
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
    ORDER BY 1, 2
"""


def _oracle(feed):
    con = duckdb.connect()
    con.register("feed", feed)
    return con.execute(ORACLE).fetch_df()


def _canon(df):
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_running_matches_window_function_oracle_any_split():
    feed = _feed()
    rows = to_residual_rows(feed)
    exp = _canon(_oracle(feed))
    for n_epochs in (1, 4, 9):
        bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
        state: dict = {}
        outs = []
        for i in range(n_epochs):
            out, state = running_kernel(
                rows.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
                flush=(i == n_epochs - 1))
            outs.append(out)
        got = _canon(pa.concat_tables(outs).to_pandas())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert state.get("run")  # carry survives flush (flush is non-terminal)


def test_running_post_flush_continuation_matches_single_pass():
    """Flush is NON-terminal: a run that flushes, then consumes more feed,
    must emit the same rows as one uninterrupted pass (ROW_NUMBER/cum_chars
    continue from the carried prefix instead of restarting at 1)."""
    feed = _feed(seed=9, n_convs=4, n_turns=30)
    rows = to_residual_rows(feed)
    exp = _canon(_oracle(feed))
    cut = rows.num_rows // 2
    state: dict = {}
    outs = []
    out, state = running_kernel(rows.slice(0, cut), state, flush=True)
    outs.append(out)
    out, state = running_kernel(rows.slice(cut), state, flush=True)
    outs.append(out)
    got = _canon(pa.concat_tables(outs).to_pandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_running_emits_every_row_immediately_with_o1_state():
    feed = _feed(seed=3)
    rows = to_residual_rows(feed)
    half = rows.slice(0, rows.num_rows // 2)
    out, state = running_kernel(half, {}, flush=False)
    assert out.num_rows == half.num_rows  # per-row, no buffering
    # state is one (count, last_ts, cum_chars) triple per conv
    df = half.to_pandas()
    g = df.groupby("conv_id")
    for nm, (cnt, last_ts, cum) in state["run"].items():
        sub = g.get_group(nm)
        assert cnt == len(sub)
        assert last_ts == sub["ts_us"].max()
        assert cum == sub["n_chars"].sum()


def test_running_first_turn_sentinel_and_monotone_outputs():
    rows = pa.table({
        "conv_id": pa.array(["c0", "c0", "c1"]),
        "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
        "role": pa.array(["user", "tool", "user"]),
        "tool": pa.array(["", "t1", ""]),
        "ts_us": pa.array([T0, T0 + 5_000_000, T0 + 1]),
        "n_chars": pa.array([3, 4, 7], type=pa.int64()),
    })
    out, _ = running_kernel(rows, {}, flush=True)
    df = out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert df["row_number"].tolist() == [1, 2, 1]
    assert df["dt_prev_us"].tolist() == [-1, 5_000_000, -1]
    assert df["cum_chars"].tolist() == [3, 7, 7]


def test_running_engine_end_to_end(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob

    feed = _feed(seed=7)
    df = feed.to_pandas().sort_values(["conv_id", "turn_idx"])
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    bounds = np.linspace(0, tbl.num_rows, 5).astype(int)
    for i in range(4):
        pq.write_table(tbl.slice(bounds[i], bounds[i + 1] - bounds[i]),
                       str(feed_dir / f"feed-{i:02d}.parquet"))
    job = StreamingJob(StreamingConfig(
        feed_dir=str(feed_dir), out_dir=str(tmp_path / "out"),
        num_partitions=4, files_per_epoch=2,
        operators={"running": {}},
    ))
    job.run()
    got = _canon(job.sink.read_op("running").to_pandas())
    pd.testing.assert_frame_equal(got, _canon(_oracle(feed)), check_dtype=False)
