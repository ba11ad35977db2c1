"""Gaps-and-islands per-row session labels ('sessionize' operator):
nested-window-function oracle parity under any epoch split, agreement with
the aggregating session window, O(1) state, and the engine end-to-end."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.stages.windows import sessionize_kernel, to_residual_rows

T0 = 1_700_000_000_000_000
GAP_S = 600


def _feed(seed=0, n_convs=6, n_turns=50):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        ts = T0 + int(rng.integers(0, 3600)) * 1_000_000
        for t in range(n_turns):
            # gaps straddle GAP_S so multi-session convs occur
            ts += int(rng.integers(1, 3 * GAP_S)) * 1_000_000
            role = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            tool = f"tool{rng.integers(0, 5)}" if role == "tool" else ""
            rows.append((f"c{c}", t, role, f"m{c}-{t}", tool, ts))
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([r[5] for r in rows], type=pa.int64()).cast(pa.timestamp("us")),
    })


ORACLE = f"""
    WITH lagged AS (
      SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS prev_us
      FROM feed
    ),
    labeled AS (
      SELECT conv_id, turn_idx,
             SUM(CASE WHEN prev_us IS NULL
                        OR ts_us - prev_us > CAST({GAP_S} AS BIGINT) * 1000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY conv_id ORDER BY turn_idx) AS session_id
      FROM lagged
    )
    SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
           CAST(session_id AS BIGINT) AS session_id,
           CAST(row_number() OVER (PARTITION BY conv_id, session_id
                                   ORDER BY turn_idx) AS BIGINT)
             AS turn_in_session
    FROM labeled
    ORDER BY 1, 2
"""


def _oracle(feed):
    con = duckdb.connect()
    con.register("feed", feed)
    return con.execute(ORACLE).fetch_df()


def _canon(df):
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_sessionize_matches_nested_window_oracle_any_split():
    feed = _feed()
    rows = to_residual_rows(feed)
    exp = _canon(_oracle(feed))
    assert exp["session_id"].max() > 1  # multi-session convs occur
    for n_epochs in (1, 4, 9):
        bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
        state: dict = {}
        outs = []
        for i in range(n_epochs):
            out, state = sessionize_kernel(
                rows.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
                gap_s=GAP_S, flush=(i == n_epochs - 1))
            outs.append(out)
        got = _canon(pa.concat_tables(outs).to_pandas())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert state.get("sess")  # carry survives flush (flush is non-terminal)


def test_sessionize_agrees_with_aggregating_session_window():
    """Label counts per (conv, session) == the session window's n_turns:
    the two operators are duals of the same gap partitioning."""
    from dstream_ray.stages.windows import session_kernel

    feed = _feed(seed=5)
    rows = to_residual_rows(feed)
    lab, _ = sessionize_kernel(rows, {}, gap_s=GAP_S, flush=True)
    agg, _ = session_kernel(rows, {}, gap_s=GAP_S, flush=True)
    sizes = (lab.to_pandas().groupby(["conv_id", "session_id"]).size()
             .reset_index(name="n"))
    agg_df = agg.to_pandas()
    assert len(sizes) == len(agg_df)
    got = sizes.sort_values(["conv_id", "session_id"])["n"].tolist()
    # session_kernel ids are 0-based in the same gap partitioning
    exp = agg_df.sort_values(["conv_id", "session_id"])["n_turns"].tolist()
    assert got == exp


def test_sessionize_carry_continues_session_across_epochs():
    rows = pa.table({
        "conv_id": pa.array(["c0"] * 4),
        "turn_idx": pa.array([0, 1, 2, 3], type=pa.int32()),
        "role": pa.array(["user", "tool", "user", "tool"]),
        "tool": pa.array(["", "t", "", "t"]),
        # gap between rows 1 and 2 exceeds GAP_S -> second session
        "ts_us": pa.array([T0, T0 + 10**6, T0 + 2000 * 10**6, T0 + 2001 * 10**6]),
        "n_chars": pa.array([1, 1, 1, 1], type=pa.int64()),
    })
    state: dict = {}
    outs = []
    for i in range(4):
        out, state = sessionize_kernel(rows.slice(i, 1), state, gap_s=GAP_S,
                                       flush=(i == 3))
        outs.append(out)
    df = pa.concat_tables(outs).to_pandas()
    assert df["session_id"].tolist() == [1, 1, 2, 2]
    assert df["turn_in_session"].tolist() == [1, 2, 1, 2]


def test_sessionize_post_flush_continuation_matches_single_pass():
    """Flush is NON-terminal: flushing mid-stream then consuming more feed
    must label sessions identically to one uninterrupted pass."""
    feed = _feed(seed=4)
    rows = to_residual_rows(feed)
    exp_out, _ = sessionize_kernel(rows, {}, gap_s=GAP_S, flush=True)
    exp = exp_out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    cut = rows.num_rows // 2
    state: dict = {}
    outs = []
    for part in (rows.slice(0, cut), rows.slice(cut)):
        out, state = sessionize_kernel(part, state, gap_s=GAP_S, flush=True)
        outs.append(out)
    got = (pa.concat_tables(outs).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sessionize_engine_end_to_end(ray_session, tmp_path):
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
        operators={"sessionize": {"gap_s": GAP_S}},
    ))
    job.run()
    got = _canon(job.sink.read_op("sessionize").to_pandas())
    pd.testing.assert_frame_equal(got, _canon(_oracle(feed)), check_dtype=False)
