"""Streaming LEFT-OUTER interval join ('outer_join' operator): SQL LEFT
JOIN oracle parity (with -1 sentinels) under any epoch split, on-arrival
pair emission, early timeout decision, and the engine path end-to-end."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.stages.windows import outer_join_kernel, to_residual_rows

T0 = 1_700_000_000_000_000
W_S = 600


def _feed(seed=0, n_convs=6, n_turns=50):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        ts = T0 + int(rng.integers(0, 3600)) * 1_000_000
        for t in range(n_turns):
            # gaps straddle W_S so matched, multi-matched and timed-out
            # user turns all occur
            ts += int(rng.integers(1, 3 * W_S)) * 1_000_000
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
    SELECT u.conv_id AS conv_id,
           CAST(u.turn_idx AS BIGINT) AS user_turn_idx,
           CAST(COALESCE(t.turn_idx, -1) AS BIGINT) AS tool_turn_idx,
           COALESCE(epoch_us(t.ts) - epoch_us(u.ts), CAST(-1 AS BIGINT)) AS dt_us
    FROM (SELECT * FROM feed WHERE role = 'user') u
    LEFT JOIN (SELECT * FROM feed WHERE role = 'tool') t
      ON t.conv_id = u.conv_id
     AND epoch_us(t.ts) > epoch_us(u.ts)
     AND epoch_us(t.ts) <= epoch_us(u.ts) + CAST({W_S} AS BIGINT) * 1000000
    ORDER BY 1, 2, 3
"""


def _oracle(feed):
    con = duckdb.connect()
    con.register("feed", feed)
    return con.execute(ORACLE).fetch_df()


def _run_split(rows, n_epochs):
    bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
    state: dict = {}
    outs = []
    for i in range(n_epochs):
        out, state = outer_join_kernel(
            rows.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
            within_s=W_S, flush=(i == n_epochs - 1))
        outs.append(out)
    return outs, state


def _canon(df):
    return df.sort_values(["conv_id", "user_turn_idx", "tool_turn_idx"]).reset_index(
        drop=True)


def test_outer_join_matches_left_join_oracle_any_split():
    feed = _feed(seed=2)  # seed picked so multi-matched users occur
    rows = to_residual_rows(feed)
    exp = _canon(_oracle(feed))
    # the feed exercises all three shapes: timeout rows, matched pairs,
    # and users matched by >1 tool
    assert (exp["tool_turn_idx"] == -1).any()
    assert (exp["tool_turn_idx"] >= 0).any()
    assert exp.groupby(["conv_id", "user_turn_idx"]).size().max() > 1
    for n_epochs in (1, 4, 9):
        outs, _ = _run_split(rows, n_epochs)
        got = _canon(pa.concat_tables(outs).to_pandas())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_outer_join_emits_early_and_bounds_state():
    """Pairs emit on tool arrival and timeouts on deadline passage — not
    only at flush — and pending state stays within the trailing window."""
    feed = _feed(seed=3)
    rows = to_residual_rows(feed)
    outs, state = _run_split(rows, 8)
    pre = pa.concat_tables(outs[:-1]).to_pandas()
    assert (pre["tool_turn_idx"] >= 0).any()  # matched pairs pre-flush
    assert (pre["tool_turn_idx"] == -1).any()  # early timeout decision
    assert state["pend"] == {}  # flush cleared pending
    half = rows.slice(0, rows.num_rows // 2)
    _, mid_state = outer_join_kernel(half, {}, within_s=W_S, flush=False)
    df = half.to_pandas()
    clocks = df.groupby("conv_id")["ts_us"].max()
    for nm, (turns, tss, hit) in mid_state["pend"].items():
        if len(tss):
            assert (tss + W_S * 1_000_000 >= clocks[nm]).all()


def test_outer_join_cross_epoch_match_suppresses_timeout():
    """A tool arriving epochs after its user still pairs (once) and the
    user never emits a timeout row; same-ts tools do NOT match."""
    rows = pa.table({
        "conv_id": pa.array(["c0"] * 3),
        "turn_idx": pa.array([0, 1, 2], type=pa.int32()),
        "role": pa.array(["user", "assistant", "tool"]),
        "tool": pa.array(["", "", "t1"]),
        "ts_us": pa.array([T0, T0 + 100 * 1_000_000, T0 + 400 * 1_000_000]),
        "n_chars": pa.array([1, 1, 1], type=pa.int64()),
    })
    state: dict = {}
    outs = []
    for i in range(3):
        out, state = outer_join_kernel(rows.slice(i, 1), state, within_s=W_S,
                                       flush=(i == 2))
        outs.append(out)
    got = pa.concat_tables(outs).to_pandas()
    assert len(got) == 1  # exactly the pair, no timeout row
    assert got["tool_turn_idx"].tolist() == [2]
    assert got["dt_us"].tolist() == [400 * 1_000_000]
    # same-ts tool does NOT match (strictly-after semantics) -> timeout row
    rows2 = rows.set_column(4, "ts_us", pa.array([T0, T0 + 1, T0]))
    out, _ = outer_join_kernel(rows2, {}, within_s=W_S, flush=True)
    assert out.num_rows == 1
    assert out["tool_turn_idx"][0].as_py() == -1


def test_outer_join_engine_end_to_end(ray_session, tmp_path):
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
        operators={"outer_join": {"within_s": W_S}},
    ))
    job.run()
    got = _canon(job.sink.read_op("outer_join").to_pandas())
    pd.testing.assert_frame_equal(got, _canon(_oracle(feed)), check_dtype=False)
