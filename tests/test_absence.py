"""CEP absence/timeout pattern ('absence' operator): NOT EXISTS oracle
parity under any epoch split, early (pre-flush) timeout emission, matched
suppression, and the engine path end-to-end."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.stages.windows import absence_kernel, to_residual_rows

T0 = 1_700_000_000_000_000
W_S = 600


def _feed(seed=0, n_convs=6, n_turns=50):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        ts = T0 + int(rng.integers(0, 3600)) * 1_000_000
        for t in range(n_turns):
            # gaps straddle W_S so both matched and timed-out users occur
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
    SELECT u.conv_id, CAST(u.turn_idx AS BIGINT) AS user_turn_idx,
           epoch_us(u.ts) AS ts_us
    FROM feed u
    WHERE u.role = 'user' AND NOT EXISTS (
      SELECT 1 FROM feed t
      WHERE t.conv_id = u.conv_id AND t.role = 'tool'
        AND epoch_us(t.ts) > epoch_us(u.ts)
        AND epoch_us(t.ts) <= epoch_us(u.ts) + CAST({W_S} AS BIGINT) * 1000000)
    ORDER BY 1, 2
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
        out, state = absence_kernel(
            rows.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
            within_s=W_S, flush=(i == n_epochs - 1))
        outs.append(out)
    return outs, state


def _canon(df):
    return df.sort_values(["conv_id", "user_turn_idx"]).reset_index(drop=True)


def test_absence_matches_not_exists_oracle_any_split():
    feed = _feed()
    rows = to_residual_rows(feed)
    exp = _canon(_oracle(feed))
    n_users = feed.to_pandas().query("role == 'user'").shape[0]
    assert 0 < len(exp) < n_users  # both timeouts and matches occur
    for n_epochs in (1, 4, 9):
        outs, _ = _run_split(rows, n_epochs)
        got = _canon(pa.concat_tables(outs).to_pandas())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_absence_emits_before_flush_and_bounds_state():
    """Timeouts decide as soon as the conv clock passes the deadline — not
    only at flush — and pending state stays within the trailing window."""
    feed = _feed(seed=3)
    rows = to_residual_rows(feed)
    outs, state = _run_split(rows, 8)
    pre_flush = sum(o.num_rows for o in outs[:-1])
    assert pre_flush > 0  # early emission happened
    assert state["pend"] == {}  # flush cleared pending
    # state bound mid-stream: every pending user is within W of the conv clock
    half = rows.slice(0, rows.num_rows // 2)
    _, mid_state = absence_kernel(half, {}, within_s=W_S, flush=False)
    df = half.to_pandas()
    clocks = df.groupby("conv_id")["ts_us"].max()
    for nm, (turns, tss) in mid_state["pend"].items():
        assert (tss + W_S * 1_000_000 >= clocks[nm]).all()


def test_absence_matched_users_never_emit():
    """A tool inside (u.ts, u.ts+W] suppresses the user turn even when the
    match arrives epochs later."""
    rows = pa.table({
        "conv_id": pa.array(["c0"] * 3),
        "turn_idx": pa.array([0, 1, 2], type=pa.int32()),
        "role": pa.array(["user", "assistant", "tool"]),
        "tool": pa.array(["", "", "t1"]),
        "ts_us": pa.array([T0, T0 + 100 * 1_000_000, T0 + 400 * 1_000_000]),
        "n_chars": pa.array([1, 1, 1], type=pa.int64()),
    })
    # split so the user and its matching tool arrive in different epochs
    state: dict = {}
    outs = []
    for i in range(3):
        out, state = absence_kernel(rows.slice(i, 1), state, within_s=W_S,
                                    flush=(i == 2))
        outs.append(out)
    assert sum(o.num_rows for o in outs) == 0
    # same-ts tool does NOT match (strictly-after semantics)
    rows2 = rows.set_column(4, "ts_us", pa.array([T0, T0 + 1, T0]))
    out, _ = absence_kernel(rows2, {}, within_s=W_S, flush=True)
    assert out.num_rows == 1 and out["user_turn_idx"][0].as_py() == 0


def test_absence_engine_end_to_end(ray_session, tmp_path):
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
        operators={"absence": {"within_s": W_S}},
    ))
    job.run()
    got = _canon(job.sink.read_op("absence").to_pandas())
    pd.testing.assert_frame_equal(got, _canon(_oracle(feed)), check_dtype=False)
