"""Streaming interval join: SQL self-join oracle parity under any epoch
split, exactly-once pair emission, bounded ts-window buffers, and the
full-engine path."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.stages.windows import interval_join_kernel, to_residual_rows

T0 = 1_700_000_000_000_000
W_S = 120

ORACLE = f"""
    SELECT u.conv_id AS conv_id,
           u.turn_idx AS user_turn_idx,
           t.turn_idx AS tool_turn_idx,
           epoch_us(t.ts) - epoch_us(u.ts) AS dt_us
    FROM feed u JOIN feed t ON u.conv_id = t.conv_id
    WHERE u.role = 'user' AND t.role = 'tool'
      AND abs(epoch_us(t.ts) - epoch_us(u.ts)) <= {W_S} * 1000000
    ORDER BY conv_id, user_turn_idx, tool_turn_idx
"""


def _feed(seed=0, n_convs=6, n_turns=40):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        ts = T0 + int(rng.integers(0, 10**9))
        for t in range(n_turns):
            ts += int(rng.integers(0, 100)) * 1_000_000  # gaps 0-100s
            role = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            rows.append((f"c{c}", t, role, f"x{t}", "tx" if role == "tool" else "", ts))
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([r[5] for r in rows], type=pa.int64()).cast(pa.timestamp("us")),
    })


def _run_split(rows, n_epochs):
    bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
    state: dict = {}
    outs = []
    for i in range(n_epochs):
        out, state = interval_join_kernel(
            rows.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
            within_s=W_S, flush=(i == n_epochs - 1))
        outs.append(out)
    return pa.concat_tables(outs), state


def _canon(tbl):
    return (tbl.to_pandas().sort_values(["conv_id", "user_turn_idx", "tool_turn_idx"])
            .reset_index(drop=True))


def test_interval_join_matches_sql_oracle_any_split():
    feed = _feed()
    rows = to_residual_rows(feed)
    con = duckdb.connect()
    con.register("feed", feed)
    exp = con.execute(ORACLE).fetch_df()
    assert len(exp) > 50  # the fixture actually exercises pairing
    for n_epochs in (1, 3, 7):
        got, _ = _run_split(rows, n_epochs)
        pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)


def test_interval_join_pairs_emitted_exactly_once():
    """No pair is duplicated across epochs (the later-arrival rule)."""
    got, _ = _run_split(to_residual_rows(_feed(seed=5)), 5)
    df = got.to_pandas()
    assert not df.duplicated(["conv_id", "user_turn_idx", "tool_turn_idx"]).any()


def test_interval_join_buffers_bounded_by_window():
    """State holds only the trailing within_s of each conv — a long stream
    does not grow it."""
    n = 2000
    rows = to_residual_rows(_feed(seed=2, n_convs=1, n_turns=n))
    _, state = _run_split(rows, 4)
    (u_turn, u_ts) = state["u"]["c0"]
    (t_turn, t_ts) = state["t"]["c0"]
    max_ts = int(rows["ts_us"][-1].as_py())
    for ts in (u_ts, t_ts):
        assert len(ts) < n // 4  # pruned, not the whole history
        if len(ts):
            assert ts.min() >= max_ts - W_S * 1_000_000


def test_interval_join_in_engine(ray_session, tmp_path):
    import pyarrow.parquet as pq_mod

    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob

    feed_tbl = _feed(seed=9)
    # engine feed must be (conv, turn)-ordered within shards
    order = pa.compute.sort_indices(
        feed_tbl, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    feed_tbl = feed_tbl.take(order)
    d = tmp_path / "feed"
    d.mkdir()
    n = feed_tbl.num_rows
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        pq_mod.write_table(feed_tbl.slice(lo, hi - lo), str(d / f"f-{i}.parquet"))
    job = StreamingJob(StreamingConfig(
        feed_dir=str(d), out_dir=str(tmp_path / "out"), num_partitions=2,
        files_per_epoch=1, operators={"interval_join": {"within_s": W_S}},
    ))
    job.run()
    got = job.sink.read_op("interval_join")
    con = duckdb.connect()
    con.register("feed", feed_tbl)
    exp = con.execute(ORACLE).fetch_df()
    pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)
