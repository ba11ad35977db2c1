"""Windowed exact distinct-count (tumbling count(DISTINCT tool)): SQL oracle
parity under any epoch split, value_col/skip_empty variants, engine path."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.stages.windows import to_residual_rows, tumbling_distinct_kernel

T0 = 1_700_000_000_000_000
W_S = 300


def _feed(seed=0, n_convs=6, n_turns=50):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        ts = T0 + int(rng.integers(0, 10**9))
        for t in range(n_turns):
            ts += int(rng.integers(0, 120)) * 1_000_000
            role = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            tool = f"tool{rng.integers(0, 5)}" if role == "tool" else ""
            rows.append((f"c{c}", t, role, f"x{t}", tool, ts))
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([r[5] for r in rows], type=pa.int64()).cast(pa.timestamp("us")),
    })


ORACLE = f"""
    SELECT conv_id,
           CAST(floor(epoch_us(ts) / ({W_S} * 1000000)) AS BIGINT) AS window_id,
           count(*) AS n_turns,
           count(DISTINCT CASE WHEN tool <> '' THEN tool END) AS n_distinct
    FROM feed
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def _run_split(rows, n_epochs, **kw):
    bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
    state: dict = {}
    outs = []
    for i in range(n_epochs):
        out, state = tumbling_distinct_kernel(
            rows.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
            width_s=W_S, flush=(i == n_epochs - 1), **kw)
        outs.append(out)
    return pa.concat_tables(outs), state


def _canon(tbl):
    return (tbl.to_pandas().sort_values(["conv_id", "window_id"])
            .reset_index(drop=True))


def test_tumbling_distinct_matches_sql_oracle_any_split():
    feed = _feed()
    rows = to_residual_rows(feed)
    con = duckdb.connect()
    con.register("feed", feed)
    exp = con.execute(ORACLE).fetch_df()
    assert exp["n_distinct"].max() >= 2  # fixture exercises multi-tool windows
    for n_epochs in (1, 4, 9):
        got, _ = _run_split(rows, n_epochs)
        pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)


def test_tumbling_distinct_role_col_no_skip():
    """value_col/skip_empty variants: distinct roles, counting '' too."""
    feed = _feed(seed=4)
    rows = to_residual_rows(feed)
    con = duckdb.connect()
    con.register("feed", feed)
    exp = con.execute(ORACLE.replace(
        "count(DISTINCT CASE WHEN tool <> '' THEN tool END)",
        "count(DISTINCT role)")).fetch_df()
    got, _ = _run_split(rows, 3, value_col="role", skip_empty=False)
    pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)


def test_tumbling_distinct_flush_is_non_terminal():
    """Post-flush rows behind a published window are dropped as late; new
    windows keep flowing."""
    feed = _feed(seed=1, n_convs=1, n_turns=10)
    rows = to_residual_rows(feed)
    out, state = tumbling_distinct_kernel(rows, {}, width_s=W_S, flush=True)
    n_emitted = out.num_rows
    assert n_emitted > 0
    # replaying the same rows: all behind the advanced per-conv cursor
    replay, state = tumbling_distinct_kernel(rows, state, width_s=W_S, flush=False)
    assert replay.num_rows == 0 and state["late_drops"] == rows.num_rows
    # a later window still emits
    later = rows.set_column(
        rows.column_names.index("ts_us"), "ts_us",
        pa.array(np.asarray(rows["ts_us"]) + 10**12))
    out2, state = tumbling_distinct_kernel(later, state, width_s=W_S, flush=True)
    assert out2.num_rows > 0


def test_tumbling_distinct_in_engine(ray_session, tmp_path):
    import pyarrow.parquet as pq_mod

    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob

    feed_tbl = _feed(seed=7)
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
        files_per_epoch=1, operators={"tumbling_distinct": {"width_s": W_S}},
    ))
    job.run()
    got = job.sink.read_op("tumbling_distinct")
    con = duckdb.connect()
    con.register("feed", feed_tbl)
    exp = con.execute(ORACLE).fetch_df()
    pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)
