"""Windowed exact discrete quantiles (tumbling quantile_disc of turn
length): SQL oracle parity under any epoch split, custom-qs variant, and
the full-engine path."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.stages.windows import to_residual_rows, tumbling_quantile_kernel

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
            text = "x" * int(rng.integers(1, 400))
            tool = f"tool{rng.integers(0, 5)}" if role == "tool" else ""
            rows.append((f"c{c}", t, role, text, tool, ts))
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
           CAST(quantile_disc(length(text), 0.50) AS BIGINT) AS p50_len,
           CAST(quantile_disc(length(text), 0.90) AS BIGINT) AS p90_len
    FROM feed
    GROUP BY 1, 2
    ORDER BY conv_id, window_id
"""


def _run_split(rows, n_epochs, **params):
    bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
    state: dict = {}
    outs = []
    for i in range(n_epochs):
        out, state = tumbling_quantile_kernel(
            rows.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
            width_s=W_S, flush=(i == n_epochs - 1), **params)
        outs.append(out)
    return pa.concat_tables(outs), state


def _canon(tbl):
    return (tbl.to_pandas().sort_values(["conv_id", "window_id"])
            .reset_index(drop=True))


def test_tumbling_quantile_matches_sql_oracle_any_split():
    feed = _feed()
    rows = to_residual_rows(feed)
    con = duckdb.connect()
    con.register("feed", feed)
    exp = con.execute(ORACLE).fetch_df()
    assert len(exp) > 50
    for n_epochs in (1, 3, 7):
        got, _ = _run_split(rows, n_epochs)
        pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)


def test_tumbling_quantile_custom_qs():
    """qs=(25, 99): column names follow the requested quantiles; values
    match quantile_disc at the same positions."""
    feed = _feed(seed=3)
    got, _ = _run_split(to_residual_rows(feed), 4, qs=(25, 99))
    assert set(got.column_names) == {"conv_id", "window_id", "n_turns",
                                     "p25_len", "p99_len"}
    con = duckdb.connect()
    con.register("feed", feed)
    exp = con.execute(f"""
        SELECT conv_id,
               CAST(floor(epoch_us(ts) / ({W_S} * 1000000)) AS BIGINT) AS window_id,
               count(*) AS n_turns,
               CAST(quantile_disc(length(text), 0.25) AS BIGINT) AS p25_len,
               CAST(quantile_disc(length(text), 0.99) AS BIGINT) AS p99_len
        FROM feed GROUP BY 1, 2 ORDER BY conv_id, window_id""").fetch_df()
    pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)


def test_tumbling_quantile_singleton_windows():
    """n=1 windows: every quantile is the single value (ceil-rule edge)."""
    rows = []
    for t in range(5):
        rows.append((f"c{t}", 0, "user", "y" * (t + 1), "",
                     T0 + t * 10**9))  # far apart -> one row per window
    feed = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([r[5] for r in rows], type=pa.int64()).cast(pa.timestamp("us")),
    })
    got, _ = _run_split(to_residual_rows(feed), 2)
    df = got.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert (df["n_turns"] == 1).all()
    assert df["p50_len"].tolist() == [1, 2, 3, 4, 5]
    assert (df["p50_len"] == df["p90_len"]).all()


def test_tumbling_quantile_in_engine(ray_session, tmp_path):
    import pyarrow.parquet as pq_mod

    from dstream_ray.pipelines.streaming import StreamingConfig, StreamingJob

    feed_tbl = _feed(seed=9)
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
        files_per_epoch=1, operators={"tumbling_quantile": {"width_s": W_S}},
    ))
    job.run()
    got = job.sink.read_op("tumbling_quantile")
    con = duckdb.connect()
    con.register("feed", feed_tbl)
    exp = con.execute(ORACLE).fetch_df()
    pd.testing.assert_frame_equal(_canon(got), exp, check_dtype=False)
