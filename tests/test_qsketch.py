"""Windowed approximate-quantile sketch ('tumbling_qsketch' operator):
exact bucket-count parity vs the SQL bit-arithmetic oracle under any epoch
split and any partition layout, quantile-read error bound, and the engine
path end-to-end."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.stages.windows import (
    qsketch_bucket,
    qsketch_quantile,
    to_residual_rows,
    tumbling_qsketch_kernel,
)

T0 = 1_700_000_000_000_000
W_S = 86_400


def _feed(seed=0, n_convs=20, n_turns=40):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        ts = T0 + int(rng.integers(0, 2 * W_S)) * 1_000_000
        for t in range(n_turns):
            ts += int(rng.integers(1, W_S // 8)) * 1_000_000
            role = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            tool = f"tool{rng.integers(0, 5)}" if role == "tool" else ""
            # lengths spanning the exact (<16) and log-bucket (>=16) ranges
            text = "x" * int(rng.integers(0, 2000))
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
    WITH v AS (
      SELECT
        CAST(epoch_us(ts) // (CAST({W_S} AS BIGINT) * 1000000) AS BIGINT)
          AS window_id,
        length(text) AS x
      FROM feed
    )
    SELECT window_id,
           CAST(CASE WHEN x < 16 THEN x
                     ELSE (length(bin(x)) - 1) * 16
                          + ((x >> (length(bin(x)) - 5)) & 15)
                END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM v GROUP BY 1, 2 ORDER BY 1, 2
"""


def _oracle(feed):
    con = duckdb.connect()
    con.register("feed", feed)
    return con.execute(ORACLE).fetch_df()


def _merge(outs):
    df = pa.concat_tables(outs).to_pandas()
    return (df.groupby(["window_id", "bucket"], as_index=False)["n"].sum()
            .sort_values(["window_id", "bucket"]).reset_index(drop=True))


def test_bucket_id_matches_sql_bit_arithmetic():
    # includes the >= 2^53 domain where int->float rounding crosses powers
    # of two (e.g. 2^62-1): the kernel's integer-shift correction must keep
    # it identical to SQL's exact length(bin(x))
    x = np.r_[np.arange(0, 40), 2 ** np.arange(4, 63), 2 ** np.arange(5, 63) - 1,
              2 ** np.arange(53, 63) + 1, (2**63 - 1) - np.arange(0, 5),
              np.random.default_rng(0).integers(0, 10**9, 500),
              np.random.default_rng(1).integers(2**53, 2**63 - 1, 500)]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": x.astype(np.int64)}))
    exp = con.execute(
        "SELECT CASE WHEN x < 16 THEN x ELSE (length(bin(x))-1)*16 + "
        "((x >> (length(bin(x))-5)) & 15) END FROM t").fetch_df().iloc[:, 0]
    assert (qsketch_bucket(x) == exp.to_numpy()).all()


def test_qsketch_counts_match_sql_any_split_and_any_partitioning():
    feed = _feed()
    rows = to_residual_rows(feed)
    exp = _oracle(feed)
    assert exp["window_id"].nunique() > 1
    for n_epochs in (1, 5):
        bounds = np.linspace(0, rows.num_rows, n_epochs + 1).astype(int)
        state: dict = {}
        outs = []
        for i in range(n_epochs):
            out, state = tumbling_qsketch_kernel(
                rows.slice(bounds[i], bounds[i + 1] - bounds[i]), state,
                width_s=W_S, flush=(i == n_epochs - 1))
            outs.append(out)
        pd.testing.assert_frame_equal(_merge(outs), exp, check_dtype=False)
        assert state == {}
    codes = np.asarray([hash(c) % 4 for c in rows["conv_id"].to_pylist()])
    outs = []
    for pid in range(4):
        part = rows.filter(pa.array(codes == pid))
        out, _ = tumbling_qsketch_kernel(part, {}, width_s=W_S, flush=True)
        outs.append(out)
    pd.testing.assert_frame_equal(_merge(outs), exp, check_dtype=False)


def test_qsketch_quantile_error_bound():
    rng = np.random.default_rng(3)
    vals = rng.lognormal(mean=5.0, sigma=1.5, size=20_000).astype(np.int64) + 1
    bucket = qsketch_bucket(vals)
    b, n = np.unique(bucket, return_counts=True)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = qsketch_quantile(b, n.astype(np.int64), q)
        true = float(np.quantile(vals, q, method="inverted_cdf"))
        assert abs(est - true) / true < 0.0625, (q, est, true)


def test_qsketch_engine_end_to_end(ray_session, tmp_path):
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
        operators={"tumbling_qsketch": {"width_s": W_S}},
    ))
    job.run()
    got = _merge([job.sink.read_op("tumbling_qsketch")])
    pd.testing.assert_frame_equal(got, _oracle(feed), check_dtype=False)
