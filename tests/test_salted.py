"""Hot-key salting tests: a mega-conversation (100x median turns) must be
split across salt partitions AND produce byte-identical session windows to
the unsalted kernel and the DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from dstream_ray.sources.transcripts import generate_transcripts
from dstream_ray.stages.salted import (
    add_salted_partition,
    phase1_sessionize_chunks,
    phase2_merge_islands,
    salted_session_windows,
)
from dstream_ray.stages.windows import session_kernel, to_residual_rows

GAP_S = 120


def make_skewed_feed() -> pa.Table:
    return generate_transcripts(
        n_convs=30, mean_turns=8, seed=21, session_gap_s=GAP_S, mega_conv_turns=2000
    )


def oracle_sessions(feed: pa.Table) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("transcripts", feed)
    return con.execute(
        f"""
        WITH flagged AS (
          SELECT conv_id, turn_idx, role, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > CAST({GAP_S} AS BIGINT)*1000000
                      THEN 1 ELSE 0 END AS brk
          FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        ), sess AS (
          SELECT *, CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS BIGINT) AS session_id
          FROM flagged
        )
        SELECT conv_id, session_id, count(*) AS n_turns,
               count(*) FILTER (WHERE role='user') AS n_user_turns,
               count(*) FILTER (WHERE role='tool') AS n_tool_turns,
               CAST(min(turn_idx) AS BIGINT) AS first_turn_idx,
               CAST(max(turn_idx) AS BIGINT) AS last_turn_idx,
               max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
        FROM sess GROUP BY 1,2
        """
    ).fetch_arrow_table().to_pandas()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(["conv_id", "session_id"]).reset_index(drop=True)


def test_phase_kernels_match_unsalted_and_oracle():
    feed = make_skewed_feed()
    # pure-kernel path (no ray): phase1 on the whole table, phase2 merge
    islands = phase1_sessionize_chunks(feed, gap_s=GAP_S, chunk_turns=16)
    merged = phase2_merge_islands(islands, gap_s=GAP_S).to_pandas()
    unsalted, _ = session_kernel(to_residual_rows(feed), {}, gap_s=GAP_S, flush=True)
    exp = oracle_sessions(feed)
    pd.testing.assert_frame_equal(norm(merged), norm(exp), check_dtype=False)
    pd.testing.assert_frame_equal(norm(unsalted.to_pandas()), norm(exp), check_dtype=False)


def test_mega_conv_spreads_across_salt_partitions():
    feed = make_skewed_feed()
    salted = add_salted_partition(feed, chunk_turns=16, num_partitions=32)
    df = salted.to_pandas()
    mega = df.groupby("conv_id").size().idxmax()
    parts = df[df["conv_id"] == mega]["salt_partition"].nunique()
    assert parts >= 16, f"mega conv only hit {parts} partitions"
    # unsalted fnv partitioning would put it on exactly 1


def test_salted_pipeline_end_to_end(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    feed = make_skewed_feed()
    p = tmp_path / "feed.parquet"
    pq.write_table(feed, str(p))
    ds = rd.read_parquet(str(p))
    out = salted_session_windows(ds, gap_s=GAP_S, chunk_turns=16, num_partitions=16).to_pandas()
    exp = oracle_sessions(feed)
    pd.testing.assert_frame_equal(norm(out), norm(exp), check_dtype=False)
