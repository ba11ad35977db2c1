"""Transcripts derivation (events → feed) vs the DuckDB window-function CTE,
including the byte-equality invariant on `text` (≙ dstream's byte-stable line
relay, pkg/executor/providers.go:234-261)."""

import duckdb
import pyarrow as pa

from dstream_ray.sources.transcripts import derive_transcripts

TRANSCRIPTS_CTE = """
WITH ranked AS (
  SELECT user_id, event_id, ts, props,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS rn
  FROM events
)
SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
       rn AS turn_idx,
       CASE rn % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       props AS text,
       CASE WHEN rn % 3 = 2 THEN 'tool_' || CAST(event_id % 5 AS VARCHAR) ELSE '' END AS tool,
       ts,
       CAST(user_id % 8 AS INTEGER) AS partition_id
FROM ranked
"""


def test_derivation_matches_oracle(ray_session, sf_tiny):
    ds = derive_transcripts(sf_tiny)
    got = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_tiny}/events.parquet')"
    )
    exp = (
        con.execute(TRANSCRIPTS_CTE)
        .fetch_arrow_table()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # byte-equality of text payloads under stable (conv_id, turn_idx) order
    assert (got["text"] == exp["text"]).all()


def test_feed_contract(ray_session, sf_tiny):
    tbl = derive_transcripts(sf_tiny).to_pandas()
    g = tbl.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")
    # dense 0-based turn_idx per conv
    assert (g["turn_idx"].agg(lambda s: (s.values == range(len(s))).all())).all()
    # ts monotone non-decreasing per conv
    assert (g["ts"].agg(lambda s: s.is_monotonic_increasing)).all()
