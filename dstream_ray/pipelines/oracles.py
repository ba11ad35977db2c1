"""DuckDB oracle SQL for every SQL-expressible query in
:mod:`dstream_ray.pipelines.queries` (+ the text/dedup/embedding queries).

The driver registers the testdata parquet files as views named
``region nation customer supplier part orders lineitem events documents
embeddings`` and compares row count, schema, and an order-insensitive value
hash against the Ray result — column names must match exactly.

The transcripts feed is not a physical table; it is defined here as a CTE
over ``events`` that mirrors :func:`dstream_ray.sources.transcripts.
events_to_transcripts_table` exactly (same conv mapping, same turn numbering,
same role/tool assignment).
"""

TRANSCRIPTS_CTE = """
transcripts AS (
  SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
         rn AS turn_idx,
         CASE rn % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
         props AS text,
         CASE WHEN rn % 3 = 2 THEN 'tool_' || CAST(event_id % 5 AS VARCHAR) ELSE '' END AS tool,
         ts,
         CAST(user_id % 8 AS INTEGER) AS partition_id
  FROM (
    SELECT user_id, event_id, ts, props,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS rn
    FROM events
  )
)
"""

SESSION_CTE = """
flagged AS (
  SELECT conv_id, turn_idx, role, tool, text, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > CAST({gap_s} AS BIGINT)*1000000
              THEN 1 ELSE 0 END AS brk
  FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), sess AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS BIGINT) AS session_id
  FROM flagged
)
"""

ORACLE_SQL: dict[str, str] = {}

ORACLE_SQL["transcripts_feed"] = f"WITH {TRANSCRIPTS_CTE} SELECT * FROM transcripts"

ORACLE_SQL["tumbling_window"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id, CAST(floor(epoch(ts)/86400) AS BIGINT) AS window_id,
       count(*) AS n_turns,
       count(*) FILTER (WHERE role='user') AS n_user_turns,
       count(*) FILTER (WHERE role='tool') AS n_tool_turns,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM transcripts GROUP BY 1, 2
"""

ORACLE_SQL["sliding_window"] = f"""
WITH {TRANSCRIPTS_CTE}, fan AS (
  SELECT conv_id, CAST(floor(epoch(ts)/86400) AS BIGINT) AS window_id, length(text) AS lc FROM transcripts
  UNION ALL
  SELECT conv_id, CAST(floor(epoch(ts)/86400) AS BIGINT) - 1 AS window_id, length(text) AS lc FROM transcripts
)
SELECT conv_id, window_id, count(*) AS n_turns, CAST(sum(lc) AS BIGINT) AS n_chars
FROM fan GROUP BY 1, 2
"""

ORACLE_SQL["session_window"] = f"""
WITH {TRANSCRIPTS_CTE}, {SESSION_CTE.format(gap_s=43200)}
SELECT conv_id, session_id,
       count(*) AS n_turns,
       count(*) FILTER (WHERE role='user') AS n_user_turns,
       count(*) FILTER (WHERE role='tool') AS n_tool_turns,
       CAST(min(turn_idx) AS BIGINT) AS first_turn_idx,
       CAST(max(turn_idx) AS BIGINT) AS last_turn_idx,
       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
FROM sess GROUP BY 1, 2
"""

ORACLE_SQL["stream_join"] = f"""
WITH {TRANSCRIPTS_CTE}, {SESSION_CTE.format(gap_s=43200)}, attributed AS (
  SELECT conv_id, session_id, turn_idx, role, tool,
         max(CASE WHEN role='user' THEN turn_idx END)
           OVER (PARTITION BY conv_id, session_id ORDER BY turn_idx
                 ROWS UNBOUNDED PRECEDING) AS user_turn_idx
  FROM sess
)
SELECT conv_id, session_id, CAST(user_turn_idx AS BIGINT) AS user_turn_idx,
       CAST(turn_idx AS BIGINT) AS tool_turn_idx, tool
FROM attributed WHERE role='tool' AND user_turn_idx IS NOT NULL
"""

ORACLE_SQL["partition_watermarks"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT partition_id, count(*) AS n_rows, count(DISTINCT conv_id) AS n_convs,
       max(epoch_us(ts)) AS watermark_us
FROM transcripts GROUP BY 1
"""

ORACLE_SQL["role_stats"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT role, count(*) AS n_turns, CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM transcripts GROUP BY 1
"""

ORACLE_SQL["tool_usage"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT tool, count(*) AS n_calls, count(DISTINCT conv_id) AS n_convs
FROM transcripts WHERE role='tool' GROUP BY 1
"""

ORACLE_SQL["events_hourly"] = """
SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_id,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
"""

ORACLE_SQL["lineitem_pricing"] = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM lineitem GROUP BY 1, 2
"""

ORACLE_SQL["orders_by_segment"] = """
SELECT c.c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""
