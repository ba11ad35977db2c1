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


def assert_oracle_ascii_contract(sf_dir: str) -> None:
    """Explicit data contract for the byte-level HUGEINT oracles
    (fnv/simhash/minhash/fingerprint/hll): they recompute hashes via
    ``split(text, '') -> ord(c)``, which equals the engine's UTF-8 byte
    hashing only when every codepoint is ASCII. The ENGINE is byte-correct
    for any input; this check makes an oracle comparison on non-ASCII data
    fail loudly up front instead of surfacing as an inexplicable
    value-hash mismatch."""
    import os

    import pyarrow.parquet as _pq

    from dstream_ray.common import utf8_view

    for tbl, col in (("documents", "text"), ("documents", "lang"), ("events", "props")):
        path = os.path.join(sf_dir, f"{tbl}.parquet")
        if not os.path.exists(path):
            continue
        t = _pq.read_table(path, columns=[col])
        data, _, _ = utf8_view(t[col])
        if len(data) and int(data.max()) >= 128:
            raise ValueError(
                f"oracle ASCII contract violated: {tbl}.{col} in {sf_dir} "
                "contains non-ASCII bytes; the byte-level HUGEINT oracles are "
                "only defined for ASCII input (the engine itself handles any "
                "bytes) — exclude those oracles for this dataset"
            )

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

# --- training-data operations (documents / embeddings) --------------------

ORACLE_SQL["doc_stats"] = """
WITH toks AS (
  SELECT doc_id, text,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))='' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \\t\\n\\x0b\\x0c\\r]+') END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
       CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to'))) AS BIGINT) AS n_stop,
       CAST(CASE WHEN len(t) > 0
                 THEN floor(length(replace(text,' ',''))*100.0 / len(t))
                 ELSE 0 END AS BIGINT) AS mean_tok_len_x100,
       (len(t) BETWEEN 10 AND 1000)
         AND (len(list_filter(t, x -> x IN ('the','a','and','of','to')))*5 <= len(t))
         AS is_quality
FROM toks
"""

ORACLE_SQL["langid_markers"] = """
WITH scored AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),'[ \\t\\n\\x0b\\x0c\\r]+'),
             x -> x IN ('der','die','und','das','ist'))) AS s_de,
         len(list_filter(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),'[ \\t\\n\\x0b\\x0c\\r]+'),
             x -> x IN ('le','la','les','et','est'))) AS s_fr,
         len(list_filter(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),'[ \\t\\n\\x0b\\x0c\\r]+'),
             x -> x IN ('el','los','las','y','es'))) AS s_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN s_de > s_fr AND s_de > s_es AND s_de > 0 THEN 'de'
            WHEN s_fr > s_de AND s_fr > s_es AND s_fr > 0 THEN 'fr'
            WHEN s_es > s_de AND s_es > s_fr AND s_es > 0 THEN 'es'
            ELSE 'en' END AS pred_lang
FROM scored
"""

ORACLE_SQL["lang_stats"] = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""

# whole-doc Horner polynomial hash mod 2^64 (base 1000003), mirroring
# stages/text.fingerprint_poly exactly; ASCII contract: ord(char) == byte.
ORACLE_SQL["doc_fingerprint"] = """
WITH hashed AS (
  SELECT doc_id,
    CASE WHEN length(text) = 0 THEN 0::HUGEINT
         ELSE list_reduce(list_transform(split(text, ''), c -> ord(c)::HUGEINT),
                          (a, b) -> (a * 1000003 + b) % (1::HUGEINT << 64))
    END AS h
  FROM documents
)
SELECT doc_id,
       CASE WHEN h >= (1::HUGEINT << 63) THEN (h - (1::HUGEINT << 64))::BIGINT
            ELSE h::BIGINT END AS fingerprint64
FROM hashed
"""

ORACLE_SQL["dedup_exact"] = """
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY text
"""

ORACLE_SQL["ngram_jaccard"] = """
WITH toks AS (
  SELECT doc_id, source, list_distinct(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),'[ \\t\\n\\x0b\\x0c\\r]+')) AS t
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(floor(1000.0 * len(list_intersect(a.t, b.t))
            / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)))) AS BIGINT)
         AS jaccard_x1000
FROM toks a JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE floor(1000.0 * len(list_intersect(a.t, b.t))
      / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)))) >= 200
"""

ORACLE_SQL["embedding_norms"] = """
SELECT vec_id,
       CAST(floor(1000 * sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
            x -> x*x)))) AS BIGINT) AS norm_x1000
FROM embeddings
"""

ORACLE_SQL["knn_bruteforce"] = """
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 8
), e AS (
  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
), sims AS (
  SELECT qid, nid, list_cosine_similarity(qv, ev) AS cos
  FROM q CROSS JOIN e WHERE nid != qid
), ranked AS (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
  FROM sims
)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""

# k-NN classification == majority label over the same exact top-10
# (dataops.q_knn_classify; ties broken toward the smaller label)
ORACLE_SQL["knn_classify"] = """
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 8
), e AS (
  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
), sims AS (
  SELECT qid, nid, list_cosine_similarity(qv, ev) AS cos
  FROM q CROSS JOIN e WHERE nid != qid
), ranked AS (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
  FROM sims
), topk AS (
  SELECT qid, nid FROM ranked WHERE rank <= 10
), votes AS (
  SELECT t.qid, emb.label, CAST(count(*) AS BIGINT) AS n_votes
  FROM topk t JOIN embeddings emb ON emb.vec_id = t.nid
  GROUP BY 1, 2
)
SELECT qid AS query_id, CAST(label AS BIGINT) AS label, n_votes
FROM votes
QUALIFY row_number() OVER (PARTITION BY qid
                           ORDER BY n_votes DESC, label) = 1
"""

ORACLE_SQL["embedding_neardup"] = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(floor(1000 * list_cosine_similarity(a.v, b.v)) AS BIGINT) AS cos_x1000
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.3
"""

ORACLE_SQL["centroid_by_label"] = """
SELECT label, CAST(dim AS BIGINT) AS dim,
       CAST(floor(1000 * avg(v)) AS BIGINT) AS avg_x1000
FROM (
  SELECT label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
GROUP BY 1, 2
"""

ORACLE_SQL["orders_by_segment"] = """
SELECT c.c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""

# salted variants must equal their unsalted oracles exactly
ORACLE_SQL["session_salted"] = ORACLE_SQL["session_window"]
ORACLE_SQL["tumbling_salted"] = ORACLE_SQL["tumbling_window"]

ORACLE_SQL["big_spenders"] = """
WITH per_cust AS (
  SELECT o.o_custkey, c.c_mktsegment, count(*) AS n_orders,
         CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(total_cents) AS BIGINT) AS total_cents
FROM per_cust WHERE n_orders >= 12 GROUP BY 1
"""

ORACLE_SQL["top_lineitems"] = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
FROM lineitem
ORDER BY price_cents DESC, l_orderkey, l_linenumber
LIMIT 20
"""


# BPE-ish token counts: the SQL pattern is built from the SAME constant the
# Ray stage compiles (RE2-safe subset; single quotes doubled for SQL).
from dstream_ray.stages.text import BPE_PATTERN as _BPE

ORACLE_SQL["bpe_token_counts"] = (
    "SELECT doc_id, CAST(len(regexp_extract_all(text, '"
    + _BPE.replace("'", "''")
    + "')) AS BIGINT) AS n_bpe_tokens FROM documents"
)

# PII scrub: decoration, per-pattern counts and the scrubbed text are all
# recomputed in SQL from the SAME pattern constants the Ray stage runs
# (both engines are RE2, so replace semantics are byte-identical).
from dstream_ray.stages.text import PII_PATTERNS as _PII


def _pii_scrub_oracle_sql() -> str:
    def q(p: str) -> str:
        return p.replace("'", "''")

    counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(t, '{q(pat)}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in _PII
    )
    scrub = "t"
    for _, pat, repl in _PII:
        scrub = f"regexp_replace({scrub}, '{q(pat)}', '{repl}', 'g')"
    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 <> 0 THEN
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com from '
                || CAST((doc_id*7)%256 AS VARCHAR) || '.'
                || CAST((doc_id*13)%256 AS VARCHAR) || '.'
                || CAST((doc_id*29)%256 AS VARCHAR) || '.'
                || CAST(doc_id%256 AS VARCHAR)
                || ' call +1 555-' || lpad(CAST(doc_id%10000 AS VARCHAR), 4, '0')
         ELSE text END AS t
  FROM documents)
SELECT doc_id,
  {counts},
  {scrub} AS scrubbed
FROM aug
"""


ORACLE_SQL["pii_scrub"] = _pii_scrub_oracle_sql()

ORACLE_SQL["cep_pattern"] = f"""
WITH {TRANSCRIPTS_CTE}, seqs AS (
  SELECT conv_id, string_agg(substr(role, 1, 1), '' ORDER BY turn_idx) AS seq
  FROM transcripts GROUP BY 1
)
SELECT conv_id, CAST(len(regexp_extract_all(seq, 'ua*t')) AS BIGINT) AS n_matches
FROM seqs
"""

ORACLE_SQL["asof_join"] = """
WITH ordered AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
         max(CASE WHEN event_type='signup' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_signup
  FROM events
)
SELECT event_id, user_id, ts_us,
       CAST(coalesce(prior_signup, -1) AS BIGINT) AS last_signup_us
FROM ordered
"""

ORACLE_SQL["semi_anti_orders"] = """
WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING')
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_custkey IN (SELECT c_custkey FROM b)) AS BIGINT) AS n_semi,
       CAST(count(*) FILTER (WHERE o_custkey NOT IN (SELECT c_custkey FROM b)) AS BIGINT) AS n_anti
FROM orders GROUP BY 1
"""

# the streaming engine's committed sinks must equal the batch oracles exactly
ORACLE_SQL["streaming_events"] = ORACLE_SQL["transcripts_feed"].replace(
    "SELECT * FROM transcripts",
    "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts",
)
ORACLE_SQL["streaming_tumbling"] = ORACLE_SQL["tumbling_window"]
# sinks read THROUGH per-epoch compaction (compact_every=1) must hit the
# very same oracles — compaction is file layout, invisible to readers
ORACLE_SQL["streaming_events_compacted"] = ORACLE_SQL["streaming_events"]
ORACLE_SQL["streaming_events_follower"] = ORACLE_SQL["streaming_events"]
ORACLE_SQL["streaming_tumbling_compacted"] = ORACLE_SQL["tumbling_window"]
ORACLE_SQL["streaming_session"] = ORACLE_SQL["session_window"]
ORACLE_SQL["streaming_join"] = ORACLE_SQL["stream_join"]
ORACLE_SQL["streaming_sliding"] = ORACLE_SQL["sliding_window"]
ORACLE_SQL["streaming_cep"] = ORACLE_SQL["cep_pattern"]

# streaming per-conv content dedup == SQL first-occurrence semantics
# (dstream_ray.stages.capture.content_dedup_kernel through the engine)
ORACLE_SQL["streaming_dedup"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx, role, text, tool, ts
FROM transcripts
QUALIFY row_number() OVER (PARTITION BY conv_id, text ORDER BY turn_idx) = 1
"""

# CEP absence/timeout == NOT EXISTS a tool turn in (u.ts, u.ts + 12 h]
# of the same conv (dstream_ray.stages.windows.absence_kernel through the
# engine; flush force-decides pending users, which over a complete feed
# equals the NOT EXISTS below)
ORACLE_SQL["streaming_absence"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT u.conv_id AS conv_id,
       CAST(u.turn_idx AS BIGINT) AS user_turn_idx,
       epoch_us(u.ts) AS ts_us
FROM transcripts u
WHERE u.role = 'user' AND NOT EXISTS (
  SELECT 1 FROM transcripts t
  WHERE t.conv_id = u.conv_id AND t.role = 'tool'
    AND epoch_us(t.ts) > epoch_us(u.ts)
    AND epoch_us(t.ts) <= epoch_us(u.ts) + CAST(43200 AS BIGINT) * 1000000
)
"""

# LEFT-OUTER interval join == SQL LEFT JOIN on the forward window with -1
# sentinels for the unmatched side (dstream_ray.stages.windows.
# outer_join_kernel through the engine; timeout rows emit when the conv
# clock passes u.ts + 12 h, which over a complete feed equals the LEFT
# JOIN's null side)
ORACLE_SQL["streaming_outer_join"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT u.conv_id AS conv_id,
       CAST(u.turn_idx AS BIGINT) AS user_turn_idx,
       CAST(COALESCE(t.turn_idx, -1) AS BIGINT) AS tool_turn_idx,
       COALESCE(epoch_us(t.ts) - epoch_us(u.ts), CAST(-1 AS BIGINT)) AS dt_us
FROM (SELECT * FROM transcripts WHERE role = 'user') u
LEFT JOIN (SELECT * FROM transcripts WHERE role = 'tool') t
  ON t.conv_id = u.conv_id
 AND epoch_us(t.ts) > epoch_us(u.ts)
 AND epoch_us(t.ts) <= epoch_us(u.ts) + CAST(43200 AS BIGINT) * 1000000
"""

# Per-row running window functions == SQL ROW_NUMBER / LAG / running SUM
# partitioned by conv, ordered by turn (dstream_ray.stages.windows.
# running_kernel through the engine; each row's outputs depend only on its
# conv prefix, which the kernel's O(1) carry summarises exactly)
# Per-row online z-score anomaly flag: (n, S, SS) over the conv's PRIOR
# turn lengths, flag iff n >= ANOMALY_MIN_PRIOR and
# (n*x - S)^2 > Z^2*(n*SS - S^2) — integer z-sigma test, no float stats.
# THE rule both sides share (the engine run configures the kernel from
# these constants).
ANOMALY_Z = 3
ANOMALY_MIN_PRIOR = 8

ORACLE_SQL["streaming_anomaly"] = f"""
WITH {TRANSCRIPTS_CTE},
w AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(count(*) OVER pw AS BIGINT) AS n_prior,
         CAST(COALESCE(sum(length(text)) OVER pw, 0) AS BIGINT) AS s_prior,
         CAST(COALESCE(sum(length(text) * length(text)) OVER pw, 0) AS BIGINT) AS ss_prior
  FROM transcripts
  WINDOW pw AS (PARTITION BY conv_id ORDER BY turn_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT conv_id, turn_idx, n_chars, n_prior,
  n_prior >= {ANOMALY_MIN_PRIOR} AND
  (n_prior * n_chars - s_prior) * (n_prior * n_chars - s_prior)
    > {ANOMALY_Z * ANOMALY_Z} * (n_prior * ss_prior - s_prior * s_prior)
  AS is_anomaly
FROM w
"""

ORACLE_SQL["streaming_running"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id,
       CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(row_number() OVER w AS BIGINT) AS row_number,
       COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w,
                CAST(-1 AS BIGINT)) AS dt_prev_us,
       CAST(sum(length(text)) OVER w AS BIGINT) AS cum_chars
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
"""

# GROUP BY ROLLUP == finest distributive aggregate + driver-side sums over
# the vocabulary-bounded finest result (queries.q_rollup_usage); grp is the
# SQL GROUPING id, '(all)' the super-aggregate placeholder
ORACLE_SQL["rollup_usage"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT CASE WHEN GROUPING(role) = 1 THEN '(all)' ELSE role END AS role,
       CASE WHEN GROUPING(tool) = 1 THEN '(all)' ELSE tool END AS tool,
       CAST(GROUPING(role) * 2 + GROUPING(tool) AS BIGINT) AS grp,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM transcripts
GROUP BY ROLLUP(role, tool)
"""

# PIVOT role -> wide per-conv columns == one-hot CASE sums per conv
# (queries.q_pivot_roles; convs never span partitions, so the per-partition
# groupby is final — no global shuffle)
ORACLE_SQL["pivot_roles"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id,
       CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_user,
       CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_assistant,
       CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tool,
       CAST(count(*) AS BIGINT) AS n_turns
FROM transcripts
GROUP BY conv_id
"""

# Windowed approximate-quantile sketch == exact bucket-count recomputation:
# the DDSketch-style log-bucket id is pure integer bit arithmetic on BOTH
# sides (numpy frexp/shift vs SQL bin()/>>/&), so every (window, bucket)
# count compares exactly (dstream_ray.stages.windows.tumbling_qsketch_kernel
# through the engine; partitions merge partials by summing)
ORACLE_SQL["streaming_qsketch"] = f"""
WITH {{TRANSCRIPTS_CTE}},
v AS (
  SELECT
    CAST(epoch_us(ts) // (CAST(86400 AS BIGINT) * 1000000) AS BIGINT)
      AS window_id,
    length(text) AS x
  FROM transcripts
)
SELECT window_id,
       CAST(CASE WHEN x < 16 THEN x
                 ELSE (length(bin(x)) - 1) * 16
                      + ((x >> (length(bin(x)) - 5)) & 15)
            END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM v GROUP BY 1, 2
""".format(TRANSCRIPTS_CTE=TRANSCRIPTS_CTE)

# Ordered funnel == chained first-occurrence-after-previous-stage minima
# (queries.q_funnel_stages; per-user-partition counts sum globally)
ORACLE_SQL["funnel_stages"] = """
WITH s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1 GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY 1
)
SELECT 'signup' AS stage, CAST(1 AS BIGINT) AS stage_idx,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 'click', CAST(2 AS BIGINT), CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 'purchase', CAST(3 AS BIGINT), CAST((SELECT count(*) FROM s3) AS BIGINT)
"""

# Cohort retention == first-active-day cohorts joined back to distinct
# (user, day) actives (queries.q_cohort_retention; per-user-partition
# distinct counts sum globally because the user hash key co-locates
# each user's whole history)
ORACLE_SQL["cohort_retention"] = """
WITH f AS (
  SELECT user_id,
         CAST(epoch_us(ts) // (CAST(86400 AS BIGINT) * 1000000) AS BIGINT)
           AS day
  FROM events
), fd AS (
  SELECT user_id, MIN(day) AS cohort_day FROM f GROUP BY 1
), act AS (
  SELECT DISTINCT f.user_id, fd.cohort_day, f.day - fd.cohort_day AS day_offset
  FROM f JOIN fd USING (user_id)
)
SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
FROM act GROUP BY 1, 2
"""

# Gaps-and-islands session labels == nested window functions: session_id
# is a running count of gap-starts, position a row_number within (conv,
# session) (dstream_ray.stages.windows.sessionize_kernel through the
# engine; the kernel's O(1) carry summarises the conv prefix exactly)
ORACLE_SQL["streaming_sessionize"] = f"""
WITH {TRANSCRIPTS_CTE},
lagged AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_us
  FROM transcripts
),
labeled AS (
  SELECT conv_id, turn_idx,
         SUM(CASE WHEN prev_us IS NULL
                    OR ts_us - prev_us > CAST(43200 AS BIGINT) * 1000000
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
"""

# GLOBAL SLIDING aggregate == each row expanded into every 24 h window
# (sliding by 6 h) that contains it; the engine never does this expansion
# — it maintains 6 h tumbling PANES and the consumer sums 4 panes per
# window (queries.q_streaming_sliding_global via tumbling_global@pane6h)
ORACLE_SQL["streaming_sliding_global"] = f"""
WITH {{TRANSCRIPTS_CTE}},
t AS (
  SELECT epoch_us(ts) AS ts_us, role, length(text) AS c FROM transcripts
), expl AS (
  SELECT unnest(generate_series(
           ((ts_us - CAST(86400 AS BIGINT) * 1000000)
             // (CAST(21600 AS BIGINT) * 1000000)) + 1,
           ts_us // (CAST(21600 AS BIGINT) * 1000000))) AS window_id,
         role, c
  FROM t
)
SELECT window_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(*) FILTER (WHERE role='user') AS BIGINT) AS n_user_turns,
       CAST(count(*) FILTER (WHERE role='tool') AS BIGINT) AS n_tool_turns,
       CAST(sum(c) AS BIGINT) AS n_chars
FROM expl GROUP BY 1
""".format(TRANSCRIPTS_CTE=TRANSCRIPTS_CTE)

# GLOBAL windowed aggregate == plain GROUP BY over the whole feed; the
# engine emits P mergeable partials per window, summed consumer-side
# (dstream_ray.stages.windows.tumbling_global_kernel through the engine)
ORACLE_SQL["streaming_global"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT CAST(floor(epoch(ts)/86400) AS BIGINT) AS window_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(*) FILTER (WHERE role='user') AS BIGINT) AS n_user_turns,
       CAST(count(*) FILTER (WHERE role='tool') AS BIGINT) AS n_tool_turns,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM transcripts
GROUP BY 1
"""

# GLOBAL windowed exact top-k == QUALIFY rank over summed value counts
# (dstream_ray.stages.windows.tumbling_counts_kernel through the engine)
ORACLE_SQL["streaming_topk"] = f"""
WITH {TRANSCRIPTS_CTE}, counts AS (
  SELECT CAST(floor(epoch(ts)/86400) AS BIGINT) AS window_id,
         tool AS value, CAST(count(*) AS BIGINT) AS n
  FROM transcripts WHERE tool <> ''
  GROUP BY 1, 2
)
SELECT window_id, value, n FROM counts
QUALIFY row_number() OVER (PARTITION BY window_id ORDER BY n DESC, value) <= 3
"""

# Misra-Gries heavy hitters (tumbling_topk_kernel) under the exact-regime
# gate (capacity >= daily tool vocabulary -> zero decrements): the summed
# per-partition summaries ARE the exact counts, so the ranked result hits
# the SAME oracle as the exact-feeder path — two state designs, one truth.
TOPK_MG_K = 3
TOPK_MG_CAPACITY = 64
ORACLE_SQL["streaming_topk_mg"] = ORACLE_SQL["streaming_topk"]

# Bottom-k hash-priority uniform sample per tumbling window
# (tumbling_sample_kernel): the oracle recomputes the engine's priority —
# fmix64(fnv1a(conv_id || ':' || turn_idx)) — in HUGEINT wraparound
# arithmetic (same emulation as the HLL oracles) and selects the k
# smallest per window. Exact for ANY partitioning/epoch split: bottom-k
# is a semilattice, so merged per-partition bottom-ks equal the full
# window's bottom-k.
SAMPLE_K = 25
SAMPLE_BY_K = 5  # stratified variant: bottom-k per (window, role)

ORACLE_SQL["streaming_sample"] = f"""
WITH {TRANSCRIPTS_CTE},
base AS (
  SELECT CAST(epoch_us(ts) // (CAST(86400 AS BIGINT) * 1000000) AS BIGINT)
           AS window_id,
         conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         CAST(length(text) AS BIGINT) AS n_chars,
         conv_id || ':' || CAST(turn_idx AS VARCHAR) AS key
  FROM transcripts
), fnv AS (
  SELECT *, list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(split(key, ''), c -> ord(c)::HUGEINT)),
      (h, b) -> (xor(h, b) * 1099511628211) % (1::HUGEINT << 64)) AS h0
  FROM base
), mix1 AS (SELECT *, xor(h0, h0 >> 33) AS h1 FROM fnv
), mul1 AS (
  SELECT *, ( ((h1 >> 32) * 18397679294719823053::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h1 % (1::HUGEINT << 32)) * 18397679294719823053::HUGEINT ) % (1::HUGEINT << 64) AS h2
  FROM mix1
), mix2 AS (SELECT *, xor(h2, h2 >> 33) AS h3 FROM mul1
), mul2 AS (
  SELECT *, ( ((h3 >> 32) * 14181476777654086739::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h3 % (1::HUGEINT << 32)) * 14181476777654086739::HUGEINT ) % (1::HUGEINT << 64) AS h4
  FROM mix2
), mixed AS (
  SELECT window_id, conv_id, turn_idx, n_chars, xor(h4, h4 >> 33) AS h FROM mul2
)
SELECT window_id, conv_id, turn_idx, n_chars FROM mixed
QUALIFY row_number() OVER (PARTITION BY window_id
                           ORDER BY h, conv_id, turn_idx) <= {{SAMPLE_K}}
ORDER BY window_id, conv_id, turn_idx
""".replace("{SAMPLE_K}", str(SAMPLE_K))

# watermark-closure twin: early emission must produce the identical sample
ORACLE_SQL["streaming_sample_wm"] = ORACLE_SQL["streaming_sample"]

# First BPE-training iteration (dataops.q_byte_pair_counts): global counts
# of adjacent character pairs (== byte pairs under the ASCII oracle
# contract), top-30 by (count DESC, pair).
ORACLE_SQL["byte_pair_counts"] = """
WITH expl AS (
  SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
  FROM documents WHERE length(text) >= 2
), pairs AS (
  SELECT substring(text, CAST(i AS INTEGER), 2) AS pair FROM expl
)
SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1
ORDER BY n DESC, pair LIMIT 30
"""

# Two BPE training iterations (dataops.q_bpe_train_steps): iteration 1 =
# the pair counts above; the top merge (count DESC, pair tie-break) is
# applied corpus-wide via left-to-right non-overlapping replace() with
# chr(1) as the merged symbol, and iteration 2 recounts. Top-10 each.
ORACLE_SQL["bpe_train_steps"] = """
WITH expl1 AS (
  SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
  FROM documents WHERE length(text) >= 2
), c1 AS (
  SELECT substring(text, CAST(i AS INTEGER), 2) AS pair,
         CAST(count(*) AS BIGINT) AS n
  FROM expl1 GROUP BY 1
), top1 AS (
  SELECT pair FROM c1 ORDER BY n DESC, pair LIMIT 1
), docs2 AS (
  SELECT replace(text, (SELECT pair FROM top1), chr(1)) AS text
  FROM documents
), expl2 AS (
  SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
  FROM docs2 WHERE length(text) >= 2
), c2 AS (
  SELECT substring(text, CAST(i AS INTEGER), 2) AS pair,
         CAST(count(*) AS BIGINT) AS n
  FROM expl2 GROUP BY 1
)
SELECT * FROM (
  (SELECT CAST(1 AS BIGINT) AS it, pair, n FROM c1
   ORDER BY n DESC, pair LIMIT 10)
  UNION ALL
  (SELECT CAST(2 AS BIGINT) AS it, pair, n FROM c2
   ORDER BY n DESC, pair LIMIT 10)
) ORDER BY it, n DESC, pair
"""

# Full N-merge BPE training loop (dataops.q_bpe_train): the learned merge
# list. Merge symbols are control bytes that the ASCII oracle contract
# guarantees absent from the raw corpus (tab/LF/CR excluded — those ARE
# legal corpus bytes), so replace() stays injective on every iteration
# and byte pairs == character pairs throughout.
BPE_TRAIN_MERGES = 16
BPE_MERGE_SYMBOLS = tuple(chr(c) for c in (*range(1, 9), *range(14, 32)))


def _bpe_train_oracle_sql(n_merges: int = BPE_TRAIN_MERGES) -> str:
    """Generate the N-stage DuckDB twin of the distributed BPE loop:
    stage k counts adjacent character pairs over corpus generation d_k,
    takes the top merge by (n DESC, pair ASC), and d_{k+1} applies it
    via left-to-right non-overlapping replace() with the k-th reserved
    merge symbol. If the corpus exhausts early, t_k goes empty and every
    later generation nulls out — the UNION then yields exactly the
    merges the engine also stops at."""
    # every d_k / t_k is referenced twice (the count and the next
    # generation / the union) — MATERIALIZED stops DuckDB's CTE inlining
    # from expanding the chain into 2^N scans of the parquet file
    parts = ["WITH d0 AS MATERIALIZED (SELECT text FROM documents)"]
    for k in range(n_merges):
        sym = ord(BPE_MERGE_SYMBOLS[k])
        parts.append(f""", c{k} AS (
  SELECT substring(text, CAST(i AS INTEGER), 2) AS pair,
         CAST(count(*) AS BIGINT) AS n
  FROM (SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
        FROM d{k} WHERE length(text) >= 2)
  GROUP BY 1
), t{k} AS MATERIALIZED (
  SELECT pair, n FROM c{k} ORDER BY n DESC, pair LIMIT 1
), d{k + 1} AS MATERIALIZED (
  SELECT replace(text, (SELECT pair FROM t{k}), chr({sym})) AS text FROM d{k}
)""")
    union = "\n  UNION ALL\n  ".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS step, pair, n FROM t{k}"
        for k in range(n_merges)
    )
    parts.append(f"\nSELECT * FROM (\n  {union}\n) ORDER BY step\n")
    return "".join(parts)


ORACLE_SQL["bpe_train"] = _bpe_train_oracle_sql()


def _bpe_encode_oracle_sql(n_merges: int = BPE_TRAIN_MERGES) -> str:
    """The ENCODE twin of :func:`_bpe_train_oracle_sql`
    (dataops.q_bpe_encode): the same N-stage learn chain, but every
    generation carries (doc_id, n_chars) so the final stage can read off
    each document's BPE token count as the merged string's length —
    after the merge chain every symbol is one character, the identity
    the engine also uses."""
    parts = [
        "WITH d0 AS MATERIALIZED "
        "(SELECT doc_id, n_chars, text FROM documents)"
    ]
    for k in range(n_merges):
        sym = ord(BPE_MERGE_SYMBOLS[k])
        parts.append(f""", c{k} AS (
  SELECT substring(text, CAST(i AS INTEGER), 2) AS pair,
         CAST(count(*) AS BIGINT) AS n
  FROM (SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
        FROM d{k} WHERE length(text) >= 2)
  GROUP BY 1
), t{k} AS MATERIALIZED (
  SELECT pair, n FROM c{k} ORDER BY n DESC, pair LIMIT 1
), d{k + 1} AS MATERIALIZED (
  SELECT doc_id, n_chars,
         CASE WHEN (SELECT count(*) FROM t{k}) = 0 THEN text
              ELSE replace(text, (SELECT pair FROM t{k}), chr({sym})) END
           AS text
  FROM d{k}
)""")
    parts.append(f"""
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(length(text) AS BIGINT) AS n_tok_bpe
FROM d{n_merges} ORDER BY doc_id
""")
    return "".join(parts)


ORACLE_SQL["bpe_encode"] = _bpe_encode_oracle_sql()

# Ingest-time inverted-index maintenance (capture.index_kernel through the
# engine): the committed postings sink equals the per-(token, turn) term
# frequencies of the whole transcripts feed — same whitespace tokenization
# contract as the batch inverted_index oracle.
ORACLE_SQL["streaming_index"] = f"""
WITH {TRANSCRIPTS_CTE},
pos AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                                   '[ \\t\\n\\x0b\\x0c\\r]+')) AS token
  FROM transcripts
  WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) <> ''
)
SELECT token, conv_id, turn_idx, CAST(count(*) AS BIGINT) AS tf
FROM pos GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

# Sliding-window sample via panes (queries.q_streaming_sliding_sample):
# each row's priority is hashed ONCE, the row then belongs to the 4
# consecutive 24 h windows sliding by 6 h that contain its timestamp
# (same expansion as the streaming_sliding_global oracle), and each
# window keeps its bottom-SAMPLE_K.
ORACLE_SQL["streaming_sliding_sample"] = f"""
WITH {TRANSCRIPTS_CTE},
base AS (
  SELECT epoch_us(ts) AS ts_us,
         conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         conv_id || ':' || CAST(turn_idx AS VARCHAR) AS key
  FROM transcripts
), fnv AS (
  SELECT *, list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(split(key, ''), c -> ord(c)::HUGEINT)),
      (h, b) -> (xor(h, b) * 1099511628211) % (1::HUGEINT << 64)) AS h0
  FROM base
), mix1 AS (SELECT *, xor(h0, h0 >> 33) AS h1 FROM fnv
), mul1 AS (
  SELECT *, ( ((h1 >> 32) * 18397679294719823053::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h1 % (1::HUGEINT << 32)) * 18397679294719823053::HUGEINT ) % (1::HUGEINT << 64) AS h2
  FROM mix1
), mix2 AS (SELECT *, xor(h2, h2 >> 33) AS h3 FROM mul1
), mul2 AS (
  SELECT *, ( ((h3 >> 32) * 14181476777654086739::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h3 % (1::HUGEINT << 32)) * 14181476777654086739::HUGEINT ) % (1::HUGEINT << 64) AS h4
  FROM mix2
), mixed AS (
  SELECT ts_us, conv_id, turn_idx, xor(h4, h4 >> 33) AS h FROM mul2
), expl AS (
  SELECT unnest(generate_series(
           ((ts_us - CAST(86400 AS BIGINT) * 1000000)
             // (CAST(21600 AS BIGINT) * 1000000)) + 1,
           ts_us // (CAST(21600 AS BIGINT) * 1000000))) AS window_id,
         conv_id, turn_idx, h
  FROM mixed
)
SELECT window_id, conv_id, turn_idx FROM expl
QUALIFY row_number() OVER (PARTITION BY window_id
                           ORDER BY h, conv_id, turn_idx) <= {SAMPLE_K}
ORDER BY window_id, conv_id, turn_idx
"""

# Stratified form of the same sample (tumbling_sample@role instance):
# bottom-SAMPLE_BY_K per (day, role), same priority hash, QUALIFY
# partitioned by the stratum.
ORACLE_SQL["streaming_sample_role"] = f"""
WITH {TRANSCRIPTS_CTE},
base AS (
  SELECT CAST(epoch_us(ts) // (CAST(86400 AS BIGINT) * 1000000) AS BIGINT)
           AS window_id,
         role, conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         conv_id || ':' || CAST(turn_idx AS VARCHAR) AS key
  FROM transcripts
), fnv AS (
  SELECT *, list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(split(key, ''), c -> ord(c)::HUGEINT)),
      (h, b) -> (xor(h, b) * 1099511628211) % (1::HUGEINT << 64)) AS h0
  FROM base
), mix1 AS (SELECT *, xor(h0, h0 >> 33) AS h1 FROM fnv
), mul1 AS (
  SELECT *, ( ((h1 >> 32) * 18397679294719823053::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h1 % (1::HUGEINT << 32)) * 18397679294719823053::HUGEINT ) % (1::HUGEINT << 64) AS h2
  FROM mix1
), mix2 AS (SELECT *, xor(h2, h2 >> 33) AS h3 FROM mul1
), mul2 AS (
  SELECT *, ( ((h3 >> 32) * 14181476777654086739::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h3 % (1::HUGEINT << 32)) * 14181476777654086739::HUGEINT ) % (1::HUGEINT << 64) AS h4
  FROM mix2
), mixed AS (
  SELECT window_id, role, conv_id, turn_idx, xor(h4, h4 >> 33) AS h FROM mul2
)
SELECT window_id, role, conv_id, turn_idx FROM mixed
QUALIFY row_number() OVER (PARTITION BY window_id, role
                           ORDER BY h, conv_id, turn_idx) <= {SAMPLE_BY_K}
ORDER BY window_id, role, conv_id, turn_idx
"""


# latest-per-key compaction == keep-last per (conv_id, role); the engine
# feed is per-conv turn-ordered (relay contract), so arrival-latest == max
# turn_idx (dstream_ray.stages.capture.upsert_kernel through the engine)
ORACLE_SQL["streaming_upsert"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx, role, text, tool, ts
FROM transcripts
QUALIFY row_number() OVER (PARTITION BY conv_id, role ORDER BY turn_idx DESC) = 1
"""

# stream-table enrichment == LEFT join against the deterministic tools dim
# written by queries._run_streaming (3 of 5 tool ids; unmatched rows null)
ORACLE_SQL["streaming_enrich"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx, role, text, tool, ts,
       CASE tool WHEN 'tool_0' THEN 'search' WHEN 'tool_2' THEN 'code'
                 WHEN 'tool_4' THEN 'math' END AS dim_category,
       CASE tool WHEN 'tool_0' THEN 'basic' WHEN 'tool_2' THEN 'pro'
                 WHEN 'tool_4' THEN 'pro' END AS dim_tier
FROM transcripts
"""

# streaming interval join == SQL self-join within +/-43200 s (IJ_WITHIN_S);
# the engine emits each pair once, in the later-arriving side's epoch
# (dstream_ray.stages.windows.interval_join_kernel through the engine)
ORACLE_SQL["streaming_interval_join"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT u.conv_id AS conv_id,
       CAST(u.turn_idx AS BIGINT) AS user_turn_idx,
       CAST(t.turn_idx AS BIGINT) AS tool_turn_idx,
       epoch_us(t.ts) - epoch_us(u.ts) AS dt_us
FROM transcripts u JOIN transcripts t ON u.conv_id = t.conv_id
WHERE u.role = 'user' AND t.role = 'tool'
  AND abs(epoch_us(t.ts) - epoch_us(u.ts)) <= CAST(43200 AS BIGINT) * 1000000
"""

# windowed exact distinct-count == GROUP BY count(DISTINCT ...) (''-valued
# tool rows don't count; dstream_ray.stages.windows.tumbling_distinct_kernel)
ORACLE_SQL["streaming_distinct"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id,
       CAST(floor(epoch(ts)/86400) AS BIGINT) AS window_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT CASE WHEN tool <> '' THEN tool END) AS BIGINT)
         AS n_distinct
FROM transcripts
GROUP BY 1, 2
"""

# windowed exact discrete quantiles == quantile_disc (value at sorted
# position ceil(q*n); dstream_ray.stages.windows.tumbling_quantile_kernel)
ORACLE_SQL["streaming_quantile"] = f"""
WITH {TRANSCRIPTS_CTE}
SELECT conv_id,
       CAST(floor(epoch(ts)/86400) AS BIGINT) AS window_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(quantile_disc(length(text), 0.50) AS BIGINT) AS p50_len,
       CAST(quantile_disc(length(text), 0.90) AS BIGINT) AS p90_len
FROM transcripts
GROUP BY 1, 2
"""

ORACLE_SQL["range_join"] = """
SELECT s.event_id, s.user_id,
       CAST(count(p.event_id) AS BIGINT) AS n_purchases_7d
FROM events s LEFT JOIN events p
  ON p.user_id = s.user_id AND p.event_type = 'purchase'
 AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
WHERE s.event_type = 'signup'
GROUP BY 1, 2
"""


# Winnowing rolling fingerprint: min over byte windows of the polynomial
# hash sum(b[j+t] * B^(15-t)) mod 2^64 (B=1000003, window=16), short docs =
# Horner over all bytes. Documents are ASCII so ord(char) == utf-8 byte.
# Exactly mirrors stages/text.rolling_fingerprint (pinned in round 2).
ORACLE_SQL["doc_fingerprint_rolling"] = """
WITH chars AS (
  SELECT doc_id, list_transform(split(text, ''), c -> ord(c)::HUGEINT) AS cs,
         length(text) AS n
  FROM documents
), hashed AS (
  SELECT doc_id,
    CASE
      WHEN n = 0 THEN 0::HUGEINT
      WHEN n < 16 THEN list_reduce(cs, (a, b) -> (a * 1000003 + b) % (1::HUGEINT << 64))
      ELSE list_min(list_transform(generate_series(1, n - 15),
        j -> list_sum(list_transform(generate_series(1, 16),
               t -> cs[j + t - 1] * ([6397295411589846571::HUGEINT,5600660903763878393::HUGEINT,14911146631531166995::HUGEINT,15642640937032856817::HUGEINT,2455841760392682171::HUGEINT,5231796974404119081::HUGEINT,3634980586811902243::HUGEINT,1460077494926286753::HUGEINT,12924618581234127435::HUGEINT,10923514805226455897::HUGEINT,14453212906556403763::HUGEINT,14003818205314896721::HUGEINT,1000009000027000027::HUGEINT,1000006000009::HUGEINT,1000003::HUGEINT,1::HUGEINT])[t])) % (1::HUGEINT << 64)))
    END AS h
  FROM chars
)
SELECT doc_id,
       CASE WHEN h >= (1::HUGEINT << 63) THEN (h - (1::HUGEINT << 64))::BIGINT
            ELSE h::BIGINT END AS fingerprint64
FROM hashed
"""

# HLL registers, computed EXACTLY in SQL: per distinct (event_type, user),
# h = fmix64(fnv1a(str(user_id))) with 64-bit wraparound arithmetic emulated
# in HUGEINT (the fmix multiplications are split at 32 bits to stay inside
# HUGEINT range); bucket = top 12 bits, rank = leading zeros of the rest +1
# via an exact threshold scan (no float log2). Register table == the merged
# HLL sketch of stages/sketches.HLL — the sketch op's oracle gate.
ORACLE_SQL["hll_registers"] = """
WITH duv AS (
  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS uid FROM events
), fnv AS (
  SELECT event_type,
    list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(split(uid, ''), c -> ord(c)::HUGEINT)),
      (h, b) -> (xor(h, b) * 1099511628211) % (1::HUGEINT << 64)
    ) AS h0
  FROM duv
), mix1 AS (
  SELECT event_type, xor(h0, h0 >> 33) AS h1 FROM fnv
), mul1 AS (
  SELECT event_type,
    ( ((h1 >> 32) * 18397679294719823053::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h1 % (1::HUGEINT << 32)) * 18397679294719823053::HUGEINT ) % (1::HUGEINT << 64) AS h2
  FROM mix1
), mix2 AS (
  SELECT event_type, xor(h2, h2 >> 33) AS h3 FROM mul1
), mul2 AS (
  SELECT event_type,
    ( ((h3 >> 32) * 14181476777654086739::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h3 % (1::HUGEINT << 32)) * 14181476777654086739::HUGEINT ) % (1::HUGEINT << 64) AS h4
  FROM mix2
), mixed AS (
  SELECT event_type, xor(h4, h4 >> 33) AS h FROM mul2
), br AS (
  SELECT event_type,
    (h >> 52)::BIGINT AS bucket,
    CASE WHEN (h << 12) % (1::HUGEINT << 64) = 0 THEN 53
         ELSE list_filter(generate_series(1, 53),
                r -> (h << 12) % (1::HUGEINT << 64) >= (1::HUGEINT << (64 - r)))[1]
    END AS rank
  FROM mixed
)
SELECT event_type AS key, bucket, CAST(MAX(rank) AS BIGINT) AS rank
FROM br GROUP BY 1, 2
"""

# Windowed form of the same register recomputation, for the streaming
# 'tumbling_hll' engine operator: the distinct set is (tumbling window,
# conv_id) over the transcripts feed, the hash chain is identical
# (stages/sketches.HLL: FNV-1a + murmur fmix64, bucket = top 12 bits,
# exact leading-zero rank), and the register table equals the elementwise
# MAX over every partition's sparse partials.
ORACLE_SQL["streaming_hll"] = f"""
WITH {{TRANSCRIPTS_CTE}},
duv AS (
  SELECT DISTINCT
    CAST(epoch_us(ts) // (CAST(86400 AS BIGINT) * 1000000) AS BIGINT)
      AS window_id,
    conv_id AS uid
  FROM transcripts
), fnv AS (
  SELECT window_id,
    list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(split(uid, ''), c -> ord(c)::HUGEINT)),
      (h, b) -> (xor(h, b) * 1099511628211) % (1::HUGEINT << 64)
    ) AS h0
  FROM duv
), mix1 AS (
  SELECT window_id, xor(h0, h0 >> 33) AS h1 FROM fnv
), mul1 AS (
  SELECT window_id,
    ( ((h1 >> 32) * 18397679294719823053::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h1 % (1::HUGEINT << 32)) * 18397679294719823053::HUGEINT ) % (1::HUGEINT << 64) AS h2
  FROM mix1
), mix2 AS (
  SELECT window_id, xor(h2, h2 >> 33) AS h3 FROM mul1
), mul2 AS (
  SELECT window_id,
    ( ((h3 >> 32) * 14181476777654086739::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h3 % (1::HUGEINT << 32)) * 14181476777654086739::HUGEINT ) % (1::HUGEINT << 64) AS h4
  FROM mix2
), mixed AS (
  SELECT window_id, xor(h4, h4 >> 33) AS h FROM mul2
), br AS (
  SELECT window_id,
    (h >> 52)::BIGINT AS bucket,
    CASE WHEN (h << 12) % (1::HUGEINT << 64) = 0 THEN 53
         ELSE list_filter(generate_series(1, 53),
                r -> (h << 12) % (1::HUGEINT << 64) >= (1::HUGEINT << (64 - r)))[1]
    END AS rank
  FROM mixed
)
SELECT window_id, bucket, CAST(MAX(rank) AS BIGINT) AS rank
FROM br GROUP BY 1, 2
""".format(TRANSCRIPTS_CTE=TRANSCRIPTS_CTE)


# --- SimHash + MinHash dedup: exact SQL recomputation ----------------------
# Both recompute the engine's FNV-1a token hashing with 64-bit wraparound in
# HUGEINT. The MinHash permutation constants come from the SAME MinHasher
# the pipeline uses, so the two sides cannot drift.

_FNV_TOKEN = """list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(split(t, ''), c -> ord(c)::HUGEINT)),
      (h, x) -> (xor(h, x) * 1099511628211) % (1::HUGEINT << 64))"""

_TOKS_TH = f"""toks AS (
  SELECT doc_id,
    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = '' THEN []
         ELSE string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \\t\\n\\x0b\\x0c\\r]+') END AS ts
  FROM documents
), th AS (
  SELECT doc_id, list_transform(ts, t -> {_FNV_TOKEN}) AS hs FROM toks
)"""

# Word-3-shingle CTE over th.hs — the MinHash family's shingle identity
# (base-1000003 window fold mod 2^64, degenerate <3-token docs collapse to
# the token-hash sum; per-doc DISTINCT). ONE definition shared by the
# minhash_dedup / streaming_neardup / decontamination oracles so the SQL
# twin of dedup.shingle_sets_batch cannot diverge between them.
_M64 = "(1::HUGEINT << 64)"
_SHING_CTE = f"""shing AS (
  SELECT doc_id,
    CASE
      WHEN len(hs) = 0 THEN []
      WHEN len(hs) < 3 THEN [list_sum(hs) % {_M64}]
      ELSE list_distinct(list_transform(generate_series(1, len(hs) - 2),
        j -> ((hs[j] * 1000003 % {_M64} + hs[j+1]) % {_M64} * 1000003 % {_M64} + hs[j+2]) % {_M64}))
    END AS sh
  FROM th
)"""

# Repetition metrics (Gopher rules): reuses the shared toks CTE (the exact
# split the byte-level _TokenView performs); unigram stats unnest tokens,
# bigram stats unnest index-built adjacent pairs (tokens contain no
# whitespace, so ' ' is an unambiguous pair separator). // is DuckDB
# integer floor division — the same floor(1000*x) integers the Ray stage
# emits.
ORACLE_SQL["repetition_stats"] = f"""
WITH {_TOKS_TH},
uni AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(c) AS BIGINT) AS max_c
  FROM (SELECT doc_id, tok, count(*) AS c
        FROM toks, unnest(ts) AS u(tok) GROUP BY 1, 2)
  GROUP BY 1
),
bgc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bg,
         CAST(count(DISTINCT b) AS BIGINT) AS n_distinct_bg
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS b
        FROM toks WHERE len(ts) > 1)
  GROUP BY 1
)
SELECT k.doc_id,
  CAST(COALESCE(u.n_tok, 0) AS BIGINT) AS n_tokens,
  CAST(CASE WHEN COALESCE(u.n_tok,0) > 0 THEN (1000*u.n_distinct)//u.n_tok ELSE 0 END AS BIGINT) AS distinct_ratio_x1000,
  CAST(CASE WHEN COALESCE(u.n_tok,0) > 0 THEN (1000*u.max_c)//u.n_tok ELSE 0 END AS BIGINT) AS top_tok_frac_x1000,
  CAST(CASE WHEN COALESCE(b.n_bg,0) > 0 THEN (1000*(b.n_bg - b.n_distinct_bg))//b.n_bg ELSE 0 END AS BIGINT) AS dup_bigram_frac_x1000
FROM toks k LEFT JOIN uni u USING (doc_id) LEFT JOIN bgc b USING (doc_id)
"""

# Decontamination: the shingle CTE is the MinHash family's (same token-FNV
# + base-1000003 window fold, per-doc distinct); the benchmark set is the
# doc_id % DECONTAM_BENCH_MOD == 0 subset and a doc's n_shared_shingles
# counts its distinct shingles that appear in ANY benchmark doc. The
# constant is THE benchmark-selection rule: q_decontamination defaults
# from it, so Ray and SQL cannot disagree on who is benchmark.
DECONTAM_BENCH_MOD = 50

ORACLE_SQL["decontamination"] = f"""
WITH {_TOKS_TH}, {_SHING_CTE}, bench AS (
  SELECT DISTINCT unnest(sh) AS s FROM shing WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
), hits AS (
  SELECT r.doc_id, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT doc_id, unnest(sh) AS s FROM shing) r
  WHERE r.s IN (SELECT s FROM bench)
  GROUP BY 1
)
SELECT d.doc_id,
  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_shingles,
  COALESCE(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""

# Substring-level dedup (word-shingle approximation of Lee et al. 2022's
# duplicated-substring removal): a doc's shingle POSITIONS (no uniquing —
# the non-distinct sibling CTE below) count as duplicated when their
# shingle value occurs in >= SUBSTRING_DUP_MIN_DOCS DISTINCT documents;
# kept = duplicated-span permille below SUBSTRING_KEEP_MAX_X1000. The
# constants are THE rule both sides share (dataops.q_substring_dedup
# defaults from them).
SUBSTRING_DUP_MIN_DOCS = 2
SUBSTRING_KEEP_MAX_X1000 = 500

_SHING_ALL_CTE = f"""shing_all AS (
  SELECT doc_id,
    CASE
      WHEN len(hs) = 0 THEN []
      WHEN len(hs) < 3 THEN [list_sum(hs) % {_M64}]
      ELSE list_transform(generate_series(1, len(hs) - 2),
        j -> ((hs[j] * 1000003 % {_M64} + hs[j+1]) % {_M64} * 1000003 % {_M64} + hs[j+2]) % {_M64})
    END AS sh
  FROM th
)"""

ORACLE_SQL["substring_dedup"] = f"""
WITH {_TOKS_TH}, {_SHING_ALL_CTE},
pos AS (SELECT doc_id, unnest(sh) AS s FROM shing_all),
docsh AS (SELECT DISTINCT doc_id, s FROM pos),
dup AS (SELECT s FROM docsh GROUP BY s HAVING count(*) >= {SUBSTRING_DUP_MIN_DOCS}),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(CASE WHEN s IN (SELECT s FROM dup) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM pos GROUP BY 1)
SELECT d.doc_id,
  CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
  CAST(COALESCE(a.n_dup, 0) AS BIGINT) AS n_dup_spans,
  CAST(CASE WHEN COALESCE(a.n_spans, 0) > 0 THEN (1000 * a.n_dup) // a.n_spans ELSE 0 END AS BIGINT) AS dup_frac_x1000,
  (CASE WHEN COALESCE(a.n_spans, 0) > 0 THEN (1000 * a.n_dup) // a.n_spans ELSE 0 END) < {SUBSTRING_KEEP_MAX_X1000} AS kept
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

# Line-level dedup (C4/RefinedWeb "repeated line removal", keep-FIRST
# occurrence): a "line" is a fixed-width NON-OVERLAPPING token chunk
# (LINE_DEDUP_W tokens; the corpus has no newlines — splitting on real
# newlines is the same operator with a different span function). Unlike
# substring_dedup (which SCORES duplicated spans), this REWRITES the
# corpus: a chunk occurrence survives iff it is the globally first
# occurrence of its hash in (doc_id, chunk_idx) order. kept_lo/hi_sum are
# the 32-bit halves of the kept-chunk hash sum, so the rewritten corpus
# content (not just counts) is value-checked without re-materializing
# text. The combined order key doc_id * LINE_CHUNK_IDX_CAP + chunk_idx is
# exact while chunk_idx < 2^21 and doc_id < 2^42 (the Ray kernel asserts).
LINE_DEDUP_W = 10
LINE_CHUNK_IDX_CAP = 1 << 21
LINE_DEDUP_BROADCAST_MAX = 2_000_000  # first-occurrence map rows; above -> join

ORACLE_SQL["line_dedup"] = f"""
WITH {_TOKS_TH},
ch AS (
  SELECT doc_id,
    CASE WHEN len(hs) = 0 THEN []
    ELSE list_transform(
      generate_series(1, CAST(ceil(len(hs) / {LINE_DEDUP_W}.0) AS BIGINT)),
      j -> list_reduce(hs[(j-1)*{LINE_DEDUP_W}+1 : least(j*{LINE_DEDUP_W}, len(hs))],
                       (a, x) -> (a * 1000003 % {_M64} + x) % {_M64}))
    END AS cl
  FROM th),
pos AS (
  SELECT doc_id, unnest(cl) AS h,
         unnest(generate_series(1, len(cl))) - 1 AS j
  FROM ch),
firsts AS (
  SELECT h, min(doc_id * {LINE_CHUNK_IDX_CAP} + j) AS kmin FROM pos GROUP BY h),
agg AS (
  SELECT p.doc_id,
    CAST(count(*) AS BIGINT) AS n_chunks,
    CAST(sum(CASE WHEN p.doc_id * {LINE_CHUNK_IDX_CAP} + p.j = f.kmin
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
    CAST(sum(CASE WHEN p.doc_id * {LINE_CHUNK_IDX_CAP} + p.j = f.kmin
             THEN p.h % 4294967296 ELSE 0 END) AS BIGINT) AS kept_lo_sum,
    CAST(sum(CASE WHEN p.doc_id * {LINE_CHUNK_IDX_CAP} + p.j = f.kmin
             THEN p.h // 4294967296 ELSE 0 END) AS BIGINT) AS kept_hi_sum
  FROM pos p JOIN firsts f USING (h) GROUP BY 1)
SELECT d.doc_id,
  CAST(COALESCE(a.n_chunks, 0) AS BIGINT) AS n_chunks,
  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
  CAST(COALESCE(a.kept_lo_sum, 0) AS BIGINT) AS kept_lo_sum,
  CAST(COALESCE(a.kept_hi_sum, 0) AS BIGINT) AS kept_hi_sum
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

# Model-based quality filtering with a deterministic stand-in for learned
# weights (the fastText/DCLM-classifier shape): token weight = a pure
# function of the FNV token hash, w(t) = (h % QUALITY_WEIGHT_MOD) - MOD//2
# in [-1000, 1000]; doc score = sum over token POSITIONS. avg_weight is
# computed through a shifted NONNEGATIVE division ((score + 1000*n) is
# >= 0) because DuckDB's // truncates toward zero while numpy floors —
# the shift makes both sides exact-equal.
QUALITY_WEIGHT_MOD = 2001

ORACLE_SQL["quality_classify"] = f"""
WITH {_TOKS_TH},
sc AS (
  SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_tokens,
    CAST(COALESCE(list_sum(list_transform(hs, h -> (h % {QUALITY_WEIGHT_MOD})::BIGINT - {QUALITY_WEIGHT_MOD // 2})), 0) AS BIGINT) AS score
  FROM th)
SELECT doc_id, n_tokens, score,
  CAST(CASE WHEN n_tokens > 0
       THEN (1000 * (score + {QUALITY_WEIGHT_MOD // 2} * n_tokens)) // n_tokens - {1000 * (QUALITY_WEIGHT_MOD // 2)}
       ELSE 0 END AS BIGINT) AS avg_weight_x1000,
  score >= 0 AS kept
FROM sc
"""

# Curriculum ordering: exact global rank by (quality score, doc_id) asc
# (score = the quality_classify hashed-weight sum), shard = rank*S//n —
# both sides pure integers; rank is 0-based.
ORACLE_SQL["curriculum_shards"] = f"""
WITH {_TOKS_TH},
sc AS (
  SELECT doc_id,
    CAST(COALESCE(list_sum(list_transform(hs, h -> (h % {QUALITY_WEIGHT_MOD})::BIGINT - {QUALITY_WEIGHT_MOD // 2})), 0) AS BIGINT) AS score
  FROM th),
rk AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score, doc_id) - 1 AS rank
  FROM sc),
t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sc)
SELECT doc_id, score, CAST(rank AS BIGINT) AS rank,
       CAST(rank * 8 // t.n AS BIGINT) AS shard
FROM rk, t
"""

# Domain/source-level filtering (the C4/RefinedWeb URL-level rule shape):
# a source survives iff its mean doc length (permille-scaled integer) is
# at least the corpus-wide mean; surviving docs pass through. All values
# nonnegative, so // is exact on both sides.
ORACLE_SQL["domain_filter"] = """
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n, CAST(sum(n_chars) AS BIGINT) AS tc
  FROM documents GROUP BY 1),
g AS (SELECT CAST((1000 * sum(n_chars)) // count(*) AS BIGINT) AS gm FROM documents)
SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d JOIN s USING (source) CROSS JOIN g
WHERE (1000 * s.tc) // s.n >= g.gm
"""

# Deterministic train/val/test split: bucket = fnv1a(str(doc_id)) % 100,
# train < SPLIT_TRAIN_X100 <= val < SPLIT_VAL_X100 <= test. Shuffle-free
# and reproducible across runs/nodes (the hash, not row order, decides);
# stratification across languages is statistical — the hash is independent
# of lang — and pytest-checked at corpus scale.
SPLIT_TRAIN_X100 = 80
SPLIT_VAL_X100 = 90

ORACLE_SQL["stratified_split"] = f"""
WITH h AS (
  SELECT doc_id, lang,
    list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(split(CAST(doc_id AS VARCHAR), ''), c -> ord(c)::HUGEINT)),
      (h, x) -> (xor(h, x) * 1099511628211) % (1::HUGEINT << 64)) % 100 AS b
  FROM documents)
SELECT doc_id, lang, CAST(b AS BIGINT) AS bucket,
  CASE WHEN b < {SPLIT_TRAIN_X100} THEN 'train'
       WHEN b < {SPLIT_VAL_X100} THEN 'val'
       ELSE 'test' END AS split
FROM h
"""

# Count-min sketch over corpus tokens, recomputed cell-for-cell: h1 = the
# FNV-1a token hash, h2 = the base-1000003 polynomial hash, cell(d) =
# d*1024 + (h1 + d*h2) mod 1024. Width is a power of two, so the engine's
# mod-2^64 wraparound drops out of the SQL side: 2^64 ≡ 0 (mod 1024).
ORACLE_SQL["cms_tokens"] = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                                   '[ \\t\\n\\x0b\\x0c\\r]+')) AS t
  FROM documents
  WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) <> ''
), h AS (
  SELECT {_FNV_TOKEN} AS h1,
         list_reduce(
           list_prepend(0::HUGEINT,
                        list_transform(split(t, ''), c -> ord(c)::HUGEINT)),
           (a, b) -> (a * 1000003 + b) % (1::HUGEINT << 64)) AS h2
  FROM tok
), cells AS (
  SELECT CAST(d.d * 1024 + CAST((h1 + d.d::HUGEINT * h2) % 1024 AS BIGINT) AS BIGINT) AS cell
  FROM h CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(d)
)
SELECT cell, CAST(count(*) AS BIGINT) AS cnt
FROM cells GROUP BY cell ORDER BY cell
"""

ORACLE_SQL["simhash"] = f"""
WITH {_TOKS_TH}, sh AS (
  SELECT doc_id,
    CASE WHEN len(hs) = 0 THEN 0::HUGEINT
         ELSE list_sum(list_transform(generate_series(0, 63), i ->
            CASE WHEN 2 * list_sum(list_transform(hs, h -> ((h >> i) % 2)::BIGINT))
                      > len(hs)
                 THEN (1::HUGEINT << i) ELSE 0::HUGEINT END))
    END AS h
  FROM th
)
SELECT doc_id,
  CASE WHEN h >= (1::HUGEINT << 63) THEN (h - (1::HUGEINT << 64))::BIGINT ELSE h::BIGINT END AS simhash,
  (h % 65536)::BIGINT AS band0
FROM sh
"""


def _minhash_oracle_sql() -> str:
    from dstream_ray.stages.dedup import MinHasher

    mh = MinHasher()
    A = "[" + ",".join(f"{x}::HUGEINT" for x in mh.a) + "]"
    B = "[" + ",".join(f"{x}::HUGEINT" for x in mh.b) + "]"
    M64 = "(1::HUGEINT << 64)"
    MERS = (1 << 61) - 1
    return f"""
WITH {_TOKS_TH}, {_SHING_CTE}, shrows AS (
  SELECT doc_id, unnest(sh) AS s FROM shing
), perms(k) AS (
  SELECT unnest(generate_series(1, 64))
), sigrows AS (
  SELECT doc_id, perms.k,
    MIN( (({A}[perms.k] * s) % {M64} + {B}[perms.k]) % {M64} % {MERS} ) AS sig
  FROM shrows CROSS JOIN perms
  GROUP BY doc_id, perms.k
), dk AS (
  SELECT d.doc_id, perms.k FROM documents d CROSS JOIN perms
), allsig AS (
  SELECT dk.doc_id, dk.k, coalesce(sr.sig, 0::HUGEINT) AS sig
  FROM dk LEFT JOIN sigrows sr ON sr.doc_id = dk.doc_id AND sr.k = dk.k
), bands AS (
  SELECT doc_id, (k - 1) // 4 AS band_id,
    list_reduce(list(sig ORDER BY k),
                (acc, v) -> (acc * 1099511628211 % {M64} + v) % {M64}) AS band_hash
  FROM allsig GROUP BY doc_id, (k - 1) // 4
), cands AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
), verified AS (
  SELECT c.doc_a, c.doc_b
  FROM cands c
  JOIN shing sa ON sa.doc_id = c.doc_a
  JOIN shing sb ON sb.doc_id = c.doc_b
  WHERE 5 * len(list_intersect(sa.sh, sb.sh))
        >= 4 * (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
), sym AS (
  SELECT doc_a AS u, doc_b AS v FROM verified
  UNION ALL SELECT doc_b, doc_a FROM verified
), walk AS (
  WITH RECURSIVE w(doc_id, lbl) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT s.v, w.lbl FROM w JOIN sym s ON s.u = w.doc_id
  )
  SELECT doc_id, MIN(lbl) AS cluster_id FROM w GROUP BY doc_id
)
SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id FROM walk
"""


# The FULL MinHash+LSH dedup pipeline under the value-hash gate: DuckDB
# recomputes shingles, 64 MinHash permutations (numpy wraparound semantics),
# banded buckets, candidate self-join, exact-Jaccard verification (integer
# 5*inter >= 4*union), and min-label components via a recursive CTE.
ORACLE_SQL["minhash_dedup"] = _minhash_oracle_sql()


def _streaming_neardup_oracle_sql(num_partitions: int = 4) -> str:
    """STREAMING near-dup suppression over the documents feed
    (queries.q_streaming_neardup / stages.capture.neardup_kernel): a doc is
    EMITTED iff no earlier doc (smaller doc_id — the feed's delivery order
    within a partition) in the SAME engine partition (fnv1a('d'||doc_id)
    mod P, the relay's routing key) shares any (band_id, band_hash)
    MinHash band bucket. Same 64-perm / 16-band / 3-shingle family as the
    batch minhash_dedup oracle; suppression is transitive by construction
    (every earlier doc's buckets count, emitted or not)."""
    from dstream_ray.stages.dedup import MinHasher

    mh = MinHasher()
    A = "[" + ",".join(f"{x}::HUGEINT" for x in mh.a) + "]"
    B = "[" + ",".join(f"{x}::HUGEINT" for x in mh.b) + "]"
    M64 = "(1::HUGEINT << 64)"
    MERS = (1 << 61) - 1
    return f"""
WITH {_TOKS_TH}, {_SHING_CTE}, shrows AS (
  SELECT doc_id, unnest(sh) AS s FROM shing
), perms(k) AS (
  SELECT unnest(generate_series(1, 64))
), sigrows AS (
  SELECT doc_id, perms.k,
    MIN( (({A}[perms.k] * s) % {M64} + {B}[perms.k]) % {M64} % {MERS} ) AS sig
  FROM shrows CROSS JOIN perms
  GROUP BY doc_id, perms.k
), dk AS (
  SELECT d.doc_id, perms.k FROM documents d CROSS JOIN perms
), allsig AS (
  SELECT dk.doc_id, dk.k, coalesce(sr.sig, 0::HUGEINT) AS sig
  FROM dk LEFT JOIN sigrows sr ON sr.doc_id = dk.doc_id AND sr.k = dk.k
), bands AS (
  SELECT doc_id, (k - 1) // 4 AS band_id,
    list_reduce(list(sig ORDER BY k),
                (acc, v) -> (acc * 1099511628211 % {M64} + v) % {M64}) AS band_hash
  FROM allsig GROUP BY doc_id, (k - 1) // 4
), pm AS (
  SELECT doc_id, list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(split('d' || CAST(doc_id AS VARCHAR), ''),
                                  c -> ord(c)::HUGEINT)),
      (h, x) -> (xor(h, x) * 1099511628211) % {M64}) % {num_partitions} AS pid
  FROM documents
), suppressed AS (
  SELECT DISTINCT b2.doc_id
  FROM bands b1
  JOIN bands b2
    ON b1.band_id = b2.band_id AND b1.band_hash = b2.band_hash
   AND b1.doc_id < b2.doc_id
  JOIN pm p1 ON p1.doc_id = b1.doc_id
  JOIN pm p2 ON p2.doc_id = b2.doc_id AND p2.pid = p1.pid
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(length(d.text) AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM suppressed)
"""


ORACLE_SQL["streaming_neardup"] = _streaming_neardup_oracle_sql()


# --- hyperplane-LSH ANN / near-dup: exact SQL recomputation ----------------
# The LSH stage is integer-exact by construction (ann.HyperplaneLSH: seeded
# {-1,0,+1} planes, vectors quantized to floor(x*1e6) BIGINTs before the
# projection), so DuckDB recomputes every bucket bit-for-bit. The plane
# matrix is read from the SAME class the pipeline instantiates, so the two
# sides cannot drift.


def _lsh_bucket_ctes(n_planes: int, dim: int = 64) -> str:
    from dstream_ray.stages.ann import HyperplaneLSH

    lsh = HyperplaneLSH(dim=dim, n_planes=n_planes)
    planes_vals = ",\n  ".join(
        f"({j}, [{','.join(str(int(w)) for w in lsh.planes[j])}])"
        for j in range(n_planes)
    )
    return f"""ei AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x * 1000000) AS BIGINT)) AS e
  FROM embeddings
), ev AS (
  SELECT vec_id, unnest(e) AS x, generate_subscripts(e, 1) AS d FROM ei
), planes(j, p) AS (
  VALUES {planes_vals}
), pv AS (
  SELECT j, unnest(p) AS w, generate_subscripts(p, 1) AS d FROM planes
), proj AS (
  SELECT ev.vec_id, pv.j, sum(ev.x * pv.w) AS s
  FROM ev JOIN pv USING (d) GROUP BY 1, 2
), bucket AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM proj GROUP BY 1
)"""


def _knn_lsh_oracle_sql(n_planes: int = 8) -> str:
    # mirrors dataops.q_knn_lsh: multi-probe = own bucket + every 1-bit flip;
    # rank by cosine desc with neighbor-id tiebreak, self excluded, top 10
    return f"""
WITH {_lsh_bucket_ctes(n_planes)},
q AS (
  SELECT e.vec_id AS qid, CAST(e.embedding AS DOUBLE[]) AS qv, b.bucket AS qb
  FROM embeddings e JOIN bucket b USING (vec_id) WHERE e.vec_id < 8
), probes AS (
  SELECT qid, qb AS pb FROM q
  UNION
  SELECT qid, xor(qb, (1::BIGINT << t.j))
  FROM q CROSS JOIN generate_series(0, {n_planes - 1}) AS t(j)
), cand AS (
  SELECT DISTINCT p.qid, cb.vec_id AS nid
  FROM probes p JOIN bucket cb ON cb.bucket = p.pb
  WHERE cb.vec_id != p.qid
), sims AS (
  SELECT c.qid, c.nid,
         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
  FROM cand c JOIN q ON q.qid = c.qid
  JOIN embeddings e ON e.vec_id = c.nid
), ranked AS (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
  FROM sims
)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


def _embedding_neardup_lsh_oracle_sql(n_planes: int = 6) -> str:
    # mirrors dataops.q_embedding_neardup_lsh: each vector fans out under its
    # bucket + every 1-bit flip; a pair co-locates iff the probe-label sets
    # intersect, i.e. iff hamming(bucket_a, bucket_b) <= 2 (equal, one flip,
    # or two distinct flips meeting in the middle)
    return f"""
WITH {_lsh_bucket_ctes(n_planes)},
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(floor(1000 * list_cosine_similarity(ea.v, eb.v)) AS BIGINT)
         AS cos_x1000
FROM bucket a JOIN bucket b
  ON a.vec_id < b.vec_id AND bit_count(xor(a.bucket, b.bucket)) <= 2
JOIN e ea ON ea.vec_id = a.vec_id
JOIN e eb ON eb.vec_id = b.vec_id
WHERE list_cosine_similarity(ea.v, eb.v) >= 0.3
"""


def _knn_ivf_oracle_sql(n_lists: int = 16, n_probe: int = 4) -> str:
    # mirrors dataops.q_knn_ivf_int: sampled integer coarse centroids
    # (vec_id < n_lists, floor(x*1e6) BIGINT components), assignment =
    # argmax integer dot (smaller list id on ties), queries probe their
    # n_probe best lists, candidates ranked by cosine desc with neighbor-id
    # tiebreak, self excluded, top 10
    return f"""
WITH ei AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x * 1000000) AS BIGINT)) AS e
  FROM embeddings
), ev AS (
  SELECT vec_id, unnest(e) AS x, generate_subscripts(e, 1) AS d FROM ei
), cv AS (
  SELECT vec_id AS j, unnest(e) AS w, generate_subscripts(e, 1) AS d
  FROM ei WHERE vec_id < {n_lists}
), dots AS (
  SELECT ev.vec_id, cv.j, sum(ev.x * cv.w) AS s
  FROM ev JOIN cv USING (d) GROUP BY 1, 2
), assign AS (
  SELECT vec_id, j AS ivf_list FROM (
    SELECT vec_id, j,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j) AS rn
    FROM dots
  ) WHERE rn = 1
), qprobe AS (
  SELECT vec_id AS qid, j AS pl FROM (
    SELECT vec_id, j,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j) AS rn
    FROM dots WHERE vec_id < 8
  ) WHERE rn <= {n_probe}
), cand AS (
  SELECT DISTINCT p.qid, a.vec_id AS nid
  FROM qprobe p JOIN assign a ON a.ivf_list = p.pl
  WHERE a.vec_id != p.qid
), sims AS (
  SELECT c.qid, c.nid,
         list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                CAST(en.embedding AS DOUBLE[])) AS cos
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.qid
  JOIN embeddings en ON en.vec_id = c.nid
), ranked AS (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
  FROM sims
)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


# SemDeDup-style semantic dedup (Abbas et al. 2023: cluster embeddings,
# drop within-cluster near-duplicates, keep one representative). Clustering
# is the sampled integer coarse quantizer (vec_id < SEMDEDUP_LISTS
# centroids), everything at fixed-point floor(x * SEMDEDUP_SCALE) — the
# 1e3 scale (not the knn_ivf family's 1e6) keeps the SQUARED pairwise
# dots inside BIGINT/int64: |x| <= 0.53 -> dot <= 64*530^2 ~ 1.8e7,
# 100*dot^2 <= 3.3e16 and 9*n2a*n2b <= 2.9e15, all < 2^63 (and every
# unsquared product < 2^53, so numpy's float64 matmul is exact too). A
# vector is a duplicate iff some SMALLER-id vector in its cluster has
# cos^2 >= TAU2_NUM/TAU2_DEN with a positive dot — the integer-exact form
# of cos >= 0.3 that needs no square roots.
SEMDEDUP_LISTS = 16
SEMDEDUP_SCALE = 1000
SEMDEDUP_TAU2_NUM = 9
SEMDEDUP_TAU2_DEN = 100

ORACLE_SQL["semantic_dedup"] = f"""
WITH ei AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x * {SEMDEDUP_SCALE}) AS BIGINT)) AS e
  FROM embeddings
), ev AS (
  SELECT vec_id, unnest(e) AS x, generate_subscripts(e, 1) AS d FROM ei
), cv AS (
  SELECT vec_id AS j, unnest(e) AS w, generate_subscripts(e, 1) AS d
  FROM ei WHERE vec_id < {SEMDEDUP_LISTS}
), dots AS (
  SELECT ev.vec_id, cv.j, sum(ev.x * cv.w) AS s
  FROM ev JOIN cv USING (d) GROUP BY 1, 2
), assign AS (
  SELECT vec_id, j AS cluster FROM (
    SELECT vec_id, j,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j) AS rn
    FROM dots
  ) WHERE rn = 1
), norms AS (
  SELECT vec_id, sum(x * x) AS n2 FROM ev GROUP BY 1
), pdots AS (
  SELECT a.vec_id AS vi, b.vec_id AS vj, sum(x.x * y.x) AS s
  FROM assign a
  JOIN assign b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
  JOIN ev x ON x.vec_id = a.vec_id
  JOIN ev y ON y.vec_id = b.vec_id AND y.d = x.d
  GROUP BY 1, 2
), dup AS (
  SELECT DISTINCT p.vi AS vec_id
  FROM pdots p
  JOIN norms na ON na.vec_id = p.vi
  JOIN norms nb ON nb.vec_id = p.vj
  WHERE p.s > 0
    AND {SEMDEDUP_TAU2_DEN} * p.s * p.s >= {SEMDEDUP_TAU2_NUM} * na.n2 * nb.n2
)
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       a.vec_id NOT IN (SELECT vec_id FROM dup) AS kept
FROM assign a
"""

ORACLE_SQL["knn_lsh"] = _knn_lsh_oracle_sql()
ORACLE_SQL["embedding_neardup_lsh"] = _embedding_neardup_lsh_oracle_sql()
ORACLE_SQL["knn_ivf"] = _knn_ivf_oracle_sql()


# The raw-RGB multimodal decode path: dataops.q_multimodal_raw generates a
# DETERMINISTIC gradient+modular image table (stages/multimodal.py
# generate_media_table_grid), really encodes it to RGB0 bytes, really
# decodes it back inside map_batches, and emits integer features; DuckDB
# recomputes the same features analytically from the closed-form pixel
# definition — no media views needed, the oracle is self-contained.
ORACLE_SQL["multimodal_raw"] = """
WITH m AS (
  SELECT i AS media_id, 8 + (i*7) % 41 AS w, 8 + (i*11) % 41 AS h
  FROM generate_series(0, 63) t(i)
), px AS (
  SELECT media_id, w, h,
         (x*255) // (w-1) AS r,
         (y*255) // (h-1) AS g,
         (x*y + media_id) % 256 AS b
  FROM m, generate_series(0, 47) gx(x), generate_series(0, 47) gy(y)
  WHERE x < w AND y < h
)
SELECT media_id,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(sum(299*r + 587*g + 114*b) AS BIGINT) AS lum_wsum,
       CAST(sum(r+g+b) AS BIGINT) AS px_sum,
       CAST(max(greatest(r,g,b)) AS BIGINT) AS px_max
FROM px GROUP BY 1, 2, 3
"""


# --- corpus curation: normalize / balanced sample / sequence packing -------

ORACLE_SQL["text_normalize"] = """
SELECT doc_id,
       lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\x0c\\r]+', ' ', 'g'), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))) AS norm_text,
       CAST(length(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\x0c\\r]+', ' ', 'g'), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)))) AS BIGINT)
         AS n_chars_norm
FROM documents
"""

# fnv1a over the decimal string of doc_id (same keying as the Ray side's
# fnv1a_u64(cast(doc_id, string)))
_FNV_DOCID = """list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(split(CAST(doc_id AS VARCHAR), ''),
                                  c -> ord(c)::HUGEINT)),
      (h, x) -> (xor(h, x) * 1099511628211) % (1::HUGEINT << 64))"""

# Language-mixture token-budget sampling: target weights per language,
# total budget = MIX_SHARE_X1000/1000 of the corpus's tokens. Priority is
# the same fnv1a(doc_id) gate the balanced sampler uses (ties by doc_id);
# the SQL twin is a running-sum window over (gate, doc_id).
MIX_WEIGHTS = {"en": 40, "de": 15, "fr": 15, "es": 15, "zh": 15}
MIX_SHARE_X1000 = 300  # sample ~30% of corpus tokens, split by MIX_WEIGHTS

_MIX_VALUES = ", ".join(f"('{l}', {w})" for l, w in MIX_WEIGHTS.items())

ORACLE_SQL["mixture_sample"] = f"""
WITH tok AS (
  SELECT doc_id, lang,
    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = '' THEN 0
         ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \\t\\n\\x0b\\x0c\\r]+')) END AS n_tok
  FROM documents
), tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t FROM tok),
w(lang, wt) AS (VALUES {_MIX_VALUES}),
g AS (
  SELECT doc_id, tok.lang AS lang, n_tok,
         ({_FNV_DOCID}) % 1000000 AS gate,
         (wt * (SELECT t FROM tot) * {MIX_SHARE_X1000}) // 100000 AS budget
  FROM tok JOIN w ON w.lang = tok.lang
), r AS (
  SELECT *, sum(n_tok) OVER (PARTITION BY lang ORDER BY gate, doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM g
)
SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tokens FROM r WHERE cum <= budget
"""

ORACLE_SQL["sample_balanced"] = f"""
WITH c AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY 1
), m AS (
  SELECT min(n) AS mn FROM c
), thr AS (
  SELECT lang, (1000000 * (SELECT mn FROM m)) // n AS t FROM c
), h AS (
  SELECT doc_id, lang, ({_FNV_DOCID}) % 1000000 AS gate FROM documents
)
SELECT h.doc_id, h.lang
FROM h JOIN thr USING (lang)
WHERE gate < thr.t::HUGEINT
"""

ORACLE_SQL["pack_sequences"] = """
WITH tok AS (
  SELECT doc_id,
    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = '' THEN 0
         ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \\t\\n\\x0b\\x0c\\r]+')) END AS n_tok
  FROM documents
), pos AS (
  SELECT doc_id, n_tok,
         CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
  FROM tok
), spans AS (
  SELECT doc_id, n_tok, s, s + n_tok AS e FROM pos WHERE n_tok > 0
), ex AS (
  SELECT doc_id, s, e,
         unnest(generate_series(s // 512, greatest(e - 1, s) // 512)) AS bin_id
  FROM spans
)
SELECT doc_id, CAST(bin_id AS BIGINT) AS bin_id,
       CAST(greatest(s, bin_id * 512) - bin_id * 512 AS BIGINT) AS bin_tok_start,
       CAST(least(e, (bin_id + 1) * 512) - greatest(s, bin_id * 512) AS BIGINT)
         AS n_tokens_in_bin
FROM ex
"""


# Greedy no-break packing: a recursive CTE folds the first-fit rule doc by
# doc WITHIN each coarse doc_id range (ranges pack independently, exactly as
# the engine's parallel range groups do), then per-range bin counts prefix-
# sum into global bin ids. RANGE matches dataops._token_counts_by_range.
ORACLE_SQL["pack_nobreak"] = """
WITH RECURSIVE params AS (
  SELECT greatest(100, (max(doc_id) + 1) // 100000 + 1) AS rng FROM documents
), tok AS (
  SELECT doc_id,
    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = '' THEN 0
         ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \\t\\n\\x0b\\x0c\\r]+')) END AS n_tok
  FROM documents
), seqd AS (
  SELECT doc_id, least(n_tok, 512) AS n_eff,
         doc_id // (SELECT rng FROM params) AS range_id,
         row_number() OVER (PARTITION BY doc_id // (SELECT rng FROM params)
                            ORDER BY doc_id) AS seq
  FROM tok WHERE n_tok > 0
), rec(range_id, seq, doc_id, n_eff, bin_l, start_tok, used_after) AS (
  SELECT range_id, seq, doc_id, n_eff, 0, 0, n_eff FROM seqd WHERE seq = 1
  UNION ALL
  SELECT d.range_id, d.seq, d.doc_id, d.n_eff,
         CASE WHEN r.used_after + d.n_eff <= 512 THEN r.bin_l ELSE r.bin_l + 1 END,
         CASE WHEN r.used_after + d.n_eff <= 512 THEN r.used_after ELSE 0 END,
         CASE WHEN r.used_after + d.n_eff <= 512 THEN r.used_after + d.n_eff ELSE d.n_eff END
  FROM rec r JOIN seqd d ON d.range_id = r.range_id AND d.seq = r.seq + 1
), nb AS (
  SELECT range_id, max(bin_l) + 1 AS n_bins FROM rec GROUP BY 1
), offs AS (
  SELECT range_id,
         CAST(coalesce(sum(n_bins) OVER (ORDER BY range_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
  FROM nb
)
SELECT rec.doc_id, CAST(rec.bin_l + offs.o AS BIGINT) AS bin_id,
       CAST(rec.start_tok AS BIGINT) AS bin_tok_start,
       CAST(rec.n_eff AS BIGINT) AS n_tokens_in_bin
FROM rec JOIN offs USING (range_id)
"""


# Composed curation flow: normalize -> quality -> exact-dedup (arg-min via a
# zero-padded composite key, mirroring the Ray aggregate) -> balanced sample.
ORACLE_SQL["curation_pipeline"] = f"""
WITH normed AS (
  SELECT doc_id, lang,
         lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\x0c\\r]+', ' ', 'g'), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))) AS norm_text
  FROM documents
), toks AS (
  SELECT doc_id, lang, norm_text,
    CASE WHEN norm_text = '' THEN 0
         ELSE len(string_split(norm_text, ' ')) END AS n_tok,
    CASE WHEN norm_text = '' THEN 0
         ELSE len(list_filter(string_split(norm_text, ' '),
                  t -> t IN ('the', 'a', 'and', 'of', 'to'))) END AS n_stop
  FROM normed
), quality AS (
  SELECT doc_id, lang, norm_text FROM toks
  WHERE n_tok BETWEEN 10 AND 1000 AND 5 * n_stop <= n_tok
), surv AS (
  SELECT min(lpad(CAST(doc_id AS VARCHAR), 12, '0') || '|' || lang) AS k
  FROM quality GROUP BY md5(norm_text)
), parsed AS (
  SELECT CAST(split_part(k, '|', 1) AS BIGINT) AS doc_id,
         split_part(k, '|', 2) AS lang
  FROM surv
), c AS (
  SELECT lang, count(*) AS n FROM parsed GROUP BY 1
), m AS (
  SELECT min(n) AS mn FROM c
), thr AS (
  SELECT lang, (1000000 * (SELECT mn FROM m)) // n AS t FROM c
), h AS (
  SELECT doc_id, lang, ({_FNV_DOCID}) % 1000000 AS gate FROM parsed
)
SELECT h.doc_id, h.lang
FROM h JOIN thr USING (lang)
WHERE gate < thr.t::HUGEINT
"""

# curation_v2 = decontamination composed in FRONT of the curation flow.
# Built from the curation_pipeline oracle by substitution so the two stay
# single-sourced: the decon CTEs (shared _TOKS_TH/_SHING_CTE + the
# DECONTAM_BENCH_MOD rule) define `clean`, and the curation body runs
# verbatim over `clean` instead of `documents`.
assert ORACLE_SQL["curation_pipeline"].lstrip().startswith("WITH normed AS (")
assert ORACLE_SQL["curation_pipeline"].count("FROM documents") == 1
ORACLE_SQL["curation_v2"] = (
    f"""
WITH {_TOKS_TH}, {_SHING_CTE}, bench AS (
  SELECT DISTINCT unnest(sh) AS s FROM shing WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
), contaminated AS (
  SELECT DISTINCT r.doc_id
  FROM (SELECT doc_id, unnest(sh) AS s FROM shing) r
  WHERE r.s IN (SELECT s FROM bench)
), clean AS (
  SELECT d.* FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
)"""
    + ORACLE_SQL["curation_pipeline"]
    .lstrip()
    .replace("WITH normed AS (", ", normed AS (", 1)
    .replace("FROM documents", "FROM clean")
    # the curation body's token CTE collides with _TOKS_TH's `toks`
    .replace(" toks AS (", " ctoks AS (")
    .replace("FROM toks", "FROM ctoks")
)

# the streaming scrub operator's committed sink equals the batch pii_scrub
# query (same decoration, same RE2 patterns, same column names)
ORACLE_SQL["streaming_scrub"] = ORACLE_SQL["pii_scrub"]

# watermark-closure engine runs hit the same content oracles — early
# emission must not change the committed results
ORACLE_SQL["streaming_tumbling_wm"] = ORACLE_SQL["tumbling_window"]
ORACLE_SQL["streaming_session_wm"] = ORACLE_SQL["session_window"]
ORACLE_SQL["streaming_join_wm"] = ORACLE_SQL["stream_join"]

# exact token-length quantiles per language: quantile_disc == the engine's
# histogram-cumsum read-off (value at sorted position ceil(q*n))
ORACLE_SQL["len_quantiles"] = """
WITH tok AS (
  SELECT lang,
    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = '' THEN 0
         ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \\t\\n\\x0b\\x0c\\r]+')) END AS n_tokens
  FROM documents
), qd AS (
  SELECT lang, quantile_disc(n_tokens, [0.50, 0.90, 0.99]) AS qs
  FROM tok GROUP BY lang
)
SELECT lang, CAST([50, 90, 99][i] AS BIGINT) AS q_pct, CAST(qs[i] AS BIGINT) AS n_tokens
FROM qd, (SELECT unnest(generate_series(1, 3)) AS i)
"""

# corpus-wide top-k tokens, deterministic (count desc, token asc) tie-break
# Integer-exact tf-idf top terms (dataops.q_tfidf_top_terms): score =
# tf * N // df in pure integer arithmetic, so both sides agree bit-for-bit
ORACLE_SQL["tfidf_top_terms"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                                   '[ \\t\\n\\x0b\\x0c\\r]+')) AS term
  FROM documents
  WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) <> ''
), tf_t AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), df_t AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf_t GROUP BY 1
)
SELECT tf_t.doc_id, tf_t.term, tf_t.tf, df_t.df,
       CAST(tf_t.tf * (SELECT CAST(count(*) AS BIGINT) FROM documents)
            // df_t.df AS BIGINT) AS score
FROM tf_t JOIN df_t USING (term)
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, term) <= 3
"""

# Inverted-index build: per-token df / tf / posting extrema plus an
# order-free exact posting-set check (32-bit halves of the doc_id sum —
# each half sums values < 2^32, so BIGINT is exact at any df). The token
# split is the shared whitespace rule; empty docs contribute nothing.
ORACLE_SQL["inverted_index"] = """
WITH pos AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                                   '[ \\t\\n\\x0b\\x0c\\r]+')) AS token
  FROM documents
  WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) <> ''
),
pd AS (
  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM pos GROUP BY 1, 2
)
SELECT token,
  CAST(count(*) AS BIGINT) AS df,
  CAST(sum(tf) AS BIGINT) AS tf,
  CAST(min(doc_id) AS BIGINT) AS min_doc,
  CAST(max(doc_id) AS BIGINT) AS max_doc,
  CAST(sum(doc_id % 4294967296) AS BIGINT) AS posting_lo_sum,
  CAST(sum(doc_id // 4294967296) AS BIGINT) AS posting_hi_sum
FROM pd GROUP BY token
"""

# Integer-exact BM25 retrieval (dataops.q_bm25_search): same whitespace
# tokenization as the inverted-index oracle, query terms = the df-ranked
# tokens at positions (10, 20, 30, 40) with (df DESC, token) tie-break,
# and the identical integer quantization recipe — idf x1e4 via
# (10000*(2N-2df+1)) // (2df+1), relative doc length x1e3 via
# (1000*dl*N) // TL, per-term score (idf_q*22000*tf) // (10000*tf + 3000
# + 9*L_q) — so every score matches the engine bit-for-bit. Top-10 by
# (score DESC, doc_id).
# shared BM25 scoring CTE chain (ends at `scored`): used by both the
# standalone bm25_search oracle and the hybrid_search fusion oracle.
_BM25_SCORED_CTE = """
WITH pos AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                                   '[ \\t\\n\\x0b\\x0c\\r]+')) AS token
  FROM documents
  WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) <> ''
),
pd AS (
  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM pos GROUP BY 1, 2
),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM pos GROUP BY 1
),
stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         CAST(sum(tf) AS BIGINT) AS tl
  FROM pd
),
dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM pd GROUP BY 1
),
qterms AS (
  SELECT token, df FROM (
    SELECT token, df,
           row_number() OVER (ORDER BY df DESC, token) AS rnk
    FROM dfreq
  ) WHERE rnk IN (10, 20, 30, 40)
),
scored AS (
  SELECT pd.doc_id,
         ( ((10000 * (2*stats.n - 2*q.df + 1)) // (2*q.df + 1))
           * 22000 * pd.tf )
         // ( 10000 * pd.tf + 3000
              + 9 * ((1000 * dl.dl * stats.n) // stats.tl) ) AS s
  FROM pd
  JOIN qterms q USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN stats)
"""

ORACLE_SQL["bm25_search"] = _BM25_SCORED_CTE + """
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(sum(s) AS BIGINT) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT 10
"""

# Deterministic per-language corpus subsample (dataops.q_corpus_sample):
# bottom-k by fmix64(fnv1a(str(doc_id))) per language, recomputed in
# HUGEINT (same emulation as the HLL/streaming_sample oracles).
ORACLE_SQL["corpus_sample"] = """
WITH base AS (
  SELECT lang, doc_id, n_chars, CAST(doc_id AS VARCHAR) AS key
  FROM documents
), fnv AS (
  SELECT *, list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
                   list_transform(split(key, ''), c -> ord(c)::HUGEINT)),
      (h, b) -> (xor(h, b) * 1099511628211) % (1::HUGEINT << 64)) AS h0
  FROM base
), mix1 AS (SELECT *, xor(h0, h0 >> 33) AS h1 FROM fnv
), mul1 AS (
  SELECT *, ( ((h1 >> 32) * 18397679294719823053::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h1 % (1::HUGEINT << 32)) * 18397679294719823053::HUGEINT ) % (1::HUGEINT << 64) AS h2
  FROM mix1
), mix2 AS (SELECT *, xor(h2, h2 >> 33) AS h3 FROM mul1
), mul2 AS (
  SELECT *, ( ((h3 >> 32) * 14181476777654086739::HUGEINT % (1::HUGEINT << 32)) * (1::HUGEINT << 32)
      + (h3 % (1::HUGEINT << 32)) * 14181476777654086739::HUGEINT ) % (1::HUGEINT << 64) AS h4
  FROM mix2
), mixed AS (
  SELECT lang, doc_id, n_chars, xor(h4, h4 >> 33) AS h FROM mul2
)
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM mixed
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) <= 20
ORDER BY lang, doc_id
"""

# Hybrid retrieval (dataops.q_hybrid_search): BM25 ranking (the CTE above)
# + dense integer-dot ranking vs the lowest-vec_id query embedding, fused
# by integer Reciprocal Rank Fusion — each ranker contributes
# 1_000_000 // (60 + rank) for its top-50; fused top-10 by (rrf, doc_id).
ORACLE_SQL["hybrid_search"] = _BM25_SCORED_CTE + """,
bagg AS (
  SELECT doc_id, CAST(sum(s) AS BIGINT) AS score FROM scored GROUP BY doc_id
),
lexr AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM bagg
),
lex AS (
  SELECT doc_id, 1000000 // (60 + r) AS c FROM lexr WHERE r <= 50
),
qv AS (
  SELECT list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000000) AS BIGINT)) AS e
  FROM embeddings ORDER BY vec_id LIMIT 1
),
qd AS (SELECT unnest(e) AS w, generate_subscripts(e, 1) AS d FROM qv),
ei AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x * 1000000) AS BIGINT)) AS e
  FROM embeddings
),
ev AS (SELECT vec_id, unnest(e) AS x, generate_subscripts(e, 1) AS d FROM ei),
dots AS (SELECT vec_id, sum(x * w) AS s FROM ev JOIN qd USING (d) GROUP BY 1),
denr AS (
  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY s DESC, vec_id) AS r
  FROM dots
),
den AS (
  SELECT doc_id, 1000000 // (60 + r) AS c FROM denr WHERE r <= 50
),
fused AS (
  SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
         COALESCE(lex.c, 0) + COALESCE(den.c, 0) AS rrf
  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rrf AS BIGINT) AS rrf
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT 10
"""

# Product quantization: codeword k of subspace m is the floor(x*1e6)
# sub-vector of the corpus vector vec_id == k; assignment = integer
# squared-L2 argmin with smaller-k tiebreak; recon_err sums the PQ_M
# minimum distances. Mirrors dataops.q_pq_encode's constants (M=8, K=16
# over 64 dims -> 8 dims/subspace).
ORACLE_SQL["pq_encode"] = """
WITH vals AS (
  SELECT vec_id,
         CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS x,
         unnest(generate_series(1, len(embedding))) AS j
  FROM embeddings
),
sub AS (SELECT vec_id, x, j, CAST((j - 1) // 8 AS BIGINT) AS m FROM vals),
cb AS (SELECT vec_id AS k, x AS c, j, m FROM sub WHERE vec_id < 16),
dist AS (
  SELECT a.vec_id, a.m, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM sub a JOIN cb b ON a.m = b.m AND a.j = b.j
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, m, k, dd,
         row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, k) AS rn
  FROM dist
)
SELECT vec_id,
  CAST(max(CASE WHEN m = 0 THEN k END) AS BIGINT) AS code_0,
  CAST(max(CASE WHEN m = 1 THEN k END) AS BIGINT) AS code_1,
  CAST(max(CASE WHEN m = 2 THEN k END) AS BIGINT) AS code_2,
  CAST(max(CASE WHEN m = 3 THEN k END) AS BIGINT) AS code_3,
  CAST(max(CASE WHEN m = 4 THEN k END) AS BIGINT) AS code_4,
  CAST(max(CASE WHEN m = 5 THEN k END) AS BIGINT) AS code_5,
  CAST(max(CASE WHEN m = 6 THEN k END) AS BIGINT) AS code_6,
  CAST(max(CASE WHEN m = 7 THEN k END) AS BIGINT) AS code_7,
  CAST(sum(dd) AS BIGINT) AS recon_err
FROM best WHERE rn = 1 GROUP BY vec_id
"""

# ADC top-k search over the PQ codes: per-query integer distance tables
# to every codeword, database distance = sum of PQ_M lookups on the
# assigned codes. Same constants as pq_encode; queries = vec_id < 8
# (the knn family's query set), k = 10, self-matches excluded.
ORACLE_SQL["pq_search"] = """
WITH vals AS (
  SELECT vec_id,
         CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS x,
         unnest(generate_series(1, len(embedding))) AS j
  FROM embeddings
),
sub AS (SELECT vec_id, x, j, CAST((j - 1) // 8 AS BIGINT) AS m FROM vals),
cb AS (SELECT vec_id AS k, x AS c, j, m FROM sub WHERE vec_id < 16),
dist AS (
  SELECT a.vec_id, a.m, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM sub a JOIN cb b ON a.m = b.m AND a.j = b.j
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, m, k FROM (
    SELECT vec_id, m, k,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, k) AS rn
    FROM dist) WHERE rn = 1
),
qd AS (
  SELECT a.vec_id AS qid, a.m, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM sub a JOIN cb b ON a.m = b.m AND a.j = b.j
  WHERE a.vec_id < 8
  GROUP BY 1, 2, 3
),
adc AS (
  SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
         CAST(sum(q.dd) AS BIGINT) AS adc
  FROM codes c JOIN qd q ON q.m = c.m AND q.k = c.k
  WHERE c.vec_id <> q.qid
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank
  FROM adc) WHERE rank <= 10
"""

# IVF+PQ composition (dataops.q_knn_ivfpq): the knn_ivf coarse quantizer
# (argmax integer dot over the vec_id < 16 sampled centroids, smaller-list
# ties; queries probe their 4 best lists) routes candidates, and distances
# within probed lists are the pq_search ADC sums over the assigned codes.
# Candidates = vectors assigned to a probed list, self excluded; final
# ranking (adc ASC, neighbor_id ASC), top 10 per query.
ORACLE_SQL["knn_ivfpq"] = """
WITH vals AS (
  SELECT vec_id,
         CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS x,
         unnest(generate_series(1, len(embedding))) AS j
  FROM embeddings
),
dots AS (
  SELECT a.vec_id, b.vec_id AS l, sum(a.x * b.x) AS s
  FROM vals a JOIN vals b ON a.j = b.j AND b.vec_id < 16
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, l AS ivf_list FROM (
    SELECT vec_id, l,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, l) AS rn
    FROM dots) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS qid, l AS pl FROM (
    SELECT vec_id, l,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, l) AS rn
    FROM dots WHERE vec_id < 8) WHERE rn <= 4
),
sub AS (SELECT vec_id, x, j, CAST((j - 1) // 8 AS BIGINT) AS m FROM vals),
cb AS (SELECT vec_id AS k, x AS c, j, m FROM sub WHERE vec_id < 16),
dist AS (
  SELECT a.vec_id, a.m, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM sub a JOIN cb b ON a.m = b.m AND a.j = b.j
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, m, k FROM (
    SELECT vec_id, m, k,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, k) AS rn
    FROM dist) WHERE rn = 1
),
qd AS (
  SELECT a.vec_id AS qid, a.m, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM sub a JOIN cb b ON a.m = b.m AND a.j = b.j
  WHERE a.vec_id < 8
  GROUP BY 1, 2, 3
),
cand AS (
  SELECT DISTINCT p.qid, a.vec_id AS nid
  FROM qprobe p JOIN assign a ON a.ivf_list = p.pl
  WHERE a.vec_id <> p.qid
),
adc AS (
  SELECT cd.qid AS query_id, c.vec_id AS neighbor_id,
         CAST(sum(q.dd) AS BIGINT) AS adc
  FROM cand cd
  JOIN codes c ON c.vec_id = cd.nid
  JOIN qd q ON q.qid = cd.qid AND q.m = c.m AND q.k = c.k
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank
  FROM adc) WHERE rank <= 10
"""

# IVFADC+R (dataops.q_knn_ivfpq_rerank): the knn_ivfpq ADC ranking keeps a
# 30-candidate shortlist per query, and the final stage re-ranks it by the
# EXACT fixed-point squared L2 between the raw (floor(x*1e6)) vectors —
# top 10 by (d2 ASC, neighbor_id ASC). Same CTEs as knn_ivfpq up to `adc`.
ORACLE_SQL["knn_ivfpq_rerank"] = """
WITH vals AS (
  SELECT vec_id,
         CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS x,
         unnest(generate_series(1, len(embedding))) AS j
  FROM embeddings
),
dots AS (
  SELECT a.vec_id, b.vec_id AS l, sum(a.x * b.x) AS s
  FROM vals a JOIN vals b ON a.j = b.j AND b.vec_id < 16
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, l AS ivf_list FROM (
    SELECT vec_id, l,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, l) AS rn
    FROM dots) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS qid, l AS pl FROM (
    SELECT vec_id, l,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, l) AS rn
    FROM dots WHERE vec_id < 8) WHERE rn <= 4
),
sub AS (SELECT vec_id, x, j, CAST((j - 1) // 8 AS BIGINT) AS m FROM vals),
cb AS (SELECT vec_id AS k, x AS c, j, m FROM sub WHERE vec_id < 16),
dist AS (
  SELECT a.vec_id, a.m, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM sub a JOIN cb b ON a.m = b.m AND a.j = b.j
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, m, k FROM (
    SELECT vec_id, m, k,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, k) AS rn
    FROM dist) WHERE rn = 1
),
qd AS (
  SELECT a.vec_id AS qid, a.m, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM sub a JOIN cb b ON a.m = b.m AND a.j = b.j
  WHERE a.vec_id < 8
  GROUP BY 1, 2, 3
),
cand AS (
  SELECT DISTINCT p.qid, a.vec_id AS nid
  FROM qprobe p JOIN assign a ON a.ivf_list = p.pl
  WHERE a.vec_id <> p.qid
),
adc AS (
  SELECT cd.qid AS query_id, c.vec_id AS neighbor_id,
         CAST(sum(q.dd) AS BIGINT) AS adc
  FROM cand cd
  JOIN codes c ON c.vec_id = cd.nid
  JOIN qd q ON q.qid = cd.qid AND q.m = c.m AND q.k = c.k
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rn
    FROM adc) WHERE rn <= 30
),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         CAST(sum((qv.x - nv.x) * (qv.x - nv.x)) AS BIGINT) AS d2
  FROM short s
  JOIN vals qv ON qv.vec_id = s.query_id
  JOIN vals nv ON nv.vec_id = s.neighbor_id AND nv.j = qv.j
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, d2, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, neighbor_id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
  FROM exact) WHERE rank <= 10
"""

# One exact Lloyd iteration (dataops.q_kmeans_step): integer squared-L2
# assignment to the vec_id < 16 sampled fixed-point centroids (smaller-
# cluster ties), then per-(cluster, dim) member count, coordinate sum and
# the refined coordinate floor(s/n). Empty clusters yield no rows.
ORACLE_SQL["kmeans_step"] = """
WITH vals AS (
  SELECT vec_id,
         CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS x,
         unnest(generate_series(1, len(embedding))) AS j
  FROM embeddings
),
cb AS (SELECT vec_id AS k, x AS c, j FROM vals WHERE vec_id < 16),
d AS (
  SELECT a.vec_id, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM vals a JOIN cb b ON a.j = b.j
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, k FROM (
    SELECT vec_id, k,
           row_number() OVER (PARTITION BY vec_id ORDER BY dd, k) AS rn
    FROM d) WHERE rn = 1
),
agg AS (
  SELECT s.k AS cluster_id, CAST(v.j - 1 AS BIGINT) AS dim,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(v.x) AS BIGINT) AS s
  FROM assign s JOIN vals v ON v.vec_id = s.vec_id
  GROUP BY 1, 2
)
SELECT cluster_id, dim, n, s,
       CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) AS c_new
FROM agg ORDER BY cluster_id, dim
"""

# Full N-iteration distributed Lloyd trainer (dataops.q_kmeans_train):
# iteration i assigns every vector to its nearest c_i centroid (integer
# squared L2, smaller-cluster ties) and refines coordinates to
# floor(sum/count); empty clusters keep their previous coordinates
# (LEFT JOIN + COALESCE). Output = final centroid table + the last
# iteration's membership counts.
KMEANS_TRAIN_ITERS = 4


def _kmeans_chain_parts(n_iters: int) -> list:
    """The shared N-iteration Lloyd CTE chain (vals, c0..cN, assign0..)
    used by both the trainer oracle and the trained-IVF search oracle."""
    parts = ["""WITH vals AS MATERIALIZED (
  SELECT vec_id,
         CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS x,
         unnest(generate_series(1, len(embedding))) AS j
  FROM embeddings
), c0 AS MATERIALIZED (
  SELECT vec_id AS k, j, x AS c FROM vals WHERE vec_id < 16
)"""]
    for i in range(n_iters):
        parts.append(f""", d{i} AS (
  SELECT a.vec_id, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM vals a JOIN c{i} b ON a.j = b.j
  GROUP BY 1, 2
), assign{i} AS MATERIALIZED (
  SELECT vec_id, k FROM (
    SELECT vec_id, k,
           row_number() OVER (PARTITION BY vec_id ORDER BY dd, k) AS rn
    FROM d{i}) WHERE rn = 1
), c{i + 1} AS MATERIALIZED (
  SELECT p.k, p.j, COALESCE(r.c_new, p.c) AS c
  FROM c{i} p LEFT JOIN (
    SELECT s.k, v.j,
           CAST(floor(CAST(sum(v.x) AS DOUBLE) / count(*)) AS BIGINT) AS c_new
    FROM assign{i} s JOIN vals v ON v.vec_id = s.vec_id
    GROUP BY 1, 2
  ) r ON r.k = p.k AND r.j = p.j
)""")
    return parts


def _kmeans_train_oracle_sql(n_iters: int = KMEANS_TRAIN_ITERS) -> str:
    """Generate the N-stage DuckDB twin of the distributed Lloyd loop."""
    parts = _kmeans_chain_parts(n_iters)
    parts.append(f"""
SELECT c.k AS cluster_id, CAST(c.j - 1 AS BIGINT) AS dim,
       COALESCE(m.n, 0) AS n, c.c AS c
FROM c{n_iters} c LEFT JOIN (
  SELECT k, CAST(count(*) AS BIGINT) AS n
  FROM assign{n_iters - 1} GROUP BY k
) m ON m.k = c.k
ORDER BY cluster_id, dim
""")
    return "".join(parts)


ORACLE_SQL["kmeans_train"] = _kmeans_train_oracle_sql()


def _knn_ivf_trained_oracle_sql(n_iters: int = KMEANS_TRAIN_ITERS) -> str:
    """Trained-quantizer IVF search (dataops.q_knn_ivf_trained): the full
    Lloyd chain produces c_N; every vector is assigned to its nearest
    trained centroid by integer squared L2 (smaller-cluster ties),
    queries probe their 4 L2-nearest lists, and candidates in probed
    lists are ranked by the EXACT integer squared L2 — top 10 per query,
    self excluded, (d2 ASC, neighbor_id ASC) ties."""
    parts = _kmeans_chain_parts(n_iters)
    parts.append(f""", cent AS (SELECT k, j, c FROM c{n_iters}),
ad AS (
  SELECT a.vec_id, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM vals a JOIN cent b ON a.j = b.j
  GROUP BY 1, 2
),
fassign AS (
  SELECT vec_id, k FROM (
    SELECT vec_id, k,
           row_number() OVER (PARTITION BY vec_id ORDER BY dd, k) AS rn
    FROM ad) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS qid, k AS pl FROM (
    SELECT vec_id, k,
           row_number() OVER (PARTITION BY vec_id ORDER BY dd, k) AS rn
    FROM ad WHERE vec_id < 8) WHERE rn <= 4
),
cand AS (
  SELECT DISTINCT p.qid, a.vec_id AS nid
  FROM qprobe p JOIN fassign a ON a.k = p.pl
  WHERE a.vec_id <> p.qid
),
exact AS (
  SELECT cd.qid AS query_id, cd.nid AS neighbor_id,
         CAST(sum((qv.x - nv.x) * (qv.x - nv.x)) AS BIGINT) AS d2
  FROM cand cd
  JOIN vals qv ON qv.vec_id = cd.qid
  JOIN vals nv ON nv.vec_id = cd.nid AND nv.j = qv.j
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, d2, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, neighbor_id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
  FROM exact) WHERE rank <= 10
""")
    return "".join(parts)


ORACLE_SQL["knn_ivf_trained"] = _knn_ivf_trained_oracle_sql()


def _knn_ivfpq_trained_oracle_sql(n_iters: int = KMEANS_TRAIN_ITERS) -> str:
    """The full trained production stack (dataops.q_knn_ivfpq_trained):
    the Lloyd chain's c_N routes every vector by integer L2 (smaller
    ties), queries probe their 4 L2-nearest trained lists, and candidates
    are scored by the PQ-ADC sums over the sampled codebook's codes —
    train → route → compress → probe → ADC in one replayed chain."""
    parts = _kmeans_chain_parts(n_iters)
    parts.append(f""", cent AS (SELECT k, j, c FROM c{n_iters}),
ad AS (
  SELECT a.vec_id, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM vals a JOIN cent b ON a.j = b.j
  GROUP BY 1, 2
),
fassign AS (
  SELECT vec_id, k FROM (
    SELECT vec_id, k,
           row_number() OVER (PARTITION BY vec_id ORDER BY dd, k) AS rn
    FROM ad) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS qid, k AS pl FROM (
    SELECT vec_id, k,
           row_number() OVER (PARTITION BY vec_id ORDER BY dd, k) AS rn
    FROM ad WHERE vec_id < 8) WHERE rn <= 4
),
sub AS (SELECT vec_id, x, j, CAST((j - 1) // 8 AS BIGINT) AS m FROM vals),
cb AS (SELECT vec_id AS k, x AS c, j, m FROM sub WHERE vec_id < 16),
pqd AS (
  SELECT a.vec_id, a.m, b.k, sum((a.x - b.c) * (a.x - b.c)) AS dd
  FROM sub a JOIN cb b ON a.m = b.m AND a.j = b.j
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, m, k FROM (
    SELECT vec_id, m, k,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, k) AS rn
    FROM pqd) WHERE rn = 1
),
qd AS (
  SELECT vec_id AS qid, m, k, dd FROM pqd WHERE vec_id < 8
),
cand AS (
  SELECT DISTINCT p.qid, a.vec_id AS nid
  FROM qprobe p JOIN fassign a ON a.k = p.pl
  WHERE a.vec_id <> p.qid
),
adc AS (
  SELECT cd.qid AS query_id, c.vec_id AS neighbor_id,
         CAST(sum(q.dd) AS BIGINT) AS adc
  FROM cand cd
  JOIN codes c ON c.vec_id = cd.nid
  JOIN qd q ON q.qid = cd.qid AND q.m = c.m AND q.k = c.k
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank
  FROM adc) WHERE rank <= 10
""")
    return "".join(parts)


ORACLE_SQL["knn_ivfpq_trained"] = _knn_ivfpq_trained_oracle_sql()

# Nucleus vocabulary coverage: smallest number of token TYPES reaching
# >= pct% of total token mass under (count desc, token asc) order; the
# threshold compares 100*cumsum >= pct*total in integers.
ORACLE_SQL["vocab_coverage"] = """
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                                   '[ \\t\\n\\x0b\\x0c\\r]+')) AS token
  FROM documents
  WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) <> ''
),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
o AS (
  SELECT cnt,
         sum(cnt) OVER (ORDER BY cnt DESC, token ASC ROWS UNBOUNDED PRECEDING) AS cum,
         row_number() OVER (ORDER BY cnt DESC, token ASC) AS rk
  FROM c),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS vs FROM c)
SELECT t.total AS total_tokens, t.vs AS vocab_size,
  CAST(min(CASE WHEN 100 * o.cum >= 50 * t.total THEN o.rk END) AS BIGINT) AS cover_50,
  CAST(min(CASE WHEN 100 * o.cum >= 90 * t.total THEN o.rk END) AS BIGINT) AS cover_90,
  CAST(min(CASE WHEN 100 * o.cum >= 99 * t.total THEN o.rk END) AS BIGINT) AS cover_99
FROM o, t GROUP BY t.total, t.vs
"""

ORACLE_SQL["top_tokens"] = """
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                                   '[ \\t\\n\\x0b\\x0c\\r]+')) AS token
  FROM documents
  WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) <> ''
)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM tok GROUP BY token
ORDER BY cnt DESC, token ASC
LIMIT 20
"""
