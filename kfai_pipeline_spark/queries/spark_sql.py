"""Spark-SQL twins of the headline (bench) queries.

Why these exist: the canonical implementations are DataFrame builders
(`relational.py` / `extensions.py`), but *constructing* a DataFrame
plan from Python costs hundreds of Py4J round-trips (~0.3-0.5 s for a
wide aggregate) — pure client-side chatter that would dominate a
sub-second benchmark and measures nothing about the engine. Repeatedly
collecting the *same* Dataset is not an honest alternative either:
Spark reuses the shuffle map outputs of an identical RDD lineage
(stages show as "skipped"), so 2nd..Nth runs skip most of the work.

`spark.sql(text)` per run is the honest middle: one Py4J call, then
parse → analyze → optimize → fresh shuffles entirely JVM-side — the
same "full query each run" contract the DuckDB oracle baseline used.
Parity of each twin with its DataFrame builder is asserted in
tests/test_oracle.py at sf0.01.

Dialect deltas vs the DuckDB oracles (queries/*.py `oracle=`):
  - unnest(string_split(..)) -> explode(split(..))
  - epoch(ts)                -> timestampdiff(MICROSECOND, naive epoch, ts)/1e6
                                (events.ts is TIMESTAMP_NTZ, which cannot
                                cast to double; the µs diff keeps sub-second
                                precision and is session-tz-free)
  - string_agg(x, ',' ORDER BY x) -> concat_ws(',', sort_array(collect_list(x)))
  - derived-table alias required
"""

from __future__ import annotations

# Keyed by registry query name; all run over the temp views registered
# by catalog.register_views.
BENCH_SQL: dict[str, str] = {
    # Exact cents-integer aggregation domain, matching the canonical
    # builder (relational.py q07): grouped double SUMs reassociate with
    # partial-agg merge order, which shifts under load — BIGINT sums of
    # 2dp-scaled values are order-free (BASELINE §5s addendum 2).
    # Cost + bound (attribution run, §5s addendum 4): +35% on B1 vs the
    # double arm — which is now measurably WRONG at sf0.1 (one lost
    # half-cent in sum_disc_price) — and exact to SF ~55 on this group
    # shape; past that, CAST the product inside SUM to DECIMAL(38,0)
    # (+21% more, headroom 1e27 rows/group).
    "q07": """
        WITH c AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(l_quantity      * 100) AS BIGINT) AS qty_c,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
                   CAST(ROUND(l_discount      * 100) AS BIGINT) AS disc_c,
                   CAST(ROUND(l_tax           * 100) AS BIGINT) AS tax_c
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        )
        SELECT
            l_returnflag,
            l_linestatus,
            ROUND(SUM(qty_c)   / 100.0D, 2)                       AS sum_qty,
            ROUND(SUM(price_c) / 100.0D, 2)                       AS sum_base_price,
            ROUND(SUM(price_c * (100 - disc_c)) / 10000.0D, 2)    AS sum_disc_price,
            ROUND(SUM(price_c * (100 - disc_c) * (100 + tax_c)) / 1000000.0D, 2)
                                                                 AS sum_charge,
            ROUND(SUM(qty_c)   / 100.0D / COUNT(*), 2)            AS avg_qty,
            ROUND(SUM(price_c) / 100.0D / COUNT(*), 2)            AS avg_price,
            ROUND(SUM(disc_c)  / 100.0D / COUNT(*), 2)            AS avg_disc,
            COUNT(*)                                             AS count_order
        FROM c
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    # r15: mirror the canonical builder's new join order (relational.py
    # q22) — the ASIA dim chain reduces ORDERS to ~20% first, the fact
    # joins LAST against that reduced side. Interleaved same-session
    # A/B: sf10 10.84 -> 3.52 s, sf1 1.43 -> 0.82 s, sf0.1 ~even
    # (0.87 -> 0.79 medians), parity exact at all three; spread at
    # sf10 collapsed from 9.7-22.5 to 2.9-3.8 s because the 1.1 GB
    # lineitem shuffle is GONE — the documented b2 session-swing
    # source. The BROADCAST(ao) hint is scoped to the bench's static
    # AQE-off posture and its measured SF range (ao = 2.94M narrow
    # rows ~ tens of MB at sf10, far under the 8 GB / 512M-row cap;
    # past ~sf300 it would not fit and the hint would be wrong —
    # the ENGINE posture in the builder carries no such hint and
    # lets AQE choose from runtime sizes). Without a pinned build
    # side the static planner trusts ao's fabricated post-join size
    # estimate, builds the hash on LINEITEM instead, and dies with
    # "Can't acquire ... bytes to build hash relation" at sf10 under
    # the 8g bench heap (measured this round) — the r14-advice SHJ
    # OOM risk, which this hint also retires. Forced runtime Bloom
    # injection (creationSideThreshold=512MB, appSideScanThreshold=1)
    # never fires for a creation side behind a 3-join chain
    # (plans/r15/b2_restruct_bloom_sf10.txt) and measured no win.
    "q22": """
        WITH ao AS (
            SELECT o_orderkey, n_name
            FROM orders
            JOIN customer ON o_custkey   = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        )
        SELECT /*+ BROADCAST(ao) */ n_name,
               ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                     / 10000.0D, 2) AS revenue
        FROM lineitem
        JOIN ao ON l_orderkey = o_orderkey
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    # r15: anti-join against the DISTINCT order keys (guide §2.3) — the
    # raw NOT EXISTS shuffled and sort-merged every orders row when the
    # static planner's SHJ size conditions fail (sf10 before-plan:
    # SortMergeJoin LeftAnti over a 15M-row right side); the distinct
    # pre-aggregate gets map-side partial dedup before the exchange and
    # feeds the join ~1/15th the rows. Interleaved same-session A/B,
    # parity exact at all three SFs: sf10 1.31->1.25 s median, sf1
    # 1.96->1.60, sf0.1 1.19->1.08 (never slower in 21 paired rounds).
    # DISTINCT on the right of an anti join cannot change the result.
    "q05": """
        SELECT c_custkey FROM customer
        LEFT ANTI JOIN (SELECT DISTINCT o_custkey FROM orders) ok
          ON c_custkey = o_custkey
        ORDER BY c_custkey
    """,
    "q10": """
        SELECT c_mktsegment, c_custkey, c_acctbal, rn
        FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey
                   ) AS rn
            FROM customer
        ) ranked
        WHERE rn <= 3
        ORDER BY c_mktsegment, rn
    """,
    "q18": """
        SELECT word, COUNT(DISTINCT p_partkey) AS cnt
        FROM (
            SELECT p_partkey, explode(split(p_name, ' ')) AS word FROM part
        ) words
        GROUP BY word
        HAVING COUNT(DISTINCT p_partkey) >= 5
        ORDER BY cnt DESC, word
        LIMIT 100
    """,
    "q28": """
        -- make_timestamp_ntz, NOT date_trunc: Spark's date_trunc
        -- up-casts NTZ through the session zone, shifting DST-gap
        -- wall-clocks an hour (tz_sweep round 7)
        SELECT make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), 0, 0)
                 AS hour, event_type,
               COUNT(*) AS cnt,
               ROUND(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) / 100.0D, 2)
                 AS sum_value
        FROM events
        GROUP BY hour, event_type
        ORDER BY hour, event_type
    """,
    "q25": """
        WITH lagged AS (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        ),
        flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN prev_ts IS NULL
                             OR timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) / 1e6
                              - timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', prev_ts) / 1e6 > 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM lagged
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_id
            FROM flagged
        ),
        per_session AS (
            SELECT user_id, session_id,
                   MAX(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) / 1e6)
                 - MIN(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) / 1e6) AS session_len
            FROM sess GROUP BY user_id, session_id
        )
        SELECT user_id, COUNT(*) AS n_sessions, ROUND(AVG(session_len), 2) AS avg_len
        FROM per_session GROUP BY user_id ORDER BY user_id
    """,
    "q26": """
        SELECT lang,
               COUNT(DISTINCT md5(text)) AS n_distinct,
               COUNT(*) AS n_rows
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "q04": """
        SELECT n_name,
               CASE WHEN COUNT(s_name) > 0
                    THEN concat_ws(',', sort_array(collect_list(s_name)))
               END AS suppliers
        FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
}
