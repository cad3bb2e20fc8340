package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Relational coverage of the reference's dataflow operators (SURVEY.md §2)
  * over the TPC-H-ish test tables, each paired with a DuckDB oracle.
  *
  * Determinism rules used throughout (the driver hash-compares values):
  *  - money sums go through DECIMAL(18,2) on BOTH sides (exact arithmetic;
  *    avoids double-summation order sensitivity);
  *  - event time is compared at epoch-second granularity on both sides
  *    (Spark `ts_sec` vs DuckDB `floor(epoch(ts))`) — the raw column is
  *    nanosecond-precision which Spark cannot represent;
  *  - every result is totally ordered by its key columns in both engines.
  *
  * Scale notes are inline per query: what shuffles, what broadcasts, what
  * pushes down. All of these survive a 1000-executor / 100 TB scale-up
  * because the only full shuffles are keyed aggregations on
  * low-cardinality or well-distributed keys, and every dimension join is a
  * broadcast.
  */
object RelationalQueries {
  private val dec = DecimalType(18, 2)
  private def decSum(c: String) = sum(col(c).cast(dec)).cast("double")

  /** DuckDB-side epoch seconds for the ns-precision events.ts. */
  private val SEC = "CAST(floor(epoch(ts)) AS BIGINT)"

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q1_agg
    // TPC-H Q1 shape: scan → filter (pushed to parquet) → hash agg on a
    // 6-value composite key. Partial aggregation makes the shuffle tiny at
    // any scale; the shipdate filter reaches the scan as a parquet filter.
    Q(
      "q1_agg",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            decSum("l_quantity").as("sum_qty"),
            decSum("l_extendedprice").as("sum_base_price"),
            count(lit(1)).as("count_order"),
          )
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
    ),

    // ------------------------------------------------------- q3_join_topk
    // Fact-fact equi-join on the natural key (orderkey) then top-k. At scale
    // both sides shuffle on l_orderkey/o_orderkey — co-partitioned join —
    // and the ORDER BY+LIMIT is a TakeOrderedAndProject (no global sort).
    Q(
      "q3_join_topk",
      (s, dir) => {
        val orders = Tables(s, dir, "orders").filter(col("o_orderstatus") === "O")
        val li = Tables(s, dir, "lineitem")
        orders
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderkey")
          .agg(decSum("l_extendedprice").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT o_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10"""),
    ),

    // ------------------------------------------------- q5_join_broadcast
    // Star join: fact (orders) ⋈ dim (customer) ⋈ tiny dim (nation).
    // nation is explicitly broadcast — no shuffle for it at any scale;
    // customer⋈orders shuffles on custkey.
    Q(
      "q5_join_broadcast",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        val cust = Tables(s, dir, "customer")
        val nation = Tables(s, dir, "nation")
        orders
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            decSum("o_totalprice").as("total_revenue"),
            count(lit(1)).as("n_orders"),
          )
          .orderBy("n_name")
      },
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""),
    ),

    // ---------------------------------------------------- q_topk_customers
    Q(
      "q_topk_customers",
      (s, dir) =>
        Tables(s, dir, "customer")
          .join(Tables(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_name")
          .agg(decSum("o_totalprice").as("total_spent"))
          .orderBy(col("total_spent").desc, col("c_custkey"))
          .limit(10),
      Some("""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY total_spent DESC, c_custkey
        LIMIT 10"""),
    ),

    // -------------------------------------------------------- s1_scan_trails
    // Reference S1: trail scan — per-uuid event count and time bounds
    // (reference: src/match_traildb.c:527-560, src/ctx.c:42-81). Pure
    // keyed aggregation on uuid; partial agg keeps the shuffle at
    // O(distinct uuids), and uuid is the natural well-distributed key.
    Q(
      "s1_scan_trails",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(col("user_id").as("uuid"))
          .agg(
            count(lit(1)).as("n_events"),
            min("ts_sec").as("min_ts"),
            max("ts_sec").as("max_ts"),
          )
          .orderBy("uuid"),
      Some(s"""
        SELECT user_id AS uuid, COUNT(*) AS n_events,
               MIN($SEC) AS min_ts, MAX($SEC) AS max_ts
        FROM events GROUP BY user_id ORDER BY uuid"""),
    ),

    // -------------------------------------------------------- f1_filter_cnf
    // Reference F1 (--filter): CNF of (field = v | field != v) terms applied
    // pre-FSM (reference: src/traildb_filter.c:9-103). Expressed as a plain
    // Column conjunction-of-disjunctions so Catalyst pushes it to parquet.
    Q(
      "f1_filter_cnf",
      (s, dir) =>
        Tables
          .events(s, dir)
          .filter(
            (col("event_type") === "click" || col("event_type") === "view")
              && col("event_type") =!= "error"
          )
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, COUNT(*) AS n FROM events
        WHERE (event_type = 'click' OR event_type = 'view')
          AND event_type <> 'error'
        GROUP BY event_type ORDER BY event_type"""),
    ),

    // ----------------------------------------------------- f2_window_filter
    // Reference F2 (--window-file): per-uuid [start,end) time windows; only
    // listed uuids survive (reference: src/window_set.c:30-180). A real
    // window FILE is a small external table (the engine path broadcasts it,
    // TrckSparkRunner.EngineFilters) — but THIS query derives its windows
    // from the fact table itself (one row per distinct user, grows with the
    // corpus), so the join must NOT carry a broadcast hint: AQE picks
    // broadcast at test scale and a shuffle join when the derived set is
    // actually big.
    Q(
      "f2_window_filter",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val windows = ev
          .groupBy("user_id")
          .agg(min("ts_sec").as("w_start"))
          .withColumn("w_end", col("w_start") + lit(604800L))
        ev.join(windows, Seq("user_id"))
          .filter(col("ts_sec") >= col("w_start") && col("ts_sec") < col("w_end"))
          .groupBy(col("user_id").as("uuid"))
          .agg(count(lit(1)).as("n_in_window"))
          .orderBy("uuid")
      },
      Some(s"""
        WITH w AS (
          SELECT user_id, MIN($SEC) AS w_start FROM events GROUP BY user_id
        )
        SELECT e.user_id AS uuid, COUNT(*) AS n_in_window
        FROM events e JOIN w ON e.user_id = w.user_id
        WHERE $SEC >= w.w_start AND $SEC < w.w_start + 604800
        GROUP BY e.user_id ORDER BY uuid"""),
    ),

    // ---------------------------------------------------------- f3_exclude
    // Reference F3 (--exclude-file): drop whole trails by uuid
    // (reference: src/exclude_set.c:23-70) → left_anti join. Same hint
    // stance as f2: a real exclude FILE is small and the engine path
    // broadcasts it; this query derives ~20% of all users from the fact
    // table, so sizing stays with AQE.
    Q(
      "f3_exclude",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val excluded = ev.select("user_id").distinct().filter(col("user_id") % 5 === 0)
        ev.join(excluded, Seq("user_id"), "left_anti")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS n FROM events
        WHERE user_id NOT IN (SELECT DISTINCT user_id FROM events WHERE user_id % 5 = 0)
        GROUP BY event_type ORDER BY event_type"""),
    ),

    // ----------------------------------------------------------- f6_in_set
    // Reference F6: field in #set (reference: src/fsm2c.py:128-131).
    Q(
      "f6_in_set",
      (s, dir) =>
        Tables
          .events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, COUNT(*) AS n FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type ORDER BY event_type"""),
    ),

    // ----------------------------------------------------------- f7_ts_cmp
    // Reference F7: ordered comparison against timestamp only
    // (reference: src/trparser.py:364-383). 2024-01-15 = 1705276800 epoch.
    Q(
      "f7_ts_cmp",
      (s, dir) =>
        Tables
          .events(s, dir)
          .filter(col("ts_sec") >= lit(1705276800L))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some(s"""
        SELECT event_type, COUNT(*) AS n FROM events
        WHERE $SEC >= 1705276800
        GROUP BY event_type ORDER BY event_type"""),
    ),

    // -------------------------------------------------- m8_dedup_consecutive
    // Reference M8: consecutive-duplicate event elision
    // (reference: src/ctx.c:112-131). lag() over (uuid, time) then filter.
    // At scale this is one shuffle on uuid; the window never spans uuids so
    // no skew beyond the natural trail-length distribution.
    Q(
      "m8_dedup_consecutive",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
        Tables
          .events(s, dir)
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
          .groupBy(col("user_id").as("uuid"))
          .agg(count(lit(1)).as("n_after_dedup"))
          .orderBy("uuid")
      },
      Some(s"""
        WITH o AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY $SEC, event_id) AS prev_type
          FROM events
        )
        SELECT user_id AS uuid, COUNT(*) AS n_after_dedup
        FROM o WHERE prev_type IS NULL OR prev_type <> event_type
        GROUP BY user_id ORDER BY uuid"""),
    ),

    // ---------------------------------------------- g1_foreach_param_join
    // Reference G1: foreach over an explicit @arr of param tuples
    // (reference: src/match_traildb.c:281-335). Semantically a broadcast
    // equi-join between events and the param table on the bound field
    // (reference: src/foreach_util.c:121-230).
    Q(
      "g1_foreach_param_join",
      (s, dir) => {
        import s.implicits._
        val params = Seq("click", "purchase", "signup").toDF("param_t")
        Tables
          .events(s, dir)
          .join(broadcast(params), col("event_type") === col("param_t"))
          .groupBy("param_t")
          .agg(count(lit(1)).as("n"))
          .orderBy("param_t")
      },
      Some("""
        SELECT param_t, COUNT(*) AS n
        FROM events
        JOIN (VALUES ('click'), ('purchase'), ('signup')) p(param_t)
          ON event_type = param_t
        GROUP BY param_t ORDER BY param_t"""),
    ),

    // ------------------------------------------------- g2_implicit_foreach
    // Reference G2: implicit foreach = lexicon sweep over all distinct
    // values of the bound field (reference: src/match_traildb.c:188-236).
    Q(
      "g2_implicit_foreach",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, COUNT(*) AS n FROM events
        GROUP BY event_type ORDER BY event_type"""),
    ),

    // ------------------------------------------------------- a1_funnel
    // Reference M1/A1 shape: "signup then later purchase" counter — the
    // flagship FSM pattern expressed relationally (single groupBy on uuid;
    // conditional min/max avoids a self-join entirely, which is the plan
    // you want at 100 TB: one shuffle, no fact-fact join).
    Q(
      "a1_funnel",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "signup", col("ts_sec"))).as("fs"),
            max(when(col("event_type") === "purchase", col("ts_sec"))).as("lp"),
          )
          .filter(col("fs").isNotNull && col("lp") > col("fs"))
          .agg(count(lit(1)).as("n_converted")),
      Some(s"""
        WITH a AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup' THEN $SEC END) AS fs,
                 MAX(CASE WHEN event_type = 'purchase' THEN $SEC END) AS lp
          FROM events GROUP BY user_id
        )
        SELECT COUNT(*) AS n_converted FROM a WHERE fs IS NOT NULL AND lp > fs"""),
    ),

    // ------------------------------------------------------- a2_set_yield
    // Reference A2: yield to #set — per-uuid distinct tuple set, emitted
    // sorted (reference: src/results_json.c:137-160 — Judy iterates
    // key-sorted). collect_set + sort_array reproduces that contract.
    Q(
      "a2_set_yield",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(col("user_id").as("uuid"))
          .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"))
          .orderBy("uuid"),
      Some("""
        SELECT user_id AS uuid,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        FROM events GROUP BY user_id ORDER BY uuid"""),
    ),

    // ---------------------------------------------------- a3_multiset_yield
    // Reference A3: yield to &multiset — tuple → occurrence count
    // (reference: src/utils.c:42-50). Emitted as (key, value, count) rows.
    Q(
      "a3_multiset_yield",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(col("user_id").as("uuid"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy("uuid", "event_type"),
      Some("""
        SELECT user_id AS uuid, event_type, COUNT(*) AS n
        FROM events GROUP BY user_id, event_type
        ORDER BY uuid, event_type"""),
    ),
  )
}
