package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables

/** Relational operator coverage over the driver's TPC-H-ish tables
  * (SURVEY.md §2.2–§2.8): filters/projections, broadcast + sort-merge +
  * semi/anti joins, hash aggregation, rollup, windows, top-k, set ops,
  * scalar string/date/json functions, and the keyed-upsert window idiom.
  *
  * Oracle-parity rules used throughout (the driver hash-compares against
  * DuckDB on identical parquet inputs):
  *  - money sums go through DECIMAL so both engines sum exactly
  *    (double summation is order-dependent and would hash-mismatch);
  *  - derived integer columns are cast to LONG (DuckDB year()/len()/
  *    row_number() return BIGINT, Spark returns INT);
  *  - every query has a total ORDER BY so row order is deterministic.
  */
object Relational {

  private val Dec18_2 = DecimalType(18, 2)
  private val Dec4_2  = DecimalType(4, 2)
  private val Dec18_4 = DecimalType(18, 4)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A-category: grouped aggregation with partial/final hash agg
    // (TPC-H Q1 shape; reference A1-A6 are all this idiom).
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast(Dec18_2)).cast(Dec18_2).as("sum_base"),
          sum(col("l_extendedprice").cast(Dec18_2) *
              (lit(1) - col("l_discount").cast(Dec4_2))).cast(Dec18_4).as("sum_disc"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P-category: filter + projection pushed into the parquet scan
    // (TPC-H Q6 shape — single-row global agg).
    "q02_filter_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
                col("l_shipdate") <  to_timestamp(lit("1997-01-01")) &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg(
          sum(col("l_extendedprice").cast(Dec18_2) *
              col("l_discount").cast(Dec4_2)).cast(Dec18_4).as("revenue"),
          count(lit(1)).as("cnt"))
    }),

    // J-category: broadcast-hash join of two small dims.
    "q03_broadcast_join" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"),
             min(col("n_name")).as("first_nation"))
        .orderBy(col("r_name"))
    }),

    // J-category: large-table join (sort-merge / shuffled-hash territory
    // at scale) + grouped agg.
    "q04_order_priority" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o  = t(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
             sum(col("l_extendedprice").cast(Dec18_2)).cast(Dec18_2).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // J-category: multi-way join — small dims broadcast, facts shuffled
    // (TPC-H Q5 shape; revenue per nation). customer is fact-sized
    // (scales with the dataset) so it is NOT broadcast — AQE picks the
    // join strategy by runtime size. Revenue is summed as exact integer
    // hundredth-cents (round → BIGINT): representation-identical across
    // engines, unlike DECIMAL whose arrow encoding varies by version.
    "q05_revenue_by_nation" -> ((s, dir) => {
      val c  = t(s, dir, "customer")
      val o  = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val n  = t(s, dir, "nation")
      val r  = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"), col("r_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(10000.0))
               .cast(LongType)).as("revenue_c4"),
             count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // T-category: global top-k => TakeOrderedAndProject (per-partition
    // top-k + driver merge, no full sort; reference T1 `vector_storage
    // .py:96`).
    "q06_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // W-category: row_number per group (reference W1 chunk numbering,
    // `docling_service.py:222-236`) — 3 most recent orders per customer.
    "q07_recent_orders_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // W-category: partition-wide aggregate broadcast to rows (reference
    // W2/A1 total_chunks, `docling_service.py:233`).
    "q08_lineitem_order_totals" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
      t(s, dir, "lineitem")
        .withColumn("n_lines", count(lit(1)).over(w))
        .withColumn("order_qty", sum(col("l_quantity")).over(w))
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("n_lines"),
                col("order_qty"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // J-category: left-semi (EXISTS) — reference embedding-cache hits (J1).
    "q09_customers_with_big_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // J-category: left-anti (NOT EXISTS) — reference embedding-cache
    // misses (J1, `embedding_service.py:147-151`).
    "q10_customers_without_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Set ops: union-distinct then except (reference cache-merge ∪ and
    // invalidation ∖, SURVEY §2.7).
    "q11_setops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val rich     = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      val nation0  = c.filter(col("c_nationkey") === 0).select(col("c_custkey"))
      building.union(rich).distinct().except(nation0)
        .orderBy(col("c_custkey"))
    }),

    // A-category: distinct aggregation.
    "q12_distinct_parts" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // F-category scalar string functions (reference F1-F9, F15):
    // length/lower/trim/split/concat_ws/sha2/base64/regexp_extract.
    "q13_string_funcs" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          length(col("text")).cast(LongType).as("text_len"),
          lower(col("lang")).as("lang_lc"),
          size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tokens"),
          concat_ws("|", col("lang"), col("source")).as("lang_source"),
          sha2(col("text"), 256).as("text_sha"),
          // Spark's base64 emits MIME-chunked output (\r\n every 76
          // chars); normalize to the unchunked RFC 4648 form
          regexp_replace(base64(col("text").cast(BinaryType)), "[\\r\\n]", "").as("text_b64"),
          substring(col("text"), 1, 20).as("prefix20"),
          regexp_extract(col("source"), "(\\d+)$", 1).as("source_num"))
        .orderBy(col("doc_id"))
    }),

    // F-category date functions (reference F11-F12): year/month/trunc/diff.
    // Money summed as exact integer cents — see q05 note.
    "q14_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast(LongType).as("order_year"),
                 month(col("o_orderdate")).cast(LongType).as("order_month"))
        .agg(count(lit(1)).as("n_orders"),
             sum(round(col("o_totalprice") * lit(100.0)).cast(LongType)).as("sum_price_cents"),
             min(datediff(col("o_orderdate"), lit("1995-01-01")).cast(LongType)).as("min_days"))
        .orderBy(col("order_year"), col("order_month"))
    }),

    // F13: JSON extraction (reference Redis payloads `document_storage
    // .py:82-121`) over events.props.
    "q15_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"),
             max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // Event-time tumbling window (batch form of the streaming agg;
    // ST-category extension per SURVEY §2.12). `day` is cast to
    // TIMESTAMP_NTZ so parquet stores INT64 micros (isAdjustedToUTC
    // =false) — the TZ-typed window start would be written INT96/nanos,
    // which the driver's comparator hashes differently from the
    // oracle's naive microsecond timestamp. Money as integer cents.
    "q16_events_daily" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").getField("start")
                   .cast(TimestampNTZType).as("day"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(round(col("value") * lit(100.0)).cast(LongType)).as("sum_value_cents"))
        .orderBy(col("day"), col("event_type"))
    }),

    // S4/S5 upsert idiom: latest-wins per key via window dedupe
    // (reference ES upsert-by-_id, `document_storage.py:66-84`).
    "q17_latest_order_per_cust" -> ((s, dir) => {
      val latest = Tables.latestByKey(
        t(s, dir, "orders"), Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")))
      latest.select(col("o_custkey"), col("o_orderkey"),
                    col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    }),

    // Rollup (hierarchical aggregate) — extension beyond reference
    // (SURVEY §2.4 marks grouping sets ABSENT; scale-path operator).
    "q18_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)
    }),

    // Lead/lag analytic window over event streams (gap-to-previous-event
    // per user) — extension operator on the events table.
    "q19_event_gaps" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("prev_ts")))
        .filter(col("user_id") < 10 && col("prev_ts").isNotNull)
        .select(col("user_id"), col("event_id"), col("gap_us"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Correlated-scalar shape: customers whose account balance exceeds
    // their nation's average (subquery decorrelation exercise).
    // The comparison is done in exact integer cents — `bal > sum/cnt`
    // becomes `bal_cents * cnt > sum_cents` — so a balance within an
    // ulp of the average cannot flip between engines (double avg is
    // summation-order-dependent).
    "q20_above_nation_avg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .withColumn("bal_cents", round(col("c_acctbal") * lit(100.0)).cast(LongType))
      val nationAgg = c.groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"), sum(col("bal_cents")).as("sum_cents"))
      c.join(broadcast(nationAgg), col("c_nationkey") === col("nk"))
        .filter(col("bal_cents") * col("n_cust") > col("sum_cents"))
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    })
  )

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS sum_disc,
         avg(l_quantity) AS avg_qty,
         count(*) AS cnt
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_revenue" ->
      """SELECT
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS revenue,
         count(*) AS cnt
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",

    "q03_broadcast_join" ->
      """SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_items,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q05_revenue_by_nation" ->
      """SELECT n_name, r_name,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_c4,
         count(*) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY n_name, r_name ORDER BY n_name""",

    "q06_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q07_recent_orders_per_cust" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_custkey, rn""",

    "q08_lineitem_order_totals" ->
      """SELECT l_orderkey, l_linenumber, n_lines, order_qty, l_quantity FROM (
           SELECT l_orderkey, l_linenumber, l_quantity,
                  count(*) OVER (PARTITION BY l_orderkey) AS n_lines,
                  sum(l_quantity) OVER (PARTITION BY l_orderkey) AS order_qty
           FROM lineitem) WHERE l_orderkey % 100 = 0
         ORDER BY l_orderkey, l_linenumber""",

    "q09_customers_with_big_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
         ORDER BY c_custkey""",

    "q10_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "q11_setops" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
          UNION
          SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
         EXCEPT
         SELECT c_custkey FROM customer WHERE c_nationkey = 0
         ORDER BY c_custkey""",

    "q12_distinct_parts" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q13_string_funcs" ->
      """SELECT doc_id,
         CAST(length(text) AS BIGINT) AS text_len,
         lower(lang) AS lang_lc,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         concat_ws('|', lang, source) AS lang_source,
         sha256(text) AS text_sha,
         base64(encode(text)) AS text_b64,
         substring(text, 1, 20) AS prefix20,
         regexp_extract(source, '(\d+)$', 1) AS source_num
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",

    "q14_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         CAST(month(o_orderdate) AS BIGINT) AS order_month,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
         min(CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)) AS min_days
         FROM orders GROUP BY 1, 2 ORDER BY order_year, order_month""",

    "q15_json_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
         FROM (SELECT event_type,
                      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events)
         GROUP BY event_type ORDER BY event_type""",

    "q16_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",

    "q17_latest_order_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1
         ORDER BY o_custkey""",

    "q18_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q19_event_gaps" ->
      """SELECT user_id, event_id, gap_us FROM (
           SELECT user_id, event_id,
                  epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id)) AS gap_us
           FROM events) WHERE user_id < 10 AND gap_us IS NOT NULL
         ORDER BY user_id, event_id""",

    "q20_above_nation_avg" ->
      """SELECT c_custkey, c_nationkey, c_acctbal FROM
         (SELECT c_custkey, c_nationkey, c_acctbal,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM customer) c
         JOIN (SELECT c_nationkey AS nk, count(*) AS n_cust,
                      sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_cents
               FROM customer GROUP BY c_nationkey) n ON c.c_nationkey = n.nk
         WHERE bal_cents * n_cust > sum_cents
         ORDER BY c_custkey"""
  )
}
