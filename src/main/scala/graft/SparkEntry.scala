package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.parse.AliccpCodec
import graft.ops.{Categorify, PointInTime}
import graft.llm.{Dedup, Similarity, TextStats}
import graft.sources.Tables

/** Driver contract — one named query per implemented operator
  * (SURVEY.md §2 inventory + LLM-pipeline north-star ops), each with a
  * DuckDB-oracle SQL twin in [[oracleSql]].
  *
  * Conventions for exact cross-engine hash parity:
  *  - every aggregate/computed column is aliased identically in both sides;
  *  - floating aggregates are ROUNDed in both sides (FP sums associate
  *    differently across engines);
  *  - all event-time logic is integer epoch-micros (`events.ts` reads as
  *    epoch-nanos BIGINT via nanosAsLong; DuckDB mirrors with epoch_us);
  *  - every result has a deterministic total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on sf0.001: AliCCP-style KV parse -> broadcast join ->
    * filter -> typed projection (the reference's Bronze->Silver spine). */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_kv_roundtrip")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Relational core (SURVEY §2.2/2.4: P*, A1-A2) -------------------
    "q01_pricing_agg" -> ((s, dir) => {
      // Cross-engine exactness: the source doubles carry <=2 decimals, so
      // casting to decimal is lossless and decimal sums are exact and
      // order-independent (double sums are not — partition merge order
      // varies). Final cast back to double is deterministic. Averages use
      // floor(x*10^4+0.5)/10^4 — pure IEEE ops, identical in any engine,
      // unlike round()'s engine-specific half-way handling.
      val qty = col("l_quantity").cast("decimal(12,2)")
      val price = col("l_extendedprice").cast("decimal(12,2)")
      val disc = col("l_discount").cast("decimal(4,2)")
      val tax = col("l_tax").cast("decimal(4,2)")
      val n = count(lit(1))
      def avg4(sumDec: Column, n: Column): Column =
        floor(sumDec.cast("double") / n * 10000 + 0.5) / 10000
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(qty).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base"),
          sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
          sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
          avg4(sum(qty), n).as("avg_qty"),
          avg4(sum(disc), n).as("avg_disc"),
          n.as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_filter_project" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 25)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // no ROUND: per-row IEEE double arithmetic is bit-identical across
          // engines, while round()'s half-way behavior is not (Spark goes
          // through shortest-decimal-repr HALF_UP; DuckDB rounds the binary)
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          col("l_quantity").cast("int").as("qty_int"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- Joins (SURVEY §2.3: J1 broadcast-dim equi-join chain) ----------
    "q03_join_nation" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      val nation = Tables(s, dir, "nation")
      val region = Tables(s, dir, "region")
      orders
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .filter(col("r_name") === "ASIA" && col("o_orderstatus") === "F")
        .groupBy(col("n_name"))
        .agg(sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    "q04_join_priority" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val orders = Tables(s, dir, "orders")
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum((col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(4,2)")))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- AliCCP KV codec (SURVEY §2.5 F4/F5, §2.9) ----------------------
    // Synthesizes the reference's \x01\x02\x03 blob format from events rows,
    // parses it natively, merges two maps (last-wins), extracts typed fields
    // — the oracle asserts the codec round-trips exactly.
    "q05_kv_roundtrip" -> ((s, dir) => {
      import AliccpCodec._
      val e = Tables(s, dir, "events")
      val blob1 = concat(
        lit("101"), lit(KvSep), col("user_id").cast("string"),
        lit(WeightSep), lit("1.0"), lit(RecSep),
        lit("et"), lit(KvSep), col("event_type"), lit(WeightSep), lit("1.0"))
      val blob2 = concat(
        lit("205"), lit(KvSep), col("event_id").cast("string"),
        lit(WeightSep), lit("1.0"), lit(RecSep),
        lit("et"), lit(KvSep), col("event_type"), lit("X"),
        lit(WeightSep), lit("1.0"))
      val m = mergeKv(parseKv(blob1), parseKv(blob2))
      e.select(
        col("event_id"),
        try_element_at(m, lit("101")).cast("bigint").as("user_id_p"),
        try_element_at(m, lit("205")).cast("bigint").as("item_p"),
        try_element_at(m, lit("et")).as("et_p"))
        .orderBy(col("event_id"))
    }),

    // ---- Categorify (SURVEY §2.5 F1-F3: StringIndexer semantics) --------
    "q06_categorify" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
      Categorify.indexColumn(cust, "c_mktsegment", "seg_idx")
        .select(col("c_custkey"), col("seg_idx"))
        .orderBy(col("c_custkey"))
    }),

    // ---- Feature-store temporal ops (SURVEY §2.4 A4, §2.3 J2) -----------
    "q07_latest_per_key" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select("user_id", "event_id", "ts_us", "event_type", "value")
      PointInTime.latestPerKey(e, Seq("user_id"), "ts_us", "event_id")
        .orderBy(col("user_id"))
    }),

    "q08_asof_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts_us").as("p_ts"))
      val feats = e.select(col("event_id").as("f_id"), col("user_id"),
        col("ts_us").as("f_ts"), col("event_type").as("f_type"),
        col("value").as("f_value"))
      PointInTime.asofJoin(purchases, feats, Seq("user_id"),
          "p_ts", "f_ts", ttlUs = 7L * 24 * 3600 * 1000000,
          strict = true, rightTieBreak = "f_id")
        .orderBy(col("p_id"))
    }),

    // ---- Semi-join (SURVEY §2.3 J3) -------------------------------------
    "q09_semi_join" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val big = Tables(s, dir, "lineitem")
        .filter(col("l_quantity") > 49)
        .select(col("l_orderkey").as("o_orderkey"))
      orders.join(big, Seq("o_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- Window ranking (engine surface beyond reference, SURVEY §2.10) -
    "q10_topk_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    // ---- Vocab stats (SURVEY §2.4 A2) — one pass, not 16 ----------------
    "q11_vocab_stats" -> ((s, dir) => {
      Tables(s, dir, "part").agg(
        countDistinct(col("p_brand")).as("n_brand"),
        countDistinct(col("p_type")).as("n_type"),
        countDistinct(col("p_size")).as("n_size"),
        count(lit(1)).as("n_rows"))
    }),

    // ---- LLM ops: exact dedup via content fingerprint -------------------
    "q12_dedup_exact" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Dedup.exact(docs, TextStats.fingerprint(col("text")), "doc_id")
        .orderBy(col("dedup_key"))
    }),

    // ---- LLM ops: text analysis -----------------------------------------
    "q13_text_stats" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      docs.select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        size(array_distinct(TextStats.tokens(col("text")))).cast("long").as("n_uniq"),
        length(col("text")).cast("long").as("len_chars"),
        (floor(TextStats.stopwordRatio(col("text"), Seq("the", "a")) * 10000 + 0.5) / 10000).as("stop_ratio"))
        .orderBy(col("doc_id"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*(1-CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*(1-CAST(l_discount AS DECIMAL(4,2)))*(1+CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)/COUNT(*)*10000+0.5)/10000 AS avg_qty,
        |FLOOR(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)/COUNT(*)*10000+0.5)/10000 AS avg_disc,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |l_extendedprice*(1-l_discount) AS revenue,
        |CAST(l_quantity AS INTEGER) AS qty_int
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_nation" ->
      """SELECT n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderstatus = 'F'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q04_join_priority" ->
      """SELECT o_orderpriority,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*(1-CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // The codec query's oracle asserts parse(format(x)) == x row-by-row.
    "q05_kv_roundtrip" ->
      """SELECT event_id, user_id AS user_id_p, event_id AS item_p,
        |event_type || 'X' AS et_p
        |FROM events ORDER BY event_id""".stripMargin,

    "q06_categorify" ->
      """WITH freq AS (
        |  SELECT c_mktsegment AS v, COUNT(*) AS c FROM customer
        |  WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment),
        |idx AS (
        |  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, v ASC) - 1 AS BIGINT) AS seg_idx
        |  FROM freq)
        |SELECT c_custkey, seg_idx FROM customer JOIN idx ON c_mktsegment = v
        |ORDER BY c_custkey""".stripMargin,

    "q07_latest_per_key" ->
      """WITH r AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, ts_us, event_type, value FROM r
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q08_asof_join" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |f AS (
        |  SELECT event_id AS f_id, user_id, epoch_us(ts) AS f_ts,
        |         event_type AS f_type, value AS f_value FROM events),
        |j AS (
        |  SELECT p.p_id, f.f_id, f.f_ts, f.f_type, f.f_value,
        |  ROW_NUMBER() OVER (PARTITION BY p.p_id
        |    ORDER BY f.f_ts DESC, f.f_id DESC) AS rn
        |  FROM p JOIN f ON p.user_id = f.user_id
        |   AND f.f_ts < p.p_ts AND f.f_ts >= p.p_ts - 604800000000)
        |SELECT p.p_id, p.user_id, p.p_ts, j.f_id, j.f_ts, j.f_type, j.f_value
        |FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON p.p_id = j.p_id
        |ORDER BY p.p_id""".stripMargin,

    "q09_semi_join" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q10_topk_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,

    "q11_vocab_stats" ->
      """SELECT CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brand,
        |CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_type,
        |CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_size,
        |COUNT(*) AS n_rows FROM part""".stripMargin,

    "q12_dedup_exact" ->
      """SELECT md5(array_to_string(list_sort(string_split(lower(text),' ')),' ')) AS dedup_key,
        |CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_text_stats" ->
      """SELECT doc_id,
        |CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_uniq,
        |CAST(length(text) AS BIGINT) AS len_chars,
        |CASE WHEN len(string_split(text,' ')) = 0 THEN 0.0
        |ELSE FLOOR(CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS DOUBLE)
        |  / len(string_split(text,' ')) * 10000 + 0.5) / 10000 END AS stop_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
