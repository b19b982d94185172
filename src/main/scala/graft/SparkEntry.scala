package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — one entry per implemented operator from SURVEY.md §2.
  *
  * Every query is a real DataFrame pipeline through the graft.operators /
  * graft.llm library (never a `spark.sql(oracle)` passthrough), totally
  * ordered for stable hashing, with output column names aliased identically
  * in the Spark code and the DuckDB oracle SQL.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Session-timezone (UTC) timestamp literal — avoids JVM-default-tz skew
    * that `java.sql.Timestamp.valueOf` would introduce. */
  private def ts(s: String) = to_timestamp(lit(s))

  /** Flagship: full incremental-sync slice on sf0.001 — watermark read (O5),
    * strict-> incremental filter (O7), projection (O4), coercion (O8), and
    * relational upsert (O9) in one pipeline. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = t(spark, dir, "orders")
    // destination = the first 1000 keys, already synced
    val base = orders.filter(col("o_orderkey") <= 1000)
    val wm = Watermark.readTimestamp(base, "o_orderdate") // Some(ts) -> incremental branch
    val delta = Incremental.extract(orders, "o_orderdate", wm.map(lit(_)))
    val coerced = Coerce.frame(Projection.columns(
      delta, Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")))
    Merge.upsert(
      Projection.columns(base, Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")),
      coerced, Seq("o_orderkey"))
  }

  // ---------------------------------------------------------------- Q1-Q15

  private val core: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 — O4/O6 projection + full scan
    "q01_project_scan" -> ((s, dir) =>
      Projection.columns(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"))
        .orderBy("o_orderkey")),

    // Q2 — O5 timestamp watermark (kept as timestamp: both engines render
    // parquet naive timestamps identically; DATE diverges in pandas dtype)
    "q02_watermark_ts" -> ((s, dir) =>
      Watermark.maxOf(t(s, dir, "orders"), "o_orderdate")),

    // Q3 — O5 id watermark, empty relation -> NULL -> 0 (sync_utils.py:32-33)
    "q03_watermark_id_null" -> ((s, dir) =>
      Watermark.idCheckValue(
        t(s, dir, "lineitem").filter(col("l_orderkey") < 0), "l_orderkey")),

    // Q4 — O7 timestamp incremental, strict >
    "q04_incr_ts" -> ((s, dir) =>
      Incremental.newerThan(t(s, dir, "orders"), "o_orderdate", ts("1996-01-01 00:00:00"))
        .select(col("o_orderkey"), col("o_orderdate"))
        .orderBy("o_orderkey")),

    // Q5 — O7 id incremental, strict >
    "q05_incr_id" -> ((s, dir) =>
      Incremental.newerThan(t(s, dir, "lineitem"), "l_orderkey", lit(3000L))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Q6 — O8 int coercion int(float(v))
    "q06_coerce_int" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), Coerce.intish(col("l_quantity")).as("q"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Q7 — O8 string normalize str(v).strip()
    "q07_coerce_trim" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"), Coerce.strip(col("c_name")).as("c_name"))
        .orderBy("c_custkey")),

    // Q8 — O9 upsert semantics: delta wins on key conflict, insert otherwise
    "q08_upsert" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val base = orders.filter(col("o_orderkey") <= 4000)
        .select(col("o_orderkey"), col("o_totalprice"))
      val delta = orders.filter(col("o_orderkey").between(2000, 6000))
        .select(col("o_orderkey"), negate(col("o_totalprice")).as("o_totalprice"))
      Merge.upsert(base, delta, Seq("o_orderkey")).orderBy("o_orderkey")
    }),

    // Q9 — O15 anti join (files to copy = source − dest)
    "q09_anti_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val src = orders.filter(col("o_orderdate") >= ts("1995-06-01 00:00:00")).select("o_orderkey")
      val dst = orders.filter(col("o_orderdate") >= ts("1996-01-01 00:00:00")).select("o_orderkey")
      SetOps.difference(src, dst, Seq("o_orderkey")).orderBy("o_orderkey")
    }),

    // Q10 — O15 semi join (already existing = source ∩ dest)
    "q10_semi_join" -> ((s, dir) => {
      val part = t(s, dir, "part").select("p_partkey")
      val li = t(s, dir, "lineitem").select(col("l_partkey").as("p_partkey"))
      SetOps.intersection(part, li, Seq("p_partkey")).orderBy("p_partkey")
    }),

    // Q11 — O16 ordered listing (sorted(files_to_copy))
    "q11_ordered_listing" -> ((s, dir) =>
      SetOps.ordered(t(s, dir, "nation").select("n_name"), Seq("n_name"))),

    // Q12 — O12 group-by-service fold; region is tiny -> broadcast
    "q12_group_fold" -> ((s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("n"))
        .orderBy("r_name")),

    // Q13 — O18 sync statistics: total + conditional count, one scan
    "q13_sync_stats" -> ((s, dir) =>
      Stats.counts(t(s, dir, "orders"),
        Seq("new" -> (col("o_orderdate") > ts("1996-01-01 00:00:00"))))),

    // Q14 — O2 type rendering numeric(p,s): decimal cast
    "q14_decimal_cast" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(DecimalType(12, 2)).cast(DoubleType).as("qty"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Q15 — O5 ∘ O7 watermark round-trip: strict > max(<= cutoff)
    "q15_watermark_roundtrip" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val synced = li.filter(col("l_shipdate") <= ts("1996-01-01 00:00:00"))
      val wm = Watermark.readTimestamp(synced, "l_shipdate")
      Stats.counts(Incremental.extract(li, "l_shipdate", wm.map(lit(_))), Seq())
        .select(col("total").as("n"))
    })
  )

  private val coreOracle: Map[String, String] = Map(
    "q01_project_scan" ->
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders ORDER BY o_orderkey",
    "q02_watermark_ts" ->
      "SELECT max(o_orderdate) AS check_value FROM orders",
    "q03_watermark_id_null" ->
      "SELECT coalesce(max(l_orderkey), 0) AS check_value FROM lineitem WHERE l_orderkey < 0",
    "q04_incr_ts" ->
      "SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderdate > TIMESTAMP '1996-01-01 00:00:00' ORDER BY o_orderkey",
    "q05_incr_id" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey > 3000 ORDER BY l_orderkey, l_linenumber",
    "q06_coerce_int" ->
      "SELECT l_orderkey, l_linenumber, CAST(CAST(l_quantity AS DOUBLE) AS BIGINT) AS q FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q07_coerce_trim" ->
      "SELECT c_custkey, trim(c_name) AS c_name FROM customer ORDER BY c_custkey",
    "q08_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice, 0 AS prec FROM orders WHERE o_orderkey <= 4000), delta AS (SELECT o_orderkey, -o_totalprice AS o_totalprice, 1 AS prec FROM orders WHERE o_orderkey BETWEEN 2000 AND 6000), u AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY prec DESC) AS rn FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)) SELECT o_orderkey, o_totalprice FROM u WHERE rn = 1 ORDER BY o_orderkey""",
    "q09_anti_join" ->
      "SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-06-01 00:00:00' EXCEPT SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' ORDER BY o_orderkey",
    "q10_semi_join" ->
      "SELECT p_partkey FROM part INTERSECT SELECT l_partkey FROM lineitem ORDER BY p_partkey",
    "q11_ordered_listing" ->
      "SELECT n_name FROM nation ORDER BY n_name",
    "q12_group_fold" ->
      "SELECT r_name, count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name",
    "q13_sync_stats" ->
      "SELECT count(*) AS total, count(CASE WHEN o_orderdate > TIMESTAMP '1996-01-01 00:00:00' THEN 1 END) AS new FROM orders",
    "q14_decimal_cast" ->
      "SELECT l_orderkey, l_linenumber, CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q15_watermark_roundtrip" ->
      "SELECT count(*) AS n FROM lineitem WHERE l_shipdate > (SELECT max(l_shipdate) FROM lineitem WHERE l_shipdate <= TIMESTAMP '1996-01-01 00:00:00')"
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = core
  def oracleSql: Map[String, String] = coreOracle
}
