package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the driver-provided parquet tables (TESTDATA.md).
  *
  * One parquet file-tree per table under a scale-factor directory. At 100 TB
  * the same call works unchanged: `spark.read.parquet` plans a distributed
  * columnar scan with partition-level parallelism, predicate pushdown and
  * column pruning — callers should always `.select`/`.filter` as early as
  * possible so Catalyst pushes both into the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
