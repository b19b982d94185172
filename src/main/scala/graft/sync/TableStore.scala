package graft.sync

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** O13 — storage/session abstraction: a "database" is a named set of tables.
  * The engine's pipelines are store-agnostic; tests and the local harness use
  * parquet directories, production uses JDBC profiles (JdbcStore below is a
  * thin options map — Spark manages executor-side connections).
  */
trait TableStore {
  def read(table: String): Option[DataFrame]
  /** Replace `table`'s contents with `df`. CONTRACT: must be safe when
    * df's plan reads the same table's previous contents (sync pipelines
    * routinely merge dest ∪ delta and write back) — implementations stage
    * the write (temp path + rename) or materialize the input BEFORE
    * destroying the old contents. */
  def write(df: DataFrame, table: String): Unit
}

/** Parquet-directory store: `dir/<table>.parquet` per table. Write goes
  * through a temp path + atomic-ish rename so a table can be rewritten from
  * a plan that reads its own previous contents (overwrite-in-place would
  * delete the files mid-scan). */
class ParquetStore(spark: SparkSession, dir: String) extends TableStore {
  private def pathOf(table: String) = s"$dir/$table.parquet"

  override def read(table: String): Option[DataFrame] = {
    val p = new Path(pathOf(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(pathOf(table))) else None
  }

  override def write(df: DataFrame, table: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$dir/.tmp_$table.parquet")
    val dst = new Path(pathOf(table))
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    if (!fs.rename(tmp, dst)) sys.error(s"rename failed for $table")
  }
}

/** JDBC store: connection profile -> per-table reads/writes. Reads resolve
  * the schema from JDBC metadata (O2's introspection, done by Spark's
  * JdbcUtils); incremental filters push into the remote WHERE
  * (pushDownPredicate default-on). `partitionOptions` enables the partitioned
  * scan (partitionColumn/lowerBound/upperBound/numPartitions) that replaces
  * the reference's whole-table driver materialization. */
class JdbcStore(spark: SparkSession, url: String, props: Map[String, String],
                partitionOptions: Map[String, String] = Map.empty) extends TableStore {
  override def read(table: String): Option[DataFrame] =
    // JDBC schema resolution is EAGER — a missing table throws here, not at
    // action time. Mapping that to None honors the trait contract and makes
    // SyncJob's empty-destination bootstrap (None -> full copy, no merge)
    // reachable for JDBC destinations, matching ParquetStore.
    try Some(spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(props).options(partitionOptions)
      .load())
    catch { case scala.util.control.NonFatal(_) => None }

  /** Store semantics are "replace table contents with df" (SyncJob hands the
    * FULL merged table): overwrite with truncate, matching ParquetStore.
    * Production incremental loads should ship only the delta through
    * `sources.UpsertWriter` (ON CONFLICT) instead of a full rewrite. */
  override def write(df: DataFrame, table: String): Unit = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    // materialize BEFORE the truncate: overwrite+truncate clears the table
    // first and only then executes df's plan — a plan that reads this very
    // table (SyncJob's merge, upsertSync) would scan the just-truncated
    // (empty) destination and silently drop every previously-synced row.
    // ParquetStore stages via temp+rename; a database has no cheap rename,
    // so the staging happens on the executors instead.
    df.localCheckpoint().write.mode("overwrite").option("truncate", "true")
      .option("batchsize", 1000).jdbc(url, table, p)
  }
}
