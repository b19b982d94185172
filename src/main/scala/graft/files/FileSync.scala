package graft.files

import graft.operators.SetOps
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.Try

/** O14-O18 — file/blob-set synchronization (reference:
  * db-sync-gcp/gcs_sync.py): list both "buckets", copy `source − dest` in
  * sorted order, count total/new/existing; dry-run plans without side
  * effects; multi-pair orchestration with per-pair error isolation.
  *
  * The reference holds both name sets in Python memory and copies serially.
  * Here listings are DataFrames (set algebra = anti/semi joins) and copies
  * are issued from executor partitions — at object-store scale nothing is
  * driver-resident and copies are parallel per partition. Existence-only
  * comparison is intentional parity (the reference's README claims MD5 but
  * never reads a hash — SURVEY §2.4-2).
  */
object FileSync {

  case class SyncStats(totalFiles: Long, newFiles: Long, existingFiles: Long, dryRun: Boolean)

  /** O14 — recursive listing as a DataFrame of bucket-relative names.
    * binaryFile source with the content column pruned: Spark plans a
    * metadata-only, partition-parallel listing scan. */
  def listFiles(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(p).toString
    if (!fs.exists(p)) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("size", org.apache.spark.sql.types.LongType))))
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        expr(s"substring(path, ${base.length + 2})").as("name"),
        col("length").as("size"))
  }

  /** O15 — the copy plan: (files to copy, files already present). */
  def plan(src: DataFrame, dst: DataFrame): (DataFrame, DataFrame) =
    (SetOps.difference(src.select("name"), dst.select("name"), Seq("name")),
     SetOps.intersection(src.select("name"), dst.select("name"), Seq("name")))

  /** O16 — ordered, side-effecting copy; dry-run counts without copying
    * (gcs_sync.py:50-62). Copies run per-partition on executors via
    * Hadoop FileUtil (the local analog of a server-side blob copy). */
  def syncDir(spark: SparkSession, srcDir: String, dstDir: String,
              dryRun: Boolean = false): SyncStats = {
    val src = listFiles(spark, srcDir)
    val dst = listFiles(spark, dstDir)
    val (toCopy, existing) = plan(src, dst)
    val total = src.count()
    val nExisting = existing.count()
    val ordered = SetOps.ordered(toCopy, Seq("name"))
    // newFiles = the plan's own count in BOTH modes — deriving it from a
    // post-copy destination re-list would overcount whenever dest holds
    // files absent from source (or is written concurrently).
    val nNew = ordered.count()
    if (!dryRun) {
      val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      ordered.select("name").foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val conf = hadoopConf.value
        it.foreach { r =>
          val name = r.getString(0)
          val from = new Path(s"$srcDir/$name")
          val to = new Path(s"$dstDir/$name")
          val fsFrom = from.getFileSystem(conf)
          val fsTo = to.getFileSystem(conf)
          fsTo.mkdirs(to.getParent)
          FileUtil.copy(fsFrom, from, fsTo, to, false, true, conf)
        }
      }
    }
    SyncStats(total, nNew, nExisting, dryRun)
  }

  /** O17 — multi-pair orchestration with per-pair error isolation
    * (gcs_sync.py:77-101). */
  def syncPairs(spark: SparkSession, pairs: Seq[(String, String)],
                dryRun: Boolean = false): Map[(String, String), Try[SyncStats]] =
    pairs.map { case (s, d) => (s, d) -> Try(syncDir(spark, s, d, dryRun)) }.toMap
}
