package graft.files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the unglamorous operator every long-running
  * 100 TB pipeline needs: incremental syncs and streaming sinks accrete
  * thousands of KB-sized parquet files whose per-file open/footer cost
  * eventually dominates scans. Compaction rewrites a table directory into
  * ~`targetBytes`-sized files.
  *
  * REQUIRES exclusive access to the directory for the duration of the call:
  * the swap is read -> write sibling tmp -> delete -> rename, which is NOT
  * atomic on object stores or concurrent writers — files appended between
  * the snapshot read and the delete would be lost, and a crash between
  * delete and rename leaves only the tmp copy (recoverable by hand, named
  * `<table>.compact_tmp`). Real lakehouse engines solve this with a
  * transaction log; this operator targets the maintenance-window case.
  */
object Compaction {

  case class CompactionStats(bytesTotal: Long, filesBefore: Long, filesAfter: Long)

  def dirBytesAndFiles(spark: SparkSession, dir: String): (Long, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L; var files = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) { bytes += f.getLen; files += 1 }
    }
    (bytes, files)
  }

  /** Rewrite `dir` (a parquet table) into max(1, bytes/targetBytes) files. */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    val (bytes, before) = dirBytesAndFiles(spark, dir)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val dst = new Path(dir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // SIBLING tmp via parent/name (string concat would nest the tmp inside
    // the table on a trailing-slash dir, and the delete below would then
    // destroy both copies)
    val tmp = new Path(dst.getParent, dst.getName + ".compact_tmp")
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    if (!fs.delete(dst, true))
      sys.error(s"compaction could not delete $dst; compacted copy left at $tmp")
    if (!fs.rename(tmp, dst))
      sys.error(s"compaction rename failed; compacted copy left at $tmp")
    val (_, after) = dirBytesAndFiles(spark, dir)
    CompactionStats(bytes, before, after)
  }
}
