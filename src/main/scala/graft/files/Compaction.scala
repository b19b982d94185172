package graft.files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the unglamorous operator every long-running
  * 100 TB pipeline needs: incremental syncs and streaming sinks accrete
  * thousands of KB-sized parquet files whose per-file open/footer cost
  * eventually dominates scans. Compaction rewrites a table directory into
  * ~`targetBytes`-sized files (atomically, via tmp + rename like
  * ParquetStore).
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
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + ".compact_tmp")
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(dir)
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst)) sys.error(s"compaction rename failed for $dir")
    val (_, after) = dirBytesAndFiles(spark, dir)
    CompactionStats(bytes, before, after)
  }
}
