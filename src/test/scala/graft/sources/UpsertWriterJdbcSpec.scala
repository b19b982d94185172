package graft.sources

import graft.SparkSpec
import org.apache.spark.SparkException

/** O9/O10 END-TO-END through a recording JDBC driver: proves the
  * executor-side batching, transaction and rollback ORDERING that the
  * SQL-text tests in UpsertWriterSpec cannot — semantics per the reference's
  * batch_insert_with_progress (db-sync-local/utils.py:38-75): batch at
  * 1,000, one commit per transaction, rollback carrying the original
  * exception on failure, 10%-style progress lines. */
class UpsertWriterJdbcSpec extends SparkSpec {
  import spark.implicits._

  RecordingDriver.registered

  private def tenK = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("happy path: batches of 1000, one commit per partition, ordered") {
    RecordingJdbc.reset()
    UpsertWriter.write(tenK, RecordingJdbc.Url, new java.util.Properties(),
      "t", Seq("id"), batchSize = 1000, numWriters = 2,
      log = RecordingJdbc.logProgress)
    val parts = RecordingJdbc.byPartition
    assert(parts.size === 2)
    var totalRows = 0
    parts.foreach { case (_, evs) =>
      // protocol order: autocommit off -> prepare -> flushes -> commit -> close
      assert(evs.head === ("setAutoCommit", "false"))
      assert(evs(1)._1 === "prepare" && evs(1)._2.contains("ON CONFLICT (\"id\")"))
      val flushes = evs.filter(_._1 == "executeBatch").map(_._2.toInt)
      assert(flushes.forall(_ <= 1000), s"batch over 1000: $flushes")
      totalRows += flushes.sum
      assert(evs.map(_._1).count(_ == "commit") === 1)
      assert(!evs.map(_._1).contains("rollback"))
      // commit strictly after the last flush, close last
      assert(evs.map(_._1).lastIndexOf("executeBatch") < evs.map(_._1).indexOf("commit"))
      assert(evs.last._1 === "close")
    }
    assert(totalRows === 10000)
  }

  test("O10 progress parity: >= 9 progress lines for a 10k-row write") {
    RecordingJdbc.reset()
    RecordingJdbc.progress.clear()
    UpsertWriter.write(tenK, RecordingJdbc.Url, new java.util.Properties(),
      "t", Seq("id"), batchSize = 1000, numWriters = 2,
      log = RecordingJdbc.logProgress)
    val lines = RecordingJdbc.progress.toArray(Array.empty[String]).toSeq
    assert(lines.size >= 9, s"expected >=9 progress lines, got ${lines.size}")
    // format mirrors utils.py:62-68's "rows written" reporting
    assert(lines.forall(_.matches("""\[upsert\] t p\d+: \d+ rows written""")))
  }

  test("failure mid-write: rollback once, no commit, original cause kept") {
    RecordingJdbc.reset()
    RecordingJdbc.failOnFlush = 3
    val e = intercept[SparkException] {
      UpsertWriter.write(tenK, RecordingJdbc.Url, new java.util.Properties(),
        "t", Seq("id"), batchSize = 1000, numWriters = 1,
        log = RecordingJdbc.logProgress)
    }
    // the injected SQLException must surface as the cause, not be masked
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null)
      && causes(e).exists(c => Option(c.getMessage).exists(_.contains("injected failure on flush 3"))))
    val evs = RecordingJdbc.byPartition.values.flatten.map(_._1).toSeq
    assert(evs.count(_ == "rollback") === 1)
    assert(!evs.contains("commit"))
    assert(evs.count(_ == "close") === 1) // connection released even on failure
  }
}
