package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import java.sql.{Connection, DriverManager}

/** O9/O10 — JDBC upsert sink: the exact `INSERT … ON CONFLICT (pks) DO UPDATE
  * SET col = EXCLUDED.col` semantics of the reference (generate_upsert_query,
  * db-sync-local/sync_utils.py:174-193) with 1,000-row batches
  * (batch_insert_with_progress, db-sync-local/utils.py:38-75).
  *
  * Scale design vs the reference: the reference materializes the whole table
  * in driver pandas and writes from one process in one transaction. Here the
  * DataFrame is repartitioned BY THE PRIMARY KEY and each executor partition
  * writes its own batched transaction — rows for the same key never ride in
  * two partitions, so concurrent ON CONFLICT batches cannot deadlock on
  * row-level locks. Conscious deviation (SURVEY §4): one transaction per
  * PARTITION, not per table.
  */
object UpsertWriter {

  /** Double-quote a SQL identifier (the reference f-string-interpolates
    * unquoted — SURVEY §2.4-8; we quote). */
  def quoteId(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""

  /** The reference's query text, parameterized placeholders per column.
    * No PK list -> plain INSERT (insert-if-identical handled upstream). */
  def upsertSql(table: String, columns: Seq[String], pks: Seq[String]): String = {
    val colList = columns.map(quoteId).mkString(", ")
    val placeholders = columns.map(_ => "?").mkString(", ")
    if (pks.nonEmpty) {
      val updateCols = columns.filterNot(pks.contains)
      val updateClause =
        if (updateCols.isEmpty) "DO NOTHING"
        else "DO UPDATE SET " + updateCols.map(c => s"${quoteId(c)} = EXCLUDED.${quoteId(c)}").mkString(", ")
      s"INSERT INTO ${quoteId(table)} ($colList) VALUES ($placeholders) " +
        s"ON CONFLICT (${pks.map(quoteId).mkString(", ")}) $updateClause"
    } else {
      s"INSERT INTO ${quoteId(table)} ($colList) VALUES ($placeholders)"
    }
  }

  /** Default progress sink: stderr, like the reference's print-based logger. */
  def defaultLog(line: String): Unit = Console.err.println(line)

  /** Executor-side batched upsert. Each partition opens one connection, one
    * transaction, addBatch/executeBatch every `batchSize` rows (the
    * reference's 1,000 default). Connection count is bounded by the
    * partition count — mirror the reference's pool-of-5 by repartitioning
    * to <= the destination's connection budget.
    *
    * O10 progress parity: the reference logs every 10% of the (known) total
    * (batch_insert_with_progress, db-sync-local/utils.py:62-68). Executors
    * cannot know the global total without an extra counting pass, so the
    * distributed equivalent logs one line per BATCH FLUSH with the
    * partition-local cumulative count — same granularity when batchSize ≈
    * total/10, and `log` is pluggable (rate-limit or drop it at 100 TB). */
  def write(df: DataFrame, url: String, props: java.util.Properties,
            table: String, pks: Seq[String], batchSize: Int = 1000,
            numWriters: Int = 5, log: String => Unit = defaultLog): Unit = {
    val columns = df.columns.toSeq
    val sql = upsertSql(table, columns, pks)
    // array columns can't go through setObject (drivers can't infer a SQL
    // type for a Scala Seq — Introspect models udt_name[] columns, so they
    // ARE expected input); resolve each array column's element SQL type
    // name ONCE from the schema, use conn.createArrayOf on the executor
    val arrayElemType: Array[String] = df.schema.fields.map(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) => et match {
        case org.apache.spark.sql.types.IntegerType => "integer"
        case org.apache.spark.sql.types.LongType    => "bigint"
        // PostgreSQL type names (the reference target): pgjdbc resolves
        // "float8"/"float4" but NOT "double" — createArrayOf("double", ..)
        // throws at runtime, so double[] columns would always fail
        case org.apache.spark.sql.types.DoubleType  => "float8"
        case org.apache.spark.sql.types.FloatType   => "float4"
        case org.apache.spark.sql.types.BooleanType => "boolean"
        case _                                      => "varchar"
      }
      case _ => null
    })
    val partitioned =
      if (pks.nonEmpty) df.repartition(numWriters, pks.map(col): _*)
      else df.repartition(numWriters)
    partitioned.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val conn: Connection = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val stmt = conn.prepareStatement(sql)
          var n = 0
          def flush(): Unit = {
            stmt.executeBatch()
            log(s"[upsert] $table p$pid: $n rows written")
          }
          rows.foreach { r =>
            var i = 0
            while (i < columns.length) {
              (arrayElemType(i), r.get(i)) match {
                case (et, seq: scala.collection.Seq[_]) if et != null =>
                  stmt.setArray(i + 1, conn.createArrayOf(et,
                    seq.map(_.asInstanceOf[AnyRef]).toArray))
                case (et, null) if et != null =>
                  stmt.setNull(i + 1, java.sql.Types.ARRAY)
                case (_, v) => stmt.setObject(i + 1, v)
              }
              i += 1
            }
            stmt.addBatch()
            n += 1
            if (n % batchSize == 0) flush()
          }
          if (n % batchSize != 0) flush()
          conn.commit()
        } catch {
          case e: Throwable =>
            // rollback on a broken connection throws too — don't let it
            // mask the original failure
            try conn.rollback()
            catch { case rb: Throwable => e.addSuppressed(rb) }
            throw e
        } finally conn.close()
      }
    }
  }
}
