package graft.sources

import java.lang.reflect.Proxy
import java.sql.{Connection, DriverManager, PreparedStatement, SQLException}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** A minimal RECORDING java.sql.Driver — the offline stand-in for Postgres
  * that lets UpsertWriter.write be exercised END TO END (connection,
  * transaction, batching, commit/rollback ordering) without a live database
  * or an external JDBC jar. Connection and PreparedStatement are reflection
  * proxies implementing only the calls UpsertWriter makes; every call is
  * recorded into a global queue (executors share the JVM under local[n]).
  *
  * Failure injection: set `failOnFlush = k` to make the k-th executeBatch
  * JVM-wide throw — the rollback-ordering test hinges on it.
  */
object RecordingJdbc {
  val Url = "jdbc:graftrec:test"

  /** (partitionId, event, detail) in call order per partition. */
  val events = new ConcurrentLinkedQueue[(Int, String, String)]()
  val flushes = new AtomicInteger(0)
  @volatile var failOnFlush: Int = -1

  def reset(): Unit = { events.clear(); flushes.set(0); failOnFlush = -1 }

  def record(pid: Int, event: String, detail: String = ""): Unit =
    events.add((pid, event, detail))

  def byPartition: Map[Int, Seq[(String, String)]] =
    events.toArray(Array.empty[(Int, String, String)]).toSeq
      .groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap

  private def pid: Int = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc == null) -1 else tc.partitionId()
  }

  private def proxy[T](clazz: Class[T])(handler: (String, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(clazz.getClassLoader, Array[Class[_]](clazz),
      (_, m, args) => handler(m.getName, if (args == null) Array.empty else args))
      .asInstanceOf[T]

  private def newStatement(): PreparedStatement = {
    var pending = 0
    proxy(classOf[PreparedStatement]) { (name, _) =>
      name match {
        case "setObject" => null
        case "addBatch"  => pending += 1; null
        case "executeBatch" =>
          val k = flushes.incrementAndGet()
          record(pid, "executeBatch", pending.toString)
          val size = pending
          pending = 0
          if (k == failOnFlush) throw new SQLException(s"injected failure on flush $k")
          Array.fill(size)(1)
        case "close" => null
        case other   => sys.error(s"unexpected PreparedStatement.$other")
      }
    }
  }

  private[sources] def newConnection(): Connection =
    proxy(classOf[Connection]) { (name, args) =>
      name match {
        case "setAutoCommit" => record(pid, "setAutoCommit", args(0).toString); null
        case "prepareStatement" => record(pid, "prepare", args(0).toString); newStatement()
        case "commit"   => record(pid, "commit"); null
        case "rollback" => record(pid, "rollback"); null
        case "close"    => record(pid, "close"); null
        case other      => sys.error(s"unexpected Connection.$other")
      }
    }

  /** Progress lines captured from UpsertWriter's pluggable logger (static so
    * the executor-side closure needs no serialization of test state). */
  val progress = new ConcurrentLinkedQueue[String]()
  def logProgress(line: String): Unit = progress.add(line)
}

class RecordingDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:graftrec:")
  override def connect(url: String, info: java.util.Properties): Connection =
    if (acceptsURL(url)) RecordingJdbc.newConnection() else null
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String, info: java.util.Properties) = Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger = throw new SQLException("no logger")
}

object RecordingDriver {
  // idempotent JVM-wide registration
  lazy val registered: Unit = DriverManager.registerDriver(new RecordingDriver)
}
