package graft.sync

import graft.config.TableConfig

import scala.util.{Failure, Success, Try}

/** O12 — multi-table orchestration with per-table error isolation
  * (reference: run_all_syncs, db-sync-local/main.py:4-30; service grouping
  * db-sync-gcp/gcp_main.py:46-79).
  *
  * Semantics preserved: sequential fold; a failing table logs and CONTINUES
  * to the next (the "Continuing with next sync..." quirk only logs when the
  * failure is not last — §2.4-10); results are collected and the process
  * exit code is 1 if anything failed.
  */
object Runner {

  case class RunReport(results: Seq[(String, Try[SyncJob.SyncStats])]) {
    def succeeded: Seq[String] = results.collect { case (t, Success(_)) => t }
    def failed: Seq[(String, Throwable)] = results.collect { case (t, Failure(e)) => (t, e) }
    /** exit(1) if any table failed (main.py:25-30). */
    def exitCode: Int = if (failed.nonEmpty) 1 else 0
  }

  def runAll(tables: Seq[TableConfig])(runOne: TableConfig => SyncJob.SyncStats): RunReport = {
    val results = tables.zipWithIndex.map { case (cfg, i) =>
      val r = Try(runOne(cfg))
      r match {
        case Failure(e) =>
          System.err.println(s"[runner] sync failed for ${cfg.name}: ${e.getMessage}")
          if (i < tables.length - 1)
            System.err.println("[runner] Continuing with next sync...")
        case Success(s) =>
          System.err.println(s"[runner] ${s.table}: ${s.mode}, rows=${s.rowsUpserted}")
      }
      cfg.name -> r
    }
    RunReport(results)
  }

  /** GCP variant: group tables by service, run service-by-service
    * (gcp_main.py:57-79). Order within a service follows config order. */
  def runGroupedByService(tables: Seq[TableConfig])(runOne: TableConfig => SyncJob.SyncStats): Map[String, RunReport] =
    tables.groupBy(_.service.getOrElse("default")).toSeq.sortBy(_._1).map {
      case (service, ts) => service -> runAll(ts)(runOne)
    }.toMap
}
