package graft.cli

import graft.config.SyncConfig
import graft.files.FileSync
import graft.sync.{ParquetStore, Runner, SyncJob}
import org.apache.spark.sql.SparkSession

/** CLI entry points mirroring the reference's three executables
  * (SURVEY §3): `db-sync` = main.py's run_all_syncs over a YAML catalog;
  * `file-sync` = gcs_sync.py's dry-run-first bucket sync (interactive
  * confirmation replaced by an explicit --apply flag — batch jobs should
  * not block on a TTY).
  *
  * Usage:
  *   graft.cli.Main db-sync --config tables.yaml --source <dir> --dest <dir> [--pks table=c1,c2 ...]
  *   graft.cli.Main file-sync <srcDir> <dstDir> [--apply]
  */
object Main {

  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: Array[String]): Int = args.toList match {
    case "db-sync" :: rest =>
      val opts = parseOpts(rest)
      val catalog = SyncConfig.loadFile(opts("config"))
      val src = new ParquetStore(spark, opts("source"))
      val dst = new ParquetStore(spark, opts("dest"))
      val pks = opts.get("pks").map(parsePks).getOrElse(Map.empty)
      // config order = YAML order is not preserved by the map; sort by name
      // for a deterministic run sequence (the reference iterates dict order)
      val report = Runner.runAll(catalog.values.toSeq.sortBy(_.name)) { cfg =>
        SyncJob.run(src, dst, cfg, pks.getOrElse(cfg.name, Seq.empty))
      }
      report.exitCode

    case "file-sync" :: srcDir :: dstDir :: rest =>
      val apply = rest.contains("--apply")
      // dry-run first, always — the reference's safety pattern (gcs_sync.py:115)
      val dry = FileSync.syncDir(spark, srcDir, dstDir, dryRun = true)
      System.err.println(s"[file-sync] plan: total=${dry.totalFiles} new=${dry.newFiles} existing=${dry.existingFiles}")
      if (apply) {
        val real = FileSync.syncDir(spark, srcDir, dstDir, dryRun = false)
        System.err.println(s"[file-sync] copied ${real.newFiles} files")
      } else {
        System.err.println("[file-sync] dry run only — pass --apply to copy")
      }
      0

    case _ =>
      System.err.println("usage: db-sync --config <yaml> --source <dir> --dest <dir> [--pks t=c1,c2;t2=c]\n" +
        "       file-sync <srcDir> <dstDir> [--apply]")
      2
  }

  private def parseOpts(rest: List[String]): Map[String, String] =
    rest.sliding(2, 2).collect {
      case List(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  /** `t1=c1,c2;t2=k` -> per-table PK lists. */
  private def parsePks(s: String): Map[String, Seq[String]] =
    s.split(';').filter(_.nonEmpty).map { part =>
      val Array(t, cols) = part.split("=", 2)
      t -> cols.split(',').toSeq
    }.toMap
}
