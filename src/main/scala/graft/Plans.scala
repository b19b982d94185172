package graft



/** Plan-dump main (optimization-round measurement tooling): writes the
  * `.explain("formatted")` output of each named query to
  * `<outDir>/<query>_<tag>.txt`.
  *
  * Usage: runMain graft.Plans <outDir> <tag> q01_project_scan,q77_stream_join
  *
  * Same session configuration as Bench (master/local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE on) so the dumped plans are built under
  * the session the bench runs. NOTE: what is dumped is the PRE-EXECUTION
  * plan (`AdaptiveSparkPlan isFinalPlan=false`) — AQE may re-shape joins
  * and coalesce partitions at run time; AQE-final shapes are asserted by
  * PlanShapeSpec (which collects first), not by these dumps. Executing
  * every query here just to dump the final plan would make plan dumps as
  * expensive as a bench run. Queries that drive their own streaming harness
  * still produce a plan: the lambda runs to completion (building the final
  * DataFrame) and the FINAL frame's plan is dumped — for those the
  * interesting plans are the per-micro-batch ones, which this tool cannot
  * see; it still pins the read-back/serve shape.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: Plans <outDir> <tag> <q1,q2,...>")
    val Array(outDir, tag, list) = args
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    var failed = 0
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
        println(s"[plans] wrote $outDir/${name}_$tag.txt")
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    // a run where dumps failed must not look successful (a before/after
    // comparison would silently diff stale or missing files)
    if (failed > 0) sys.exit(1)
  }
}
