package graft

import org.apache.spark.sql.SparkSession

/** The ONE SparkSession constructor shared by every runtime main (Bench,
  * Verify, Plans, the CLI). Until round 19 each main carried its own
  * builder block; a config edit in one silently de-synced the session the
  * bench times from the session the oracle verifies (the recorded
  * round-18 debt). Every main needs the same five facts:
  *
  *  - master `local[$SPARK_GRAFT_CPUS]` (driver contract: the driver
  *    re-runs the bench at a lower core count to measure scaling, so the
  *    core count must come from the environment, never a constant);
  *  - `spark.sql.shuffle.partitions` = the same core count;
  *  - UTC session timezone (cross-engine timestamp determinism);
  *  - `nanosAsLong` for the timestamp[ns] testdata generation (Tables
  *    normalizes both generations on top of it);
  *  - AQE on (the default since 3.2, pinned explicitly so a vendor
  *    default flip cannot change plan shapes between rounds), UI off.
  */
object Sessions {
  /** `masterOverride` lets the CLI honor its SPARK_MASTER env contract;
    * every other main uses the driver's local[$SPARK_GRAFT_CPUS]. */
  def build(masterOverride: Option[String] = None): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(masterOverride.getOrElse(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // kept for timestamp[ns]-generation testdata (reads as bigint nanos);
      // timestamp[us] generations read as TIMESTAMP_NTZ — Tables normalizes
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
