package graft.operators

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two same-bucketed tables plans no shuffle exchange") {
    // clean both catalog entries and orphaned warehouse dirs (a killed JVM
    // can leave the location without the in-memory catalog entry)
    Seq("graft_bkt_a", "graft_bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val a = (1L to 100L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 100L).map(i => (i, s"b$i")).toDF("k", "vb")
    Bucketing.writeBucketed(a, "graft_bkt_a", Seq("k"), 4)
    Bucketing.writeBucketed(b, "graft_bkt_b", Seq("k"), 4)
    val joined = Bucketing.bucketedJoin(spark, "graft_bkt_a", "graft_bkt_b", Seq("k"))
    assert(joined.count() === 100)
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$physical")
  }
}
