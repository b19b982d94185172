package graft.files

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits round-robin (col j bit i -> position i*d + j)") {
    // x=0b11, y=0b01: pos0=x0=1, pos1=y0=1, pos2=x1=1, pos3=y1=0 -> 0b0111
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), bits = 2).as("z"))
      .head.getLong(0)
    assert(z === 7L)
    // one column degenerates to the identity on the low bits
    val z1 = Seq(Tuple1(5L)).toDF("x")
      .select(Layout.zValue(Seq(col("x")), bits = 3).as("z")).head.getLong(0)
    assert(z1 === 5L)
  }

  test("minMaxBucket maps lo->0, hi->max bucket, constant column -> 0") {
    val df = Seq(0L, 50L, 100L).toDF("v")
      .crossJoin(Seq((0.0, 100.0)).toDF("lo", "hi"))
    val b = df.select(Layout.minMaxBucket(col("v"), col("lo"), col("hi"), 8).as("b"))
      .collect().map(_.getLong(0)).sorted
    assert(b === Array(0L, 128L, 255L))
    val const = Seq(7L).toDF("v").crossJoin(Seq((7.0, 7.0)).toDF("lo", "hi"))
      .select(Layout.minMaxBucket(col("v"), col("lo"), col("hi"), 8).as("b"))
      .head.getLong(0)
    assert(const === 0L)
  }

  test("clusteredWrite keeps every row and bounds per-file bbox on BOTH dims") {
    val dir = Files.createTempDirectory("graft_zorder").toString + "/t"
    // 32x32 uniform grid: a 4-file z-layout should give each file a
    // bounding box well under the full extent on both x and y; a
    // lexicographic sort would score ~1.0 on y
    val grid = spark.range(1024)
      .select((col("id") % 32).as("x"), (col("id") / 32).as("y"))
    Layout.clusteredWrite(grid, dir, Seq("x", "y"), numFiles = 4, bits = 5)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1024)
    assert(back.select("x", "y").except(grid).count() === 0)
    val m = Layout.bboxFractions(back, Seq("x", "y")).head
    assert(m.getLong(0) === 4L)
    assert(m.getDouble(1) <= 0.6, s"frac_x = ${m.getDouble(1)}")
    assert(m.getDouble(2) <= 0.6, s"frac_y = ${m.getDouble(2)}")
  }

  test("statsIndex + prunedRead: exact result through a strict file subset") {
    val dir = Files.createTempDirectory("graft_pruned").toString + "/t"
    val grid = spark.range(1024)
      .select(col("id"), (col("id") % 32).as("x"), (col("id") / 32).as("y"))
    Layout.clusteredWrite(grid, dir, Seq("x", "y"), numFiles = 4, bits = 5)
    val idx = Layout.statsIndex(spark, dir, Seq("x", "y"))
    assert(idx.count() === 4L)
    // band on y (the non-leading dim of a would-be x sort)
    val (pruned, nFiles) = Layout.prunedRead(spark, dir, idx, "y", 10L, 12L)
    assert(nFiles < 4L, s"band read must prune at least one file, read $nFiles")
    val expect = grid.filter(col("y").between(10, 12))
    assert(pruned.select("id").except(expect.select("id")).count() === 0)
    assert(expect.select("id").except(pruned.select("id")).count() === 0)
    // empty band: no files, empty result, same schema
    val (none, n0) = Layout.prunedRead(spark, dir, idx, "y", 999L, 1000L)
    assert(n0 === 0L && none.count() === 0L)
  }

  test("quantile bucketing keeps discriminating where an outlier collapses min-max") {
    // y mass lives in [0,99] with one outlier at 1e6: min-max maps ALL
    // normal rows to y-bucket 0 (no discrimination — every file spans the
    // whole normal y range), while equi-depth boundaries ignore the outlier
    val data = spark.range(1024)
      .select(col("id"), (col("id") % 32).as("x"),
        when(col("id") === 0, 1000000L).otherwise(col("id") % 100).as("y"))
    def medianYExtent(dir: String): Double = {
      val exts = spark.read.parquet(dir).withColumn("__f", input_file_name())
        .filter(col("y") < 1000000L) // the outlier's own extent isn't the point
        .groupBy("__f").agg((max("y") - min("y")).as("ext"))
        .collect().map(_.getLong(1)).sorted
      exts(exts.length / 2).toDouble
    }
    val d1 = Files.createTempDirectory("graft_qminmax").toString + "/t"
    Layout.clusteredWrite(data, d1, Seq("x", "y"), numFiles = 4, bits = 5)
    val d2 = Files.createTempDirectory("graft_qquant").toString + "/t"
    Layout.clusteredWrite(data, d2, Seq("x", "y"), numFiles = 4, bits = 5, quantile = true)
    assert(spark.read.parquet(d2).count() === 1024)
    assert(spark.read.parquet(d2).select("id").except(data.select("id")).count() === 0)
    val (mm, qq) = (medianYExtent(d1), medianYExtent(d2))
    assert(mm >= 90.0, s"outlier should collapse min-max y-discrimination, median extent $mm")
    assert(qq <= 60.0, s"quantile bucketing should keep y tight, median extent $qq")
  }

  test("property: zValue is a bijection on the grid (deinterleave recovers x and y)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val bits = 8
    val xy = Gen.zip(Gen.choose(0L, (1L << bits) - 1), Gen.choose(0L, (1L << bits) - 1))
    val prop = Prop.forAll(Gen.listOfN(32, xy)) { pts =>
      pts.isEmpty || {
        val zs = pts.toDF("x", "y")
          .select(col("x"), col("y"),
            Layout.zValue(Seq(col("x"), col("y")), bits).as("z"))
          .collect()
        zs.forall { r =>
          val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
          val dx = (0 until bits).map(i => ((z >> (2 * i)) & 1L) << i).sum
          val dy = (0 until bits).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
          dx == x && dy == y
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
