package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)
  private val subDim = 4
  private val m = 3
  private val k = 5
  private val books: Array[Array[Array[Float]]] =
    Array.fill(m, k, subDim)(rnd.nextFloat() * 2 - 1)

  /** The least(struct(dist, cid)) formulation the expression replaced —
    * kept as the parity reference. */
  private def refCodes(vecCol: org.apache.spark.sql.Column) =
    array((0 until m).map { s =>
      val sub = slice(vecCol, s * subDim + 1, subDim)
      val scored = books(s).zipWithIndex.map { case (c, cid) =>
        val cn2 = c.map(x => x.toDouble * x).sum
        struct((lit(cn2) - lit(2.0) * graft.functions.VectorFunctions.floatDot(
          sub, typedLit(c.toSeq))).as("d"), lit(cid).as("cid"))
      }
      least(scored.toIndexedSeq: _*).getField("cid")
    }: _*)

  test("codegen'd codes equal the least-struct formulation on random vectors") {
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(m * subDim)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    val rows = vecs.select(
        PqEncode($"v", books, subDim).as("fast"), refCodes($"v").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
  }

  test("a vector equal to a centroid encodes to that centroid's index") {
    val v = (books(0)(3) ++ books(1)(0) ++ books(2)(4)).toSeq
    val codes = Seq(Tuple1(v)).toDF("v")
      .select(PqEncode($"v", books, subDim)).head.getSeq[Int](0)
    assert(codes === Seq(3, 0, 4))
  }

  test("ties break to the lowest centroid index") {
    val dup: Array[Array[Array[Float]]] =
      Array(Array(Array(1f, 0f), Array(1f, 0f), Array(0f, 1f)))
    val codes = Seq(Tuple1(Seq(1f, 0f))).toDF("v")
      .select(PqEncode($"v", dup, 2)).head.getSeq[Int](0)
    assert(codes === Seq(0))
  }
}
