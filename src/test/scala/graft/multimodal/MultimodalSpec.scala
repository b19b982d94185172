package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private implicit def s: SparkSession = spark

  test("attachBinary produces (doc_id, media binary) schema") {
    val df = Multimodal.attachBinary(Seq((1L, "abc")).toDF("doc_id", "text"), "doc_id", "text")
    assert(df.columns.toSeq === Seq("doc_id", "media"))
    assert(df.schema("media").dataType.typeName === "binary")
    assert(df.head.getAs[Array[Byte]]("media").toSeq === "abc".getBytes("UTF-8").toSeq)
  }

  test("decode runs partition-parallel and derives metadata from bytes") {
    val df = Multimodal.attachBinary(
      Seq((1L, "a" * 100), (2L, ""), (3L, "xyz")).toDF("doc_id", "text"), "doc_id", "text")
      .repartition(3)
    val out = Multimodal.decode(df).collect().map(d => d.doc_id -> d).toMap
    assert(out(1L) === Multimodal.DecodedMedia(1L, 100, 64 + 100 % 64, 64 + (100 / 64) % 64, 'a'.toLong))
    assert(out(2L) === Multimodal.DecodedMedia(2L, 0, 64, 64, 0))
    assert(out(3L).checksum === 'x'.toLong)
  }

  test("extractFeatures: 16-bin byte histogram, integer-exact") {
    val df = Multimodal.attachBinary(Seq((1L, "aaab")).toDF("doc_id", "text"), "doc_id", "text")
    val h = Multimodal.extractFeatures(df).collect().head.histogram
    // 'a' = 0x61 and 'b' = 0x62 -> bin 6 has all 4 bytes
    assert(h(6) === 4L && h.sum === 4L)
  }

  test("resizeMeta scales height proportionally to the target width") {
    val df = Multimodal.attachBinary(Seq((1L, "x" * 100)).toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.resizeMeta(Multimodal.decode(df), targetWidth = 32).collect().head
    assert(out.width === 32)
    assert(out.height === Multimodal.decodeBytes(1L, ("x" * 100).getBytes).height * 32 /
      Multimodal.decodeBytes(1L, ("x" * 100).getBytes).width)
  }

  test("sampleFrames explodes one row per stride offset") {
    val df = Multimodal.attachBinary(Seq((1L, "0123456789")).toDF("doc_id", "text"), "doc_id", "text")
    val frames = Multimodal.sampleFrames(df, 4).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(frames.toSeq === Seq((0L, 0L), (1L, 4L), (2L, 8L)))
  }
}
