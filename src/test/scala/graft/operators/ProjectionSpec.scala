package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.types._

/** §2.4-6: ignore_columns drops a column ONLY when it is nullable. */
class ProjectionSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("note", StringType, nullable = true),
    StructField("req", StringType, nullable = false)))

  test("nullable ignored column is dropped") {
    assert(Projection.keptFields(schema, Set("note")) === Seq("id", "req"))
  }

  test("non-nullable ignored column is KEPT (reference quirk)") {
    assert(Projection.keptFields(schema, Set("req")) === Seq("id", "note", "req"))
  }

  test("ignoring applies the rule to a real frame") {
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, "n", "r")), schema)
    assert(Projection.ignoring(df, Set("note", "req")).columns.toSeq === Seq("id", "req"))
  }
}
