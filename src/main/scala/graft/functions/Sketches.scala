package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter sketch surface: Spark ships codegen-able
  * BloomFilterAggregate / BloomFilterMightContain expressions for its
  * runtime row-level join filtering but does NOT register them as public
  * functions — this exposes them as Columns (and GraftExtensions registers
  * them as SQL functions), because a Bloom filter is the canonical 100 TB
  * pre-join primitive: build a fixed-size sketch of the small side's keys,
  * probe the huge side BEFORE it shuffles, and ship only probable matches.
  * No false negatives by construction; false-positive rate is set by
  * bits/item.
  */
object Sketches {

  /** Aggregate a bigint/int/string column into a serialized Bloom filter
    * (binary). `numBits` controls the false-positive rate
    * (~0.03 at 8 bits/item, halving per +1.44 bits/item). */
  def bloomAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(GraftColumnBridge.expression(c),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a DRIVER-collected sketch: the expression requires its filter
    * side constant-foldable, which is exactly the sketch contract — the
    * filter is a fixed-size object regardless of input scale, so
    * collecting the one sketch row and inlining it as a literal is the
    * intended use (Spark's own runtime filtering injects it as a scalar
    * subquery for the same reason). */
  def mightContain(sketch: Array[Byte], value: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(Literal(sketch), GraftColumnBridge.expression(value)))
}
