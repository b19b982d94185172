package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The RFC 9309 longest-match decision as ONE codegen'd expression:
  * `decide(host, path)` over a rules table shipped as a plan literal.
  *
  * Why an expression and not a join + per-rule `regexp_like`: Spark's
  * regex expressions only cache the compiled `Pattern` when the pattern
  * is FOLDABLE — a pattern read from a joined rules array recompiles on
  * every (row × rule) evaluation, so a host with R rules costs R
  * `Pattern.compile` calls per URL on the 100 TB side. Here the rules are
  * collected once (a robots corpus is |hosts|-bounded — the
  * centroid/vocab collect precedent), ride the expression as a reference
  * object, and compile once per TASK via a transient lazy map (reference
  * objects deserialize with each task binary) — amortized across the
  * task's whole partition, so each ROW costs only the actual matches. The join disappears entirely —
  * the decision is a pure narrow projection that fuses into the scan.
  *
  * Decision semantics (RFC 9309 §2.2.2): among the host's rules whose
  * anchored regex matches the path, the longest PATTERN wins and Allow
  * wins length ties; no rules for the host, or no matching rule, means
  * allowed. NULL host/path propagates NULL (callers coalesce to the RFC
  * allow default).
  */
case class RobotsDecision(left: Expression, right: Expression,
                          rules: Map[String, Seq[(Int, Boolean, String)]])
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"RobotsDecision expects (string host, string path), got ($l, $r)")
    }

  /** Compiled once per TASK (the expression rides the codegen references
    * array, which deserializes with each task binary — |rules|-bounded
    * per task, amortized across the task's whole partition; per-ROW it
    * costs nothing, which is the point vs a joined non-foldable regex).
    * Keyed by UTF8String so the per-row probe needs no String decode —
    * UTF8String has value equals/hashCode. */
  @transient private lazy val compiled: Map[UTF8String, Array[(Int, Boolean, java.util.regex.Pattern)]] =
    rules.map { case (h, rs) =>
      UTF8String.fromString(h) -> rs.map { case (len, allow, rx) =>
        (len, allow, java.util.regex.Pattern.compile(rx))
      }.toArray
    }

  def decide(host: UTF8String, path: UTF8String): Boolean = {
    val rs = compiled.getOrElse(host, null)
    if (rs == null) return true
    val p = path.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rs.length) {
      val r = rs(i)
      if ((r._1 > bestLen || (r._1 == bestLen && r._2 && !bestAllow)) &&
          r._3.matcher(p).find()) {
        bestLen = r._1
        bestAllow = r._2
      }
      i += 1
    }
    if (bestLen < 0) true else bestAllow
  }

  override protected def nullSafeEval(h: Any, p: Any): Any =
    decide(h.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotsDecision", this,
      classOf[RobotsDecision].getName)
    nullSafeCodeGen(ctx, ev, (h, p) => s"${ev.value} = $ref.decide($h, $p);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RobotsDecision {
  def column(host: Column, path: Column,
             rules: Map[String, Seq[(Int, Boolean, String)]]): Column =
    GraftColumnBridge.column(RobotsDecision(
      GraftColumnBridge.expression(host),
      GraftColumnBridge.expression(path), rules))
}
