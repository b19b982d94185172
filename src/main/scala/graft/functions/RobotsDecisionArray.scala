package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The RFC 9309 longest-match decision over a JOINED per-host rule array —
  * the join-form twin of [[RobotsDecision]] (the
  * [[graft.operators.Robots.isAllowed]] plan literal), for rule sets too
  * big to ship in a task closure.
  *
  * `decide(path, rules)` takes the rule array a host-keyed join delivered
  * on the row: `array<struct<allow boolean, pattern string>>`. The literal
  * twin is faster when the whole rules table fits a closure (no join at
  * all); THIS form is the mega-host escape — a broad-crawl frontier has
  * 10⁶+ hosts and the rules stay a distributed table end to end, joined
  * host-keyed (AQE picks broadcast vs shuffle by actual size), never
  * collected.
  *
  * Why not a joined `regexp_like`: Spark's regex expressions only cache
  * the compiled `Pattern` when the pattern is FOLDABLE — a pattern read
  * from a joined array recompiles per (row × rule). Here each task keeps
  * an LRU of compiled patterns (keyed by the raw robots pattern; the
  * regex conversion runs on miss only), so a host crawled ten-thousand
  * URLs deep compiles its rules once per task, not once per URL — and the
  * cache is BOUNDED (8192 entries), so a mega-host rule sweep cannot
  * accumulate every pattern a long task ever saw. Sort-merge joins
  * deliver rows host-clustered, which makes the LRU hit rate ~1.
  *
  * Decision semantics are the literal twin's, verbatim: among the rules
  * whose anchored regex matches the path, the longest raw PATTERN wins
  * and Allow wins length ties; an empty array (or one with only
  * null-field rules — hand-built frames; parse can't produce them) means
  * allowed. NULL path or NULL array propagates NULL (callers coalesce to
  * the RFC allow default — a host with no rules row at all surfaces as a
  * NULL array after the left join).
  */
case class RobotsDecisionArray(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType,
            ArrayType(StructType(Array(a, p)), _))
        if a.dataType == BooleanType && p.dataType == StringType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "RobotsDecisionArray expects (string path, " +
          s"array<struct<allow boolean, pattern string>>), got ($l, $r)")
    }

  /** Per-task compiled-pattern LRU. The expression deserializes with each
    * task binary, so the map is task-lifetime; access-ordered with a hard
    * cap so pathological rule cardinality degrades to recompiles, never
    * to unbounded heap. Keys are defensive copies — an UnsafeRow-backed
    * UTF8String points into a buffer the scan reuses. */
  /** Cache entry: the compiled pattern PLUS the raw pattern's UTF-16
    * length (the literal twin's String.length, so the twins tie-break
    * identically) — caching the length too keeps cache HITS free of any
    * String materialization, which is the per-row hot path. */
  @transient private lazy val cache =
    new java.util.LinkedHashMap[UTF8String, (java.util.regex.Pattern, Int)](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[UTF8String, (java.util.regex.Pattern, Int)]): Boolean =
        size() > 8192
    }

  private def compiledFor(pat: UTF8String): (java.util.regex.Pattern, Int) = {
    val hit = cache.get(pat)
    if (hit != null) return hit
    val s = pat.toString
    val e = (java.util.regex.Pattern.compile(
      graft.operators.Robots.patternRegex(s)), s.length)
    cache.put(UTF8String.fromString(s), e)
    e
  }

  def decide(path: UTF8String, rules: ArrayData): Boolean = {
    val p = path.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    val n = rules.numElements()
    while (i < n) {
      if (!rules.isNullAt(i)) {
        val r = rules.getStruct(i, 2)
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val allow = r.getBoolean(0)
          val (rx, len) = compiledFor(r.getUTF8String(1))
          if ((len > bestLen || (len == bestLen && allow && !bestAllow)) &&
              rx.matcher(p).find()) {
            bestLen = len
            bestAllow = allow
          }
        }
      }
      i += 1
    }
    if (bestLen < 0) true else bestAllow
  }

  override protected def nullSafeEval(p: Any, rs: Any): Any =
    decide(p.asInstanceOf[UTF8String], rs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotsDecisionArray", this,
      classOf[RobotsDecisionArray].getName)
    nullSafeCodeGen(ctx, ev, (p, rs) => s"${ev.value} = $ref.decide($p, $rs);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RobotsDecisionArray {
  def column(path: Column, rules: Column): Column =
    GraftColumnBridge.column(RobotsDecisionArray(
      GraftColumnBridge.expression(path),
      GraftColumnBridge.expression(rules)))
}
