package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's two-stage JSONB quote-repair
  * (db-sync-local/sync_utils.py:97-126), replicated byte-for-byte:
  *
  * Stage 1: if the string looks like `'{...}'`, strip the outer single quotes;
  * then replace doubled single quotes `''` with `"`; verify it parses as JSON.
  * Stage 2 (on any stage-1 failure): operating on the *stage-1-transformed*
  * string (the reference mutates `value` in place before the try fails),
  * replace `'` with `"`, then `""` with `'`; verify; unparseable -> NULL
  * (lossy by design — SURVEY §2.4-5).
  *
  * The column form is a native Catalyst expression (JsonRepairExpr below),
  * not a Scala UDF: no encoder roundtrip through external String types, no
  * closure serialization, and the call participates in whole-stage codegen.
  * The repair body itself stays in compiled Scala behind a static forwarder
  * — string surgery plus a Jackson parse is JIT-compiled JVM code either
  * way; what codegen buys is eliminating the UDF wrapper around every row.
  */
object JsonRepair {

  // Jackson ships with Spark; thread-safe for reads.
  @transient private lazy val mapper = new ObjectMapper()

  private def parses(s: String): Boolean =
    try { mapper.readTree(s); true }
    catch { case _: Exception => false }

  /** Pure repair: Some(repaired) or None (reference appends NULL). */
  def repair(value: String): Option[String] = {
    if (value == null) return None
    // Stage 1 (sync_utils.py:101-108)
    var v = value
    if (v.startsWith("'{") && v.endsWith("}'")) v = v.substring(1, v.length - 1)
    v = v.replace("''", "\"")
    if (parses(v)) Some(v)
    else {
      // Stage 2 (sync_utils.py:117-121) — on the mutated value, like the reference
      val fixed = v.replace("'", "\"").replace("\"\"", "'")
      if (parses(fixed)) Some(fixed) else None
    }
  }

  /** Call target for both eval and the generated code (a Scala object
    * method with no companion class compiles to a static forwarder, so
    * generated Java calls `graft.functions.JsonRepair.repairUTF8(...)`
    * directly): UTF8String in/out, null = unrepairable. */
  def repairUTF8(s: UTF8String): UTF8String =
    if (s == null) null
    else repair(s.toString) match {
      case Some(r) => UTF8String.fromString(r)
      case None => null
    }

  /** Column form: NULL in -> NULL out, unparseable -> NULL. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(JsonRepairExpr(GraftColumnBridge.expression(c)))
}

/** Codegen'd repair: string -> repaired string or NULL. Nullable even for
  * non-null input (unparseable values are dropped to NULL by contract), so
  * the generated block re-derives isNull from the call result. */
case class JsonRepairExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"JsonRepairExpr expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    JsonRepair.repairUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.JsonRepair.repairUTF8($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
