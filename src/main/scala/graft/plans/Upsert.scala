package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** The engine's one custom logical operator: `Upsert(base, delta, pks)` —
  * whole-operator DO-UPDATE semantics as a plan node, per the (c) extension
  * path (custom LogicalPlan + Rule, injected via SparkSessionExtensions).
  *
  * The node is sugar, not execution: ResolveUpsert rewrites it during
  * analysis into the same union + row_number + filter plan that
  * `operators.Merge.upsert` builds with the DataFrame API, so Catalyst
  * optimizes and Tungsten executes a completely standard plan — no custom
  * SparkPlan/strategy needed (SURVEY §4's conclusion, demonstrated).
  */
case class Upsert(base: LogicalPlan, delta: LogicalPlan, pks: Seq[String])
    extends BinaryNode {
  override def left: LogicalPlan = base
  override def right: LogicalPlan = delta
  override def output: Seq[Attribute] = base.output
  // never resolved: the analyzer must expand it via ResolveUpsert
  override lazy val resolved: Boolean = false
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(base = l, delta = r)
}

/** Analysis rule: Upsert -> Project(Filter(rn = 1, Window(row_number over
  * pks order by prec desc, rowhash desc), Union(base+0, delta+1))). The
  * deterministic row-hash tie-break matches Merge.upsert. */
object ResolveUpsert extends Rule[LogicalPlan] {

  private val PREC = "__graft_precedence"
  private val RN = "__graft_rn"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Upsert(base, delta, pks) if base.resolved && delta.resolved =>
      require(pks.nonEmpty, "Upsert requires at least one key column")
      // align delta columns to base order by name (unionByName semantics) —
      // and like unionByName, refuse extra delta columns rather than
      // silently dropping them (schema drift must fail loudly)
      require(delta.output.length == base.output.length,
        s"Upsert requires matching column sets; base has ${base.output.map(_.name)}, " +
          s"delta has ${delta.output.map(_.name)}")
      val deltaCols = base.output.map(a =>
        delta.output.find(d => conf.resolver(d.name, a.name)).getOrElse(
          throw new IllegalArgumentException(s"delta is missing column ${a.name}")))
      val pBase = Project(base.output :+ Alias(Literal(0), PREC)(), base)
      val pDelta = Project(deltaCols :+ Alias(Literal(1), PREC)(), delta)
      val union = Union(Seq(pBase, pDelta))
      val uOut = union.output
      def attrOf(name: String): Attribute = uOut.find(a => conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(s"unknown key column $name"))
      val pkAttrs: Seq[Expression] = pks.map(attrOf)
      val precAttr = uOut.last
      val dataAttrs = uOut.dropRight(1)
      val order = Seq(
        SortOrder(precAttr, Descending),
        SortOrder(new XxHash64(dataAttrs), Descending))
      val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
      val rn = Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(pkAttrs, order, frame)), RN)()
      val window = Window(Seq(rn), pkAttrs, order, union)
      val filtered = Filter(EqualTo(rn.toAttribute, Literal(1)), window)
      Project(dataAttrs, filtered)
  }
}
