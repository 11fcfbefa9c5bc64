package graft.plans

import graft.core.Geo
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Catalyst extension demonstrating the reference's spatial-query rewrite as
  * an optimizer Rule (SURVEY.md §4.1 "Prune-then-refine"; b6 compiles every
  * spatial predicate into a coarse index prune + exact residual,
  * search/spatial.go:65-83 / spatial.go:168-305).
  *
  * `WithinCapMeters(lat, lng, qLat, qLng, radius)` evaluates the EXACT
  * great-circle predicate. The `PruneWithinCap` rule rewrites
  * `Filter(within_cap(...))` into
  * `Filter(bboxPrune && within_cap(...))` when the cap is literal: four
  * cheap comparisons (lat/lng bounding box, cos-scaled in longitude) guard
  * the transcendental haversine — the same prune/refine split b6 performs
  * against its cell index, expressed purely on expressions so Catalyst can
  * push the cheap conjuncts further down on its own.
  *
  * Registered via `SparkSessionExtensions` (injectOptimizerRule), the (c)
  * tier of the custom-operator ladder. */
case class WithinCapMeters(children: Seq[Expression], pruned: Boolean = false)
    extends Expression {
  require(children.length == 5, "within_cap(lat, lng, qLat, qLng, radiusMeters)")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "within_cap"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else {
      val Seq(lat, lng, qLat, qLng, r) = vs.map(_.asInstanceOf[Double])
      Geo.haversineMeters(lat, lng, qLat, qLng) <= r
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(_.isNull).mkString("(", " || ", ")")
    val Seq(lat, lng, qLat, qLng, r) = evals.map(_.value)
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(code =
      code"""
         |$childCode
         |boolean ${ev.isNull} = $anyNull;
         |boolean ${ev.value} = false;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.core.Geo.haversineMeters($lat, $lng, $qLat, $qLng) <= $r;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): WithinCapMeters =
    copy(children = c)
}

/** Filter(within_cap(lat, lng, L, G, R)) with literal cap -> add the
  * bounding-box prune in front. Idempotent at EXPRESSION granularity: each
  * rewritten predicate is marked `pruned`, so repeated optimizer iterations
  * (and multiple cap predicates in one filter) are handled. */
object PruneWithinCap extends Rule[LogicalPlan] {
  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond.transformUp {
        case w @ WithinCapMeters(Seq(lat, lng,
            Literal(qLat: Double, _), Literal(qLng: Double, _), Literal(r: Double, _)), false) =>
          val dLat = r / 111000.0
          val dLng = dLat / math.max(0.2, math.cos(math.toRadians(qLat)))
          val prune = And(
            And(GreaterThanOrEqual(lat, Literal(qLat - dLat)),
              LessThanOrEqual(lat, Literal(qLat + dLat))),
            And(GreaterThanOrEqual(lng, Literal(qLng - dLng)),
              LessThanOrEqual(lng, Literal(qLng + dLng))))
          And(prune, w.copy(pruned = true))
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PruneWithinCap)
  }
}

object GraftExtensions {
  /** Column-level constructor for the exact predicate. */
  def withinCap(lat: Column, lng: Column, qLat: Double, qLng: Double,
                radiusMeters: Double): Column =
    Bridge.column(WithinCapMeters(Seq(
      Bridge.expression(lat), Bridge.expression(lng),
      Literal(qLat), Literal(qLng), Literal(radiusMeters))))
}
