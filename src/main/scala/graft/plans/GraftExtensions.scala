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

  /** Sound lat/lng bounding box of cap(qLat, qLng, r meters), or None when a
    * box prune would be unsound and the rewrite must be skipped (ADVICE r01):
    * the cap reaches a pole, the exact longitude-extent formula's
    * precondition sin(rr) < cos(lat) fails, or the window crosses +-180.
    *
    * Latitude extent: rr = r/R radians exactly (haversine's own earth model).
    * Longitude extent: the EXACT spherical bound asin(sin(rr)/cos(qLat)) —
    * not the linear under-estimate — with a relative + absolute float margin. */
  def capBounds(qLat: Double, qLng: Double, r: Double)
      : Option[(Double, Double, Double, Double)] = {
    if (!(r >= 0) || r >= math.Pi / 2 * Geo.EarthRadiusMeters) return None
    val rr = r / Geo.EarthRadiusMeters
    val dLat = math.toDegrees(rr) * (1 + 1e-9) + 1e-9
    val latLo = qLat - dLat; val latHi = qLat + dLat
    if (latLo <= -89.999 || latHi >= 89.999) return None
    val sinr = math.sin(rr)
    val cosphi = math.cos(math.toRadians(qLat))
    if (sinr >= cosphi) return None
    val dLng = math.toDegrees(math.asin(sinr / cosphi)) * (1 + 1e-9) + 1e-9
    val lngLo = qLng - dLng; val lngHi = qLng + dLng
    if (lngLo <= -180.0 || lngHi >= 180.0) return None
    Some((latLo, latHi, lngLo, lngHi))
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond.transformUp {
        case w @ WithinCapMeters(Seq(lat, lng,
            Literal(qLat: Double, _), Literal(qLng: Double, _), Literal(r: Double, _)), false)
            if capBounds(qLat, qLng, r).isDefined =>
          val (latLo, latHi, lngLo, lngHi) = capBounds(qLat, qLng, r).get
          val prune = And(
            And(GreaterThanOrEqual(lat, Literal(latLo)),
              LessThanOrEqual(lat, Literal(latHi))),
            And(GreaterThanOrEqual(lng, Literal(lngLo)),
              LessThanOrEqual(lng, Literal(lngHi))))
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
