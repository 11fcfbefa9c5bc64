package graft.functions

import graft.core.S2
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the hot write-time path: lat/lng -> S2
  * level-16 cell (SURVEY.md §4.3 "custom expressions (optional, perf)").
  *
  * Unlike a Scala UDF, this stays inside whole-stage codegen: the generated
  * code calls the static kernel directly — no ScalaUDF wrapper, no
  * encoder/converter round-trip, no extra closure dispatch per row, and the
  * expression reports its null-intolerance so Catalyst can reason about it.
  */
case class S2CellAt16(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "s2_cell16"

  override protected def nullSafeEval(lat: Any, lng: Any): Any =
    S2.cellAt(lat.asInstanceOf[Double], lng.asInstanceOf[Double], 16)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lng) =>
      s"${ev.value} = graft.core.S2.cellAt($lat, $lng, 16);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): S2CellAt16 =
    copy(left = newLeft, right = newRight)
}

object S2Expressions {
  /** Column-level entry point: `s2Cell16($"lat", $"lng")`. */
  def s2Cell16(lat: Column, lng: Column): Column =
    Bridge.column(S2CellAt16(Bridge.expression(lat), Bridge.expression(lng)))
}
