package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the haversine distance (SURVEY.md
  * §2.10 showcase) — the custom-`Expression` path (preference (b) in the
  * custom-operator ladder) for when composing built-ins isn't enough.
  *
  * Implements `doGenCode` so the whole computation stays inside the
  * surrounding whole-stage-codegen span as straight-line Java math —
  * no virtual calls per row, unlike a Scala UDF (which breaks codegen
  * and pays serialization) or the composed-Column form (which codegens
  * fine but as ~12 separate expression nodes).
  *
  * Semantics identical to [[Haversine.haversineMiles]] (asin form,
  * R = 3963 — reference back_end/feature_store/batch_processing.py:32-37).
  */
case class HaversineMiles(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression)
  extends QuaternaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
  with Serializable {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType
  // ImplicitCastInputTypes: SQL literals (decimals) / ints coerce to
  // double instead of failing analysis
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "haversine_miles"

  @inline private def compute(a1: Double, o1: Double, a2: Double, o2: Double): Double = {
    // same association order as the composed-Column form so both paths
    // agree bit-for-bit (radians applied per operand, then subtracted)
    val dlat = (math.toRadians(a2) - math.toRadians(a1)) / 2
    val dlon = (math.toRadians(o2) - math.toRadians(o1)) / 2
    val h = math.sin(dlat) * math.sin(dlat) +
      math.cos(math.toRadians(a1)) * math.cos(math.toRadians(a2)) *
        math.sin(dlon) * math.sin(dlon)
    2 * Haversine.EarthRadiusMiles * math.asin(math.sqrt(h))
  }

  override protected def nullSafeEval(v1: Any, v2: Any, v3: Any, v4: Any): Any =
    compute(v1.asInstanceOf[Double], v2.asInstanceOf[Double],
      v3.asInstanceOf[Double], v4.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a1, o1, a2, o2) => {
      val r = Haversine.EarthRadiusMiles
      // freshName, not fixed names: when all four children are
      // non-nullable the block is inlined unscoped, so two instances in
      // one projection would otherwise declare duplicate locals and fail
      // Janino compilation (→ silent interpreted fallback).
      val dlat = ctx.freshName("dlat")
      val dlon = ctx.freshName("dlon")
      val h = ctx.freshName("h")
      s"""
         |double $dlat = (Math.toRadians($a2) - Math.toRadians($a1)) / 2;
         |double $dlon = (Math.toRadians($o2) - Math.toRadians($o1)) / 2;
         |double $h = Math.sin($dlat) * Math.sin($dlat) +
         |  Math.cos(Math.toRadians($a1)) * Math.cos(Math.toRadians($a2)) *
         |  Math.sin($dlon) * Math.sin($dlon);
         |${ev.value} = 2 * $r * Math.asin(Math.sqrt($h));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}

object HaversineMiles {
  /** Column form of the native expression. */
  def native(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(HaversineMiles(
      expression(lat1), expression(lon1), expression(lat2), expression(lon2)))
  }

  /** Register `haversine_miles` for SQL use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "haversine_miles",
      exprs => HaversineMiles(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
}
