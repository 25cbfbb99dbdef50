package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.expr.{Haversine, HaversineMiles}

/** Optimizer rule (custom-operator ladder step (c): `Rule[LogicalPlan]`
  * via `SparkSessionExtensions` / `experimental.extraOptimizations`).
  *
  * A radius predicate `haversine_miles(lat, lon, LAT0, LON0) <= R` with
  * a literal center cannot reach the parquet scan — the scan would read
  * every row and evaluate trig per row. This rule conjoins the IMPLIED
  * bounding box `lat BETWEEN LAT0±ΔLAT AND lon BETWEEN LON0±ΔLON`
  * (a superset of the disc, so the rewrite is semantics-preserving),
  * which Catalyst's predicate pushdown then drives into the scan as
  * min/max row-group pruning — the 100 TB geo query reads only the
  * stripes near the center and applies exact haversine to the survivors.
  *
  * Reference semantics: the fraud pipeline's distance feature
  * (`back_end/feature_store/batch_processing.py:32-37`) feeds distance
  * threshold filters; this makes those filters scan-prunable.
  *
  * Longitude shrink: Δlon = Δlat / cos(worst-case latitude in the band);
  * near the poles (cos → 0) the lon bound is dropped rather than risk a
  * wrap-around false negative. Idempotent: the generated conjuncts are
  * checked for semantic presence before re-adding, so the rule is stable
  * under the optimizer's fixed-point batches.
  */
object HaversineBoundingBox extends Rule[LogicalPlan] with PredicateHelper {

  private val MilesPerDegLat = math.Pi * Haversine.EarthRadiusMiles / 180.0

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val added = conjuncts.flatMap(bboxFor).filterNot(p =>
        conjuncts.exists(_.semanticEquals(p)))
      if (added.isEmpty) f
      else Filter((conjuncts ++ added).reduce(And), child)
  }

  /** The implied bounding-box conjuncts for one radius predicate. */
  private def bboxFor(e: Expression): Seq[Expression] = e match {
    case LessThan(h: HaversineMiles, DoubleLit(r)) => bounds(h, r)
    case LessThanOrEqual(h: HaversineMiles, DoubleLit(r)) => bounds(h, r)
    case GreaterThan(DoubleLit(r), h: HaversineMiles) => bounds(h, r)
    case GreaterThanOrEqual(DoubleLit(r), h: HaversineMiles) => bounds(h, r)
    case _ => Nil
  }

  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case _ => None
    }
  }

  private def bounds(h: HaversineMiles, r: Double): Seq[Expression] =
    (h.lat1, h.lon1, h.lat2, h.lon2) match {
      // literal center may be either argument pair
      case (DoubleLit(la), DoubleLit(lo), latE, lonE) => bbox(latE, lonE, la, lo, r)
      case (latE, lonE, DoubleLit(la), DoubleLit(lo)) => bbox(latE, lonE, la, lo, r)
      case _ => Nil
    }

  private def bbox(latE: Expression, lonE: Expression,
      lat0: Double, lon0: Double, r: Double): Seq[Expression] = {
    if (r < 0 || r.isNaN) return Nil
    val dLat = r / MilesPerDegLat
    val latMin = lat0 - dLat
    val latMax = lat0 + dLat
    val latBounds = Seq[Expression](
      GreaterThanOrEqual(latE, Literal(latMin)),
      LessThanOrEqual(latE, Literal(latMax)))
    // worst-case (smallest) cos over the latitude band
    val cosMin = math.min(math.cos(math.toRadians(math.min(math.abs(latMin), 90.0))),
      math.cos(math.toRadians(math.min(math.abs(latMax), 90.0))))
    val lonBounds =
      if (cosMin <= 1e-9) Nil // near a pole every longitude is in range
      else {
        val dLon = dLat / cosMin
        if (lon0 - dLon < -180.0 || lon0 + dLon > 180.0) Nil // wrap-around
        else Seq[Expression](
          GreaterThanOrEqual(lonE, Literal(lon0 - dLon)),
          LessThanOrEqual(lonE, Literal(lon0 + dLon)))
      }
    latBounds ++ lonBounds
  }

  /** Attach to an existing session (tests / notebooks). */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  def disable(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == this)
}

/** Deploy-time registration: `--conf spark.sql.extensions=graft.plans.GraftSparkExtensions`
  * injects the optimizer rule and the `haversine_miles` SQL function
  * into every session of the cluster. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => HaversineBoundingBox)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("haversine_miles"),
      new ExpressionInfo(classOf[HaversineMiles].getName, "haversine_miles"),
      (exprs: Seq[Expression]) => HaversineMiles(exprs(0), exprs(1), exprs(2), exprs(3))))
  }
}
