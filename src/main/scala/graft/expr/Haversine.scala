package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Haversine great-circle distance in miles, R = 3963.
  *
  * Mirrors the reference's batch formulation (asin form,
  * `back_end/feature_store/batch_processing.py:32-37`); the reference's
  * streaming plane uses the atan2 form (`pipeline.py:17-23`) which is
  * numerically equivalent. Pure `Column` composition — stays inside
  * whole-stage codegen, no UDF.
  */
object Haversine {
  val EarthRadiusMiles = 3963.0

  def haversineMiles(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2) - radians(lat1)
    val dlon = radians(lon2) - radians(lon1)
    val a = pow(sin(dlat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon / 2), 2)
    lit(2 * EarthRadiusMiles) * asin(sqrt(a))
  }
}
