package graft.serve

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage backend behind [[FeatureStore]] — the reference serves from
  * Postgres via Prisma (`back_end/prisma/schema.prisma:16-31`,
  * `app/routes/feature.py:73-103`); SURVEY maps S8 to "Parquet or
  * JDBC". Both are DataFrame sources, so every FeatureStore query keeps
  * its pushdown behavior: parquet prunes row groups, JDBC compiles
  * filters into the remote WHERE clause.
  */
sealed trait OfflineBackend {
  def read(spark: SparkSession): DataFrame
  def append(df: DataFrame): Unit
  def overwrite(df: DataFrame): Unit
}

final case class ParquetBackend(path: String) extends OfflineBackend {
  override def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
  override def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path)
  override def overwrite(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}

/** JDBC table (the reference's Postgres plane; tested against embedded
  * Derby). When `partitionColumn` is set, reads fan out over
  * `numPartitions` range slices bounded by a min/max probe — one
  * executor per slice instead of a single-connection scan, the shape a
  * 1000-executor cluster needs against a sharded store.
  */
final case class JdbcBackend(url: String, table: String,
    user: Option[String] = None, password: Option[String] = None,
    partitionColumn: Option[String] = None, numPartitions: Int = 32)
  extends OfflineBackend {

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    p
  }

  override def read(spark: SparkSession): DataFrame = partitionColumn match {
    case Some(c) =>
      val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(c)
      val bounds = spark.read
        .jdbc(url, s"(SELECT MIN($q) AS mn, MAX($q) AS mx FROM $table) b", props)
        .head()
      if (bounds.isNullAt(0)) spark.read.jdbc(url, table, props)
      else spark.read.jdbc(url, table, c,
        bounds.getAs[Number](0).longValue(), bounds.getAs[Number](1).longValue(),
        numPartitions, props)
    case None => spark.read.jdbc(url, table, props)
  }

  override def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  override def overwrite(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)
}
