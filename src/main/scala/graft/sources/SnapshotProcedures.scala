package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Snapshots

/** SQL-callable maintenance procedures for snapshot tables — the ops
  * loop (`compactSmall` cadence, `purgeDeletes`, wall-clock vacuum,
  * checkpointing) exposed Iceberg-style through Spark 4's DSv2 stored
  * procedures:
  * {{{
  *   CALL graft.system.compact_small('tbl', 1000000, 4194304)
  *   CALL graft.system.vacuum_older_than('tbl', <cutoff epoch ms>)
  *   CALL graft.system.history('tbl')
  * }}}
  * Each call routes to the SAME engine entry point every other caller
  * uses and returns its footprint as rows (a `LocalScan` — the results
  * are manifest-scale by construction). Table names resolve under the
  * catalog's root exactly like table identifiers. Procedures are
  * declared non-deterministic: each call is a maintenance ACTION
  * against live state, never cacheable. */
private[sources] object SnapshotProcedures {

  /** One fixed-signature maintenance procedure. */
  private final case class Proc(
      name: String,
      params: Seq[(String, DataType)],
      outSchema: StructType,
      run: (SparkSession, InternalRow, String => String) => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def description(): String = s"graft snapshot maintenance: $name"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      params.map { case (n, t) => ProcedureParameter.in(n, t).build() }.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val out = run(spark, input, resolvePath).toArray
      val schema = outSchema
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = schema
      }
      java.util.List.of(scan).iterator()
    }
    // injected per catalog instance (the root differs)
    @volatile private var resolvePath: String => String = identity
    def withResolver(r: String => String): Proc = { resolvePath = r; this }
  }

  private def utf8(s: String) = UTF8String.fromString(s)

  private def cowRow(c: Snapshots.Cow): InternalRow =
    InternalRow(c.version.map(Long.box).orNull, c.filesRewritten,
      c.filesVisible, c.filesDropped, c.dvRows)

  private val cowSchema = StructType(Seq(
    StructField("version", LongType), StructField("files_rewritten", IntegerType),
    StructField("files_visible", IntegerType), StructField("files_dropped", IntegerType),
    StructField("dv_rows", LongType)))

  private def defs: Seq[Proc] = Seq(
    Proc("vacuum",
      Seq("table" -> StringType, "retain_versions" -> IntegerType),
      StructType(Seq(StructField("files_deleted", LongType))),
      (s, in, path) => Seq(InternalRow(
        Snapshots.vacuum(s, path(in.getUTF8String(0).toString), in.getInt(1))))),
    Proc("vacuum_older_than",
      Seq("table" -> StringType, "cutoff_ms" -> LongType),
      StructType(Seq(StructField("files_deleted", LongType))),
      (s, in, path) => Seq(InternalRow(
        Snapshots.vacuumOlderThan(s, path(in.getUTF8String(0).toString), in.getLong(1))))),
    Proc("compact_small",
      Seq("table" -> StringType, "target_rows" -> LongType,
        "small_max_bytes" -> LongType),
      cowSchema,
      (s, in, path) => Seq(cowRow(Snapshots.compactSmall(
        s, path(in.getUTF8String(0).toString), in.getLong(1), in.getLong(2))))),
    Proc("optimize",
      Seq("table" -> StringType, "target_rows" -> LongType,
        "zorder_cols" -> StringType),
      StructType(Seq(StructField("version", LongType))),
      (s, in, path) => {
        val cols = in.getUTF8String(2).toString.split(",")
          .map(_.trim).filter(_.nonEmpty).toSeq
        Seq(InternalRow(Snapshots.compactLatest(
          s, path(in.getUTF8String(0).toString), in.getLong(1), cols)))
      }),
    Proc("purge_deletes",
      Seq("table" -> StringType),
      cowSchema,
      (s, in, path) => Seq(cowRow(
        Snapshots.purgeDeletes(s, path(in.getUTF8String(0).toString))))),
    Proc("checkpoint",
      Seq("table" -> StringType),
      StructType(Seq(StructField("version", LongType))),
      (s, in, path) => Seq(InternalRow(
        Snapshots.checkpoint(s, path(in.getUTF8String(0).toString))))),
    Proc("dv_stats",
      Seq("table" -> StringType),
      StructType(Seq(StructField("dirty_files", IntegerType),
        StructField("dv_rows", LongType), StructField("dv_files", IntegerType))),
      (s, in, path) => {
        val d = Snapshots.dvStats(s, path(in.getUTF8String(0).toString))
        Seq(InternalRow(d.dirtyFiles, d.dvRows, d.dvFiles))
      }),
    Proc("history",
      Seq("table" -> StringType),
      StructType(Seq(StructField("version", LongType),
        StructField("action", StringType), StructField("n_files", IntegerType),
        StructField("n_removed", IntegerType), StructField("n_dvs", IntegerType),
        StructField("ts", LongType))),
      (s, in, path) =>
        Snapshots.history(s, path(in.getUTF8String(0).toString))
          .orderBy("version")
          .queryExecution.executedPlan.executeCollect().toSeq))

  def load(name: String, resolver: String => String): Option[UnboundProcedure] =
    defs.find(_.name == name.toLowerCase).map(_.withResolver(resolver))

  def names: Seq[String] = defs.map(_.name)
}
