package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Golden-content gate for the DETERMINISTIC queries the DuckDB oracle
  * cannot express (seeded KMeans fits, BPE merge learning, greedy MMR,
  * deflate ratios, decode plumbing): the driver's correctness harness
  * only rows>0-checks them, so a silent content regression in the
  * sequential-algorithm paths could hide behind a stable row count.
  * This pins each query's full result to a content hash computed the
  * same way the oracle harness compares (columns sorted by name, rows
  * sorted, values hashed), committed as GOLDEN.json and asserted by
  * GoldenSpec on every test run.
  *
  * NOT pinned (genuinely nondeterministic or estimate-valued by
  * design): u2–u5/o4 seeded-shuffle samples (seed-stable within one
  * Spark version but defined as sampling), s11's producer, and the
  * sketch-estimate rows (a10/a13/cms/kll — their merge/rollup laws are
  * spec-pinned instead).
  *
  * Regenerate after an INTENDED semantic change:
  *   sbt "runMain graft.tools.Golden /root/testdata/sf0.001 GOLDEN.json"
  * then review the diff like any other golden-file change.
  */
object Golden {

  /** The deterministic no-oracle queries under golden pinning. */
  val targets: Seq[String] = Seq(
    "ns_tokenize", "ns_bpe_encode", "ns_pack_concat", "ns_diverse_topk",
    "ns_semdedup", "mm_decode_meta", "ns_ivf_topk", "ns_pq_topk",
    "ns_ivfpq_topk", "ns_ann_recall", "ns_compression_ratio",
    "ml_feature_transform")

  /** Content hash with the oracle harness's compare semantics: columns
    * sorted by NAME, every value rendered to a canonical string (6-dp
    * doubles, epoch-seconds timestamps are already the queries' own
    * output convention), rows sorted, sha-256 over the joined text.
    * Row order and column order thus never matter — only content. */
  def contentHash(df: DataFrame): String = {
    import org.apache.spark.sql.functions._
    val cols = df.columns.sorted
    val rendered = df.select(cols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000NULL")).as(c)): _*)
      .select(concat_ws("\u0001", cols.map(col): _*).as("r"))
      .collect().map(_.getString(0)).sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rendered.foreach { r => md.update(r.getBytes("UTF-8")); md.update(10.toByte) }
    md.digest().map("%02x".format(_)).mkString
  }

  def computeAll(spark: SparkSession, sfDir: String): Seq[(String, String, Long)] =
    targets.map { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      (name, contentHash(df), df.count())
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "GOLDEN.json"
    val spark = Tables.configure(SparkSession.builder().master("local[8]")
      .appName("golden").config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    val entries = computeAll(spark, sfDir)
    val json = entries.map { case (n, h, c) =>
      s"""  "$n": {"sha256": "$h", "rows": $c}"""
    }.mkString("{\n  \"sf_dir\": \"" + sfDir + "\",\n", ",\n", "\n}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    entries.foreach { case (n, h, c) => println(s"GOLDEN $n rows=$c $h") }
    spark.stop()
  }
}
