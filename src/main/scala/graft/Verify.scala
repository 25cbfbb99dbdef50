package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump every query's result to `outDir/<name>` parquet plus the
    * oracle SQL sidecar; returns the (name → message) failure map.
    * Failures must be VISIBLE in the artifact, not just on stderr: round 4
    * lost 21 red queries from the correctness denominator because a throw
    * left no output dir at all. On failure we (a) write _ERROR.txt into
    * the query's output dir and (b) accumulate everything into errors.json
    * beside oracle_sql.json so the driver can surface `err` rows.
    * (VerifySpec drives this path with a deliberately-broken query.) */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String],
      only: Option[Set[String]] = None): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    // Dump the oracle SQL FIRST: it depends only on the static inventory.
    // Round 2 lost every oracle row because this write sat AFTER the query
    // loop — a timeout/kill mid-loop (or at spark.stop) left the file
    // unwritten and the driver scored all 85 queries "no_oracle".
    val json = oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // errors.json exists from the START and is rewritten after every
    // failure — a mid-loop driver kill (the round-2 scenario that moved
    // oracle_sql.json above the loop) still leaves a complete record of
    // everything that failed up to that point.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // atomic replace (temp + move): a kill mid-rewrite must never leave
    // truncated JSON — the reader would crash instead of seeing errors
    def writeErrors(): Unit = {
      val tmp = Paths.get(s"$outDir/errors.json.tmp")
      Files.writeString(tmp,
        errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
      Files.move(tmp, Paths.get(s"$outDir/errors.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    writeErrors()
    queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[verify] $name failed: $msg")
        errors.put(name, msg)
        new java.io.File(s"$outDir/$name").mkdirs()
        Files.writeString(Paths.get(s"$outDir/$name/_ERROR.txt"), msg + "\n")
        writeErrors()
      }
    }
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query names (local iteration)
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = run(spark, sfDir, outDir,
      SparkEntry.queries, SparkEntry.oracleSql, only)
    spark.stop()
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
  }
}
