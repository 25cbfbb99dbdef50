package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The correctness-dump harness itself: a failing query must leave a
  * visible error marker in the artifact (r4 regression: 21 broken
  * queries silently vanished from the round's denominator because a
  * throw left no output at all). */
class VerifySpec extends AnyFunSuite with SparkSuite {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_verify_").toString

  test("a failing query writes _ERROR.txt and lands in errors.json; good queries still dump") {
    val out = tmp()
    val good: (SparkSession, String) => DataFrame =
      (s, dir) => Tables.load(s, dir, "region")
    val bad: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("deliberately broken")
    val errors = Verify.run(spark, sf0001, out,
      queries = scala.collection.immutable.ListMap("good_q" -> good, "bad_q" -> bad),
      oracleSql = Map("good_q" -> "SELECT * FROM region ORDER BY r_regionkey"))
    assert(errors.keySet == Set("bad_q"))
    assert(errors("bad_q").contains("deliberately broken"))
    // artifact shape: the driver can see the failure without our stderr
    val marker = new java.io.File(s"$out/bad_q/_ERROR.txt")
    assert(marker.isFile)
    assert(java.nio.file.Files.readString(marker.toPath).contains("deliberately broken"))
    val errJson = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/errors.json"))
    assert(errJson.contains("\"bad_q\"") && errJson.contains("deliberately broken"))
    // the good query's parquet and the oracle sidecar are unaffected
    assert(spark.read.parquet(s"$out/good_q").count() ==
      Tables.load(spark, sf0001, "region").count())
    val oracle = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    assert(oracle.contains("\"good_q\""))
  }

  test("a clean run writes an empty errors.json (the driver can rely on its presence)") {
    val out = tmp()
    val good: (SparkSession, String) => DataFrame =
      (s, dir) => Tables.load(s, dir, "nation")
    val errors = Verify.run(spark, sf0001, out,
      queries = Map("n_q" -> good), oracleSql = Map.empty)
    assert(errors.isEmpty)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json")) == "{}")
  }

  test("error messages with quotes/newlines stay valid JSON") {
    val out = tmp()
    val bad: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("line1\nline2 \"quoted\" \t tab")
    Verify.run(spark, sf0001, out, queries = Map("bad_q" -> bad), oracleSql = Map.empty)
    val errJson = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/errors.json"))
    // escaped, single-line, and the original content round-trips
    assert(!errJson.contains("\n"))
    assert(errJson.contains("\\n") && errJson.contains("\\\"quoted\\\"") && errJson.contains("\\t"))
  }
}
