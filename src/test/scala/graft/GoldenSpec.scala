package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.Golden

/** Golden-content gate (VERDICT r6 #2): the deterministic queries the
  * DuckDB oracle cannot express are pinned to committed content hashes
  * (GOLDEN.json) so a silent content regression cannot hide behind the
  * driver's rows>0 check. Hash semantics mirror the oracle compare:
  * columns sorted by name, rows sorted, values hashed — layout and
  * partition order never matter, only content.
  *
  * On an INTENDED semantic change, regenerate and review the diff:
  *   sbt "runMain graft.tools.Golden /root/testdata/sf0.001 GOLDEN.json"
  */
class GoldenSpec extends AnyFunSuite with SparkSuite {

  private lazy val golden: Map[String, (String, Long)] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("GOLDEN.json")), "UTF-8")
    val entry = """"([a-z0-9_]+)":\s*\{"sha256":\s*"([0-9a-f]{64})",\s*"rows":\s*(\d+)\}""".r
    entry.findAllMatchIn(text).map(m =>
      m.group(1) -> (m.group(2), m.group(3).toLong)).toMap
  }

  test("GOLDEN.json covers exactly the declared deterministic no-oracle queries") {
    assert(golden.keySet == Golden.targets.toSet,
      s"drift between GOLDEN.json and Golden.targets: " +
        s"missing=${Golden.targets.toSet -- golden.keySet} extra=${golden.keySet -- Golden.targets.toSet}")
  }

  Golden.targets.foreach { name =>
    test(s"golden content: $name") {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val (wantHash, wantRows) = golden(name)
      val gotRows = df.count()
      assert(gotRows == wantRows, s"$name row count drifted: $gotRows != $wantRows")
      val gotHash = Golden.contentHash(df)
      assert(gotHash == wantHash,
        s"$name content hash drifted — if the change is intended, regenerate GOLDEN.json")
    }
  }
}
