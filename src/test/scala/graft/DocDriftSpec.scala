package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the hand-written query-id enumerations honest (VERDICT r9
  * item 5): `tools/doc_drift.py` extracts the registry from the
  * `QueryDef` registrations, expands README/SURVEY id ranges, and fails
  * on a registry id README never mentions or an id either doc mentions
  * that the registry doesn't have. */
class DocDriftSpec extends AnyFunSuite {

  test("README/SURVEY query-id lists match the QueryDef registry") {
    assume(Files.exists(Paths.get("tools/doc_drift.py")), "no tools/doc_drift.py")
    assume(
      try {
        new ProcessBuilder("python3", "--version").start().waitFor() == 0
      } catch { case _: java.io.IOException => false },
      "python3 not available")
    val pb = new ProcessBuilder("python3", "tools/doc_drift.py")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    info(out)
    assert(rc === 0, s"doc drift detected:\n$out")
  }

  test("SURVEY.md count claim matches the compiled registry (r13 item 3)") {
    // The python tool checks the registered-query count from the QueryDef
    // regex; this test is the stronger twin with the COMPILED registry in
    // hand — both numbers in the prose claim must be exact.
    assume(Files.exists(Paths.get("SURVEY.md")), "no SURVEY.md")
    val text = Files.readString(Paths.get("SURVEY.md"))
    val claim = """\*\*(\d+) registered queries, (\d+) with DuckDB oracles""".r
    val ms = claim.findAllMatchIn(text).toSeq
    assert(ms.nonEmpty, "SURVEY.md lost its count claim — doc_drift.py " +
      "cross-checks it, keep the '**N registered queries, M with DuckDB " +
      "oracles' phrasing")
    ms.foreach { m =>
      assert(m.group(1).toInt === SparkEntry.queries.size,
        s"SURVEY.md claims ${m.group(1)} registered queries; " +
          s"SparkEntry.queries has ${SparkEntry.queries.size}")
      assert(m.group(2).toInt === SparkEntry.oracleSql.size,
        s"SURVEY.md claims ${m.group(2)} oracle-backed queries; " +
          s"SparkEntry.oracleSql has ${SparkEntry.oracleSql.size}")
    }
  }
}
