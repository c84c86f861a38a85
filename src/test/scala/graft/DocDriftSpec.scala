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
}
