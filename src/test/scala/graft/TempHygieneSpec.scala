package graft

/** /tmp residue gate (VERDICT r14 item 2): the judge box accumulated
  * hundreds of leaked `graft_*` dirs (~0.7 GB) per session from gate
  * queries and spec scaffolding — on a tmpfs-backed /tmp that residue
  * is memory pressure mid-bench, a residency suspect for in-session
  * inflation. This spec runs the leak-prone paths and asserts they
  * leave NOTHING behind beyond the dirs [[SparkSpec.tmpDir]] tracks
  * (those die at JVM exit by contract, via its shutdown hook):
  *
  *  - a real checkpointed streaming gate (s7 — scoped checkpoint dir
  *    AND scoped artifact dir, both owned by withStateParallelism's
  *    finally since round 15);
  *  - the format-roundtrip gate (q44 — pid-keyed layout dirs now
  *    registered for exit deletion, reused across bench reps, so they
  *    are asserted REGISTERED rather than already gone).
  */
class TempHygieneSpec extends SparkSpec {

  private def graftTmp(): Set[String] = {
    // scan BOTH scratch bases: round 19 moved gate scratch to
    // TmpHygiene.scratchBase (tmpfs when available), and a spec that
    // kept scanning only java.io.tmpdir would pass vacuously on any
    // box with writable /dev/shm — the exact leak class this gate
    // exists for would be ungated.
    Seq(System.getProperty("java.io.tmpdir"), TmpHygiene.scratchBase)
      .distinct
      .flatMap { base =>
        Option(new java.io.File(base).listFiles())
          .getOrElse(Array.empty[java.io.File])
          .map(_.getAbsolutePath).filter(_.contains("/graft_"))
      }.toSet
  }

  test("a streaming gate row leaves zero /tmp residue") {
    val before = graftTmp()
    val out = SparkEntry.queries("s7_stream_incr_dedup")(spark, sf())
    assert(out.count() >= 0)
    val leaked = (graftTmp() -- before) -- SparkSpec.liveTmpDirs
    assert(leaked.isEmpty,
      s"streaming gate leaked temp dirs: ${leaked.mkString(", ")}")
  }

  test("format-roundtrip gate dirs are registered for exit deletion") {
    val before = graftTmp()
    assert(SparkEntry.queries("q44_text_roundtrip")(spark, sf()).count() > 0)
    // q44's pid-keyed dir survives the query BY DESIGN (bench reps
    // reuse it); the hygiene contract is that it is REGISTERED in the
    // shared exit-deletion registry (dies with this JVM), and that
    // nothing new escaped registration.
    val pid = ProcessHandle.current().pid()
    assert(TmpHygiene.registered
        .exists(d => d.contains("graft_q44") && d.endsWith(s"_p$pid")),
      "q44's layout dir is not registered for exit deletion")
    val leaked = graftTmp() -- before -- TmpHygiene.registered
    assert(leaked.isEmpty,
      s"q44 left unregistered residue: ${leaked.mkString(", ")}")
  }
}
