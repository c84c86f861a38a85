package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The 2× gate-math check (VERDICT r8 item 7 / r9 item 3), in `sbt test`:
  * `tools/bench_gate.py` reads the committed full-precision bench
  * artifact (`bench.json`) and BASELINE.md's machine-readable
  * authoritative row (the `bench-gate` HTML comment), and fails at
  * >1.8× — per-query mean vs the round-4 driver baseline, and the
  * frozen-subset totals (core82, core153) vs their freeze values. The
  * second test proves the gate actually trips by poisoning the measured
  * values 10×. Cancels (not passes) when the artifact or python3 is
  * absent, so a clean checkout without a bench run stays green honestly. */
class BenchGateSpec extends AnyFunSuite {

  private def run(args: String*): Int = {
    val cmd = Seq("python3", "tools/bench_gate.py") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    info(s"bench_gate ${args.mkString(" ")} -> rc=$rc\n$out")
    rc
  }

  private def preconditions(): Unit = {
    assume(Files.exists(Paths.get("bench.json")), "no bench.json artifact")
    assume(Files.exists(Paths.get("BASELINE.md")), "no BASELINE.md")
    assume(
      try {
        new ProcessBuilder("python3", "--version").start().waitFor() == 0
      } catch { case _: java.io.IOException => false },
      "python3 not available")
  }

  test("bench gate passes on the committed artifact") {
    preconditions()
    assert(run() === 0, "bench gate failed on the real bench.json — " +
      "per-query or frozen-subset total exceeded 1.8x its baseline")
  }

  test("bench gate trips on a 10x-poisoned artifact (self-test)") {
    preconditions()
    assert(run("--poison", "10") === 1,
      "poisoned values did not trip the gate — the check is vacuous")
  }
}
