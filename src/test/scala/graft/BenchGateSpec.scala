package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The 2× gate-math check (VERDICT r8 item 7 / r9 item 3), in `sbt test`:
  * `tools/bench_gate.py` reads the COMMITTED full-precision bench
  * artifact (`git show HEAD:bench.json` — round 18, VERDICT r17 item 2:
  * the r17 driver left its killed partial artifact in the WORKING TREE
  * and the two committed-artifact tests were the suite's only reds;
  * the suite certifies gate SEMANTICS, never the box's last hour) and
  * BASELINE.md's machine-readable authoritative row (the `bench-gate`
  * HTML comment), and fails at >1.8× — per-query mean vs the round-4
  * driver baseline, and the frozen-subset totals (core82, core153) vs
  * their freeze values. The second test proves the gate actually trips
  * by poisoning the measured values 10×. Cancels (not passes) when the
  * committed artifact or python3 is absent, so a clean checkout
  * without a bench run stays green honestly. */
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

  /** The COMMITTED content of a repo file (`git show HEAD:path`),
    * extracted to `target/gate-fixtures/` so the python gate can read
    * it by path. None when git or the committed file is unavailable —
    * the tests assume-cancel then, exactly like the old missing-file
    * path. */
  private def committedFile(path: String): Option[java.nio.file.Path] =
    try {
      val p = new ProcessBuilder("git", "show", s"HEAD:$path").start()
      val out = p.getInputStream.readAllBytes()
      if (p.waitFor() != 0 || out.isEmpty) None
      else {
        val dir = Paths.get("target", "gate-fixtures")
        Files.createDirectories(dir)
        val f = dir.resolve(path.replace('/', '_'))
        Files.write(f, out)
        Some(f)
      }
    } catch { case _: java.io.IOException => None }

  private lazy val committedBench = committedFile("bench.json")
  private lazy val committedMd = committedFile("BASELINE.md")

  private def preconditions(): Unit = {
    assume(committedBench.isDefined, "no committed bench.json artifact")
    assume(committedMd.isDefined, "no committed BASELINE.md")
    assume(
      try {
        new ProcessBuilder("python3", "--version").start().waitFor() == 0
      } catch { case _: java.io.IOException => false },
      "python3 not available")
  }

  test("bench gate passes on the committed artifact") {
    preconditions()
    assert(run(committedBench.get.toString, committedMd.get.toString) === 0,
      "bench gate failed on the committed bench.json — per-query or " +
        "frozen-subset total exceeded 1.8x its baseline")
  }

  test("bench gate trips on a 10x-poisoned artifact (self-test)") {
    preconditions()
    assert(run("--poison", "10", committedBench.get.toString,
        committedMd.get.toString) === 1,
      "poisoned values did not trip the gate — the check is vacuous")
  }

  // ---- BenchGate (the Scala warn twin of the python gate) ----------

  private val anchor = Map(
    "baseline_per_query_s" -> 0.5, "stream_cert_per_row_s" -> 2.0,
    "core82_freeze_s" -> 40.0, "max_ratio" -> 1.8)

  test("BenchGate warn fires on a poisoned artifact, quoting max_ratio") {
    // batch mean = (20 - 8) / 4 = 3.0 s vs 0.5 baseline → 6.0x: TRIPPING.
    val qs = Map("q1_a" -> 1.0, "q2_b" -> 1.0, "d1_c" -> 5.0, "e1_d" -> 5.0,
      "s7_e" -> 5.0, "s19_f" -> 3.0)
    val warns = BenchGate.warnings(qs, 20.0, Nil, anchor)
    assert(warns.exists(w => w.contains("batch mean") && w.contains("TRIPPING")),
      s"no tripping batch-mean warn in: $warns")
    assert(warns.forall(_.contains("1.8x")),
      s"warn text must quote max_ratio from the anchor: $warns")
  }

  test("BenchGate warns BEFORE the gate trips (90% of max_ratio)") {
    // batch mean = 0.85 s vs 0.5 → 1.70x: over 0.9*1.8=1.62, under 1.8.
    val qs = Map("q1_a" -> 0.85, "q2_b" -> 0.85)
    val warns = BenchGate.warnings(qs, 1.7, Nil, anchor)
    assert(warns.exists(w => w.contains("batch mean") && !w.contains("TRIPPING")),
      s"expected a pre-trip warn: $warns")
  }

  test("BenchGate covers the stream16 freeze and every frozen subset") {
    // stream16 subtotal poisoned to 30 vs its 10 freeze → 3.0x
    // TRIPPING; core82 poisoned to 80 vs 40 freeze → 2.0x TRIPPING; a
    // partial subset (n != expected) must stay silent, not mis-warn.
    // (The all-rows stream-cert MEAN is informational only since the
    // round-15 re-derivation — it must NOT warn.)
    val qs = Map("q1_a" -> 0.1, "s7_e" -> 6.0, "s21_f" -> 2.0)
    val a16 = anchor + ("stream16_freeze_s" -> 10.0)
    val subsets = Seq(("core82", 80.0, 82, 82), ("core153", 999.0, 150, 153),
      ("stream16", 30.0, 16, 16))
    val warns = BenchGate.warnings(qs, 8.1, subsets, a16)
    assert(warns.exists(w => w.contains("stream16_total") && w.contains("TRIPPING")))
    assert(warns.exists(w => w.contains("core82_total") && w.contains("TRIPPING")))
    assert(!warns.exists(_.contains("core153")), s"partial subset mis-warned: $warns")
    assert(!warns.exists(_.contains("stream-cert mean")),
      s"mix-sensitive stream mean must not warn since round 15: $warns")
  }

  test("BenchGate stream16 membership is frozen at s7..s22") {
    assert(BenchGate.isStream16("s7_stream_incr_dedup"))
    assert(BenchGate.isStream16("s22_stream_retract"))
    assert(!BenchGate.isStream16("s6_gap_detect"))
    assert(!BenchGate.isStream16("s23_stream_phash_retract"),
      "post-freeze streaming rows must land OUTSIDE the frozen subtotal")
    assert(!BenchGate.isStream16("q55_triangle_census"))
  }

  test("BenchGate batch187 freeze: a complete batch187 subset retires " +
      "the mix-sensitive batch mean; a partial one keeps it gated " +
      "(round-17 re-derivation after the r16 DNF)") {
    val a187 = anchor + ("batch187_freeze_s" -> 10.0)
    // batch mean would be 3.0x (TRIPPING) — but the frozen subtotal is
    // green, and with a COMPLETE batch187 subset present the mean must
    // be informational, so nothing warns.
    val qs = Map("q1_a" -> 1.5, "q2_b" -> 1.5)
    val complete = Seq(("batch187", 3.0, 187, 187))
    assert(BenchGate.warnings(qs, 3.0, complete, a187).isEmpty,
      "a green frozen batch subtotal must retire the mix-sensitive mean")
    // the frozen subtotal itself still trips when red
    val red = Seq(("batch187", 30.0, 187, 187))
    assert(BenchGate.warnings(qs, 3.0, red, a187)
        .exists(w => w.contains("batch187_total") && w.contains("TRIPPING")))
    // a PARTIAL subset (a member errored) is not comparable — the mean
    // stays gated, exactly the core82_n rule
    val partial = Seq(("batch187", 3.0, 180, 187))
    assert(BenchGate.warnings(qs, 3.0, partial, a187)
        .exists(w => w.contains("batch mean") && w.contains("TRIPPING")),
      "a partial batch187 subset must fall back to the gated mean")
    // and an anchor without the freeze key keeps the historical rule
    assert(BenchGate.warnings(qs, 3.0, complete, anchor)
        .exists(w => w.contains("batch mean") && w.contains("TRIPPING")))
  }

  test("BenchGate is quiet when everything has headroom") {
    val qs = Map("q1_a" -> 0.4, "s7_e" -> 1.5)
    assert(BenchGate.warnings(qs, 1.9, Seq(("core82", 30.0, 82, 82)), anchor).isEmpty)
  }

  test("BenchGate stream-cert membership is by rule: s7+ yes, s1-s6/q/d no") {
    assert(BenchGate.isStreamCert("s7_stream_incr_dedup"))
    assert(BenchGate.isStreamCert("s19_crash_recovery"))
    assert(BenchGate.isStreamCert("s21_stream_video_dedup"))
    assert(!BenchGate.isStreamCert("s1_event_deltas"))
    assert(!BenchGate.isStreamCert("s6_gap_detect"))
    assert(!BenchGate.isStreamCert("q55_triangle_census"))
    assert(!BenchGate.isStreamCert("d7_minhash_lsh"))
  }

  test("BenchGate.parseAnchor reads BASELINE.md's authoritative row") {
    preconditions()
    val md = Files.readString(committedMd.get)
    val a = BenchGate.parseAnchor(md).getOrElse(fail("no bench-gate anchor"))
    // The Scala warn and the python gate must read the SAME numbers.
    assert(a.contains("baseline_per_query_s") && a.contains("stream_cert_per_row_s")
      && a.contains("max_ratio") && a.contains("core192_freeze_s"))
    assert(a("max_ratio") === 1.8)
  }

  test("BenchGate.parseAnchor is total: a malformed anchor degrades to " +
    "None (the warn path's never-throws contract), never an exception") {
    // stray token without '='
    assert(BenchGate.parseAnchor(
      "<!-- bench-gate: max_ratio=1.8 stray -->").isEmpty)
    // non-numeric value
    assert(BenchGate.parseAnchor(
      "<!-- bench-gate: max_ratio=1.8x -->").isEmpty)
    // absent anchor
    assert(BenchGate.parseAnchor("no anchor here").isEmpty)
    // a well-formed anchor still parses
    assert(BenchGate.parseAnchor(
      "<!-- bench-gate: a=1 b=2.5 -->").contains(Map("a" -> 1.0, "b" -> 2.5)))
  }

  test("BenchGate agrees with the python gate on the committed artifact") {
    preconditions()
    // Parse bench.json minimally (flat JSON, numeric fields + queries map).
    val txt = Files.readString(committedBench.get)
    val qre = """"queries":\{(.*?)\}""".r
    val qs = qre.findFirstMatchIn(txt).map(_.group(1)).getOrElse(fail("no queries"))
      .split(",").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.replaceAll("\"", "") -> v.toDouble
      }.filter(_._2 >= 0).toMap
    def num(field: String): Double =
      (s""""$field":([-0-9.eE]+)""".r).findFirstMatchIn(txt)
        .map(_.group(1).toDouble).getOrElse(fail(s"no $field"))
    val md = Files.readString(committedMd.get)
    val a = BenchGate.parseAnchor(md).getOrElse(fail("no anchor"))
    val subsets = Seq(82, 153, 158, 167, 192).flatMap { n =>
      try Seq((s"core$n", num(s"core${n}_total"), num(s"core${n}_n").toInt, n))
      catch { case _: org.scalatest.exceptions.TestFailedException => Nil }
    } ++ {
      try Seq(("stream16", num("stream16_total"), num("stream16_n").toInt, 16))
      catch { case _: org.scalatest.exceptions.TestFailedException => Nil }
    }
    val warns = BenchGate.warnings(qs, num("value"), subsets, a)
    // The python gate passes on the committed artifact (first test above),
    // so the Scala twin must see no TRIPPING signal either.
    assert(!warns.exists(_.contains("TRIPPING")), s"scala/python gate disagree: $warns")
  }
}
