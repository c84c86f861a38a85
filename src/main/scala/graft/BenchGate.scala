package graft

/** Gate-drift math shared by [[Bench]] (runtime early warnings) and
  * `BenchGateSpec` (unit tests), mirroring `tools/bench_gate.py`.
  *
  * Single source of truth for every number is BASELINE.md's
  * machine-readable `<!-- bench-gate: k=v ... -->` anchor — the warn
  * text quotes `max_ratio` from there instead of hard-coding a
  * threshold (VERDICT r13 item 2: the old warn said "trips at 2x"
  * while the machine gate tripped at 1.8×, and covered only the
  * per-query mean and core82).
  *
  * Gated signals (derivation in BASELINE.md "Per-query gate
  * derivation" + "Stream-cert gate re-derivation"): the BATCH
  * per-query mean (total minus the micro-batch stream-certification
  * rows, over the non-cert count) vs the round-4 driver row, and
  * every frozen-subset total vs its freeze — including `stream16`,
  * the frozen-membership stream-certification subtotal (s7–s22,
  * round-15 re-derivation: the old all-rows per-row MEAN moved for
  * mix reasons whenever a heavy certification row registered, so it
  * is informational only now). Stream-certification membership is BY
  * RULE (`s<K>_…`, K ≥ 7), not a hand list — round 13's hand list
  * silently omitted s19–s21.
  */
object BenchGate {

  /** s1–s6 are light single-drain streams that existed in the round-4
    * baseline mix and stay inside the batch mean; s7+ are the real
    * checkpointed micro-batch certifications with a per-batch planning
    * floor. Mirrors STREAM_CERT_MIN_ID in tools/bench_gate.py. */
  val streamCertMinId = 7
  private val StreamCertRe = "^s(\\d+)_.*".r

  def isStreamCert(name: String): Boolean = name match {
    case StreamCertRe(id) => id.toInt >= streamCertMinId
    case _                => false
  }

  /** FROZEN membership of the gated stream-certification subtotal:
    * s7–s22, the 16 micro-batch rows of the round-14 registry, frozen
    * at the round-14 driver artifact (BASELINE.md round-15
    * re-derivation). s23+ land OUTSIDE it — this bound never moves,
    * exactly as core192's membership never moves. */
  val stream16MaxId = 22

  def isStream16(name: String): Boolean = name match {
    case StreamCertRe(id) =>
      id.toInt >= streamCertMinId && id.toInt <= stream16MaxId
    case _ => false
  }

  /** FROZEN membership of the round-15 stream-certification subtotal:
    * s7–s24, the 18 micro-batch rows of the round-15 registry, frozen
    * at the round-15 driver artifact (BASELINE.md "stream18 freeze").
    * Nested over stream16 exactly as core153 nests core82; s25+ land
    * OUTSIDE it. */
  val stream18MaxId = 24

  def isStream18(name: String): Boolean = name match {
    case StreamCertRe(id) =>
      id.toInt >= streamCertMinId && id.toInt <= stream18MaxId
    case _ => false
  }

  /** Parse the bench-gate anchor out of BASELINE.md text. None when
    * the anchor comment is absent (a clean checkout must still bench)
    * OR malformed (a stray non-`k=v` token, a non-numeric value): the
    * only consumer is the warn-only path, whose contract is "never
    * throws" — a broken anchor degrades to "warns skipped", and the
    * authoritative python gate fails loudly on the same text. */
  def parseAnchor(md: String): Option[Map[String, Double]] = {
    val re = "(?s)<!--\\s*bench-gate:\\s*(.*?)\\s*-->".r
    re.findFirstMatchIn(md).flatMap { m =>
      try Some(m.group(1).trim.split("\\s+").iterator.map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> v.toDouble
      }.toMap)
      catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** One gated signal: measured value against its anchor baseline. */
  final case class Signal(name: String, measured: Double, baseline: Double) {
    def ratio: Double = measured / baseline
  }

  /** Assemble every gated signal from a bench run.
    *
    * @param queries per-query best times (negative = errored, excluded
    *                upstream — pass only valid times)
    * @param subsets (name, total, n, expectedN) per frozen subset; a
    *                partial subset (n != expectedN) is skipped here —
    *                the python gate fails it outright, the runtime warn
    *                cannot say anything comparable about it
    */
  def signals(
      queries: Map[String, Double],
      total: Double,
      subsets: Seq[(String, Double, Int, Int)],
      anchor: Map[String, Double]): Seq[Signal] = {
    val streamTotal = queries.collect { case (k, v) if isStreamCert(k) => v }.sum
    val nStream = queries.count(kv => isStreamCert(kv._1))
    val nBatch = queries.size - nStream
    // Round-17 re-derivation (BASELINE.md "batch187 freeze", after the
    // round-16 DNF): once a run carries a COMPLETE batch187 frozen
    // subtotal with an anchor freeze, the mix-sensitive all-rows batch
    // mean is informational only — new batch certification rows land
    // outside the freeze and can no longer move a gated signal for mix
    // reasons (the same rule that retired the stream-cert mean in
    // round 15). Without the subtotal (historical artifacts), the mean
    // stays gated as before.
    val batch187Gated = subsets.exists { case (n, _, cnt, exp) =>
      n == "batch187" && cnt == exp } && anchor.contains("batch187_freeze_s")
    val batch =
      if (!batch187Gated && nBatch > 0 &&
          anchor.contains("baseline_per_query_s"))
        Seq(Signal("batch mean", (total - streamTotal) / nBatch,
          anchor("baseline_per_query_s")))
      else Nil
    // The stream-cert population is gated via the frozen-membership
    // stream16 subtotal, passed in `subsets` like every coreNN freeze
    // (round-15 re-derivation — the all-rows per-row mean was
    // mix-sensitive and is informational only now).
    val subs = subsets.collect {
      case (name, tot, n, expected)
          if n == expected && anchor.contains(s"${name}_freeze_s") =>
        Signal(s"${name}_total", tot, anchor(s"${name}_freeze_s"))
    }
    batch ++ subs
  }

  /** Early-warning lines: fire at `warnFrac × max_ratio` (default 0.9 —
    * BEFORE the machine gate trips, VERDICT r13 item 2) and escalate to
    * a TRIPPING line at `max_ratio` itself. Empty when everything has
    * headroom. */
  def warnings(
      queries: Map[String, Double],
      total: Double,
      subsets: Seq[(String, Double, Int, Int)],
      anchor: Map[String, Double],
      warnFrac: Double = 0.9): Seq[String] = {
    val maxRatio = anchor.getOrElse("max_ratio", 1.8)
    signals(queries, total, subsets, anchor).flatMap { s =>
      if (s.ratio > maxRatio) Some(
        f"[bench][gate-warn] ${s.name} ${s.measured}%.3f s is ${s.ratio}%.2fx " +
          f"its ${s.baseline}%.3f baseline — TRIPPING the ${maxRatio}x machine " +
          "gate (tools/bench_gate.py / BenchGateSpec will fail)")
      else if (s.ratio > warnFrac * maxRatio) Some(
        f"[bench][gate-warn] ${s.name} ${s.measured}%.3f s is ${s.ratio}%.2fx " +
          f"its ${s.baseline}%.3f baseline — within ${(1 - warnFrac) * 100}%.0f%% " +
          f"of the ${maxRatio}x machine gate")
      else None
    }
  }
}
