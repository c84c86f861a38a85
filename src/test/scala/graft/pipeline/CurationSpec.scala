package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Curation operators: contamination detection, repetition quality,
  * per-source quota caps. */
class CurationSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf(), "documents")

  test("contamination finds planted n-gram overlap, nothing else") {
    import spark.implicits._
    val evalSet = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight")).toDF(
      "doc_id", "text")
    val corpus = Seq(
      // shares exactly 3 shingles: "the quick brown fox jumps",
      // "quick brown fox jumps over", "brown fox jumps over the"
      (10L, "she saw the quick brown fox jumps over the fence"),
      // no 5-gram in common (shared words, different order)
      (11L, "dog lazy the over jumps fox brown quick the tonight"),
      // exact copy → every one of its shingles is shared
      (12L, "the quick brown fox jumps over the lazy dog tonight")).toDF(
      "doc_id", "text")
    val out = Curation.contamination(corpus, evalSet, "text", "doc_id")
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toSeq === Seq(10L -> 3L, 12L -> 6L))
  }

  test("repetitionStats: hand-computed per-mille scores and keep flag") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),          // no repeats: dup 0, top 250
      (2L, "a a a a b"),        // dup (5-2)*1000 div 5 = 600, top 800
      (3L, "x x y y")           // dup 500, top 500
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(df, "text", "doc_id",
        maxDupPm = 600, maxTopPm = 500)
      .orderBy("doc_id")
      .select("n_tokens", "n_distinct", "dup_pm", "top_pm", "keep")
      .collect().map(r => (0 to 4).map(r.getLong))
    assert(out(0) === Seq(4L, 4L, 0L, 250L, 1L))
    assert(out(1) === Seq(5L, 2L, 600L, 800L, 0L)) // top_pm over ceiling
    assert(out(2) === Seq(4L, 2L, 500L, 500L, 1L))
  }

  test("sourceQuota: exact cap per source, equals the window reference " +
    "form, stable under repartitioning") {
    val byQuota = Curation.sourceQuota(docs, "source", "doc_id", 7)
    val counts = byQuota.groupBy("source").count()
      .collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ == 7L)) // all strata ≥ 7 here

    // reference form: rank whole source by (bucket, key)
    val ranked = docs.withColumn("_rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(Sampling.hashBucket(col("doc_id"), 42L), col("doc_id"))))
      .filter(col("_rk") <= 7).drop("_rk")
    assert(byQuota.select("doc_id").exceptAll(ranked.select("doc_id"))
      .isEmpty)
    assert(ranked.select("doc_id").exceptAll(byQuota.select("doc_id"))
      .isEmpty)

    // physical layout must not change membership
    val again = Curation.sourceQuota(docs.repartition(13), "source",
      "doc_id", 7)
    assert(again.select("doc_id").exceptAll(byQuota.select("doc_id"))
      .isEmpty)

    // quota larger than every stratum keeps everything
    val all = Curation.sourceQuota(docs, "source", "doc_id", 1000000)
    assert(all.count() === docs.count())
  }

  test("mixBySource: per-source budgets honored exactly; absent sources " +
    "contribute nothing; oversized quotas cap at the stratum") {
    val quotas = Map("src0" -> 3L, "src1" -> 0L, "src2" -> 1000000L)
    val out = Curation.mixBySource(docs, "source", "doc_id", quotas)
    val bySource = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val src2Total = docs.filter(col("source") === "src2").count()
    assert(bySource === Map("src0" -> 3L, "src2" -> src2Total))
    // determinism: the kept set is a pure function of (quotas, seed, keys)
    val again = Curation.mixBySource(docs.repartition(7), "source",
      "doc_id", quotas)
    assert(again.select("doc_id").exceptAll(out.select("doc_id")).isEmpty)
  }

  test("incrementalPairs: increment pairs only against the corpus, " +
    "never the corpus against itself") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "one two three four five six seven"),
      (2L, "one two three four five six seven"), // corpus-internal dup
      (3L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "one two three four five six seven"), // dup of 1 and 2
      (101L, "nothing here resembles the archive at all")).toDF(
      "doc_id", "text")
    val out = Dedup.incrementalPairs(corpus, batch, "text", "doc_id")
      .orderBy("new_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // 100 matches corpus docs 1 and 2 at J=1; the 1↔2 corpus-internal
    // pair must NOT appear — incremental cost never re-pairs history
    assert(out.toSeq === Seq((100L, 1L, 1.0), (100L, 2L, 1.0)))
  }

  test("weightBudget: equals the single-window reference form; edge " +
    "budgets behave") {
    import org.apache.spark.sql.expressions.Window
    val stats = Curation.repetitionStats(docs, "text", "doc_id")
      .select("doc_id", "n_tokens", "dup_pm")
    def reference(budget: Long) = stats
      .withColumn("_cum", sum(col("n_tokens")).over(
        Window.orderBy(col("dup_pm"),
          Sampling.hashBucket(col("doc_id"), 42L), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("_cum") <= budget).drop("_cum")
    Seq(0L, 500L, 5000L, 1000000L).foreach { budget =>
      val twoPhase = Sampling.weightBudget(stats, "dup_pm", "doc_id",
        "n_tokens", budget)
      val ref = reference(budget)
      assert(twoPhase.select("doc_id").exceptAll(ref.select("doc_id"))
          .isEmpty &&
        ref.select("doc_id").exceptAll(twoPhase.select("doc_id")).isEmpty,
        s"two-phase != reference at budget=$budget")
    }
    // budget 0 keeps nothing; budget >= total keeps everything
    assert(Sampling.weightBudget(stats, "dup_pm", "doc_id", "n_tokens", 0L)
      .count() === 0)
    assert(Sampling.weightBudget(stats, "dup_pm", "doc_id", "n_tokens",
      1000000L).count() === stats.count())
    // the spent budget is within one document of the target
    val sel = Sampling.weightBudget(stats, "dup_pm", "doc_id", "n_tokens",
      5000L)
    val spent = sel.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(spent <= 5000L, s"overspent: $spent")
  }

  test("incrementalPairsFromIndex rejects an index built with another k") {
    import spark.implicits._
    val corpus = Seq((1L, "one two three four five six")).toDF(
      "doc_id", "text")
    val idx = Dedup.hashedShingleIndex(corpus, "text", "doc_id", k = 5)
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalPairsFromIndex(idx, corpus, "text", "doc_id", k = 4)
    }
    // hashes over different shingle widths never match — this must be a
    // loud failure, not a silent zero-pair result
    assert(e.getMessage.contains("k=4"))
  }

  test("dupShingleStats: hand-computed duplicate-shingle fractions") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f"),      // shingles: abcde, bcdef
      (2L, "a b c d e x"),      // shingles: abcde, bcdex → shares abcde
      (3L, "p q r s t u")       // shingles: pqrst, qrstu → unique
    ).toDF("doc_id", "text")
    val out = Curation.dupShingleStats(df, "text", "doc_id")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, 500L), (2L, 2L, 1L, 500L), (3L, 2L, 0L, 0L)))
  }

  test("piiScrub: counts and ordered redaction, hand-computed") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@sub.example.org now"),
      (2L, "host 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call 555-0199 or 555-0200"),
      // all three kinds in one document; the email's digits must not be
      // re-matched by the phone pattern after redaction
      (4L, "a1@b.co at 1.2.3.4 tel 123-4567"),
      (5L, "nothing to see here")).toDF("doc_id", "text")
    val out = Curation.piiScrub(df, "text", "doc_id").orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out(0) === ((1L, 1L, 0L, 0L,
      "mail <EMAIL> now")))
    assert(out(1) === ((2L, 0L, 2L, 0L, "host <IP> and <IP> up")))
    assert(out(2) === ((3L, 0L, 0L, 2L, "call <PHONE> or <PHONE>")))
    assert(out(3) === ((4L, 1L, 1L, 1L, "<EMAIL> at <IP> tel <PHONE>")))
    assert(out(4) === ((5L, 0L, 0L, 0L, "nothing to see here")))
  }

  test("lineDedup: boilerplate lines dropped, order kept, empty docs kept") {
    import spark.implicits._
    val df = Seq(
      (1L, "keep me one\nCOOKIE BANNER\nkeep me two"),
      (2L, "COOKIE BANNER\nunique middle\nFOOTER"),
      (3L, "FOOTER\nCOOKIE BANNER"), // everything boilerplate → empty
      (4L, "only\n\nlines here")     // blank line dropped from the count
    ).toDF("doc_id", "text")
    val out = Curation.lineDedup(df, "text", "doc_id", minDocs = 2)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out(0) === ((1L, 3L, 2L, 1L, "keep me one\nkeep me two")))
    assert(out(1) === ((2L, 3L, 1L, 2L, "unique middle")))
    assert(out(2) === ((3L, 2L, 0L, 2L, "")))
    assert(out(3) === ((4L, 2L, 2L, 0L, "only\nlines here")))
  }

  test("bm25Rank: hand-computed score, absent-term docs dropped, ordering") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark spark data"), // tf=2, dl=3
      (2L, "spark data data"),  // tf=1, dl=3
      (3L, "data data data"),   // tf=0 → dropped
      (4L, "spark")             // tf=1, dl=1
    ).toDF("doc_id", "text")
    val out = Curation.bm25Rank(df, "text", "doc_id", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=4, df=3, avgdl=2.5; idf = ln(1 + 1.5/3.5)
    val idf = math.log(1.0 + 1.5 / 3.5)
    def s(tf: Double, dl: Double): Double =
      BigDecimal(idf * tf * 2.25 / (tf + 1.25 * (0.25 + 0.75 * dl / 2.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Map(1L -> s(2, 3), 2L -> s(1, 3), 4L -> s(1, 1)))
    // shorter doc outranks longer at equal tf; at equal length higher tf
    // wins (tf=2/dl=3 does NOT beat tf=1/dl=1 — length normalization
    // outweighs the saturated second occurrence, by design)
    assert(out(4L) > out(2L) && out(1L) > out(2L))
  }

  test("fuzzyTokenJoin: all edit kinds found, distance-3 candidates " +
      "rejected, no cartesian product in the plan") {
    import spark.implicits._
    val left = Seq("cat", "stream", "ab", "x", "kernel").toDF("tok")
    val right = Seq(
      "cbt",     // substitution: dist 1
      "cart",    // insertion into cat: dist 2 from "cat"? no — 1
      "steam",   // deletion from stream: dist 1
      "ba",      // transposition of ab: dist 2 (plain levenshtein)
      "xyz",     // dist 2 from x
      "colonel", // dist 4 from kernel — must NOT appear
      "cat"      // equal — must NOT appear
    ).toDF("tok")
    val out = Curation.fuzzyTokenJoin(left, right, "tok")
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join fell back to a cross join:\n$p")
    val pairs = out.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // the SymSpell path must equal the brute-force cross join exactly —
    // candidate generation may only add work, never lose a pair
    val ref = left.crossJoin(right.withColumnRenamed("tok", "tok_b"))
      .select(col("tok").as("tok_a"), col("tok_b"),
        levenshtein(col("tok"), col("tok_b")).as("dist"))
      .filter(col("dist") <= 2 && col("tok_a") =!= col("tok_b"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(pairs === ref)
    // every edit kind represented; the dist-3/4 decoys rejected
    assert(pairs.contains(("cat", "cbt", 1)))    // substitution
    assert(pairs.contains(("cat", "cart", 1)))   // insertion
    assert(pairs.contains(("stream", "steam", 1))) // deletion
    assert(pairs.contains(("ab", "ba", 2)))      // transposition = 2 subs
    assert(!pairs.exists(p => p._2 == "colonel"))
    assert(!pairs.exists(p => p._1 == "cat" && p._2 == "cat"))
  }

  test("linearQualityScore: bounded, deterministic, single-token docs " +
      "score exactly sigmoid(w)") {
    import spark.implicits._
    val df = Seq((1L, "alpha"), (2L, "alpha alpha"), (3L, "beta"),
      (4L, "")).toDF("doc_id", "text")
    val out = Curation.linearQualityScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2)))
      .toMap
    assert(!out.contains(4L)) // empty doc dropped, not NaN-scored
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out.values.forall { case (s, _) => s > 0 && s < 1 })
    // mean over tokens: a doc repeating one token scores as the token
    assert(out(1L) === out(2L))
    // keep flag consistent with the 0.5 threshold on the rounded score
    assert(out.values.forall { case (s, k) => (s >= 0.5) === (k == 1) })
  }

  test("unigramSurprisal: hand-computed mean nats on a tiny corpus") {
    import spark.implicits._
    // corpus counts: a=3, b=2, c=1 of 6 total
    val df = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Curation.unigramSurprisal(df, "text", "doc_id", 1.0)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toMap
    def lp(c: Int): Double =
      BigDecimal(math.log(c / 6.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    def mean(cs: Int*): Double =
      BigDecimal(-cs.map(lp).sum / cs.length).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    val m1 = mean(3, 3, 2)
    assert(out(1L) === ((3L, m1, if (m1 <= 1.0) 1 else 0)))
    assert(out(2L)._2 === mean(3, 2, 1))
    // the rarer-token doc is strictly more surprising
    assert(out(2L)._2 > out(1L)._2)
  }

  test("sequencePack: invariant under bucket granularity, bins tight") {
    val d = docs.limit(200)
    def packed(chars: Int) =
      Curation.sequencePack(d, "text", "doc_id", budget = 256L,
          bucketChars = chars)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(4))).sortBy(_._1)
    val p1 = packed(1)
    val p2 = packed(2)
    // the prefix sum is a pure function of the data: 16 buckets and 256
    // buckets must produce the identical packing
    assert(p1.toSeq === p2.toSeq)
    // structural invariants: offsets inside the budget; straddle flag
    // consistent; total stream length conserved
    assert(p1.forall { case (_, _, _, off, _) => off >= 0 && off < 256 })
    assert(p1.forall { case (_, n, _, off, s) => (off + n > 256) === (s == 1) })
    val total = p1.map(_._2).sum
    val maxBin = p1.map(_._3).max
    assert(maxBin <= total / 256) // bin index bounded by stream length
    // start offsets reconstruct the stream: sorting by (bin, offset)
    // yields strictly increasing global positions bin*256 + offset
    val pos = p1.map(t => t._3 * 256 + t._4).sorted
    assert(pos.distinct.length === pos.length)
    assert(pos.zip(pos.tail).forall { case (a, b) => a < b })
  }

  test("bigramSurprisal matches an independently computed reference model") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "a dog sat")
    ).toDF("doc_id", "text")
    val texts = Map(1L -> "the cat sat", 2L -> "the cat ran",
      3L -> "a dog sat")
    // reference: same interpolated model computed with plain Scala math
    val allToks = texts.values.flatMap(_.split(" ")).toSeq
    val uni = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = allToks.size.toDouble
    val bis = texts.values.flatMap(t => t.split(" ").sliding(2))
      .map(a => (a(0), a(1))).toSeq
    val bc = bis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sc = bis.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def lpU(first: Boolean, w1: String, w2: String): Long =
      if (first) math.round(math.log(uni(w2) / total) * 1e6)
      else math.round(math.log(
        bc((w1, w2)).toDouble / sc(w1).toDouble * 0.75 +
          uni(w2) / total * 0.25) * 1e6)
    val expect = texts.map { case (id, t) =>
      val ws = t.split(" ")
      val lps = lpU(first = true, "", ws(0)) +:
        ws.sliding(2).map(a => lpU(first = false, a(0), a(1))).toSeq
      id -> (ws.length.toLong, -lps.sum / ws.length)
    }
    val got = Curation.bigramSurprisal(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    expect.foreach { case (id, (n, mu)) =>
      assert(got(id) === ((n, mu)), s"doc $id")
    }
    // repeated bigram "the cat" must make docs 1/2 less surprising than 3
    assert(got(1L)._2 < got(3L)._2 && got(2L)._2 < got(3L)._2)
  }

  test("substrDedup removes exactly the tokens covered by duplicated windows") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h"),             // shares "a b c d e" with doc 2
      (2L, "x y a b c d e z"),
      (3L, "p q r s t u p q r s t u"),     // within-doc repeat: fully covered
      (4L, "m n o dd ee ff"),              // unique: untouched
      (5L, "aa bb")                        // < k tokens: no windows, untouched
    ).toDF("doc_id", "text")
    val out = Curation.substrDedup(d, "text", "doc_id", k = 5, minCount = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // cross-doc: "a b c d e" occurs twice, covering p1-5 of doc 1 and
    // p3-7 of doc 2 — exactly 5 tokens removed from each
    assert(out(1L) === ((8L, 5L, "f g h")))
    assert(out(2L) === ((8L, 5L, "x y z")))
    // within-doc: both halves' windows repeat, covering every position
    assert(out(3L) === ((12L, 12L, "")))
    // no duplicated window touches docs 4 and 5
    assert(out(4L) === ((6L, 0L, "m n o dd ee ff")))
    assert(out(5L) === ((2L, 0L, "aa bb")))
  }

  test("dsirSelect ranks target-like documents above unrelated ones") {
    import spark.implicits._
    // Target slice (is_target): documents about "the solar panel".
    // Doc 10 reuses the target's bigrams verbatim; doc 11 shares the
    // vocabulary but no bigram; doc 12 is token-less.
    val d = Seq(
      (1L, true,  "the solar panel array powers the solar grid"),
      (2L, true,  "a solar panel on the roof feeds the solar grid"),
      (10L, false, "install the solar panel near the solar grid"),
      (11L, false, "panel the grid solar a powers roof the on"),
      (12L, false, " ")).toDF("doc_id", "is_target", "text")
    val out = Curation.dsirSelect(d, "text", "doc_id", col("is_target"),
        buckets = 64, topN = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getInt(4)))).toMap
    // the verbatim-bigram doc must outscore the shuffled-vocabulary doc
    val score10 = out(10L)._3.get
    val score11 = out(11L)._3.get
    assert(score10 > score11,
      s"target-like doc scored $score10, shuffled doc $score11")
    // token-less doc: zero bigrams, NULL score, never selected
    assert(out(12L) === ((0L, 0L, None, 0)))
    // top-3 cutoff flags exactly 3 of the 4 scorable documents
    assert(out.values.map(_._4).sum === 3)
    assert(out(11L)._4 === 0, "the lowest scorer must not be selected")
  }

  test("zipfFit: exact normal-equation sums on a hand-built frequency curve") {
    import spark.implicits._
    // token counts by construction: a=8, b=4, c=2, d=1 → ranks 1..4
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = Curation.zipfFit(df, "text", topN = 4).collect()
    assert(out.length === 1)
    val r = out.head
    // replicate the integer micro-nat fit exactly
    val pts = Seq((1, 8), (2, 4), (3, 2), (4, 1)).map { case (rk, c) =>
      (math.round(math.log(rk) * 1e6), math.round(math.log(c) * 1e6))
    }
    val n = pts.size.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val (num, den) = (n * sxy - sx * sy, n * sxx - sx * sx)
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === num)
    assert(r.getLong(2) === den)
    // slope ≈ −1.5 for counts halving over ranks 1..4; pin the exact
    // 6-decimal HALF_UP rounding Spark's round() applies
    val slope = BigDecimal(num.toDouble / den)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === slope)
    assert(slope < -1.0 && slope > -2.0, s"implausible Zipf slope $slope")
  }

  test("sourceOverlap: planted shingle overlap, full matrix with zero rows") {
    import spark.implicits._
    val df = Seq(
      // A and B share exactly the 2 shingles of "v w x y z a"
      ("A", 1L, "v w x y z a b c d"),   // 5 distinct shingles
      ("B", 2L, "p q r s t v w x y z a"), // 7 distinct shingles
      ("C", 3L, "one two three four five six")) // 2, disjoint
      .toDF("source", "doc_id", "text")
    val out = Curation.sourceOverlap(df, "text", "source", k = 5)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("A", "B", 2L, 5L, 7L, 1000000L * 2 / (5 + 7 - 2)),
      ("A", "C", 0L, 5L, 2L, 0L),
      ("B", "C", 0L, 7L, 2L, 0L)))
  }

  /** Reference winnowing (Schleimer et al. 2003): every length-w window
    * of the doc's word-k-gram sha-prefix hashes selects its minimum,
    * rightmost on ties — the local model winnowFingerprints must match
    * exactly. */
  private def localWinnow(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val ws = text.trim.split("\\s+").filter(_.nonEmpty)
    if (ws.length < k) return Set.empty
    val hs = ws.sliding(k).map { g =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(g.mkString(" ").getBytes("UTF-8"))
      java.lang.Long.parseLong(sha.take(4).map("%02x".format(_)).mkString, 16)
    }.toArray
    val n = hs.length
    (1 to math.max(n - w + 1, 1)).map { i =>
      val end = math.min(i + w - 1, n)
      var best = i
      (i to end).foreach { p =>
        if (hs(p - 1) < hs(best - 1) ||
            (hs(p - 1) == hs(best - 1) && p > best)) best = p
      }
      (best.toLong, hs(best - 1))
    }.toSet
  }

  test("winnowFingerprints matches the reference model, including ties") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight and then " +
        "some more words to make several windows appear here"),
      // alternating bigram-period text: identical k-grams recur INSIDE
      // one window, exercising the rightmost tie-break
      (2L, "a b a b a b a b a b a b a b"),
      (3L, "exactly five words right here"),  // one shingle, one window
      (4L, "too few words"))                  // < k words: no output
    val df = corpus.toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(df, "text", "doc_id",
        k = 5, w = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    val want = corpus.map { case (id, t) => id -> localWinnow(t, 5, 4) }
      .filter(_._2.nonEmpty).toMap
    assert(got === want)
    assert(!got.contains(4L))
    assert(got(3L).size === 1)
  }

  test("applyBpeMerges: adjacency, word boundaries, sequential merges") {
    import spark.implicits._
    val df = Seq(
      (1L, "abab ab cd"),  // merge 'a b': abab→(ab)(ab), ab→(ab), cd stays
      (2L, "AB12 xyz"),    // 'ab12' not alpha after lowering → excluded
      (3L, "b a"))         // 'b a' spans a WORD boundary → must not merge
      .toDF("doc_id", "text")
    val r1 = TextAnalysis.applyBpeMerges(df, "text", "doc_id", Seq("a b"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(r1.toSeq === Seq(
      (1L, 3L, 8L, 5L),   // adjacent occurrences both merge in one pass
      (2L, 1L, 3L, 3L),
      (3L, 2L, 2L, 2L)))  // boundary blocked the cross-word pair
    // sequential merges compose: 'a b' then 'ab ab' collapses abab fully
    val r2 = TextAnalysis.applyBpeMerges(df, "text", "doc_id",
        Seq("a b", "ab ab"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(r2.head === ((1L, 4L)))  // (abab)(ab)(c)(d)
  }

  test("winnowMatchPairs: two shared regions score, disjoint docs do not") {
    import spark.implicits._
    val runA = "alpha beta gamma delta epsilon zeta eta theta"   // 8 words
    val runB = "one two three four five six seven eight"          // 8 words
    val df = Seq(
      (1L, s"$runA filler words in the middle here $runB and tail"),
      (2L, s"prefix junk $runA other unrelated middle $runB trailing bits"),
      (3L, "completely different text with no overlap at all whatsoever " +
        "nothing shared here in any window of words"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowMatchPairs(df, "text", "doc_id",
        k = 5, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1 and 2 share two independent w+k-1 runs → ≥ 2 shared
    // fingerprints by the winnowing guarantee; doc 3 pairs with nobody
    assert(pairs.length === 1)
    assert(pairs.head._1 === 1L && pairs.head._2 === 2L)
    assert(pairs.head._3 >= 2L)
  }

  test("winnowProbeMatches: probe scores against the archive index only") {
    import spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val run2 = "one two three four five six seven eight"
    val archive = Seq(
      (1L, s"archive doc leading $run middle part $run2 trailing text"),
      (2L, "unrelated archive content nothing shared with anyone here at all"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (10L, s"new doc with $run inside and also $run2 at the end"),
      (11L, "novel text matching nothing in the archive corpus whatsoever"))
      .toDF("doc_id", "text")
    val idx = TextAnalysis.winnowIndex(archive, "text", "doc_id",
      k = 5, w = 4)
    val got = TextAnalysis.winnowProbeMatches(probe, idx, "text", "doc_id",
        k = 5, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // both shared w+k-1 runs guarantee >= 2 shared fingerprints for
    // (10, 1); nothing else pairs
    assert(got.length === 1)
    assert(got.head._1 === 10L && got.head._2 === 1L && got.head._3 >= 2L)
    // the df-cap is an INDEX-BUILD property: cap 0 fingerprints survive
    // at maxDf = 0, so nothing can match
    val empty = TextAnalysis.winnowProbeMatches(probe,
      TextAnalysis.winnowIndex(archive, "text", "doc_id", k = 5, w = 4,
        maxDf = 0),
      "text", "doc_id", k = 5, w = 4, minShared = 1)
    assert(empty.count() === 0)
  }

  test("winnowIndexRetract: ≡ rebuild-without-them, including df-cap " +
      "resurrection of a capped-out fingerprint") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"$shared plus some trailing words here"),
      (2L, s"$shared plus some trailing words here"),
      (3L, s"$shared plus some trailing words here"),
      (9L, "wholly unrelated content that overlaps with nobody at all ever"))
      .toDF("doc_id", "text")
    val maxDf = 2
    val sketch = TextAnalysis.winnowSketch(docs, "text", "doc_id",
      k = 5, w = 4)
    // at build time the triplet's shared fingerprints have df = 3 > cap:
    // the capped index holds NOTHING for docs 1-3
    val built = TextAnalysis.winnowIndex(docs, "text", "doc_id",
      k = 5, w = 4, maxDf = maxDf)
    assert(built.filter(col("id").isin(1L, 2L, 3L)).count() === 0,
      "precondition: the shared fingerprints must be capped out at df 3")
    // retract doc 3 → df drops to 2: a rebuild RE-ADMITS the surviving
    // postings, and the sketch-based retract must match it exactly —
    // the direction a capped-index anti-join can never recover
    val retracted = TextAnalysis.winnowIndexRetract(sketch,
      Seq(3L).toDF("doc_id"), maxDf = maxDf)
    val rebuilt = TextAnalysis.winnowIndex(
      docs.filter(col("doc_id") =!= 3L), "text", "doc_id",
      k = 5, w = 4, maxDf = maxDf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("fp"))).toSet
    val rSet = rows(retracted)
    val bSet = rows(rebuilt)
    assert(rSet === bSet)
    assert(rSet.exists(_._1 == 1L),
      "retraction must RESURRECT the now-under-cap shared fingerprints")
    assert(!rSet.exists(_._1 == 3L), "retracted doc's postings must be gone")
    // and with no cap pressure, retract ≡ plain anti-join rebuild
    val r2 = TextAnalysis.winnowIndexRetract(sketch, Seq(9L).toDF("doc_id"),
      maxDf = 100)
    val b2 = TextAnalysis.winnowIndex(docs.filter(col("doc_id") =!= 9L),
      "text", "doc_id", k = 5, w = 4, maxDf = 100)
    assert(rows(r2) === rows(b2))
  }

  test("shingleIndexRetract: ≡ rebuild-without-them incl. df-cap " +
      "resurrection; k mismatch fails fast") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, shared), (2L, shared), (3L, shared),
      (9L, "wholly unrelated content that overlaps with nobody at all"))
      .toDF("doc_id", "text")
    val maxDf = 2
    val sketch = Dedup.hashedShingleSketch(df, "text", "doc_id", k = 5)
    // build-time: the triplet's shared shingles have df = 3 > cap
    val built = Dedup.hashedShingleIndex(df, "text", "doc_id",
      k = 5, maxDf = maxDf)
    assert(built.filter(col("id").isin(1L, 2L, 3L)).count() === 0,
      "precondition: shared shingles must be capped out at df 3")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("shingle_k5"),
        r.getAs[Long]("n_c"))).toSet
    // retract doc 3 → df 2: rebuild re-admits the survivors' postings
    // (with their intrinsic n_c), and the sketch-based retract matches
    val ret = Dedup.shingleIndexRetract(sketch, Seq(3L).toDF("doc_id"),
      k = 5, maxDf = maxDf)
    val rebuilt = Dedup.hashedShingleIndex(df.filter(col("doc_id") =!= 3L),
      "text", "doc_id", k = 5, maxDf = maxDf)
    assert(rows(ret) === rows(rebuilt))
    assert(rows(ret).exists(_._1 == 1L),
      "retraction must RESURRECT the now-under-cap shingles")
    assert(!rows(ret).exists(_._1 == 3L))
    // the k contract survives the sketch: asking for another k is loud
    val e = intercept[IllegalArgumentException] {
      Dedup.shingleIndexRetract(sketch, Seq(3L).toDF("doc_id"), k = 4)
    }
    assert(e.getMessage.contains("k=4"))
  }

  test("shingleSketchUpdate: ≡ rebuild-with-the-new-versions through " +
      "the serving view; append-before-retract loses the doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "one two three four five six seven"),
      (2L, "red orange yellow green blue indigo violet"),
      (3L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val sketch = Dedup.hashedShingleSketch(df, "text", "doc_id", k = 5)
    val newV = Seq(
      (2L, "red orange yellow fresh green blue indigo violet"), // changed
      (4L, "an upserted document never seen before right here")) // upsert
      .toDF("doc_id", "text")
    val updatedCorpus = df.filter(col("doc_id") =!= 2L).unionAll(newV)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val upd = Dedup.shingleSketchUpdate(sketch, newV, "text", "doc_id",
      k = 5)
    // sketch face ≡ from-scratch build over the corpus with the new
    // versions (the changed doc serves its NEW shingles, the upsert
    // appends cleanly)
    assert(rows(upd) ===
      rows(Dedup.hashedShingleSketch(updatedCorpus, "text", "doc_id",
        k = 5)))
    // serving view: df-cap and intrinsic n_c re-derive to the rebuild's
    assert(rows(Dedup.shingleServingIndex(upd, k = 5, maxDf = 100)) ===
      rows(Dedup.hashedShingleIndex(updatedCorpus, "text", "doc_id",
        k = 5, maxDf = 100)))
    // THE ORDERING HAZARD the update face exists to fix: appending the
    // new version first, then retracting "the updated ids", anti-joins
    // BOTH versions' postings out — the document vanishes from the
    // index instead of serving its new text
    val wrong = Dedup.shingleSketchRetract(
      Dedup.shingleSketchAppend(sketch, newV, "text", "doc_id", k = 5),
      newV.select("doc_id"), k = 5)
    assert(wrong.filter(col("id").isin(2L, 4L)).count() === 0,
      "reversed composition must demonstrate the vanished-doc bug")
    assert(upd.filter(col("id") === 2L).count() > 0)
  }

  test("winnowing guarantee: a shared w+k-1 word run shares a fingerprint") {
    import spark.implicits._
    // w + k - 1 = 8 shared consecutive words embedded in different docs
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, s"completely unrelated prefix text here $run and a suffix too"),
      (2L, s"$run followed by other trailing words entirely different"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(df, "text", "doc_id",
        k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val a = fp.filter(_._1 == 1L).map(_._2).toSet
    val b = fp.filter(_._1 == 2L).map(_._2).toSet
    assert(a.intersect(b).nonEmpty,
      "shared run of w+k-1 words must yield a shared fingerprint hash")
  }
}
