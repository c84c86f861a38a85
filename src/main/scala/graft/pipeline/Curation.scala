package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline: benchmark
  * decontamination, repetition-based quality filtering, and per-source
  * quota capping. Together with [[Dedup]]/[[Sampling]] these cover the
  * standard pre-training curation loop (dedup → decontaminate → quality
  * filter → mix by source).
  */
object Curation {

  /** Eval-set contamination check: for every corpus document, the number
    * of distinct word-k-shingles it shares with ANY document of
    * `evalSet` (benchmark/eval data that must not leak into training).
    * Returns (id, n_shared) for contaminated documents only — callers
    * anti-join to scrub, or keep the counts for an audit report.
    *
    * 100 TB shape: eval sets are small (benchmarks are thousands of
    * documents, the corpus is billions), so the eval shingle set is
    * BROADCAST and the corpus side never shuffles its text — the scan
    * projects (id, 8-byte shingle hash) rows through one codegen span
    * ([[TextAnalysis.hashedShingleRows]]), hash-joins against the
    * broadcast set map-side, and only matching (id, shingle) pairs reach
    * the one aggregation shuffle (keyed by id, bounded by the overlap,
    * not the corpus).
    */
  def contamination(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, k: Int = 5): DataFrame = {
    val corpusSh = TextAnalysis
      .hashedShingleRows(corpus, textCol, idCol, k).distinct()
    val evalSh = TextAnalysis
      .hashedShingleRows(evalSet, textCol, idCol, k)
      .select("shingle").distinct()
    corpusSh.join(broadcast(evalSh), "shingle")
      .groupBy("id")
      // corpusSh is distinct per (id, shingle): plain count IS the
      // distinct shared-shingle count, no countDistinct state needed
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Repetition-based quality stats (the Gopher/C4 family of filters,
    * adapted to single-line documents): per document,
    *   - `n_tokens` / `n_distinct`: whitespace-token totals;
    *   - `dup_pm`: per-mille of tokens that are repeats of an earlier
    *     token, `1000·(n - n_distinct) div n`;
    *   - `top_pm`: per-mille of tokens taken by the single most frequent
    *     token — high values flag keyword-stuffed / boilerplate pages;
    *   - `keep`: 1 iff both are at or under the supplied ceilings.
    *
    * Pure narrow expressions — no explode, no shuffle: the top-token
    * count folds over the distinct-token array per row (quadratic in the
    * per-document vocabulary, linear in the corpus — the trade that
    * keeps a 100 TB scoring pass a single map stage). Integer per-mille
    * outputs make the scores engine-portable (no float rounding drift).
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String,
      maxDupPm: Int = 600, maxTopPm: Int = 150): DataFrame = {
    val withTok = df.select(col(idCol),
      TextAnalysis.words(col(textCol)).as("_ws"))
      .select(col(idCol), col("_ws"),
        size(col("_ws")).cast("long").as("n_tokens"),
        size(array_distinct(col("_ws"))).cast("long").as("n_distinct"))
    val topCnt = array_max(transform(array_distinct(col("_ws")),
      w => size(filter(col("_ws"), x => x === w)))).cast("long")
    withTok
      .withColumn("_topcnt", topCnt)
      .withColumn("dup_pm",
        when(col("n_tokens") > 0,
          expr("(1000 * (n_tokens - n_distinct)) div n_tokens"))
          .otherwise(lit(0L)))
      .withColumn("top_pm",
        when(col("n_tokens") > 0, expr("(1000 * _topcnt) div n_tokens"))
          .otherwise(lit(0L)))
      .withColumn("keep",
        when(col("dup_pm") <= maxDupPm && col("top_pm") <= maxTopPm, 1L)
          .otherwise(0L))
      .drop("_ws", "_topcnt")
  }

  /** Corpus-level duplicate-shingle fraction (the C4 "dedup at n-gram
    * granularity" audit signal): per document, how many of its distinct
    * word-k-shingles occur in at least one OTHER document, as a
    * per-mille of its shingle count. High values mean the document is
    * assembled from boilerplate the corpus already has even when no
    * single pair-wise near-dup fires. Returns
    * (id, n_shingles, n_dup, dup_sh_pm).
    *
    * 100 TB shape: one scan produces distinct (id, 8-byte shingle hash)
    * rows; the shingle document-frequency aggregate shuffles those 16
    * bytes per row — never text — and the df table joins back by
    * shingle hash. Both shuffles key on the hash, so skew is bounded by
    * the most common shingle's df, not by any document. */
  def dupShingleStats(df: DataFrame, textCol: String, idCol: String,
      k: Int = 5): DataFrame = {
    val sh = TextAnalysis.hashedShingleRows(df, textCol, idCol, k)
      .distinct()
    val freq = sh.groupBy("shingle")
      .agg(count(lit(1)).as("_df"))
    sh.join(freq, "shingle")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_df") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_sh_pm",
        expr("(1000 * n_dup) div n_shingles"))
  }

  /** Weighted corpus mixing: per-source document budgets ("the training
    * mix wants 5k of src_web, 20k of src_code, …"), each source capped
    * at its quota — sources absent from the map contribute nothing.
    * Selection is deterministic by key hash (stable across runs and
    * corpus growth). Delegates to [[Sampling.stratifiedQuotas]]; the
    * same two-phase histogram machinery as [[sourceQuota]], so the mix
    * never sorts a whole source in one task. */
  def mixBySource(df: DataFrame, sourceCol: String, keyCol: String,
      quotas: Map[String, Long], seed: Long = 42L,
      bucketFn: (org.apache.spark.sql.Column, Long) =>
        org.apache.spark.sql.Column = Sampling.hashBucket): DataFrame =
    Sampling.stratifiedQuotas(df, sourceCol, keyCol, quotas, seed,
      bucketFn)

  /** Token-budget selection — the final assembly step of a training
    * mix: keep the best-scoring documents (lowest `scoreCol`, e.g.
    * [[repetitionStats]]'s `dup_pm`) until the cumulative `weightCol`
    * (token counts) spends `budget`. Deterministic prefix of the
    * (score, hash-bucket, key) order; delegates to
    * [[Sampling.weightBudget]]'s two-phase selection, so no score class
    * is ever sorted in one task. */
  def tokenBudget(df: DataFrame, scoreCol: String, keyCol: String,
      tokenCol: String, budget: Long, seed: Long = 42L,
      bucketFn: (org.apache.spark.sql.Column, Long) =>
        org.apache.spark.sql.Column = Sampling.hashBucket): DataFrame =
    Sampling.weightBudget(df, scoreCol, keyCol, tokenCol, budget, seed,
      bucketFn)

  /** URL/domain filtering (the RefinedWeb/C4 front-of-pipeline step:
    * resolve each document's URL to its host, measure per-domain volume,
    * and flag documents whose host is blocklisted). Host extraction uses
    * Spark's `parse_url` builtin (a codegen'd expression, not a UDF);
    * the blocklist arrives as a DataFrame with a `host` column and rides
    * a BROADCAST left join. Returns (id, host, domain_docs, blocked).
    *
    * 100 TB shape: host derivation is a pure map stage; the per-domain
    * count shuffles only (host, id) — never document text; the
    * blocklist is broadcast (domain blocklists are a few MB in
    * practice), so no wide-side shuffle for the flag. */
  def urlFilter(df: DataFrame, urlCol: String, idCol: String,
      blocklist: DataFrame): DataFrame = {
    val hosts = df.select(col(idCol).as("id"),
      lower(call_function("parse_url", col(urlCol), lit("HOST")))
        .as("host"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
    hosts
      .withColumn("domain_docs", count(lit(1)).over(w))
      .join(broadcast(blocklist.select(col("host"), lit(1).as("blocked"))),
        Seq("host"), "left")
      .select(col("id"), col("host"), col("domain_docs"),
        coalesce(col("blocked"), lit(0)).as("blocked"))
  }

  /** PII patterns shared by detection and redaction. Deliberately kept
    * inside the RE2 ∩ java.util.regex dialect (no backreferences, no
    * lookaround) so the DuckDB oracle replays them verbatim. Redaction
    * order matters and is part of the contract: emails first (their
    * local parts may contain digits a later pattern could bite into),
    * then IPv4, then phone fragments; the replacement tokens contain no
    * digits, so later patterns can never match inside an earlier
    * redaction. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** PII detection + redaction (the anonymization pass every released
    * corpus runs): per document, counts of email / IPv4 / phone-shaped
    * spans plus the text with each span replaced by a typed tag
    * (`<EMAIL>`/`<IP>`/`<PHONE>`). Returns
    * (id, n_email, n_ip, n_phone, redacted).
    *
    * 100 TB shape: pure narrow regexp expressions — one codegen'd map
    * stage, zero shuffles; the scan reads only (id, text). */
  def piiScrub(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    // Counts follow the redaction cascade: each pattern is counted on the
    // text AFTER the earlier patterns were redacted, so n_email + n_ip +
    // n_phone equals exactly the number of tags in `redacted` — one span
    // can never be double-counted (a phone-shaped fragment inside an
    // email's local part counts only as the email that swallowed it).
    val t1 = regexp_replace(t, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val redacted = regexp_replace(t2, PhoneRe, "<PHONE>")
    df.select(col(idCol).as("id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long")
        .as("n_email"),
      size(regexp_extract_all(t1, lit(Ipv4Re), lit(0))).cast("long")
        .as("n_ip"),
      size(regexp_extract_all(t2, lit(PhoneRe), lit(0))).cast("long")
        .as("n_phone"),
      redacted.as("redacted"))
  }

  /** Exact duplicated-span removal — the ExactSubstr step of Lee et
    * al.'s "Deduplicating Training Data Makes Language Models Better",
    * at word granularity: every token that lies inside some `k`-token
    * window occurring at least `minCount` times in the WHOLE corpus
    * (across or within documents — occurrences, not document frequency)
    * is removed, and the survivors are reassembled in original order.
    * Catches verbatim boilerplate runs that document- and line-level
    * dedup both miss. Returns (id, n_tokens, n_removed, cleaned).
    *
    * 100 TB shape: the only corpus-wide structure is the window
    * frequency over 8-byte xxhash64 window keys — one hash-keyed count
    * shuffle; document text never shuffles. Coverage explodes each
    * DUPLICATED window start into its k positions ((id, int) pairs,
    * bounded by k × duplicated starts — duplication-proportional, not
    * corpus-proportional) and anti-joins token positions; reassembly
    * groups by document id, bounded by the largest single document,
    * the same bound a plain parse already has. */
  def substrDedup(df: DataFrame, textCol: String, idCol: String,
      k: Int = 5, minCount: Long = 2): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      TextAnalysis.words(col(textCol)).as("ws"))
    val starts = base.select(col("id"), col("ws"),
        explode(when(size(col("ws")) >= k,
            sequence(lit(1), size(col("ws")) - (k - 1)))
          .otherwise(array().cast("array<int>"))).as("sp"))
      .select(col("id"), col("sp"),
        xxhash64((0 until k).map(j =>
          element_at(col("ws"), col("sp") + lit(j))): _*).as("wh"))
    val dup = starts.groupBy(col("wh"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount).select("wh")
    val covered = starts.join(dup, "wh")
      .select(col("id"),
        explode(sequence(col("sp"), col("sp") + lit(k - 1))).as("p"))
      .distinct()
    val tokens = base
      .select(col("id"), posexplode(col("ws")).as(Seq("p0", "tok")))
      .select(col("id"), (col("p0") + lit(1)).as("p"), col("tok"))
    val reassembled = tokens.join(covered, Seq("id", "p"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok")), " ").as("cleaned"))
    base.select(col("id"), size(col("ws")).cast("long").as("n_tokens"))
      .join(reassembled, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .cast("long").as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Corpus-level line deduplication (the RefinedWeb/C4 step below
    * document granularity): split every document on `sep`, drop blank
    * lines, remove each line that occurs in at least `minDocs` DISTINCT
    * documents (navigation chrome, cookie banners, license boilerplate),
    * and reassemble the survivors in original order. Returns
    * (id, n_lines, n_kept, n_dropped, cleaned) — one row per input
    * document, including documents whose every line was boilerplate
    * (`cleaned` = empty string).
    *
    * 100 TB shape: the line document-frequency aggregate shuffles
    * (8-byte xxhash64, id) pairs — never line text; the banned-line set
    * (df ≥ minDocs) is the small side of a LEFT ANTI join that AQE
    * broadcast-converts when it fits (boilerplate vocabularies are tiny
    * relative to a corpus), so the exploded text crosses no shuffle in
    * the common case. Reassembly groups by document id — bounded by the
    * largest single document, the same bound a plain parse already has. */
  def lineDedup(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n", minDocs: Int = 2): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      filter(split(col(textCol),
          java.util.regex.Pattern.quote(sep)),
        l => length(l) > 0).as("lines"))
    val exploded = base
      .select(col("id"), posexplode(col("lines")).as(Seq("pos", "line")))
      .withColumn("lh", xxhash64(col("line")))
    val banned = exploded.groupBy("lh")
      .agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("lh")
    val kept = exploded.join(banned, Seq("lh"), "left_anti")
    val reassembled = kept.groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          sep).as("cleaned"))
    base.select(col("id"), size(col("lines")).cast("long").as("n_lines"))
      .join(reassembled, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** C4-style line-rule cleaning (Raffel et al.'s famous filter set,
    * the step that turned Common Crawl into C4): a line survives iff it
    * ends with terminal punctuation, has at least `minWords` words, and
    * contains no blacklisted substring ("javascript", "cookies enabled",
    * lorem ipsum...); a document survives iff at least `minLines` of its
    * lines did. Returns (id, n_lines, n_kept, n_dropped, doc_keep,
    * cleaned) with surviving lines reassembled in order.
    *
    * 100 TB shape: the rules are pure narrow expressions on the exploded
    * lines; the only shuffle is the per-document reassembly keyed on id
    * (the [[lineDedup]] sorted-struct pattern) — line text shuffles once,
    * bounded by the input size, with no corpus-wide aggregate at all
    * (unlike lineDedup there is no document-frequency pass: C4 rules are
    * local to the line, which is what made them cheap at web scale). */
  def c4LineFilter(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n", minWords: Int = 3, minLines: Int = 3,
      blacklist: Seq[String] = Seq("javascript")): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      filter(split(col(textCol), java.util.regex.Pattern.quote(sep)),
        l => length(l) > 0).as("lines"))
    val exploded = base
      .select(col("id"), posexplode(col("lines")).as(Seq("pos", "line")))
    val noBlacklist = blacklist
      .map(b => !col("line").contains(b))
      .reduceOption(_ && _).getOrElse(lit(true))
    val kept = exploded.filter(
      col("line").endsWith(".") &&
        size(TextAnalysis.words(col("line"))) >= minWords &&
        noBlacklist)
    val reassembled = kept.groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          sep).as("cleaned"))
    base.select(col("id"), size(col("lines")).cast("long").as("n_lines"))
      .join(reassembled, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        when(coalesce(col("n_kept"), lit(0L)) >= minLines, 1).otherwise(0)
          .as("doc_keep"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Per-source quota cap — at most `maxPerSource` documents from each
    * source, chosen deterministically by key hash (stable across runs
    * and corpus growth). The "domain cap" mixing op: a crawl where one
    * domain is 30% of the bytes must not be 30% of the training mix.
    * Delegates to [[Sampling.stratifiedQuota]] (two-phase histogram
    * selection: a giant source costs a bounded histogram, never a
    * single-task sort). */
  def sourceQuota(df: DataFrame, sourceCol: String, keyCol: String,
      maxPerSource: Long, seed: Long = 42L,
      bucketFn: (org.apache.spark.sql.Column, Long) =>
        org.apache.spark.sql.Column = Sampling.hashBucket): DataFrame =
    Sampling.stratifiedQuota(df, sourceCol, keyCol, maxPerSource, seed,
      bucketFn)

  /** BM25 keyword retrieval over the corpus: rank documents against a
    * fixed term list with the Robertson/Spärck Jones weighting —
    * idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). The retrieval face of a
    * curation stack: "pull the documents about X" over a pre-tokenized
    * 100 TB corpus without an external search system.
    *
    * Engine-portability contract (this is a gate query): per-term tf
    * columns are computed with one fixed column per term and the final
    * score is an EXPLICIT left-associated sum over the term list — never
    * a grouped SUM over per-term rows, whose double-accumulation order
    * no engine promises. All corpus stats (N, df, avgdl) are integers or
    * exact integer ratios; the only non-correctly-rounded primitive is
    * the single ln per term, bounded to ≤1 ulp by both engines and
    * washed out by the 6-dp output rounding.
    *
    * 100 TB shape: one narrow scan computes (dl, tf_0..tf_T) per
    * document; the corpus stats reduce to ONE tiny row broadcast back —
    * two passes total, no shuffle wider than the T+2-column stats row;
    * top-k by sort+limit, never a global window. */
  def bm25Rank(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.25, b: Double = 0.75,
      topK: Int = 100): DataFrame = {
    require(terms.nonEmpty, "bm25Rank needs at least one term")
    val withTf = terms.zipWithIndex.foldLeft(
      df.select(col(idCol).as("id"),
        TextAnalysis.words(col(textCol)).as("_ws"))
        .withColumn("dl", size(col("_ws")).cast("double"))) {
      case (d, (t, i)) => d.withColumn(s"tf_$i",
        size(filter(col("_ws"), x => x === lit(t))).cast("double"))
    }.drop("_ws")
    val statCols = count(lit(1)).cast("double").as("n") +:
      avg(col("dl")).as("avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L))
          .cast("double").as(s"df_$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val idf = log(lit(1.0) +
        (col("n") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .withColumn("score", round(score, 6))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
      .select(col("id"), col("score"))
  }

  /** Model-based quality scoring — the fastText/DCLM-shaped linear
    * classifier that modern curation stacks run over every document:
    * score(doc) = sigmoid(mean over tokens of w[h(token)]), keep iff
    * score ≥ `threshold`. The Spark shape is the point: per-token weight
    * lookup and the token fold are pure expressions inside one codegen'd
    * map stage — no shuffle, no UDF, no model server; a 100 TB corpus is
    * scored by one scan.
    *
    * Weights here are derived from sha256 of the token itself (uniform
    * in [−1, 1], mod-2001 of a 32-bit hash slice) — a deterministic
    * stand-in with the same lookup cost as a trained table, chosen so
    * the DuckDB oracle replays scoring bit-for-bit (the [[Sampling
    * .shaBucket]] convention). Swapping in a TRAINED model is the
    * production drop-in: replace `w(t)` with an `element_at` into a
    * broadcast weight array keyed by the same hash — the plan shape,
    * cost, and this operator's contract are unchanged.
    *
    * Exactness contract: the token fold runs in array order on both
    * engines (Spark `aggregate`, DuckDB `list_sum∘list_transform` — the
    * e8 precedent); each weight is an exact small-integer ratio; the
    * single transcendental (exp in the sigmoid) is ≤1 ulp each side and
    * washed by 6-dp rounding; `keep` derives from the ROUNDED score. */
  def linearQualityScore(df: DataFrame, textCol: String, idCol: String,
      seed: String = "w", threshold: Double = 0.5): DataFrame = {
    def w(t: Column): Column =
      (conv(substring(sha2(concat(lit(s"$seed:"), t), 256), 1, 8), 16, 10)
        .cast("long") % 2001 - 1000).cast("double") / lit(1000.0)
    df.select(col(idCol).as("id"),
        TextAnalysis.words(col(textCol)).as("_ws"))
      .withColumn("n", size(col("_ws")).cast("double"))
      .filter(col("n") > 0)
      .withColumn("_raw",
        aggregate(col("_ws"), lit(0.0), (acc, t) => acc + w(t)))
      .withColumn("score",
        round(lit(1.0) / (lit(1.0) + exp(-(col("_raw") / col("n")))), 6))
      .withColumn("keep",
        when(col("score") >= lit(threshold), 1).otherwise(0))
      .select(col("id"), col("score"), col("keep"))
  }

  /** Unigram-LM surprisal scoring — the CCNet/KenLM-shaped perplexity
    * filter: each document's mean negative log-likelihood in nats/token
    * under the corpus's own unigram distribution, keep iff at or under
    * `maxMeanNats`. Gibberish and boilerplate-stuffed documents sit in
    * the tails of exactly this statistic; production stacks score
    * against a held-out LM, which drops in by replacing the self-counts
    * join with a broadcast model table — the plan shape is unchanged.
    *
    * Plan shape at 100 TB: one narrow posexplode; ONE vocab-keyed count
    * shuffle (token types, ≪ corpus); counts + the 1-row total rejoin by
    * broadcast (drop the hint if the vocabulary outgrows broadcast — the
    * shape survives as a shuffle join); one id-keyed aggregation whose
    * carried value is (pos, 6-dp lp) pairs. Document text never shuffles.
    *
    * Exactness contract: each token's log-probability is rounded to 6 dp
    * FIRST (washing the ln ulp), then folded per document in strict
    * position order via the sorted-struct-fold pattern ([[lineDedup]]'s
    * reassembly precedent) — Spark `aggregate(array_sort(collect_list(
    * struct(pos, lp))))` ≡ DuckDB `list_sum(list(lp ORDER BY pos))`;
    * `keep` derives from the twice-rounded mean on both sides. */
  def unigramSurprisal(df: DataFrame, textCol: String, idCol: String,
      maxMeanNats: Double = 3.45): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      posexplode(TextAnalysis.words(col(textCol))).as(Seq("pos", "tok")))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("double").as("total"))
    toks.join(broadcast(counts), "tok")
      .crossJoin(broadcast(total))
      .withColumn("lp",
        round(log(col("cnt").cast("double") / col("total")), 6))
      .groupBy("id")
      .agg(
        aggregate(array_sort(collect_list(struct(col("pos"), col("lp")))),
          lit(0.0), (acc, x) => acc + x.getField("lp")).as("_s"),
        count(lit(1)).cast("double").as("n"))
      .withColumn("mean_nats", round(-col("_s") / col("n"), 6))
      .withColumn("keep",
        when(col("mean_nats") <= lit(maxMeanNats), 1).otherwise(0))
      .select(col("id"), col("n").cast("long").as("n_tokens"),
        col("mean_nats"), col("keep"))
  }

  /** Bigram-LM surprisal — [[unigramSurprisal]]'s next rung toward the
    * CCNet 5-gram filter: per-token log-probability under an
    * interpolated bigram model trained on the corpus itself,
    * p(w₂|w₁) = ¾·c(w₁w₂)/c(w₁·) + ¼·c(w₂)/N (Jelinek-Mercer with
    * dyadic weights so both engines scale exactly; every scored bigram
    * was counted, so no zero-probability guard is needed). The first
    * token of each document scores under the unigram term alone.
    * Returns (id, n_tokens, mean_unats, keep) — mean surprisal in
    * integer micro-nats (3400000 ≙ 3.4 nats).
    *
    * Cross-engine exactness: ONE float-rounding layer only. Each token's
    * surprisal becomes an INTEGER in micro-nats (round(ln(·)·10⁶) →
    * BIGINT); from there everything is exact integer arithmetic — the sum
    * is order-free (no sorted-struct fold needed) and the mean is `div`
    * (≡ DuckDB `//`). d28's double pattern (6-dp round per term, fold,
    * round the mean again) was tried first and the SECOND rounding hit a
    * half-ulp boundary at sf0.1 (-s/n = 3.40617849999…: Spark HALF_UP on
    * the double says …178, DuckDB's decimal-repr ROUND says …179) — the
    * derived-quotient re-round the exactness cookbook warns about. The
    * interpolation is written (bc/sc)·0.75 + (uc/N)·0.25 — integer÷
    * integer first (double on both engines), THEN the dyadic scale, so
    * a DECIMAL-parsing engine never folds 0.75 in decimal arithmetic.
    *
    * 100 TB shape: two count shuffles (unigram-keyed, bigram-keyed).
    * The unigram/total tables carry an explicit broadcast hint (a word
    * vocabulary always fits); the bigram/start-count joins carry NO
    * hint — a web-scale bigram table exceeds broadcast limits, and an
    * unhinted equi-join is what lets Spark/AQE pick broadcast when it
    * fits and a shuffle join when it does not. Token-less documents
    * still appear in the output (n_tokens 0, NULL mean, keep 0 — a
    * document that cannot be scored is rejected, not lost). */
  def bigramSurprisal(df: DataFrame, textCol: String, idCol: String,
      maxMeanMicroNats: Long = 3400000L): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      TextAnalysis.words(col(textCol)).as("ws"))
    val toks = base
      .select(col("id"), posexplode(col("ws")).as(Seq("pos0", "tok")))
      .select(col("id"), (col("pos0") + 1).as("pos"), col("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("uc"))
    val total = uni.agg(sum(col("uc")).cast("double").as("total"))
    val bi = base
      .select(col("id"), col("ws"),
        explode(when(size(col("ws")) >= 2,
            sequence(lit(1), size(col("ws")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("id"), col("i"),
        element_at(col("ws"), col("i")).as("w1"),
        element_at(col("ws"), col("i") + 1).as("w2"))
    val bc = bi.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    val sc = bc.groupBy("w1").agg(sum(col("bc")).as("sc"))
    val lpFirst = toks.filter(col("pos") === 1)
      .join(broadcast(uni), "tok").crossJoin(broadcast(total))
      .select(col("id"),
        round(log(col("uc").cast("double") / col("total")) * 1e6)
          .cast("long").as("lp_u"))
    val lpRest = bi
      .join(bc, Seq("w1", "w2"))
      .join(sc, "w1")
      .join(broadcast(uni.withColumnRenamed("tok", "w2")), "w2")
      .crossJoin(broadcast(total))
      .select(col("id"),
        round(log(
          col("bc").cast("double") / col("sc").cast("double") * 0.75 +
          col("uc").cast("double") / col("total") * 0.25) * 1e6)
          .cast("long").as("lp_u"))
    val scored = lpFirst.unionByName(lpRest)
      .groupBy("id")
      .agg((-sum(col("lp_u"))).as("_s"), count(lit(1)).as("n"))
      .withColumn("mean_unats", expr("_s div n"))
    base.select(col("id"), size(col("ws")).cast("long").as("n_tokens"))
      .join(scored, Seq("id"), "left")
      .withColumn("keep",
        when(col("mean_unats").isNotNull &&
          col("mean_unats") <= lit(maxMeanMicroNats), 1).otherwise(0))
      .select(col("id"), col("n_tokens"), col("mean_unats"), col("keep"))
  }

  /** Sequence packing for pretraining export — the "concat and chunk"
    * strategy: documents are laid out on one deterministic token stream
    * (ordered by sha256 of the id — a stable shuffle both engines can
    * replay) and cut into fixed-`budget` bins; each document reports its
    * bin, its token offset within the bin, and whether it straddles a
    * bin boundary (the packing loss a trainer either accepts, masks, or
    * re-splits). All arithmetic is integer-exact.
    *
    * The 100 TB part is the global prefix sum, computed WITHOUT a
    * single-partition window: the sha hex order key's first
    * `bucketChars` characters split the stream into 16^bucketChars
    * contiguous logical buckets; per-bucket token totals (one tiny
    * aggregate, one row per bucket) prefix-sum into per-bucket offsets
    * on the driver — bounded by the bucket count, never the data — and
    * each bucket then windows only its own slice. Logical buckets, not
    * `spark_partition_id`: the result is a pure function of the data, so
    * no caching/checkpointing is needed to keep two passes consistent. */
  def sequencePack(df: DataFrame, textCol: String, idCol: String,
      budget: Long, seed: String = "pk", bucketChars: Int = 2): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = df.select(col(idCol).as("id"),
        size(TextAnalysis.words(col(textCol))).cast("long").as("n_tok"),
        sha2(concat(lit(s"$seed:"), col(idCol).cast("string")), 256)
          .as("ord"))
      .withColumn("bucket", substring(col("ord"), 1, bucketChars))
    val offsets = base.groupBy("bucket").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val offByBucket = offsets.map(_._1)
      .zip(offsets.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offCol = offByBucket.foldLeft(lit(0L)) { case (acc, (bk, o)) =>
      when(col("bucket") === bk, lit(o)).otherwise(acc) }
    val w = Window.partitionBy(col("bucket")).orderBy(col("ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before",
        coalesce(sum(col("n_tok")).over(w), lit(0L)) + offCol)
      .withColumn("bin", expr(s"cum_before div $budget")) // integer div: exact past 2^53
      .withColumn("bin_offset", col("cum_before") % lit(budget))
      .withColumn("straddles",
        when(col("bin_offset") + col("n_tok") > lit(budget), 1)
          .otherwise(0))
      .select(col("id"), col("n_tok"), col("bin"), col("bin_offset"),
        col("straddles"))
  }

  /** SymSpell-style fuzzy vocabulary join: all (left-token, right-token)
    * pairs within Levenshtein distance `maxDist` (1 or 2) — typo
    * canonicalization, near-miss vocabulary merging, OCR-noise repair.
    *
    * The scalable part is candidate generation: instead of the O(|A|·|B|)
    * cross join, each DISTINCT token explodes to its ≤2-deletion
    * neighborhood (1 + L + L·(L−1)/2 variants for length L), candidates
    * are the variant-key equi-join (two tokens within distance d share a
    * ≤d-deletion variant — the SymSpell invariant), and only candidates
    * pay the exact `levenshtein` verify. Vocabulary is deduped BEFORE the
    * explode, so cost is O(vocab · len²), independent of corpus size —
    * the same flagged-slice shape as the LSH dedup family.
    */
  def fuzzyTokenJoin(left: DataFrame, right: DataFrame, tokCol: String,
      maxDist: Int = 2): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion-neighborhood banding covers maxDist 1 or 2, got $maxDist")
    def delVariants(t: Column): Column = {
      val L = length(t)
      val del1 = transform(sequence(lit(1), L),
        i => concat(t.substr(lit(1), i - lit(1)),
          t.substr(i + lit(1), L - i)))
      val del2 = when(L >= 2, flatten(transform(sequence(lit(1), L - lit(1)),
        i => transform(sequence(i + lit(1), L),
          j => concat(t.substr(lit(1), i - lit(1)),
            t.substr(i + lit(1), j - i - lit(1)),
            t.substr(j + lit(1), L - j))))))
        .otherwise(array().cast("array<string>"))
      val all = if (maxDist == 2) concat(array(t), del1, del2)
        else concat(array(t), del1)
      array_distinct(all)
    }
    def side(d: DataFrame, out: String): DataFrame =
      d.select(col(tokCol).as(out)).distinct()
        .select(col(out), explode(delVariants(col(out))).as("_v"))
    side(left, "tok_a").join(side(right, "tok_b"), "_v")
      .select("tok_a", "tok_b").distinct()
      .withColumn("dist", levenshtein(col("tok_a"), col("tok_b")))
      .filter(col("dist") <= maxDist && col("tok_a") =!= col("tok_b"))
  }

  /** DSIR data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score every
    * document by how target-like its hashed-bigram distribution is and
    * select the `topN` highest scorers. `targetPred` marks the in-domain
    * exemplar slice (an eval benchmark, a curated wiki dump); every
    * document — target or not — is scored against the importance weights
    *
    *   log w(x) = Σ_b c_x[b] · (log p̂_target[b] − log p̂_raw[b])
    *
    * where c_x are the document's hashed-bigram bucket counts and both
    * p̂ distributions are add-one-smoothed bucket frequencies (target
    * slice vs whole corpus). Returns one row per document:
    * (id, n_tokens, n_bigrams, dsir_unats, selected).
    *
    * Deterministic face: the paper resamples from the weight softmax;
    * this gate query takes the temperature→0 limit — top-N by
    * (score desc, id) — so two engines agree bit-for-bit. A seeded
    * Gumbel-top-k is a one-line extension where sampling noise is wanted.
    *
    * Cross-engine exactness (the d33 cookbook): bucket ids are the first
    * 8 hex chars of sha256 mod `buckets` (both engines parse the same
    * prefix); each bucket's two log-frequencies are INDIVIDUALLY rounded
    * to integer micro-nats before subtracting, so the single ln ulp is
    * washed per term and everything downstream — per-document sums, the
    * top-N cutoff — is exact BIGINT arithmetic with no fold-order
    * sensitivity.
    *
    * 100 TB shape: one narrow bigram scan (id, is_target, bucket — text
    * never shuffles); ONE bucket-keyed count shuffle bounded by
    * `buckets` rows regardless of corpus size; the weight table is
    * broadcastable by construction (≤ `buckets` rows) so scoring is a
    * map-side hash join; the per-document score is one id-keyed integer
    * aggregation; top-N is sort+limit (TakeOrdered — distributed, never
    * a global window) and rejoins as a broadcast semi flag. */
  def dsirSelect(df: DataFrame, textCol: String, idCol: String,
      targetPred: Column, buckets: Int = 512, topN: Int = 100,
      seed: String = "dsir"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(topN > 0, s"topN must be positive, got $topN")
    val base = df.select(col(idCol).as("id"), targetPred.as("is_target"),
      TextAnalysis.words(col(textCol)).as("ws"))
    val bi = base
      .select(col("id"), col("is_target"), col("ws"),
        explode(when(size(col("ws")) >= 2,
            sequence(lit(1), size(col("ws")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("id"), col("is_target"),
        pmod(
          conv(substring(sha2(concat(lit(s"$seed:"),
            element_at(col("ws"), col("i")), lit(" "),
            element_at(col("ws"), col("i") + 1)), 256), 1, 8), 16, 10)
            .cast("long"),
          lit(buckets.toLong)).as("bucket"))
    val counts = bi.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (round(log((col("ct") + 1).cast("double") /
            (col("tt") + buckets).cast("double")) * 1e6).cast("long") -
         round(log((col("cr") + 1).cast("double") /
            (col("tr") + buckets).cast("double")) * 1e6).cast("long"))
          .as("lw"))
    val scored = bi.join(broadcast(weights), "bucket")
      .groupBy("id")
      .agg(sum(col("lw")).as("dsir_unats"), count(lit(1)).as("n_bigrams"))
    val top = scored.orderBy(col("dsir_unats").desc, col("id")).limit(topN)
      .select(col("id").as("_sel"))
    base.select(col("id"), size(col("ws")).cast("long").as("n_tokens"))
      .join(scored, Seq("id"), "left")
      .join(broadcast(top), col("id") === col("_sel"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("dsir_unats"),
        when(col("_sel").isNotNull, 1).otherwise(0).as("selected"))
  }

  /** Token–label PMI mining — the quality-signal inspection step behind
    * classifier-based curation (which n-grams actually separate the
    * target slice from the rest; the feature audit run before trusting
    * a [[linearQualityScore]]-style model). Document-frequency PMI of
    * each token against `targetPred`, add-one smoothed:
    *
    *   pmi(t) = ln(n_t1 + 1) + ln(N + 2) − ln(n_t + 2) − ln(N_1 + 1)
    *
    * where n_t1 = target docs containing t, n_t = all docs containing
    * t, N_1 = target docs, N = all docs. Each ln term is INDIVIDUALLY
    * rounded to integer micro-nats before combining (the d33 cookbook),
    * so the score is an exact BIGINT sum and the single per-term ln ulp
    * is washed by the rounding on both engines. Tokens below `minDf`
    * document frequency are dropped (hapax PMI is noise by
    * construction). Returns the `topN` tokens by (pmi desc, token):
    * (token, df_t, df_nt, pmi_unats).
    *
    * 100 TB shape: one narrow (id, y, token) explode — text never
    * shuffles, DISTINCT per document bounds each doc's contribution by
    * its vocabulary; ONE token-keyed count shuffle; the two corpus
    * totals ride as driver literals (one 1-row aggregate); top-N is
    * sort+limit (TakeOrdered, never a global window). */
  def tokenLabelPmi(df: DataFrame, textCol: String, idCol: String,
      targetPred: Column, minDf: Int = 3, topN: Int = 50): DataFrame = {
    require(minDf >= 1, s"minDf must be positive, got $minDf")
    require(topN >= 1, s"topN must be positive, got $topN")
    val base = df.select(col(idCol).as("id"),
      targetPred.cast("int").as("y"),
      TextAnalysis.words(col(textCol)).as("ws"))
    val tot = base.agg(sum(col("y")).cast("long"), count(lit(1))).head
    val (nTarget, nDocs) = (tot.getLong(0), tot.getLong(1))
    def unats(c: Column): Column = round(log(c.cast("double")) * 1e6)
      .cast("long")
    val constUnats = math.round(math.log(nDocs + 2.0) * 1e6) -
      math.round(math.log(nTarget + 1.0) * 1e6)
    base
      .select(col("id"), col("y"),
        explode(array_distinct(col("ws"))).as("token"))
      .groupBy("token")
      .agg(sum(col("y")).cast("long").as("df_t"),
        count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("token"), col("df_t"),
        (col("df") - col("df_t")).as("df_nt"),
        (unats(col("df_t") + 1) - unats(col("df") + 2) + lit(constUnats))
          .as("pmi_unats"))
      .orderBy(col("pmi_unats").desc, col("token"))
      .limit(topN)
  }

  /** Zipf-law fit of the token frequency distribution — the standard
    * corpus health diagnostic (natural text shows log(count) ≈
    * a + s·log(rank) with s ≈ −1; a flat or cliff-shaped curve flags
    * boilerplate floods or truncated vocabularies). Least-squares over
    * the `topN` tokens by count, on integer micro-nat coordinates
    * (x = round(ln rank · 1e6), y = round(ln count · 1e6) — the d33
    * cookbook), so the normal-equation sums are exact BIGINTs on both
    * engines. Returns ONE row (n_fit, slope_num, slope_den, slope):
    * slope = num/den with num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)²,
    * emitted exactly plus as one 6-decimal-rounded double division.
    *
    * Overflow headroom: |x| ≤ ln(topN)·1e6, |y| ≤ ln(total tokens)·1e6
    * ≤ ~46e6 even at 100 T tokens, so n·Σxy ≤ topN²·x·y ≤ 8.7e17 at
    * topN = 200 — comfortably inside BIGINT for any corpus this engine
    * can hold.
    *
    * 100 TB shape: one token-keyed count shuffle over the corpus (the
    * same aggregate every frequency query pays); top-N is sort+limit
    * (TakeOrdered — never a global window over the vocabulary); the
    * rank window and the fit run on exactly `topN` rows. */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 200): DataFrame = {
    require(topN >= 2, s"need at least 2 points to fit, got $topN")
    val top = df
      .select(explode(TextAnalysis.words(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(topN)
    def unats(c: Column): Column =
      round(log(c.cast("double")) * 1e6).cast("long")
    // The rank window runs on the topN-row result of the sort+limit —
    // a single bounded partition by construction, not a corpus sort.
    val ranked = top.withColumn("rnk",
        row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
      .select(unats(col("rnk")).as("x"), unats(col("cnt")).as("y"))
    ranked.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_fit"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      .withColumn("slope",
        round(col("slope_num").cast("double") / col("slope_den"), 6))
  }

  /** Cross-source contamination matrix: for every unordered pair of
    * values of `srcCol`, the number of distinct word-k-shingles the two
    * slices share, both slice sizes, and the Jaccard similarity in ppm
    * (integer floor division — exact on both engines for non-negative
    * operands). Zero-overlap pairs are kept (n_common = 0): the report
    * is the full matrix, and "these two crawls share nothing" is a
    * finding, not a missing row. The d16 contamination check guards
    * train vs eval; THIS guards train vs train — mirrored crawls and
    * re-scraped mixes inflate effective epochs exactly like document
    * duplicates do.
    *
    * 100 TB shape: text collapses to distinct (source, 8-byte shingle
    * hash) rows in one codegen span ([[TextAnalysis.hashedShingleRows]]
    * — production would use it; here the sha variant keeps the DuckDB
    * gate). The self-join keys on the shingle hash, and its per-key
    * fan-out is bounded by the SOURCE count (each shingle appears at
    * most once per source after the distinct), so the pair stream is
    * ≤ |sources|²/2 per shingle — never corpus-quadratic. Pair counts
    * shuffle on (src_a, src_b): |sources|² rows, a driver-size result
    * for any real mixture list. */
  def sourceOverlap(df: DataFrame, textCol: String, srcCol: String,
      k: Int = 5): DataFrame = {
    val sh = TextAnalysis
      .shaShingleRows(df.select(col(srcCol).as("src"), col(textCol)),
        textCol, "src", k)
      .select(col("id").as("src"), col("shingle")).distinct()
    val sizes = sh.groupBy("src").agg(count(lit(1)).as("n"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    // Full matrix: every unordered source pair, zero-overlap included.
    // The sizes frame is |sources| rows — both sides of the pair grid
    // are broadcast-size by construction.
    val a = sizes.select(col("src").as("src_a"), col("n").as("n_a"))
    val b = sizes.select(col("src").as("src_b"), col("n").as("n_b"))
    a.join(b, col("src_a") < col("src_b"))
      .join(common, Seq("src_a", "src_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .select(col("src_a"), col("src_b"), col("n_common"),
        col("n_a"), col("n_b"),
        expr("(1000000 * n_common) div (n_a + n_b - n_common)")
          .as("jaccard_ppm"))
  }
}
