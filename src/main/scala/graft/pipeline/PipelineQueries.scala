package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** LLM-data-pipeline operator surface (SURVEY §2b north star): dedup (exact,
  * Jaccard, MinHash-LSH, SimHash), text analysis, similarity search, and
  * multimodal plumbing — each as a verifiable query over the driver
  * fixtures. Where the algorithm is SQL-expressible the DuckDB oracle
  * recomputes it from scratch; hash-function-dependent ops (xxhash64) get
  * rows-only checks here and exact ScalaTest coverage.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // ---- d1: exact dedup via content hash (sha2-256 ≡ DuckDB sha256). ----
  private def d1(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(s, dir), "text", "doc_id").orderBy("keep_id")

  private val d1Oracle =
    """SELECT sha256(text) AS content_sha, MIN(doc_id) AS keep_id,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY sha256(text) ORDER BY keep_id""".stripMargin

  // ---- d2: token / punctuation / stopword counting. ----
  private def d2(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_calc"),
      TextAnalysis.nTokens(col("text")).as("n_tokens"),
      TextAnalysis.nPunct(col("text")).as("n_punct"),
      TextAnalysis.nStopwords(col("text")).as("n_stop"),
      round(TextAnalysis.nStopwords(col("text")).cast("double") /
        greatest(TextAnalysis.nTokens(col("text")).cast("double"), lit(1.0)), 6)
        .as("stop_ratio"))
      .orderBy("doc_id")

  private val d2Oracle =
    """SELECT doc_id, CAST(LENGTH(text) AS INT) AS n_chars_calc,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS INT) AS n_punct,
      |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS INT) AS n_stop,
      |  ROUND(CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE)
      |    / GREATEST(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0), 6) AS stop_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- d9: BPE-ish subword token counting (whitespace count already in
  // d2) — tokens-per-word ratio is the budgeting metric. ----
  private def d9(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.nTokens(col("text")).as("n_ws_tokens"),
      TextAnalysis.nBpeTokens(col("text")).as("n_bpe_tokens"),
      round(TextAnalysis.nBpeTokens(col("text")).cast("double") /
        greatest(TextAnalysis.nTokens(col("text")).cast("double"), lit(1.0)), 6)
        .as("bpe_per_word"))
      .orderBy("doc_id")

  private val d9Oracle =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+')) AS INT) AS n_bpe_tokens,
      |  ROUND(CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+')) AS DOUBLE)
      |    / GREATEST(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0), 6) AS bpe_per_word
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- d10: deterministic train/val/test split. This registered query
  // uses the sha256 bucket variant so the oracle replays the assignment
  // exactly (DuckDB parses the same 8-hex-char prefix); the xxhash64
  // default's determinism/stability properties are asserted in
  // SamplingSpec. ----
  private def d10(s: SparkSession, dir: String): DataFrame =
    Sampling.splitByHash(docs(s, dir), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      bucketFn = Sampling.shaBucket)
      .groupBy("split").agg(count(lit(1)).as("n"))
      .orderBy("split")

  private val d10Oracle =
    """SELECT split, COUNT(*) AS n FROM (
      |  SELECT CASE WHEN b < 8000 THEN 'train'
      |              WHEN b < 9000 THEN 'val'
      |              WHEN b < 10000 THEN 'test'
      |              ELSE 'rest' END AS split
      |  FROM (SELECT ('0x' || substr(sha256('42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS b
      |        FROM documents))
      |GROUP BY split ORDER BY split""".stripMargin

  // ---- d12: stratified exact sampling — per-language quota of
  // ceil(0.2 × |stratum|) documents, membership chosen by deterministic
  // key-hash order so the sample is stable across runs and corpus
  // growth. Registered with the sha256 bucket (like d10) so DuckDB
  // replays the per-stratum ordering and quota arithmetic exactly; the
  // xxhash64 default's properties are covered in SamplingSpec. ----
  private def d12(s: SparkSession, dir: String): DataFrame =
    Sampling.stratified(docs(s, dir), "lang", "doc_id", 0.2,
      bucketFn = Sampling.shaBucket)
      .select("doc_id", "lang")
      .orderBy("lang", "doc_id")

  private val d12Oracle =
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY b, doc_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM (SELECT doc_id, lang,
      |          ('0x' || substr(sha256('42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS b
      |        FROM documents))
      |WHERE rk <= CEIL(n * 0.2::DOUBLE)
      |ORDER BY lang, doc_id""".stripMargin

  // ---- d3: language-ID marker heuristic. ----
  private def d3(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"), col("lang"),
      TextAnalysis.langScore(col("text"), "en").as("s_en"),
      TextAnalysis.langScore(col("text"), "fr").as("s_fr"),
      TextAnalysis.langScore(col("text"), "es").as("s_es"),
      TextAnalysis.langScore(col("text"), "de").as("s_de"),
      TextAnalysis.langGuess(col("text")).as("lang_guess"))
      .orderBy("doc_id")

  private val d3Oracle = {
    def sc(pat: String) =
      s"CAST(len(regexp_extract_all(lower(text), '$pat')) AS INT)"
    val en = sc("\\b(the|and|of|is|was|with)\\b")
    val fr = sc("\\b(le|la|les|et|des|une)\\b")
    val es = sc("\\b(el|los|las|que|una|por)\\b")
    val de = sc("\\b(der|die|das|und|ist|ein)\\b")
    s"""SELECT doc_id, lang, $en AS s_en, $fr AS s_fr, $es AS s_es, $de AS s_de,
       |  CASE WHEN $en >= $fr AND $en >= $es AND $en >= $de THEN 'en'
       |       WHEN $fr >= $es AND $fr >= $de THEN 'fr'
       |       WHEN $es >= $de THEN 'es'
       |       ELSE 'de' END AS lang_guess
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---- d4: quality scoring. ----
  private def d4(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      (TextAnalysis.qualityScore(col("text")) >= 0.7).as("keep"))
      .orderBy("doc_id")

  private val d4Oracle = {
    val nTok = "CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)"
    val nStop = "CAST(len(regexp_extract_all(lower(text), '\\b(the|a|an|and|or|of|to|in|is|it)\\b')) AS DOUBLE)"
    val nPunct = "CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)"
    val nChars = "CAST(LENGTH(text) AS DOUBLE)"
    // x::DOUBLE on every literal: DuckDB otherwise sums these as DECIMALs
    // (exact 1.0) while Spark sums doubles (0.9999999999999999).
    val q =
      s"""(CASE WHEN $nChars >= 50 AND $nChars <= 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
         | + CASE WHEN $nChars / GREATEST($nTok, 1.0) >= 2.0 AND $nChars / GREATEST($nTok, 1.0) <= 12.0 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
         | + CASE WHEN $nStop / GREATEST($nTok, 1.0) >= 0.01 THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END
         | + CASE WHEN $nPunct / GREATEST($nChars, 1.0) <= 0.1 THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END)""".stripMargin
    s"""SELECT doc_id, $q AS quality, $q >= 0.7::DOUBLE AS keep
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---- d5: rolling-hash document fingerprint (h = (h*31+code) mod 2^31-1;
  // DuckDB list_reduce seeds with the first element ≡ our fold from 0). ----
  private def d5(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  private val d5Oracle =
    """SELECT doc_id,
      |  CASE WHEN LENGTH(text) > 0 THEN
      |    list_reduce(
      |      list_transform(generate_series(1, LENGTH(text)),
      |                     i -> CAST(unicode(substr(text, i, 1)) AS BIGINT)),
      |      (acc, c) -> (acc * 31 + c) % 2147483647)
      |  ELSE 0 END AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- d6: exact n-gram Jaccard near-dup pairs. ----
  private def d6(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(docs(s, dir), "text", "doc_id",
      k = 5, threshold = 0.6, maxDf = 100)
      .orderBy("doc_a", "doc_b")

  /** Shared CTE chain computing exact word-5-shingle Jaccard pairs — used
    * by both the d6 oracle and (under WITH RECURSIVE) the d11 oracle. */
  private val jaccardCtes = jaccardCtesFrom("documents")

  /** [[jaccardCtes]] over an arbitrary documents source — the d60
    * update oracle replays the pair-mining + CC chain against the
    * corpus-with-new-versions (the d58 docsSrc pattern). */
  private def jaccardCtesFrom(docsSrc: String,
      maxDf: Int = 100): String =
    s"""w AS (
      |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM $docsSrc),
      |sh AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(ws) >= 5 THEN
      |      list_transform(generate_series(1, len(ws) - 4),
      |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])
      |    ELSE CAST([] AS VARCHAR[]) END) AS shingles
      |  FROM w),
      |idx AS (
      |  SELECT doc_id, unnest(shingles) AS shingle FROM sh),
      |df_ok AS (
      |  SELECT shingle FROM idx GROUP BY shingle
      |  HAVING COUNT(*) BETWEEN 2 AND $maxDf),
      |f AS (SELECT idx.* FROM idx JOIN df_ok USING (shingle)),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)""".stripMargin

  private val d6Oracle =
    s"""WITH $jaccardCtes
      |SELECT p.id_a AS doc_a, p.id_b AS doc_b, p.inter AS inter,
      |  ROUND(p.inter / (sa.n + sb.n - p.inter), 6) AS jaccard
      |FROM p
      |JOIN sizes sa ON p.id_a = sa.doc_id
      |JOIN sizes sb ON p.id_b = sb.doc_id
      |WHERE ROUND(p.inter / (sa.n + sb.n - p.inter), 6) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- d41: shingle-CONTAINMENT pairs (Broder's asymmetric measure) —
  // the quote/embedding detector beside d6's symmetric Jaccard: a short
  // document wholly quoted inside a long one scores containment ~1.0
  // where Jaccard is near zero. Same df-capped inverted index as d6
  // (ReuseExchange runs the tokenize-hash-dedup stage once); only the
  // final ratio differs: inter / min(n_a, n_b) >= 0.8. The oracle
  // reuses d6's CTE chain with the containment ratio. ----
  private def d41(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(docs(s, dir), "text", "doc_id",
      k = 5, threshold = 0.8, maxDf = 100)
      .orderBy("doc_a", "doc_b")

  private val d41Oracle =
    s"""WITH $jaccardCtes
      |SELECT p.id_a AS doc_a, p.id_b AS doc_b, p.inter AS inter,
      |  ROUND(p.inter / least(sa.n, sb.n), 6) AS containment
      |FROM p
      |JOIN sizes sa ON p.id_a = sa.doc_id
      |JOIN sizes sb ON p.id_b = sb.doc_id
      |WHERE ROUND(p.inter / least(sa.n, sb.n), 6) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- d11: near-dup GROUPS — connected components over the d6 pairs,
  // every document mapped to its cluster's surviving (minimum) id. The
  // oracle replays the pair derivation and closes it transitively with a
  // recursive CTE, so the driver hash-verifies the distributed label
  // propagation end to end. ----
  private def d11(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.jaccardPairs(d, "text", "doc_id",
      k = 5, threshold = 0.6, maxDf = 100)
    Dedup.survivors(d, pairs, "doc_id").orderBy("doc_id")
  }

  // ---- d50: connected components by alternating Large-Star/Small-Star
  // contraction (Kiveris 2014) over the d6 pair list — the
  // beyond-diameter CC scale path beside d11's min-label propagation
  // (one round per diameter hop vs O(log²) rounds on any topology; the
  // 64-path spec shows min-label's default budget silently truncating
  // where star contraction closes). Result contract is identical — every
  // paired doc labeled with its component's minimum id — so the oracle
  // is the same recursive-CTE transitive closure, restricted to paired
  // nodes. ----
  private def d50(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.jaccardPairs(d, "text", "doc_id",
      k = 5, threshold = 0.6, maxDf = 100)
    Dedup.componentsAltStar(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id")
  }

  private val d50Oracle =
    s"""WITH RECURSIVE $jaccardCtes,
      |jp AS (
      |  SELECT p.id_a, p.id_b FROM p
      |  JOIN sizes sa ON p.id_a = sa.doc_id
      |  JOIN sizes sb ON p.id_b = sb.doc_id
      |  WHERE ROUND(p.inter / (sa.n + sb.n - p.inter), 6) >= 0.6),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM jp
      |  UNION SELECT id_b, id_a FROM jp),
      |nodes AS (SELECT DISTINCT src AS id FROM edges),
      |cc AS (
      |  SELECT id, id AS comp FROM nodes
      |  UNION
      |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON cc.id = e.src)
      |SELECT id AS doc_id, MIN(comp) AS component FROM cc
      |GROUP BY id ORDER BY doc_id""".stripMargin

  // ---- d52: INCREMENTAL connected components — the dedup-groups
  // artifact's append face (Dedup.componentsAppend): the archive
  // (doc_id % 4 != 0) is clustered once, then the increment appends as
  // (archive labels as star edges) ∪ (increment-touching pairs) — the
  // archive is never re-paired OR re-clustered. The oracle is the SAME
  // full-corpus recursive closure as d50: passing it certifies the
  // append algebra produces exactly the from-scratch result, the d21 →
  // groups completion of the incremental-dedup story (and the dedup twin
  // of the nnDescentAppend/s15 index-maintenance contract). Pair mining
  // runs once over the full corpus and splits by membership — the d21
  // persisted-index contract (df stats over the full history). ----
  private def d52(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // mined ONCE and materialized: the archive/increment splits and both
    // CC passes (each of which walks its pair input several times —
    // canon + self-pair restore + per-round lineage) would otherwise
    // re-run the LSH pair mining repeatedly
    val pairs = Dedup.jaccardPairs(d, "text", "doc_id",
      k = 5, threshold = 0.6, maxDf = 100).localCheckpoint(true)
    def arch(c: org.apache.spark.sql.Column) = c % 4 =!= 0
    val archPairs = pairs.filter(arch(col("doc_a")) && arch(col("doc_b")))
    val incPairs = pairs.filter(!arch(col("doc_a")) || !arch(col("doc_b")))
    val old = Dedup.componentsAltStar(archPairs, "doc_a", "doc_b")
    Dedup.componentsAppend(old, incPairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id")
  }

  // d52's oracle IS d50's: the whole point is that the append face must
  // reproduce the from-scratch closure over the full pair set.
  private def d52Oracle: String = d50Oracle

  // ---- d55: RETRACTION face of the dedup-groups artifact
  // (Dedup.componentsRetract) — the delete twin of d52's append: the
  // full corpus is clustered once (survivors view: every doc labeled,
  // pairless docs label themselves), then doc_id % 10 = 3 is retracted
  // (a takedown batch). Only components touched by a removal
  // re-cluster over their SURVIVING pair evidence — untouched labels
  // pass through verbatim — and the result must equal a from-scratch
  // closure over pairs among surviving docs (bridge removals SPLIT
  // groups; the degenerate cut-vertex face is spec-certified in
  // DedupSpec). Oracle: the d11 recursive closure seeded from the
  // surviving documents with both pair endpoints surviving. ----
  private def d55(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.jaccardPairs(d, "text", "doc_id",
      k = 5, threshold = 0.6, maxDf = 100).localCheckpoint(true)
    val old = Dedup.survivors(d, pairs, "doc_id")
      .select(col("doc_id").as("id"), col("keep_id").as("component"))
    val removed = d.filter(col("doc_id") % 10 === 3).select("doc_id")
    Dedup.componentsRetract(old, pairs, removed, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id")
  }

  private[graft] val d55Oracle =
    s"""WITH RECURSIVE $jaccardCtes,
      |jp AS (
      |  SELECT p.id_a, p.id_b FROM p
      |  JOIN sizes sa ON p.id_a = sa.doc_id
      |  JOIN sizes sb ON p.id_b = sb.doc_id
      |  WHERE ROUND(p.inter / (sa.n + sb.n - p.inter), 6) >= 0.6),
      |surv AS (SELECT doc_id FROM documents WHERE doc_id % 10 <> 3),
      |jps AS (
      |  SELECT id_a, id_b FROM jp
      |  JOIN surv va ON jp.id_a = va.doc_id
      |  JOIN surv vb ON jp.id_b = vb.doc_id),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM jps
      |  UNION SELECT id_b, id_a FROM jps),
      |cc AS (
      |  SELECT doc_id AS id, doc_id AS comp FROM surv
      |  UNION
      |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON cc.id = e.src)
      |SELECT id AS doc_id, MIN(comp) AS component FROM cc
      |GROUP BY id ORDER BY doc_id""".stripMargin

  // ---- d60: dedup-groups UPDATE (Dedup.componentsUpdate) — the
  // re-crawl edit path for the GROUPS family, completing the
  // UPDATE-face matrix (shingle d58, winnow d59, IVF-PQ e29, hash
  // mm14, video mm15, graph-ANN e32): every doc with doc_id % 7 = 1
  // is re-crawled as a CHANGED version (text doubled — its jaccard
  // denominators grow, so some of its old near-dup edges dissolve:
  // groups split; identically-doubled near-dups re-pair: groups
  // re-form), the update face retracts the old versions from the
  // (labels, pairs) artifact and appends the re-mined evidence
  // (incrementalPairsFromIndex at the d58-updated serving index —
  // the archive is never re-mined or re-clustered), and the oracle is
  // a from-scratch pair-mine + recursive CC over the
  // corpus-with-new-versions. The gate runs UNCAPPED (maxDf high
  // enough to never bind): evidence kept verbatim for unchanged docs
  // is exact only while the increment moves no shingle across the df
  // cap — the cap is a property of the MINING snapshot (the d21
  // freshness contract, documented on the face); the cap-maintenance
  // problem itself is the shingle family's, solved by its uncapped
  // sketch (d58/s27). Ordering spec-pinned in UpdateFacesSpec. ----
  private def d60(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val isUpd = col("doc_id") % 7 === 1
    val maxDf = 10000
    // the corpus is tokenized ONCE (VERDICT r16 task 1b): the uncapped
    // pair-mine and the d58-update serving index below both read this
    // checkpointed sketch instead of re-deriving it
    val sketch0 = Dedup.hashedShingleSketch(d, "text", "doc_id", k = 5)
      .localCheckpoint(true)
    val pairs0 = Dedup.jaccardPairsFromSketch(sketch0, k = 5,
      threshold = 0.6, maxDf = maxDf).localCheckpoint(true)
    val labels0 = Dedup.survivors(d, pairs0, "doc_id")
      .select(col("doc_id").as("id"), col("keep_id").as("component"))
    val newVersions = d.filter(isUpd)
      .withColumn("text", concat(col("text"), lit(" "), col("text")))
    // re-mine ONLY the changed docs' evidence, against the
    // d58-updated serving index (caps + sizes re-derived over the
    // updated corpus, so probe arithmetic matches the rebuild's)
    val updIdx = Dedup.shingleServingIndex(
      Dedup.shingleSketchUpdate(sketch0,
        newVersions, "text", "doc_id", k = 5),
      k = 5, maxDf = maxDf)
    val newPairs = Dedup.incrementalPairsFromIndex(updIdx, newVersions,
        "text", "doc_id", k = 5, threshold = 0.6)
      .filter(col("new_id") =!= col("corpus_id"))
      .select(col("new_id").as("doc_a"), col("corpus_id").as("doc_b"))
    Dedup.componentsUpdate(
        Dedup.GroupsArtifact(labels0, pairs0.select("doc_a", "doc_b")),
        newVersions.select("doc_id"), newPairs, "doc_a", "doc_b")
      .labels
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id")
  }

  private val d60Oracle = {
    val src =
      """(SELECT doc_id,
        |   CASE WHEN doc_id % 7 = 1 THEN text || ' ' || text
        |        ELSE text END AS text
        | FROM documents)""".stripMargin
    s"""WITH RECURSIVE ${jaccardCtesFrom(src, maxDf = 10000)},
      |jp AS (
      |  SELECT p.id_a, p.id_b FROM p
      |  JOIN sizes sa ON p.id_a = sa.doc_id
      |  JOIN sizes sb ON p.id_b = sb.doc_id
      |  WHERE ROUND(p.inter / (sa.n + sb.n - p.inter), 6) >= 0.6),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM jp
      |  UNION SELECT id_b, id_a FROM jp),
      |cc AS (
      |  SELECT doc_id AS id, doc_id AS comp FROM documents
      |  UNION
      |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON cc.id = e.src)
      |SELECT id AS doc_id, MIN(comp) AS component FROM cc
      |GROUP BY id ORDER BY doc_id""".stripMargin
  }

  // ---- d34: leakage-safe train/val/test split — assignment keyed on
  // the near-dup GROUP (d11's component minimum), so near-duplicates
  // never straddle a train/test boundary. Oracle = d11's recursive-CC
  // replay + d10's sha-bucket CASE applied to the group id. ----
  private def d34(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.jaccardPairs(d, "text", "doc_id",
      k = 5, threshold = 0.6, maxDf = 100)
    Dedup.groupSafeSplit(d, pairs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        bucketFn = Sampling.shaBucket)
      .orderBy("doc_id")
  }

  private val d34Oracle =
    s"""WITH RECURSIVE $jaccardCtes,
      |jp AS (
      |  SELECT p.id_a, p.id_b FROM p
      |  JOIN sizes sa ON p.id_a = sa.doc_id
      |  JOIN sizes sb ON p.id_b = sb.doc_id
      |  WHERE ROUND(p.inter / (sa.n + sb.n - p.inter), 6) >= 0.6),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM jp
      |  UNION SELECT id_b, id_a FROM jp),
      |cc AS (
      |  SELECT doc_id AS id, doc_id AS comp FROM documents
      |  UNION
      |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON cc.id = e.src),
      |g AS (
      |  SELECT id AS doc_id, MIN(comp) AS group_id FROM cc GROUP BY id)
      |SELECT doc_id, group_id,
      |  CASE WHEN b < 8000 THEN 'train'
      |       WHEN b < 9000 THEN 'val'
      |       WHEN b < 10000 THEN 'test'
      |       ELSE 'rest' END AS split
      |FROM (SELECT doc_id, group_id,
      |        ('0x' || substr(sha256('42:' || CAST(group_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS b
      |      FROM g)
      |ORDER BY doc_id""".stripMargin

  private val d11Oracle =
    s"""WITH RECURSIVE $jaccardCtes,
      |jp AS (
      |  SELECT p.id_a, p.id_b FROM p
      |  JOIN sizes sa ON p.id_a = sa.doc_id
      |  JOIN sizes sb ON p.id_b = sb.doc_id
      |  WHERE ROUND(p.inter / (sa.n + sb.n - p.inter), 6) >= 0.6),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM jp
      |  UNION SELECT id_b, id_a FROM jp),
      |cc AS (
      |  SELECT doc_id AS id, doc_id AS comp FROM documents
      |  UNION
      |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON cc.id = e.src)
      |SELECT id AS doc_id, MIN(comp) AS keep_id FROM cc
      |GROUP BY id ORDER BY doc_id""".stripMargin

  // ---- d7/d8: hash-based near-dup (xxhash64 not reproducible in DuckDB —
  // rows-only here, exact coverage in MinHashLSHSpec/SimHashSpec). ----
  private def d7(s: SparkSession, dir: String): DataFrame =
    MinHashLSH.candidatePairs(docs(s, dir), "text", "doc_id")
      .orderBy("doc_a", "doc_b")

  private def d8(s: SparkSession, dir: String): DataFrame =
    SimHash.pairs(docs(s, dir), "text", "doc_id")
      .orderBy("doc_a", "doc_b")

  // ---- d13/d14: the CERTIFICATION variants of d8/d7 — the identical
  // SimHash / MinHash-LSH pipelines with the per-token/per-shingle hash
  // swapped from xxhash64 to a sha256 prefix DuckDB can replay, so the
  // whole construction (bit votes → fingerprint → chunk pigeonhole join;
  // permuted min-signatures → banded buckets → agreement estimate) is
  // hash-verified end-to-end at the gate. maxBucket is uncapped here so
  // the bucketed candidate set provably equals the oracle's all-pairs
  // form (pigeonhole for Hamming ≤ 3; band-slice equality for LSH); the
  // xxhash64 defaults with production caps remain the 100 TB path. ----
  private def d13(s: SparkSession, dir: String): DataFrame =
    SimHash.pairs(docs(s, dir), "text", "doc_id", maxHamming = 3,
      maxBucket = Int.MaxValue, hashFn = SimHash.shaTokenHash, numBits = 60)
      .orderBy("doc_a", "doc_b")

  private val d13Oracle =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS t
      |  FROM documents),
      |h AS (SELECT doc_id, ('0x' || substr(sha256(t), 1, 15))::BIGINT AS h FROM tok),
      |bits AS (SELECT unnest(generate_series(0, 59)) AS b),
      |votes AS (
      |  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |  FROM h CROSS JOIN bits GROUP BY doc_id, b),
      |fp0 AS (
      |  SELECT doc_id, SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS fp
      |  FROM votes GROUP BY doc_id),
      |fp AS (
      |  SELECT d.doc_id, COALESCE(f.fp, 0) AS fp
      |  FROM documents d LEFT JOIN fp0 f USING (doc_id))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
      |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.fp, b.fp)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  private def d14(s: SparkSession, dir: String): DataFrame =
    MinHashLSH.candidatePairs(docs(s, dir), "text", "doc_id",
      k = 5, numHashes = 64, bands = 16, estThreshold = 0.5,
      maxBucket = Int.MaxValue, shingleRows = TextAnalysis.shaShingleRows)
      .orderBy("doc_a", "doc_b")

  private val d14Oracle: String = {
    val mod = MinHashLSH.Modulus
    val ps = MinHashLSH.perms(64)
    val minExprs = ps.zipWithIndex.map { case ((a, b), i) =>
      s"MIN((h * $a + $b) % $mod) AS m$i"
    }.mkString(", ")
    val bandEq = (0 until 16).map { b =>
      (0 until 4).map(r => s"a.m${b * 4 + r} = b.m${b * 4 + r}")
        .mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val agree = (0 until 64)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) >= 5 THEN
       |      list_transform(generate_series(1, len(ws) - 4),
       |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])
       |    ELSE CAST([] AS VARCHAR[]) END AS shingles
       |  FROM w),
       |u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |hs AS (SELECT doc_id, ('0x' || substr(sha256(s), 1, 8))::BIGINT AS h FROM u),
       |sig AS (
       |  SELECT doc_id, $minExprs
       |  FROM hs GROUP BY doc_id),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    ROUND(($agree) / 64.0, 6) AS est_jaccard
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE ($bandEq))
       |SELECT doc_a, doc_b, est_jaccard FROM p
       |WHERE est_jaccard >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---- d15: the COMPOSED end-to-end near-dup dedup pipeline — LSH
  // candidates (sha family, as d14) → exact Jaccard verification
  // restricted to the flagged slice → connected components → survivors.
  // The oracle replays all four stages: the d14 signature/band algebra
  // picks the candidate pairs, the d6 inverted-index Jaccard (computed
  // over candidate members only, df-cap included) verifies them, and the
  // d11 recursive-CTE closure maps every document to its cluster minimum.
  // maxBucket uncapped like d14 so bucketed candidates provably equal the
  // oracle's band-equality pairs; the xxhash64 defaults with production
  // caps remain the 100 TB path (exercised by d7 + PipelineSpec). ----
  private def d15(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupPipeline(docs(s, dir), "text", "doc_id",
      k = 5, threshold = 0.6, numHashes = 64, bands = 16,
      estThreshold = 0.5, maxBucket = Int.MaxValue, maxDf = 100,
      shingleRows = TextAnalysis.shaShingleRows)
      .orderBy("doc_id")

  private val d15Oracle: String = {
    val mod = MinHashLSH.Modulus
    val ps = MinHashLSH.perms(64)
    val minExprs = ps.zipWithIndex.map { case ((a, b), i) =>
      s"MIN((h * $a + $b) % $mod) AS m$i"
    }.mkString(", ")
    val bandEq = (0 until 16).map { b =>
      (0 until 4).map(r => s"a.m${b * 4 + r} = b.m${b * 4 + r}")
        .mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val agree = (0 until 64)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH RECURSIVE
       |w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(
       |    CASE WHEN len(ws) >= 5 THEN
       |      list_transform(generate_series(1, len(ws) - 4),
       |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])
       |    ELSE CAST([] AS VARCHAR[]) END) AS shingles
       |  FROM w),
       |u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |hs AS (SELECT doc_id, ('0x' || substr(sha256(s), 1, 8))::BIGINT AS h FROM u),
       |sig AS (SELECT doc_id, $minExprs FROM hs GROUP BY doc_id),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE ($bandEq) AND ROUND(($agree) / 64.0, 6) >= 0.5),
       |cdocs AS (
       |  -- DISTINCT over UNION ALL, not UNION: inside a WITH RECURSIVE
       |  -- list DuckDB 1.0.0 skips the UNION dedup for non-recursive CTEs
       |  -- (d11's edges tolerate that; a membership set must not).
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM cand
       |    UNION ALL SELECT doc_b FROM cand)),
       |idx AS (
       |  SELECT sh.doc_id, unnest(sh.shingles) AS shingle
       |  FROM sh JOIN cdocs USING (doc_id)),
       |df_ok AS (
       |  SELECT shingle FROM idx GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 100),
       |f AS (SELECT idx.* FROM idx JOIN df_ok USING (shingle)),
       |p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (
       |  SELECT sh.doc_id, len(shingles) AS n FROM sh JOIN cdocs USING (doc_id)),
       |jp AS (
       |  SELECT p.id_a, p.id_b FROM p
       |  JOIN sizes sa ON p.id_a = sa.doc_id
       |  JOIN sizes sb ON p.id_b = sb.doc_id
       |  JOIN cand c ON p.id_a = c.doc_a AND p.id_b = c.doc_b
       |  WHERE ROUND(p.inter / (sa.n + sb.n - p.inter), 6) >= 0.6),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM jp
       |  UNION SELECT id_b, id_a FROM jp),
       |cc AS (
       |  SELECT doc_id AS id, doc_id AS comp FROM documents
       |  UNION
       |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON cc.id = e.src)
       |SELECT id AS doc_id, MIN(comp) AS keep_id FROM cc
       |GROUP BY id ORDER BY doc_id""".stripMargin
  }

  // ---- e1: brute-force cosine top-k (the ANN baseline). ----
  private def e1(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(emb(s, dir), "vec_id", "embedding",
      _ < 20, k = 5)
      .orderBy("q_id", "rank")

  private val e1Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id < 20),
      |s AS (
      |  SELECT q.vec_id AS q_id, e.vec_id AS nn_id,
      |    ROUND(list_dot_product(q.v, e.v) /
      |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6) AS sim
      |  FROM q JOIN e ON q.vec_id <> e.vec_id),
      |r AS (
      |  SELECT q_id, nn_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM s)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e2: k-NN majority-vote classification on top of e1. ----
  private def e2(s: SparkSession, dir: String): DataFrame = {
    val topk = Similarity.bruteForceTopK(emb(s, dir), "vec_id", "embedding",
      _ < 20, k = 10)
    Similarity.knnClassify(topk, emb(s, dir), "vec_id", "label")
      .orderBy("q_id")
  }

  private val e2Oracle =
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id < 20),
      |s AS (
      |  SELECT q.vec_id AS q_id, e.vec_id AS nn_id, e.label AS nn_label,
      |    ROUND(list_dot_product(q.v, e.v) /
      |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6) AS sim
      |  FROM q JOIN e ON q.vec_id <> e.vec_id),
      |r AS (
      |  SELECT q_id, nn_id, nn_label, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM s),
      |votes AS (
      |  SELECT q_id, nn_label, COUNT(*) AS votes FROM r WHERE rank <= 10
      |  GROUP BY q_id, nn_label),
      |best AS (
      |  SELECT q_id, nn_label, votes,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY votes DESC, nn_label) AS rn
      |  FROM votes)
      |SELECT q_id, nn_label AS predicted_label, votes
      |FROM best WHERE rn = 1 ORDER BY q_id""".stripMargin

  // ---- e3: LSH-bucketed ANN (recall<1 by design vs brute force; recall
  // asserted in PipelineSpec). The hyperplanes are fixed-seed plan
  // literals, so the oracle embeds the SAME planes as SQL literal arrays
  // (shortest-repr doubles round-trip exactly through both parsers) and
  // replays the whole construction: sign-bit signatures, ≤2-bit-flip
  // multi-probe, bucket join, cosine, per-query top-k. ----
  private def e3(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(emb(s, dir), "vec_id", "embedding", _ < 20, k = 5)
      .orderBy("q_id", "rank")

  private val e3Oracle: String = {
    val bits = 6
    val planes = Similarity.lshPlanes(dim = 64, bits = bits)
    val sigExpr = planes.zipWithIndex.map { case (plane, p) =>
      val arr = plane.mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(v, $arr) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    val flips = (0L +:
      ((0 until bits).map(b => 1L << b) ++
        (for { a <- 0 until bits; b <- a + 1 until bits }
          yield (1L << a) | (1L << b))).map(_.toLong)).mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sg AS (SELECT vec_id, v, $sigExpr AS sig FROM e),
       |q AS (SELECT * FROM sg WHERE vec_id < 20),
       |fl AS (SELECT unnest($flips) AS flip),
       |probes AS (
       |  SELECT q.vec_id AS q_id, q.v AS qv, xor(q.sig, fl.flip) AS sig
       |  FROM q CROSS JOIN fl),
       |cand AS (
       |  SELECT DISTINCT p.q_id, s.vec_id AS nn_id,
       |    ROUND(list_dot_product(p.qv, s.v) /
       |      (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.v, s.v))), 6) AS sim
       |  FROM probes p JOIN sg s ON p.sig = s.sig AND p.q_id <> s.vec_id),
       |r AS (
       |  SELECT q_id, nn_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
       |  FROM cand)
       |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, sim
       |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  // ---- e5: IVF-cell ANN (recall<1 by design vs brute force; recall
  // asserted in PipelineSpec). Fully oracle-replayable: the coarse
  // quantizer is a sha256-ordered id sample (≡ DuckDB sha256), cell
  // assignment is argmax cosine over the 16 centroids (max-struct ≡
  // ORDER BY s DESC, c DESC), probes are each query's top-4 cells. ----
  private def e5(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(emb(s, dir), "vec_id", "embedding", _ < 20, k = 5)
      .orderBy("q_id", "rank")

  private val e5Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cents AS (
      |  SELECT vec_id AS cid, v AS cv FROM e
      |  ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      |assign AS (
      |  SELECT e.vec_id, e.v, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ROUND(list_dot_product(e.v, c.cv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) DESC,
      |      c.cid DESC) AS rn
      |  FROM e CROSS JOIN cents c),
      |cells AS (SELECT vec_id, v, cid AS cell FROM assign WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS q_id, v AS qv, cid AS cell FROM assign
      |  WHERE vec_id < 20 AND rn <= 4),
      |cand AS (
      |  SELECT p.q_id, s.vec_id AS nn_id,
      |    ROUND(list_dot_product(p.qv, s.v) /
      |      (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.v, s.v))), 6) AS sim
      |  FROM probes p JOIN cells s ON p.cell = s.cell AND p.q_id <> s.vec_id),
      |r AS (
      |  SELECT q_id, nn_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM cand)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e25: FILTERED IVF ANN (Similarity.filteredIvfTopK) — vector
  // search with a metadata predicate: top-5 among SAME-label corpus
  // vectors, the filter applied at the inverted-list scan (not by
  // post-filtering an unconstrained top-k, which starves recall under
  // selective predicates — spec-asserted). The oracle is e5's full
  // replay plus the label equi-condition in the candidate join. ----
  private def e25(s: SparkSession, dir: String): DataFrame =
    Similarity.filteredIvfTopK(emb(s, dir), "vec_id", "embedding",
        "label", _ < 20, k = 5)
      .orderBy("q_id", "rank")

  private val e25Oracle =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      |  FROM embeddings),
      |cents AS (
      |  SELECT vec_id AS cid, v AS cv FROM e
      |  ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      |assign AS (
      |  SELECT e.vec_id, e.v, e.label, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ROUND(list_dot_product(e.v, c.cv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) DESC,
      |      c.cid DESC) AS rn
      |  FROM e CROSS JOIN cents c),
      |cells AS (SELECT vec_id, v, label, cid AS cell FROM assign WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS q_id, v AS qv, label AS ql, cid AS cell FROM assign
      |  WHERE vec_id < 20 AND rn <= 4),
      |cand AS (
      |  SELECT p.q_id, s.vec_id AS nn_id,
      |    ROUND(list_dot_product(p.qv, s.v) /
      |      (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.v, s.v))), 6) AS sim
      |  FROM probes p JOIN cells s ON p.cell = s.cell AND p.q_id <> s.vec_id
      |    AND s.label = p.ql),
      |r AS (
      |  SELECT q_id, nn_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM cand)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e7: TWO-LEVEL IVF ANN (the nlist ≫ 10³ configuration) under the
  // gate. nlist = 81 > 64 forces the fused kernel path, superProbe = 2
  // engages Ivf2CellsExpr: score 9 super-centroids, descend into the
  // children of the best 2, take the top-4 cells. The oracle replays the
  // ENTIRE two-level construction in SQL: sha-ordered centroid sample
  // with sample-order indexes, supers = first ceil(√81) = 9, child→super
  // home assignment (cosine desc, larger super index on ties), per-vector
  // super top-2 then child top-1 (corpus cells) / top-4 (query probes),
  // bucket join, rounded cosine, per-query top-k. Cell assignment ranks
  // UNROUNDED cosines on both sides — deterministic on the fixed fixtures
  // (validated at sf0.01 and sf0.1); the output ranking itself uses the
  // 6-dp rounded sim exactly like e5. ----
  private def e7(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(emb(s, dir), "vec_id", "embedding", _ < 20, k = 5,
      nlist = 81, nprobe = 4, superProbe = 2)
      .orderBy("q_id", "rank")

  private val e7Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cents AS (
      |  SELECT cid, cv, ROW_NUMBER() OVER (ORDER BY sha, cid) - 1 AS cidx
      |  FROM (SELECT vec_id AS cid, v AS cv,
      |          sha256(CAST(vec_id AS VARCHAR)) AS sha
      |        FROM e ORDER BY sha, vec_id LIMIT 81)),
      |supers AS (SELECT cidx AS sidx, cv AS sv FROM cents WHERE cidx < 9),
      |home AS (
      |  SELECT cid, cv, sidx FROM (
      |    SELECT c.cid, c.cv, s.sidx,
      |      ROW_NUMBER() OVER (PARTITION BY c.cidx ORDER BY
      |        list_dot_product(c.cv, s.sv) /
      |          (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(s.sv, s.sv))) DESC,
      |        s.sidx DESC) AS rn
      |    FROM cents c CROSS JOIN supers s)
      |  WHERE rn = 1),
      |sup_top AS (
      |  SELECT vec_id, sidx FROM (
      |    SELECT e.vec_id, s.sidx,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, s.sv) /
      |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.sv, s.sv))) DESC,
      |        s.sidx DESC) AS rn
      |    FROM e CROSS JOIN supers s)
      |  WHERE rn <= 2),
      |ranked AS (
      |  SELECT vec_id, cell, ROW_NUMBER() OVER (
      |      PARTITION BY vec_id ORDER BY cs DESC, cell DESC) AS rn
      |  FROM (
      |    SELECT st.vec_id, h.cid AS cell,
      |      list_dot_product(e.v, h.cv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(h.cv, h.cv))) AS cs
      |    FROM sup_top st JOIN e ON e.vec_id = st.vec_id
      |    JOIN home h ON h.sidx = st.sidx)),
      |cells AS (
      |  SELECT e.vec_id, e.v, r.cell
      |  FROM e JOIN ranked r ON e.vec_id = r.vec_id AND r.rn = 1),
      |probes AS (
      |  SELECT r.vec_id AS q_id, q.v AS qv, r.cell
      |  FROM ranked r JOIN e q ON q.vec_id = r.vec_id
      |  WHERE r.vec_id < 20 AND r.rn <= 4),
      |cand AS (
      |  SELECT p.q_id, s.vec_id AS nn_id,
      |    ROUND(list_dot_product(p.qv, s.v) /
      |      (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.v, s.v))), 6) AS sim
      |  FROM probes p JOIN cells s ON p.cell = s.cell AND p.q_id <> s.vec_id),
      |r AS (
      |  SELECT q_id, nn_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM cand)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e8: product-quantization ANN (asymmetric distance) — the PQ half
  // of the standard IVF-PQ layout, under the gate. 8 subspaces × 16-entry
  // codebooks (the sha-ordered sample e5 also uses, sliced), corpus rows
  // reduced to 8 codes by the fused PqEncodeExpr kernel, queries scored
  // against codebook reconstructions by PqAdcExpr. The oracle replays
  // encoding (UNROUNDED sub-distance argmin, ties to the smaller code —
  // both engines compute the identical fold, the e7 precedent),
  // reconstruction (flatten of codebook slices in subspace order), and
  // the per-subspace ADC fold (the hoisted-LUT parenthesization — the
  // Spark side computes the query's m×ksub table once per query and the
  // per-candidate distance is m table reads). Kernel ≡ HOF reference forms and
  // shortlist recall vs exact L2 asserted in PipelineSpec. ----
  private def e8(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(emb(s, dir), "vec_id", "embedding", _ < 20, k = 5)
      .orderBy("q_id", "rank")

  private val e8Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cb AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY sha, vec_id) - 1 AS c, v
      |  FROM (SELECT vec_id, v, sha256(CAST(vec_id AS VARCHAR)) AS sha
      |        FROM e ORDER BY sha, vec_id LIMIT 16)),
      |enc0 AS (
      |  SELECT e.vec_id, js.j, cb.c,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (e.v[js.j*8 + i] - cb.v[js.j*8 + i])
      |           * (e.v[js.j*8 + i] - cb.v[js.j*8 + i]))) AS d
      |  FROM e CROSS JOIN generate_series(0, 7) AS js(j) CROSS JOIN cb),
      |enc AS (
      |  SELECT vec_id, j, c FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM enc0) WHERE rn = 1),
      |recon AS (
      |  SELECT enc.vec_id,
      |    flatten(list(cb.v[enc.j*8+1 : enc.j*8+8] ORDER BY enc.j)) AS rv
      |  FROM enc JOIN cb ON cb.c = enc.c
      |  GROUP BY enc.vec_id),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
      |adc AS (
      |  SELECT q.q_id, r.vec_id AS nn_id,
      |    ROUND(list_sum(list_transform(generate_series(0, 7),
      |      j -> list_sum(list_transform(generate_series(1, 8),
      |        i -> (q.qv[j*8+i] - r.rv[j*8+i])
      |             * (q.qv[j*8+i] - r.rv[j*8+i]))))), 6) AS adist
      |  FROM q JOIN recon r ON q.q_id <> r.vec_id),
      |rk AS (
      |  SELECT q_id, nn_id, adist,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, nn_id) AS rank
      |  FROM adc)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, adist
      |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e9: composed IVF-PQ ANN — e5's coarse routing over e8's stored
  // codes. The oracle fuses the two replays: `samp` serves as both the
  // centroid set (cid + full vector, cosine assignment with the e5
  // rounding/tie contract) and the PQ codebook (sample-order index c +
  // subspace slices, the e8 encode/reconstruction/ADC contract); the
  // candidate join is on the assigned cell instead of e8's all-pairs.
  // Same codebook ⇒ e8 and e9 codes are bit-identical — composition
  // (adist equality pair-for-pair, candidate-set containment) is
  // spec-asserted in PipelineSpec. ----
  private def e9(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopK(emb(s, dir), "vec_id", "embedding", _ < 20, k = 5)
      .orderBy("q_id", "rank")

  private val e9Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |samp AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY sha, vec_id) - 1 AS c, vec_id AS cid, v
      |  FROM (SELECT vec_id, v, sha256(CAST(vec_id AS VARCHAR)) AS sha
      |        FROM e ORDER BY sha, vec_id LIMIT 16)),
      |assign AS (
      |  SELECT e.vec_id, e.v, s.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ROUND(list_dot_product(e.v, s.v) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.v, s.v))), 9) DESC,
      |      s.cid DESC) AS rn
      |  FROM e CROSS JOIN samp s),
      |cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS q_id, v AS qv, cid AS cell FROM assign
      |  WHERE vec_id < 20 AND rn <= 4),
      |enc0 AS (
      |  SELECT e.vec_id, js.j, s.c,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (e.v[js.j*8 + i] - s.v[js.j*8 + i])
      |           * (e.v[js.j*8 + i] - s.v[js.j*8 + i]))) AS d
      |  FROM e CROSS JOIN generate_series(0, 7) AS js(j) CROSS JOIN samp s),
      |enc AS (
      |  SELECT vec_id, j, c FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM enc0) WHERE rn = 1),
      |recon AS (
      |  SELECT enc.vec_id,
      |    flatten(list(s.v[enc.j*8+1 : enc.j*8+8] ORDER BY enc.j)) AS rv
      |  FROM enc JOIN samp s ON s.c = enc.c
      |  GROUP BY enc.vec_id),
      |adc AS (
      |  SELECT p.q_id, cl.vec_id AS nn_id,
      |    ROUND(list_sum(list_transform(generate_series(0, 7),
      |      j -> list_sum(list_transform(generate_series(1, 8),
      |        i -> (p.qv[j*8+i] - r.rv[j*8+i])
      |             * (p.qv[j*8+i] - r.rv[j*8+i]))))), 6) AS adist
      |  FROM probes p
      |  JOIN cells cl ON p.cell = cl.cell AND p.q_id <> cl.vec_id
      |  JOIN recon r ON r.vec_id = cl.vec_id),
      |rk AS (
      |  SELECT q_id, nn_id, adist,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, nn_id) AS rank
      |  FROM adc)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, adist
      |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e11: PQ shortlist → exact re-rank (Similarity.pqRerankTopK) —
  // the production serving pattern: e8's compressed scan cut at rank 50,
  // raw vectors fetched for the survivors only, exact L2 decides the
  // final top-5. The oracle replays e8's encode/recon/ADC, cuts the
  // shortlist, and re-scores with the same full-dimension fold over raw
  // vectors. ----
  private def e11(s: SparkSession, dir: String): DataFrame =
    Similarity.pqRerankTopK(emb(s, dir), "vec_id", "embedding", _ < 20,
        k = 5, shortlist = 50)
      .orderBy("q_id", "rank")

  private val e11Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cb AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY sha, vec_id) - 1 AS c, v
      |  FROM (SELECT vec_id, v, sha256(CAST(vec_id AS VARCHAR)) AS sha
      |        FROM e ORDER BY sha, vec_id LIMIT 16)),
      |enc0 AS (
      |  SELECT e.vec_id, js.j, cb.c,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (e.v[js.j*8 + i] - cb.v[js.j*8 + i])
      |           * (e.v[js.j*8 + i] - cb.v[js.j*8 + i]))) AS d
      |  FROM e CROSS JOIN generate_series(0, 7) AS js(j) CROSS JOIN cb),
      |enc AS (
      |  SELECT vec_id, j, c FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM enc0) WHERE rn = 1),
      |recon AS (
      |  SELECT enc.vec_id,
      |    flatten(list(cb.v[enc.j*8+1 : enc.j*8+8] ORDER BY enc.j)) AS rv
      |  FROM enc JOIN cb ON cb.c = enc.c
      |  GROUP BY enc.vec_id),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
      |adc AS (
      |  SELECT q.q_id, r.vec_id AS nn_id,
      |    ROUND(list_sum(list_transform(generate_series(0, 7),
      |      j -> list_sum(list_transform(generate_series(1, 8),
      |        i -> (q.qv[j*8+i] - r.rv[j*8+i])
      |             * (q.qv[j*8+i] - r.rv[j*8+i]))))), 6) AS adist
      |  FROM q JOIN recon r ON q.q_id <> r.vec_id),
      |sl AS (
      |  SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, nn_id) AS rank
      |    FROM adc) WHERE rank <= 50),
      |ex AS (
      |  SELECT sl.q_id, sl.nn_id,
      |    ROUND(list_sum(list_transform(generate_series(1, 64),
      |      i -> (q.qv[i] - c.v[i]) * (q.qv[i] - c.v[i]))), 6) AS dist
      |  FROM sl JOIN q USING (q_id) JOIN e c ON c.vec_id = sl.nn_id),
      |rk AS (
      |  SELECT q_id, nn_id, dist,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, nn_id) AS rank
      |  FROM ex)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, dist
      |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e24: trained per-dimension int8 scalar quantization + exact
  // re-rank (Similarity.sq8RerankTopK) — the FAISS SQ8 serving layout.
  // The oracle replays the training pass (per-dimension MIN/MAX over
  // the corpus), the clamp-floor encode with the same double-arithmetic
  // order, the PURE-INTEGER squared-L2 shortlist (exact BIGINT on both
  // engines — the whole point of ranking on codes), and the e11
  // exact-L2 re-rank over raw vectors. ----
  private def e24(s: SparkSession, dir: String): DataFrame =
    Similarity.sq8RerankTopK(emb(s, dir), "vec_id", "embedding", _ < 20,
        k = 5, shortlist = 50)
      .orderBy("q_id", "rank")

  private val e24Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |st AS (
      |  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
      |  FROM e, generate_series(1, 64) AS g(i) GROUP BY i),
      |lims AS (
      |  SELECT list(mn ORDER BY i) AS mnl, list(mx ORDER BY i) AS mxl
      |  FROM st),
      |c AS (
      |  SELECT e.vec_id,
      |    list_transform(generate_series(1, 64), i ->
      |      CASE WHEN lims.mxl[i] = lims.mnl[i] THEN 0
      |      ELSE LEAST(GREATEST(CAST(floor(
      |        ((e.v[i] - lims.mnl[i]) * 255.0) / (lims.mxl[i] - lims.mnl[i]))
      |        AS BIGINT), 0), 255) END) AS codes
      |  FROM e CROSS JOIN lims),
      |q AS (SELECT vec_id AS q_id, codes AS qc FROM c WHERE vec_id < 20),
      |s AS (
      |  SELECT q.q_id, c.vec_id AS nn_id,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> (q.qc[i] - c.codes[i]) * (q.qc[i] - c.codes[i]))) AS idist
      |  FROM q JOIN c ON q.q_id <> c.vec_id),
      |sl AS (
      |  SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY idist, nn_id) AS rank
      |    FROM s) WHERE rank <= 50),
      |qv AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
      |ex AS (
      |  SELECT sl.q_id, sl.nn_id,
      |    ROUND(list_sum(list_transform(generate_series(1, 64),
      |      i -> (qv.qv[i] - t.v[i]) * (qv.qv[i] - t.v[i]))), 6) AS dist
      |  FROM sl JOIN qv USING (q_id) JOIN e t ON t.vec_id = sl.nn_id),
      |rk AS (
      |  SELECT q_id, nn_id, dist,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, nn_id) AS rank
      |  FROM ex)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, dist
      |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e12: residual IVF-PQ (Similarity.ivfPqResidualTopK) — codes
  // quantize v − centroid(cell); the oracle replays assignment (e5),
  // in-plan residuals, the OFFSET-16 codebook sample (the first 16
  // sha-rows are the centroids, whose own residuals are ~zero), encode,
  // reconstruction, and the residual-space ADC with the query residual
  // parenthesized exactly as Spark computes it. ----
  private def e12(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqResidualTopK(emb(s, dir), "vec_id", "embedding",
        _ < 20, k = 5)
      .orderBy("q_id", "rank")

  private val e12Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cents AS (
      |  SELECT vec_id AS cid, v AS cv FROM e
      |  ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      |assign AS (
      |  SELECT e.vec_id, e.v, c.cid, c.cv,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ROUND(list_dot_product(e.v, c.cv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) DESC,
      |      c.cid DESC) AS rn
      |  FROM e CROSS JOIN cents c),
      |res AS (
      |  SELECT vec_id, cid AS cell,
      |    list_transform(generate_series(1, 64), i -> v[i] - cv[i]) AS r
      |  FROM assign WHERE rn = 1),
      |cb AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY sha, vec_id) - 1 AS c, r AS v
      |  FROM (SELECT vec_id, r, sha256(CAST(vec_id AS VARCHAR)) AS sha
      |        FROM res ORDER BY sha, vec_id LIMIT 16 OFFSET 16)),
      |enc0 AS (
      |  SELECT res.vec_id, js.j, cb.c,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (res.r[js.j*8 + i] - cb.v[js.j*8 + i])
      |           * (res.r[js.j*8 + i] - cb.v[js.j*8 + i]))) AS d
      |  FROM res CROSS JOIN generate_series(0, 7) AS js(j) CROSS JOIN cb),
      |enc AS (
      |  SELECT vec_id, j, c FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM enc0) WHERE rn = 1),
      |recon AS (
      |  SELECT enc.vec_id,
      |    flatten(list(cb.v[enc.j*8+1 : enc.j*8+8] ORDER BY enc.j)) AS rv
      |  FROM enc JOIN cb ON cb.c = enc.c
      |  GROUP BY enc.vec_id),
      |probes AS (
      |  SELECT vec_id AS q_id, v AS qv, cid, cv FROM assign
      |  WHERE vec_id < 20 AND rn <= 4),
      |adc AS (
      |  SELECT p.q_id, res.vec_id AS nn_id,
      |    ROUND(list_sum(list_transform(generate_series(0, 7),
      |      j -> list_sum(list_transform(generate_series(1, 8),
      |        i -> ((p.qv[j*8+i] - p.cv[j*8+i]) - rc.rv[j*8+i])
      |             * ((p.qv[j*8+i] - p.cv[j*8+i]) - rc.rv[j*8+i]))))), 6) AS adist
      |  FROM probes p
      |  JOIN res ON res.cell = p.cid AND res.vec_id <> p.q_id
      |  JOIN recon rc ON rc.vec_id = res.vec_id),
      |rk AS (
      |  SELECT q_id, nn_id, adist,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, nn_id) AS rank
      |  FROM adc)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, adist
      |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e13: IVF ANN with a k-means-REFINED quantizer — the gate row for
  // the Lloyd iteration (the last spec-only similarity component through
  // round 8). One iteration from the deterministic sha-sample: assign
  // every vector to its round-9-cosine argmax cell (ties to the larger
  // label), replace each centroid with its cell's mean — folded in
  // ascending-id order (the d28 sorted-fold pattern) and rounded to 9 dp,
  // so the refined centroids are bit-identical across partitionings AND
  // in DuckDB — then route and rank exactly like e5 against the refined
  // centroids. The oracle replays the whole chain: sha sample, initial
  // assignment, list(ORDER BY id) means with COALESCE for empty cells,
  // re-assignment, probes, rounded-cosine top-k. nlist = 8, nprobe = 3,
  // k = 5 over the 64-dim embeddings. ----
  private def e13(s: SparkSession, dir: String): DataFrame = {
    val nlist = 8
    val centRows = emb(s, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .orderBy(sha2(col("id").cast("string"), 256), col("id"))
      .limit(nlist).collect()
    val labels = centRows.map(_.getLong(0))
    val init = centRows.map(_.getSeq[Double](1).toArray)
    val refined = Similarity.kmeansRefineExact(emb(s, dir), "vec_id",
      "embedding", init, labels, iters = 1)
    Similarity.ivfTopKWith(emb(s, dir), "vec_id", "embedding", _ < 20,
      k = 5, refined, labels.toSeq, nprobe = 3)
      .orderBy("q_id", "rank")
  }

  private val e13Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cents AS (
      |  SELECT vec_id AS cid, v AS cv FROM e
      |  ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      |assign0 AS (
      |  SELECT e.vec_id, e.v, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ROUND(list_dot_product(e.v, c.cv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) DESC,
      |      c.cid DESC) AS rn
      |  FROM e CROSS JOIN cents c),
      |cells0 AS (SELECT vec_id, v, cid AS cell FROM assign0 WHERE rn = 1),
      |agg AS (
      |  SELECT cell, COUNT(*) AS n, list(v ORDER BY vec_id) AS lv
      |  FROM cells0 GROUP BY cell),
      |refined AS (
      |  SELECT cell, list_transform(generate_series(1, 64),
      |    d -> ROUND(list_sum(list_transform(lv, x -> x[d])) / n, 9)) AS mv
      |  FROM agg),
      |cents1 AS (
      |  SELECT c.cid, COALESCE(r.mv, c.cv) AS cv
      |  FROM cents c LEFT JOIN refined r ON c.cid = r.cell),
      |assign1 AS (
      |  SELECT e.vec_id, e.v, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ROUND(list_dot_product(e.v, c.cv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) DESC,
      |      c.cid DESC) AS rn
      |  FROM e CROSS JOIN cents1 c),
      |cells AS (SELECT vec_id, v, cid AS cell FROM assign1 WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS q_id, v AS qv, cid AS cell FROM assign1
      |  WHERE vec_id < 20 AND rn <= 3),
      |cand AS (
      |  SELECT p.q_id, s.vec_id AS nn_id,
      |    ROUND(list_dot_product(p.qv, s.v) /
      |      (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(s.v, s.v))), 6) AS sim
      |  FROM probes p JOIN cells s ON p.cell = s.cell AND p.q_id <> s.vec_id),
      |r AS (
      |  SELECT q_id, nn_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM cand)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e14: binary sign-sketch prefilter + exact re-rank (Charikar
  // hyperplane sketch, coordinate-sign variant). Each vector compresses
  // to a 2×32-bit sign signature; the shortlist is the 50 smallest
  // Hamming distances (XOR + popcount — pure integer codegen, the
  // signature scan carries 16 bytes/row instead of 256); exact e1-contract
  // cosine over raw vectors decides the top-5. The oracle replays the
  // same chain: sign words as disjoint-power-of-two sums (additive fold
  // == bitwise OR, and two 32-bit words sidestep DuckDB's checked 1<<63),
  // Hamming shortlist with nn_id ties, cosine re-rank. ----
  private def e14(s: SparkSession, dir: String): DataFrame =
    Similarity.hammingRerankTopK(emb(s, dir), "vec_id", "embedding", _ < 20,
      k = 5, shortlist = 50)
      .orderBy("q_id", "rank")

  private val e14Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sig AS (
      |  SELECT vec_id, v,
      |    list_sum(list_transform(range(32), i -> CASE WHEN v[i+1] > 0
      |      THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS lo,
      |    list_sum(list_transform(range(32), i -> CASE WHEN v[i+33] > 0
      |      THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS hi
      |  FROM e),
      |short AS (
      |  SELECT q_id, nn_id, hamming, qv, nv FROM (
      |    SELECT q.vec_id AS q_id, n.vec_id AS nn_id,
      |      CAST(bit_count(xor(q.lo, n.lo)) + bit_count(xor(q.hi, n.hi)) AS INT) AS hamming,
      |      q.v AS qv, n.v AS nv,
      |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
      |        bit_count(xor(q.lo, n.lo)) + bit_count(xor(q.hi, n.hi)), n.vec_id) AS srn
      |    FROM sig q JOIN sig n ON n.vec_id <> q.vec_id
      |    WHERE q.vec_id < 20)
      |  WHERE srn <= 50),
      |rr AS (
      |  SELECT q_id, nn_id, hamming,
      |    ROUND(list_dot_product(qv, nv) /
      |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6) AS sim
      |  FROM short),
      |r AS (
      |  SELECT q_id, nn_id, hamming, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM rr)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, hamming, sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e15: Matryoshka prefix-dimension two-stage ANN — shortlist by
  // cosine over the FIRST 16 of 64 coordinates (1/4 the compute, and
  // 1/4 the scan width under a prefix-column layout), exact
  // full-dimension cosine re-ranks the survivors. The oracle replays
  // the sliced-prefix shortlist (DuckDB list slice v[1:16]) and the
  // full re-rank under the shared e1 cosine contract. ----
  private def e15(s: SparkSession, dir: String): DataFrame =
    Similarity.prefixRerankTopK(emb(s, dir), "vec_id", "embedding", _ < 20,
      k = 5, prefixDim = 16, shortlist = 50)
      .orderBy("q_id", "rank")

  private val e15Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (SELECT vec_id, v, v[1:16] AS pv FROM e),
      |short AS (
      |  SELECT q_id, nn_id, psim, qv, nv FROM (
      |    SELECT q.vec_id AS q_id, n.vec_id AS nn_id,
      |      ROUND(list_dot_product(q.pv, n.pv) /
      |        (sqrt(list_dot_product(q.pv, q.pv)) * sqrt(list_dot_product(n.pv, n.pv))), 6) AS psim,
      |      q.v AS qv, n.v AS nv,
      |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
      |        ROUND(list_dot_product(q.pv, n.pv) /
      |          (sqrt(list_dot_product(q.pv, q.pv)) * sqrt(list_dot_product(n.pv, n.pv))), 6) DESC,
      |        n.vec_id) AS srn
      |    FROM p q JOIN p n ON n.vec_id <> q.vec_id
      |    WHERE q.vec_id < 20)
      |  WHERE srn <= 50),
      |rr AS (
      |  SELECT q_id, nn_id, psim,
      |    ROUND(list_dot_product(qv, nv) /
      |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6) AS sim
      |  FROM short),
      |r AS (
      |  SELECT q_id, nn_id, psim, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM rr)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, psim, sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e16: hybrid retrieval — the RAG serving composition: BM25
  // lexical retrieval (d25's scorer, top-20 shortlist) re-ranked by
  // embedding cosine against a PSEUDO-RELEVANCE query vector (Rocchio:
  // the dimension-wise mean of the top-3 lexical hits' embeddings,
  // folded in ascending doc_id order and rounded to 9 dp — the e13
  // centroid contract — since the text query itself has no embedding in
  // an offline fixture). Final top-5 by exact cosine. The oracle
  // replays the whole chain: BM25 (d25's dyadic-constants argument),
  // the shortlist join to embeddings, the top-3 mean, and the re-rank.
  // 100 TB shape: BM25's stats ride one broadcast row; the re-rank
  // touches 20 vectors; the only corpus-wide work is d25's scan. ----
  private def e16(s: SparkSession, dir: String): DataFrame = {
    val bm = Curation.bm25Rank(docs(s, dir), "text", "doc_id",
        Seq("spark", "window", "merge"), topK = 20)
      .select(col("id").as("doc_id"), col("score").as("bm25"))
    val vecs = emb(s, dir).select(col("vec_id").as("doc_id"),
      col("embedding").cast("array<double>").as("v"))
    val short = bm.join(vecs, Seq("doc_id"))
    val qvec = short.orderBy(col("bm25").desc, col("doc_id")).limit(3)
      .agg(collect_list(struct(col("doc_id"), col("v"))).as("lv"),
        count(lit(1)).as("m"))
      .select(transform(sequence(lit(1), lit(64)), d =>
        round(aggregate(array_sort(col("lv")), lit(0.0), (acc, x) =>
          acc + element_at(x.getField("v"), d)) / col("m"), 9)).as("qv"))
    short.crossJoin(broadcast(qvec))
      .withColumn("sim",
        round(Similarity.cosineFast(col("qv"), col("v")), 6))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sim").desc, col("doc_id"))))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("bm25"), col("sim"))
      .orderBy("rank")
  }

  private val e16Oracle =
    """WITH d AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
      |st AS (SELECT doc_id,
      |  CAST(len(ws) AS DOUBLE) AS dl,
      |  CAST(len(list_filter(ws, x -> x = 'spark')) AS DOUBLE) AS tf0,
      |  CAST(len(list_filter(ws, x -> x = 'window')) AS DOUBLE) AS tf1,
      |  CAST(len(list_filter(ws, x -> x = 'merge')) AS DOUBLE) AS tf2
      |  FROM d),
      |g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
      |  CAST(COUNT(*) FILTER (WHERE tf0 > 0) AS DOUBLE) AS df0,
      |  CAST(COUNT(*) FILTER (WHERE tf1 > 0) AS DOUBLE) AS df1,
      |  CAST(COUNT(*) FILTER (WHERE tf2 > 0) AS DOUBLE) AS df2
      |  FROM st),
      |sc AS (SELECT doc_id, ROUND(
      |    ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.25
      |      / (tf0 + 1.25 * (0.25 + 0.75 * dl / avgdl))
      |  + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.25
      |      / (tf1 + 1.25 * (0.25 + 0.75 * dl / avgdl))
      |  + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.25
      |      / (tf2 + 1.25 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
      |  FROM st CROSS JOIN g),
      |bm AS (SELECT doc_id, score AS bm25 FROM sc WHERE score > 0
      |  ORDER BY score DESC, doc_id LIMIT 20),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |short AS (
      |  SELECT bm.doc_id, bm.bm25, e.v FROM bm JOIN e ON e.vec_id = bm.doc_id),
      |t3 AS (SELECT doc_id, v FROM short ORDER BY bm25 DESC, doc_id LIMIT 3),
      |qv AS (
      |  SELECT list_transform(generate_series(1, 64),
      |    dd -> ROUND(list_sum(list_transform(lv, x -> x[dd])) / m, 9)) AS q
      |  FROM (SELECT list(v ORDER BY doc_id) AS lv, COUNT(*) AS m FROM t3)),
      |rr AS (
      |  SELECT s.doc_id, s.bm25,
      |    ROUND(list_dot_product(qv.q, s.v) /
      |      (sqrt(list_dot_product(qv.q, qv.q)) * sqrt(list_dot_product(s.v, s.v))), 6) AS sim
      |  FROM short s CROSS JOIN qv),
      |r AS (
      |  SELECT doc_id, bm25, sim,
      |    ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS rank
      |  FROM rr)
      |SELECT doc_id, CAST(rank AS INT) AS rank, bm25, sim
      |FROM r WHERE rank <= 5 ORDER BY rank""".stripMargin

  // ---- e17: FaceNet triplet mining — per anchor, the hardest positive
  // (most-similar same-label) and hardest negative (most-similar
  // different-label), with the α-band semi-hard flag trainers batch on.
  // Margin is a DIFFERENCE OF INTEGER micro-units (each cosine
  // independently ROUND(·1e6)::BIGINT — the d33 one-rounding-layer
  // rule), so no derived-double re-round exists anywhere. ----
  private def e17(s: SparkSession, dir: String): DataFrame =
    Similarity.tripletMine(emb(s, dir), "vec_id", "embedding", "label",
        _ < 20, alphaU = 50000L)
      .orderBy("q_id")

  private val e17Oracle =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id < 20),
      |s AS (
      |  SELECT q.vec_id AS q_id, q.label, e.vec_id AS nn_id,
      |    e.label AS nn_label,
      |    ROUND(list_dot_product(q.v, e.v) /
      |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6) AS sim,
      |    CAST(ROUND(list_dot_product(q.v, e.v) /
      |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) * 1e6)
      |      AS BIGINT) AS sim_u
      |  FROM q JOIN e ON q.vec_id <> e.vec_id),
      |pos AS (
      |  SELECT q_id, nn_id AS pos_id, sim AS pos_sim, sim_u AS pos_u
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
      |          ORDER BY sim DESC, nn_id) AS rn
      |        FROM s WHERE label = nn_label)
      |  WHERE rn = 1),
      |neg AS (
      |  SELECT q_id, nn_id AS neg_id, sim AS neg_sim, sim_u AS neg_u
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
      |          ORDER BY sim DESC, nn_id) AS rn
      |        FROM s WHERE label <> nn_label)
      |  WHERE rn = 1)
      |SELECT q.vec_id AS q_id, q.label, pos.pos_id, pos.pos_sim,
      |  neg.neg_id, neg.neg_sim,
      |  pos.pos_u - neg.neg_u AS margin_u,
      |  CASE WHEN pos.pos_u - neg.neg_u > 0
      |        AND pos.pos_u - neg.neg_u <= 50000 THEN 1 ELSE 0 END AS semi_hard,
      |  CASE WHEN pos.pos_u - neg.neg_u <= 0 THEN 1 ELSE 0 END AS violation
      |FROM q LEFT JOIN pos ON pos.q_id = q.vec_id
      |  LEFT JOIN neg ON neg.q_id = q.vec_id
      |ORDER BY q_id""".stripMargin

  // ---- e6: top-k over int8-quantized storage (4× smaller vectors). The
  // roundtrip runs as the fused codegen kernel (QuantizeRoundtripExpr) —
  // the interpreted HOF composition was re-evaluated inside the join's
  // codegen inner loop (r1 bench: 37.7 s). The oracle replays the exact
  // quantization arithmetic with DuckDB list ops, like e1 does for full
  // precision; overlap vs full precision is asserted in PipelineSpec. ----
  private def e6(s: SparkSession, dir: String): DataFrame = {
    val deq = emb(s, dir).select(col("vec_id"),
      graft.functions.QuantizeRoundtrip.quantize_roundtrip(
        col("embedding").cast("array<double>")).as("embedding"))
    Similarity.bruteForceTopK(deq, "vec_id", "embedding", _ < 20, k = 5)
      .orderBy("q_id", "rank")
  }

  private val e6Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (SELECT vec_id, v,
      |        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |      FROM e),
      |d AS (SELECT vec_id,
      |        list_transform(v, x -> round(x / greatest(scale, 1e-30)) * scale) AS v
      |      FROM p),
      |q AS (SELECT * FROM d WHERE vec_id < 20),
      |s AS (
      |  SELECT q.vec_id AS q_id, d.vec_id AS nn_id,
      |    ROUND(list_dot_product(q.v, d.v) /
      |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(d.v, d.v))), 6) AS sim
      |  FROM q JOIN d ON q.vec_id <> d.vec_id),
      |r AS (
      |  SELECT q_id, nn_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM s)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---- e4: embedding-cosine near-dup pairs (the "semantic dedup" flavor:
  // exact all-pairs over a bounded subset; the unbounded path is e3's LSH
  // buckets with the same threshold filter). ----
  private def e4(s: SparkSession, dir: String): DataFrame = {
    val sub = emb(s, dir).filter(col("vec_id") < 500)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = sub.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = sub.select(col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", round(Similarity.cosineFast(col("va"), col("vb")), 6))
      .filter(col("sim") >= 0.4)
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy("id_a", "id_b")
  }

  private val e4Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings WHERE vec_id < 500)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  ROUND(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE ROUND(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  // ---- e10: semantic dedup (SemDeDup composition) — embedding-space
  // near-dup groups resolved to keep-one-per-group survivors: e4's exact
  // cosine edges → distributed connected components (Dedup.components,
  // the d11 machinery) → survivors left-join. The scale path swaps the
  // exact all-pairs edge set for e3's LSH-bucketed candidates with the
  // same threshold — the composition downstream is identical; the gate
  // uses the exact edges so DuckDB can replay end to end (recursive-CTE
  // CC, the d11 precedent). ----
  private def e10(s: SparkSession, dir: String): DataFrame = {
    val sub = emb(s, dir).filter(col("vec_id") < 500)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = sub.select(col("vec_id").as("doc_a"), col("v").as("va"))
    val b = sub.select(col("vec_id").as("doc_b"), col("v").as("vb"))
    val pairs = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("sim",
        round(Similarity.cosineFast(col("va"), col("vb")), 6))
      .filter(col("sim") >= 0.4)
      .select("doc_a", "doc_b")
    Dedup.survivors(sub.select(col("vec_id")), pairs, "vec_id")
      .orderBy("vec_id")
  }

  private val e10Oracle =
    """WITH RECURSIVE ev AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings WHERE vec_id < 500),
      |p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM ev a JOIN ev b ON a.vec_id < b.vec_id
      |  WHERE ROUND(list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM p
      |  UNION SELECT id_b, id_a FROM p),
      |cc AS (
      |  SELECT vec_id AS id, vec_id AS comp FROM ev
      |  UNION
      |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON cc.id = e.src)
      |SELECT id AS vec_id, MIN(comp) AS keep_id FROM cc
      |GROUP BY id ORDER BY vec_id""".stripMargin

  // ---- mm1: multimodal decode plumbing (stub codec; Spark-side schema,
  // mapPartitions batching, metadata derivation are the real test). ----
  private def mm1(s: SparkSession, dir: String): DataFrame =
    Multimodal.featureTable(s, docs(s, dir))
      .select("doc_id", "media_type", "n_bytes", "width", "height")
      .orderBy("doc_id")

  // ---- d30: heavy hitters — the exact top-20 keys by count
  // (FrequentItems.exactTopK, one count shuffle + sort-limit). The
  // bounded-memory space-saving path over the same data is spec-certified
  // (containment + lower-bound guarantees) in FrequentItemsSpec. ----
  private def d30(s: SparkSession, dir: String): DataFrame =
    FrequentItems.exactTopK(Tables.load(s, dir, "events"), "user_id", 20)
      .orderBy(col("n").desc, col("key"))

  // ---- d36: weighted sample without replacement (Efraimidis–Spirakis)
  // — 100 documents drawn with probability ∝ token count. The oracle
  // replays the sha-bucket uniform, the ln(u)/w priority (rounded to
  // 9 dp, ties on doc_id), and the top-k. ----
  private def d36(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(
        docs(s, dir).select(col("doc_id"),
          size(TextAnalysis.words(col("text"))).cast("long")
            .as("n_tokens")),
        "doc_id", "n_tokens", k = 100)
      .select(col("doc_id"), col("n_tokens"), col("pri"))
      .orderBy(col("pri").desc, col("doc_id"))

  private val d36Oracle =
    """SELECT doc_id, n_tokens, pri FROM (
      |  SELECT doc_id,
      |    len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
      |    ROUND(
      |      ln((('0x' || substr(sha256('42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 + 1) / 10000.0)
      |        / len(regexp_extract_all(text, '\S+')), 9) AS pri
      |  FROM documents)
      |ORDER BY pri DESC, doc_id LIMIT 100""".stripMargin

  // ---- d35: count-min sketch point estimates for the exact top-20
  // keys — the mergeable-sketch heavy-hitters face (4 × 512 counters,
  // sha-prefix hash rows the oracle replays bit-for-bit). est ≥ n always
  // (CMS never undercounts); the spec asserts it for EVERY key. ----
  private def d35(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val sketch = FrequentItems.cmsSketch(ev, "user_id")
    val top = FrequentItems.exactTopK(ev, "user_id", 20)
    top.join(FrequentItems.cmsEstimate(sketch, top.select("key"), "key"),
        "key")
      .select(col("key"), col("n"), col("est"))
      .orderBy(col("n").desc, col("key"))
  }

  private val d35Oracle =
    """WITH t AS (
      |  SELECT user_id AS key, COUNT(*) AS n FROM events
      |  GROUP BY user_id ORDER BY n DESC, key LIMIT 20),
      |h AS (
      |  SELECT row, bucket, COUNT(*) AS cnt FROM (
      |    SELECT r.i AS row,
      |      ('0x' || substr(sha256('cm' || r.i || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 512 AS bucket
      |    FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(i))
      |  GROUP BY row, bucket),
      |p AS (
      |  SELECT t.key, r.i AS row,
      |    ('0x' || substr(sha256('cm' || r.i || ':' || CAST(t.key AS VARCHAR)), 1, 8))::BIGINT % 512 AS bucket
      |  FROM t CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(i)),
      |e AS (
      |  SELECT p.key, MIN(COALESCE(h.cnt, 0)) AS est
      |  FROM p LEFT JOIN h USING (row, bucket) GROUP BY p.key)
      |SELECT t.key, t.n, e.est FROM t JOIN e USING (key)
      |ORDER BY n DESC, key""".stripMargin

  private[graft] val d30Oracle =
    """SELECT user_id AS key, COUNT(*) AS n FROM events
      |GROUP BY user_id ORDER BY n DESC, key LIMIT 20""".stripMargin

  // ---- mm3: multimodal retrieval end to end — payload → mapPartitions
  // decode (the Arrow-batched-UDF shape) → 8-dim stub feature vectors →
  // cosine top-5 per query doc. Certifies the full decode→feature→ANN
  // composition under the gate: the oracle re-derives the stripe-sum
  // features from the utf-8 payload bytes (ASCII fixture: ord(char) =
  // byte) with float32 division (checked: no double-rounding divergence
  // for any value k/1000, k < 1000), then replays the e1-style cosine
  // ranking. ----
  private def mm3(s: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.featureTable(s, docs(s, dir))
      .select(col("doc_id"), col("features").cast("array<double>").as("v"))
    val q = feats.filter(col("doc_id") < 20)
      .select(col("doc_id").as("q_id"), col("v").as("qv"))
    // per-query top-k as the bounded-buffer aggregation (the round-10
    // ANN lesson): no per-query sort of the full feature corpus —
    // through the one shared aggTopK so the top-k/NaN contract lives
    // in exactly one place
    Similarity.aggTopK(
      broadcast(q)
        .join(feats.select(col("doc_id").as("nn_id"), col("v").as("nv")),
          col("q_id") =!= col("nn_id"))
        .select(col("q_id"), col("nn_id"),
          round(Similarity.cosineFast(col("qv"), col("nv")), 6).as("sim")),
      5, "sim", asc = false)
      .orderBy("q_id", "rank")
  }

  private val mm3Oracle =
    """WITH f AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0, 7), i ->
      |      CAST(CAST(list_sum(list_transform(
      |          generate_series(i + 1, length(text), 8),
      |          j -> ord(substr(text, j, 1)))) % 1000 AS FLOAT)
      |        / CAST(1000.0 AS FLOAT) AS DOUBLE)) AS v
      |  FROM documents),
      |q AS (SELECT doc_id AS q_id, v AS qv FROM f WHERE doc_id < 20),
      |c AS (
      |  SELECT q.q_id, f.doc_id AS nn_id,
      |    ROUND(list_dot_product(q.qv, f.v) /
      |      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(f.v, f.v))), 6) AS sim
      |  FROM q JOIN f ON q.q_id <> f.doc_id),
      |rk AS (
      |  SELECT q_id, nn_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM c)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, sim
      |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  private val mm1Oracle =
    """SELECT doc_id, 'image/fake' AS media_type,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  CAST(16 + octet_length(encode(text)) % 624 AS INT) AS width,
      |  CAST(16 + (octet_length(encode(text)) // 7) % 464 AS INT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- mm2: video frame-sampling plumbing — per-doc frame counts/last
  // timestamp are a pure function of payload size, so DuckDB replays the
  // stub arithmetic and hash-verifies the 1→N generator. ----
  private def mm2(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    Multimodal.sampleFrames(media, everyMs = 500).toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"), max("frame_ts_ms").as("last_ts"))
      .orderBy("doc_id")
  }

  private val mm2Oracle =
    """SELECT doc_id,
      |  CAST((1000 + octet_length(encode(text)) % 9000) // 500 + 1 AS BIGINT) AS n_frames,
      |  CAST(((1000 + octet_length(encode(text)) % 9000) // 500) * 500 AS BIGINT) AS last_ts
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- mm4: audio modality — stub PCM framing + VAD-style
  // active/silence segmentation (the silence-stripping front half of an
  // audio curation pipeline). Frame energy is integer per-mille byte-sum
  // arithmetic, so the oracle replays frames, flags, the flag-change
  // running sum, and the per-segment rollup byte-for-byte (fixture
  // payloads are ASCII: byte p ≡ ord(substr(text, p, 1))). ----
  private def mm4(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    Multimodal.audioSegments(
        Multimodal.sampleAudioFrames(media, frameBytes = 16,
          activePm = 390L).toDF())
      .select(col("doc_id"), col("seg_id"), col("active").cast("long")
        .as("active"), col("start_idx"), col("end_idx"), col("n_frames"))
      .orderBy("doc_id", "seg_id")
  }

  // ---- mm5: video scene-cut detection — segmentation on energy CHANGE
  // (frame differencing), where mm4 segments on LEVEL. Same 16-byte
  // stub framing; a new scene starts where |Δ energy_pm| >= 25 (the
  // fixture's delta distribution spreads 0–40+, so the threshold
  // genuinely segments: ~23% of frames open a scene). The oracle
  // replays frames, deltas, the cut running sum, and the per-scene
  // rollup including the integer-div mean. ----
  private def mm5(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    Multimodal.sceneCuts(
        Multimodal.sampleAudioFrames(media, frameBytes = 16).toDF(),
        cutPm = 25L)
      .select(col("doc_id"), col("scene_id"), col("start_idx"),
        col("end_idx"), col("n_frames"), col("mean_pm"))
      .orderBy("doc_id", "scene_id")
  }

  // ---- mm6: perceptual difference-hash (dHash) per image — the image
  // near-dup fingerprint (the aHash/dHash/pHash family). The stub
  // decoder's 9×8 gray grid is byte-stripe sums mod 256, so the oracle
  // replays grid → 64 row-wise gradient bits → two 32-bit words
  // entirely from the stored payload bytes. ----
  private def mm6(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    Multimodal.dHash(media).orderBy("doc_id")
  }

  /** Shared dHash replay: byte stripes → 72-cell grid (absent stripes
    * 0) → packed gradient bits. Used by the mm6 and mm7 oracles and the
    * s17 streaming-phash-dedup oracle in [[graft.streaming.StreamQueries]]. */
  private[graft] val dHashCtes = dHashCtesFrom("documents")

  /** [[dHashCtes]] over an arbitrary documents source — the mm14
    * update oracle replays the dHash chain against the
    * corpus-with-new-payloads (the d58 docsSrc pattern). */
  private[graft] def dHashCtesFrom(docsSrc: String): String =
    s"""d AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM $docsSrc),
      |bt AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, n),
      |    p -> {'c': (p - 1) % 72,
      |          'v': ord(substr(text, CAST(p AS INT), 1))})) AS u
      |  FROM d),
      |gsum AS (
      |  SELECT doc_id, u.c AS c, CAST(SUM(u.v) % 256 AS BIGINT) AS g
      |  FROM bt GROUP BY doc_id, u.c),
      |allc AS (
      |  SELECT doc_id, unnest(generate_series(0, 71)) AS c FROM d),
      |gg AS (
      |  SELECT allc.doc_id, allc.c, COALESCE(gsum.g, 0) AS g
      |  FROM allc LEFT JOIN gsum ON gsum.doc_id = allc.doc_id
      |    AND gsum.c = allc.c),
      |gl AS (
      |  SELECT doc_id, list(g ORDER BY c) AS gs FROM gg GROUP BY doc_id),
      |ph AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(generate_series(0, 31), b ->
      |      CASE WHEN gs[(b // 8) * 9 + (b % 8) + 2]
      |             > gs[(b // 8) * 9 + (b % 8) + 1]
      |        THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS ph_lo,
      |    CAST(list_sum(list_transform(generate_series(32, 63), b ->
      |      CASE WHEN gs[(b // 8) * 9 + (b % 8) + 2]
      |             > gs[(b // 8) * 9 + (b % 8) + 1]
      |        THEN (1::BIGINT << (b - 32)) ELSE 0::BIGINT END)) AS BIGINT)
      |      AS ph_hi
      |  FROM gl)""".stripMargin

  private val mm6Oracle =
    s"""WITH $dHashCtes
      |SELECT doc_id, ph_lo, ph_hi FROM ph ORDER BY doc_id""".stripMargin

  /** The 4×16-bit chunk explode over a (doc_id, ph_lo, ph_hi) source —
    * the SQL twin of `Multimodal.phashChunks`, shared by the mm7 and
    * s17 oracles so the chunk layout lives in ONE place on each side.
    * Emits two CTEs named `<name>` (struct rows) and `<name>2` (the
    * flattened (doc_id, ph_lo, ph_hi, ck, cv) face). */
  private[graft] def phashChunkCtes(name: String, src: String): String =
    s"""$name AS (
      |  SELECT doc_id, ph_lo, ph_hi,
      |    unnest(list_transform(generate_series(0, 3), i ->
      |      {'ck': i,
      |       'cv': CASE WHEN i = 0 THEN ph_lo & 65535
      |                  WHEN i = 1 THEN (ph_lo >> 16) & 65535
      |                  WHEN i = 2 THEN ph_hi & 65535
      |                  ELSE (ph_hi >> 16) & 65535 END})) AS u
      |  FROM $src),
      |${name}2 AS (
      |  SELECT doc_id, ph_lo, ph_hi, u.ck AS ck, u.cv AS cv FROM $name)""".stripMargin

  // ---- mm7: image near-dup pairs by Hamming distance over mm6's
  // dHashes — chunk-pigeonhole candidates (any pair within Hamming 3
  // shares one of the four 16-bit chunks, the d8/d13 contract), df-cap
  // 100 per bucket, exact XOR+popcount verify. Exact-duplicate texts in
  // the fixture give identical payloads, hence Hamming-0 pairs; the
  // oracle replays chunks, the cap, the candidate join, and the verify. ----
  private def mm7(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    Multimodal.phashPairs(Multimodal.dHash(media),
        maxHamming = 3, maxBucket = 100)
      .orderBy("doc_a", "doc_b")
  }

  private val mm7Oracle =
    s"""WITH $dHashCtes,
      |${phashChunkCtes("ck", "ph")},
      |ok AS (
      |  SELECT ck, cv FROM ck2 GROUP BY ck, cv
      |  HAVING COUNT(*) BETWEEN 2 AND 100),
      |f AS (SELECT ck2.* FROM ck2 JOIN ok USING (ck, cv)),
      |p AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.ph_lo, b.ph_lo))
      |      + bit_count(xor(a.ph_hi, b.ph_hi)) AS INT) AS hamming
      |  FROM f a JOIN f b ON a.ck = b.ck AND a.cv = b.cv
      |    AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, hamming FROM p
      |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin

  // ---- mm8: perceptual VIDEO near-dup pairs — the video modality's
  // dedup face, completing the family (text d7/d13, image mm6/mm7):
  // payloads segment into scenes on 72-byte stub-frame energy change
  // (mm5's arithmetic at the grid-filling frame size), each scene's
  // keyframe dHashes through the mm6 grid, keyframes pair through the
  // mm7 chunk-pigeonhole (df-cap 100, exact Hamming ≤ 3 verify), and
  // video pairs emit where matches cover ≥ half of either side's
  // scenes (d41 containment-style — a clip inside a longer video still
  // surfaces). The oracle replays frames → energies → cuts → keyframe
  // slices → 72-cell grids → gradient words → packed keyframe ids →
  // chunks → cap → verify → coverage rollup, all integer byte
  // arithmetic off the stored payload. ----
  private def mm8(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    Multimodal.videoDupPairs(
        Multimodal.keyframeHashes(media, frameBytes = 72, cutPm = 8L).toDF(),
        maxHamming = 3, maxBucket = 100)
      .orderBy("doc_a", "doc_b")
  }

  /** The video keyframe CTE chain (documents → 72-byte stub frames →
    * energy deltas → scene cuts → keyframe 72-cell grids → packed
    * gradient words: `kph` = (doc_id, scene_id, ph_lo, ph_hi), `kid` =
    * the doc·2^16+scene packed hash face) — the SQL twin of
    * `Multimodal.keyframeHashes(frameBytes = 72, cutPm = 8)`, shared
    * by the mm8 and mm10 oracles. */
  private[graft] val keyframeCtes: String = keyframeCtesFrom("documents")

  /** [[keyframeCtes]] over an arbitrary documents source — the mm15
    * update oracle replays the keyframe chain against the
    * corpus-with-new-payloads (the d58 docsSrc pattern). */
  private[graft] def keyframeCtesFrom(docsSrc: String): String =
    s"""d AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM $docsSrc),
      |f AS (
      |  SELECT doc_id, n,
      |    unnest(generate_series(0, (n + 71) // 72 - 1)) AS fi
      |  FROM d),
      |e AS (
      |  SELECT f.doc_id, f.fi,
      |    (list_sum(list_transform(
      |      generate_series(f.fi * 72 + 1, least(f.fi * 72 + 72, f.n)),
      |      p -> ord(substr(d.text, CAST(p AS INT), 1)))) * 1000)
      |      // (255 * (least(f.fi * 72 + 72, f.n) - f.fi * 72)) AS epm
      |  FROM f JOIN d USING (doc_id)),
      |b AS (
      |  SELECT doc_id, fi, epm,
      |    CASE WHEN LAG(epm) OVER w IS NULL
      |           OR abs(epm - LAG(epm) OVER w) >= 8 THEN 1 ELSE 0 END AS cut
      |  FROM e WINDOW w AS (PARTITION BY doc_id ORDER BY fi)),
      |g AS (
      |  SELECT doc_id, fi,
      |    SUM(cut) OVER (PARTITION BY doc_id ORDER BY fi
      |      ROWS UNBOUNDED PRECEDING) AS scene
      |  FROM b),
      |kf0 AS (
      |  SELECT doc_id, CAST(scene AS BIGINT) AS scene_id, MIN(fi) AS kfi
      |  FROM g GROUP BY doc_id, scene),
      |gl AS (
      |  SELECT k.doc_id, k.scene_id,
      |    list_transform(generate_series(0, 71), c ->
      |      CASE WHEN k.kfi * 72 + c + 1 <= d.n
      |        THEN ord(substr(d.text, CAST(k.kfi * 72 + c + 1 AS INT), 1))
      |        ELSE 0 END) AS gs
      |  FROM kf0 k JOIN d USING (doc_id)),
      |kph AS (
      |  SELECT doc_id, scene_id,
      |    CAST(list_sum(list_transform(generate_series(0, 31), b ->
      |      CASE WHEN gs[(b // 8) * 9 + (b % 8) + 2]
      |             > gs[(b // 8) * 9 + (b % 8) + 1]
      |        THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS ph_lo,
      |    CAST(list_sum(list_transform(generate_series(32, 63), b ->
      |      CASE WHEN gs[(b // 8) * 9 + (b % 8) + 2]
      |             > gs[(b // 8) * 9 + (b % 8) + 1]
      |        THEN (1::BIGINT << (b - 32)) ELSE 0::BIGINT END)) AS BIGINT)
      |      AS ph_hi
      |  FROM gl),
      |kid AS (
      |  SELECT doc_id * 65536 + scene_id AS doc_id, ph_lo, ph_hi FROM kph)""".stripMargin

  private val mm8Oracle =
    s"""WITH $keyframeCtes,
      |${phashChunkCtes("ck", "kid")},
      |ok AS (
      |  SELECT ck, cv FROM ck2 GROUP BY ck, cv
      |  HAVING COUNT(*) BETWEEN 2 AND 100),
      |fk AS (SELECT ck2.* FROM ck2 JOIN ok USING (ck, cv)),
      |p AS (
      |  SELECT DISTINCT a.doc_id AS kid_a, b.doc_id AS kid_b,
      |    CAST(bit_count(xor(a.ph_lo, b.ph_lo))
      |      + bit_count(xor(a.ph_hi, b.ph_hi)) AS INT) AS hamming
      |  FROM fk a JOIN fk b ON a.ck = b.ck AND a.cv = b.cv
      |    AND a.doc_id < b.doc_id),
      |sp AS (
      |  SELECT kid_a // 65536 AS doc_a, kid_a % 65536 AS scene_a,
      |    kid_b // 65536 AS doc_b, kid_b % 65536 AS scene_b
      |  FROM p WHERE hamming <= 3 AND kid_a // 65536 <> kid_b // 65536),
      |cov AS (
      |  SELECT doc_a, doc_b,
      |    COUNT(DISTINCT scene_a) AS matched_a,
      |    COUNT(DISTINCT scene_b) AS matched_b
      |  FROM sp GROUP BY doc_a, doc_b),
      |cnt AS (SELECT doc_id, COUNT(*) AS n_scenes FROM kph GROUP BY doc_id)
      |SELECT cov.doc_a, cov.doc_b,
      |  ca.n_scenes AS n_scenes_a, cb.n_scenes AS n_scenes_b,
      |  cov.matched_a, cov.matched_b
      |FROM cov
      |JOIN cnt ca ON ca.doc_id = cov.doc_a
      |JOIN cnt cb ON cb.doc_id = cov.doc_b
      |WHERE cov.matched_a * 2 >= ca.n_scenes
      |   OR cov.matched_b * 2 >= cb.n_scenes
      |ORDER BY cov.doc_a, cov.doc_b""".stripMargin

  // ---- mm9: acoustic-fingerprint AUDIO near-dup pairs — the audio
  // modality's dedup face, closing the matrix (text d7/d13, image
  // mm6/mm7, video mm8): payloads frame at 8 bytes (the
  // sampleAudioFrames energy arithmetic), the fingerprint sets bit f
  // where frame f+1's energy exceeds frame f's (sign-of-delta — dHash
  // in the time domain), and the two-word hashes pair through the
  // UNCHANGED image machinery (phashPairs: 4×16-bit chunk pigeonhole,
  // df-cap 100, exact Hamming ≤ 3 verify). The oracle replays frames →
  // energies → LEAD deltas → packed words → chunks → cap → verify. ----
  private def mm9(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    Multimodal.phashPairs(
        Multimodal.audioFingerprints(media, frameBytes = 8),
        maxHamming = 3, maxBucket = 100)
      .orderBy("doc_a", "doc_b")
  }

  /** The acoustic-fingerprint CTE chain (documents → 8-byte-frame
    * energies → LEAD sign-of-delta bits → packed two-word `ph` face,
    * one row per doc including zero-frame all-zero hashes) — the SQL
    * twin of `Multimodal.audioFingerprints(frameBytes = 8)`, shared by
    * the mm9 and s20 oracles. */
  private[graft] val audioFpCtes: String =
    """d AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
      |f AS (
      |  SELECT doc_id, n,
      |    unnest(generate_series(0, least((n + 7) // 8 - 1, 64))) AS fi
      |  FROM d),
      |en AS (
      |  SELECT f.doc_id, f.fi,
      |    (list_sum(list_transform(
      |      generate_series(f.fi * 8 + 1, least(f.fi * 8 + 8, f.n)),
      |      p -> ord(substr(d.text, CAST(p AS INT), 1)))) * 1000)
      |      // (255 * (least(f.fi * 8 + 8, f.n) - f.fi * 8)) AS epm
      |  FROM f JOIN d USING (doc_id)),
      |bits AS (
      |  SELECT doc_id, fi AS b,
      |    CASE WHEN LEAD(epm) OVER (PARTITION BY doc_id ORDER BY fi) > epm
      |      THEN 1 ELSE 0 END AS bit
      |  FROM en),
      |pb AS (
      |  SELECT doc_id,
      |    CAST(COALESCE(SUM(CASE WHEN bit = 1 AND b < 32
      |      THEN (1::BIGINT << b) ELSE 0::BIGINT END), 0) AS BIGINT) AS ph_lo,
      |    CAST(COALESCE(SUM(CASE WHEN bit = 1 AND b >= 32 AND b < 64
      |      THEN (1::BIGINT << (b - 32)) ELSE 0::BIGINT END), 0) AS BIGINT)
      |      AS ph_hi
      |  FROM bits GROUP BY doc_id),
      |ph AS (
      |  SELECT d.doc_id, COALESCE(pb.ph_lo, 0) AS ph_lo,
      |    COALESCE(pb.ph_hi, 0) AS ph_hi
      |  FROM d LEFT JOIN pb USING (doc_id))""".stripMargin

  private val mm9Oracle =
    s"""WITH $audioFpCtes,
      |${phashChunkCtes("ck", "ph")},
      |ok AS (
      |  SELECT ck, cv FROM ck2 GROUP BY ck, cv
      |  HAVING COUNT(*) BETWEEN 2 AND 100),
      |fk AS (SELECT ck2.* FROM ck2 JOIN ok USING (ck, cv)),
      |p AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.ph_lo, b.ph_lo))
      |      + bit_count(xor(a.ph_hi, b.ph_hi)) AS INT) AS hamming
      |  FROM fk a JOIN fk b ON a.ck = b.ck AND a.cv = b.cv
      |    AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, hamming FROM p
      |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin

  // ---- mm10: INCREMENTAL video near-dup — the d21 persisted-index
  // contract for the video family (s17's shape at the video grain):
  // the archive's keyframes bake ONCE into a VideoIndex (df-capped
  // chunk index over packed keyframe ids + per-video scene counts),
  // and new videos probe it — only the increment decodes, the archive
  // is never re-derived, re-capped, or re-paired. Coverage joins read
  // the increment's own counts plus the persisted archive counts. The
  // oracle replays the shared keyframe chain, splits probe/archive on
  // the packed doc id, caps the ARCHIVE side only (cross-side
  // single-occupant buckets must still match), probes, unpacks, and
  // rolls coverage. ----
  private def mm10(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    val isNew = col("doc_id") % 10 === 0
    val archIdx = Multimodal.videoKeyframeIndex(
      Multimodal.keyframeHashes(media.filter(!isNew),
        frameBytes = 72, cutPm = 8L).toDF())
    Multimodal.videoProbePairs(
        Multimodal.keyframeHashes(media.filter(isNew),
          frameBytes = 72, cutPm = 8L).toDF(),
        archIdx, maxHamming = 3)
      .orderBy("doc_new", "doc_arch")
  }

  // ---- mm11: VIDEO-INDEX RETRACTION (Multimodal.videoIndexRetract) —
  // the multimodal leg of the round-14 delete lifecycle (d55 groups,
  // d56 fingerprints, e27 ANN): the archive's UNCAPPED keyframe sketch
  // is persisted once, a takedown batch (doc_id % 7 = 1) retracts by
  // one packed-id anti-join + one bucket recount (payloads never
  // re-decoded or re-hashed), and the mm10 increment probes the
  // retracted index. Oracle = mm10's probe chain with the archive
  // shrunk to the survivors — a from-scratch rebuild-without-them —
  // so green certifies retract ≡ rebuild through the serve path; the
  // bucket-resurrection direction is spec-pinned in MultimodalSpec. ----
  private def mm11(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    val isNew = col("doc_id") % 10 === 0
    val sketch = Multimodal.videoKeyframeSketch(
      Multimodal.keyframeHashes(media.filter(!isNew),
        frameBytes = 72, cutPm = 8L).toDF())
    val removed = docs(s, dir)
      .filter(!isNew && col("doc_id") % 7 === 1).select("doc_id")
    Multimodal.videoProbePairs(
        Multimodal.keyframeHashes(media.filter(isNew),
          frameBytes = 72, cutPm = 8L).toDF(),
        Multimodal.videoIndexRetract(sketch, removed, maxBucket = 100),
        maxHamming = 3)
      .orderBy("doc_new", "doc_arch")
  }

  private[graft] val mm11Oracle = videoProbeOracle(
    akExtra = " AND (doc_id // 65536) % 7 <> 1",
    caExtra = " AND doc_id % 7 <> 1")

  // ---- d62: delta-chain COMPACTION for the VIDEO family
  // (Multimodal.videoDeltaCompact) — d61's cycle parameterized over
  // the worst-case family (VERDICT r16 missing item 2: d61 certified
  // compaction for the shingle chain only, and the video TWO-FACE
  // artifact — packed chunks + per-video scene counts — is exactly
  // where a compaction bug would hide: a counts-less compacted base
  // fails its first videoDeltaServing read, ADVICE r16). Half the
  // takedowns run as a delta step on the original base, the chain
  // compacts (generic chunk fold + the counts-face tombstone
  // anti-join), the other half runs as a delta step on the COMPACTED
  // base; the final serving VideoIndex answers the mm10 increment
  // probe and mm11's one-shot survivor-archive oracle adjudicates —
  // deltas → compact → deltas ≡ the one-shot retract of everything.
  // The phash and winnow chains compact through the generic fold
  // directly (no extra face) — their cycles are spec-certified in
  // DeltaRetractSpec. ----
  private def d62(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    val isNew = col("doc_id") % 10 === 0
    val takedown = docs(s, dir)
      .filter(!isNew && col("doc_id") % 7 === 1).select("doc_id")
    val out = graft.TmpHygiene.deleteAtExit(
      graft.TmpHygiene.scratchDir("graft_d62"))
    val docHalf = expr("id div 65536")
    Multimodal.videoDeltaBase(s,
      Multimodal.keyframeHashes(media.filter(!isNew),
        frameBytes = 72, cutPm = 8L).toDF(), s"$out/a/init")
    DeltaRetract.step(s, s"$out/a", "init", 0L,
      takedown.filter(col("doc_id") % 2 === 1),
      Seq("chunk", "chunk_val"), 100, identity, docHalf)
    Multimodal.videoDeltaCompact(s, s"$out/a", "init", 0L,
      s"$out/b/init")
    DeltaRetract.step(s, s"$out/b", "init", 0L,
      takedown.filter(col("doc_id") % 2 === 0),
      Seq("chunk", "chunk_val"), 100, identity, docHalf)
    val idx = Multimodal.videoDeltaServing(s, s"$out/b", "init", 0L)
    Multimodal.videoProbePairs(
        Multimodal.keyframeHashes(media.filter(isNew),
          frameBytes = 72, cutPm = 8L).toDF(), idx, maxHamming = 3)
      .orderBy("doc_new", "doc_arch")
  }

  // ---- mm12/mm13: IMAGE and AUDIO hash-index RETRACTION
  // (Multimodal.phashIndexRetract) — the flat-hash legs of the delete
  // lifecycle, completing the retract column of the modality dedup
  // matrix (text d57, winnow d56, groups d55, ANN e27, video mm11):
  // the archive's UNCAPPED chunk sketch is persisted once, a takedown
  // batch (doc_id % 7 = 1) retracts by one doc-id anti-join + one
  // bucket recount (payloads never re-decoded or re-hashed), and the
  // s17/s20 increment probes the retracted index. One engine face
  // serves both modalities — audioFingerprints emits the same two-word
  // hash layout as dHash — so the two gates differ ONLY in the
  // fingerprint chain. Oracle = the shared probe chain with the
  // archive shrunk to the survivors: a from-scratch
  // rebuild-without-them, certifying retract ≡ rebuild through the
  // serve path; bucket resurrection is spec-pinned in PipelineSpec. ----
  private def phashRetractGate(s: SparkSession, dir: String,
      hashFn: org.apache.spark.sql.Dataset[Multimodal.MediaRow]
        => DataFrame): DataFrame = {
    val sp = s
    import sp.implicits._
    val media = Multimodal.withPayload(docs(s, dir), "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    val isNew = col("doc_id") % 10 === 0
    val sketch = Multimodal.phashChunkSketch(hashFn(media.filter(!isNew)))
    val removed = docs(s, dir)
      .filter(!isNew && col("doc_id") % 7 === 1).select("doc_id")
    Multimodal.phashProbePairs(hashFn(media.filter(isNew)),
        Multimodal.phashIndexRetract(sketch, removed, maxBucket = 100),
        maxHamming = 3)
      .orderBy("new_id", "corpus_id")
  }

  private def mm12(s: SparkSession, dir: String): DataFrame =
    phashRetractGate(s, dir, Multimodal.dHash(_))

  private def mm13(s: SparkSession, dir: String): DataFrame =
    phashRetractGate(s, dir,
      Multimodal.audioFingerprints(_, frameBytes = 8))

  // shared with the s23 streaming gate: sequential per-batch retraction
  // over the maintained sketch chain composes to the one-shot retract,
  // so the same survivor-archive probe oracle adjudicates both
  private[graft] val mm12Oracle =
    phashProbeOracle(dHashCtes, archExtra = " AND doc_id % 7 <> 1")

  private val mm13Oracle =
    phashProbeOracle(audioFpCtes, archExtra = " AND doc_id % 7 <> 1")

  // ---- mm14: IMAGE hash-index UPDATE (Multimodal.phashSketchUpdate)
  // — d58's multimodal twin, the re-crawl/re-encode edit path: every
  // archive doc with doc_id % 7 = 1 ships a CHANGED payload (text
  // doubled — the byte stripes shift, so the dHash and every chunk
  // bucket move), the update face retracts the old versions' chunk
  // rows and appends the re-fingerprinted versions' against the same
  // uncapped sketch, and the s17 increment probes the re-derived
  // serving index. Because audioFingerprints emits the same two-word
  // face, this ONE update face serves both modalities (the mm12/mm13
  // symmetry); the gate certifies the image leg. Oracle = the shared
  // probe chain over the corpus-with-new-payloads
  // (rebuild-with-them); retract-then-append ordering spec-pinned in
  // UpdateFacesSpec. ----
  private def mm14(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    def media(c: DataFrame) = Multimodal.withPayload(c, "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    val d = docs(s, dir)
    val isNew = col("doc_id") % 10 === 0
    val arch = d.filter(!isNew)
    val sketch = Multimodal.phashChunkSketch(
      Multimodal.dHash(media(arch)))
    val newVersions = arch.filter(col("doc_id") % 7 === 1)
      .withColumn("text", concat(col("text"), lit(" "), col("text")))
    val updated = Multimodal.phashSketchUpdate(sketch,
      Multimodal.dHash(media(newVersions)))
    Multimodal.phashProbePairs(Multimodal.dHash(media(d.filter(isNew))),
        Multimodal.phashServingIndex(updated, maxBucket = 100),
        maxHamming = 3)
      .orderBy("new_id", "corpus_id")
  }

  // shared with the s32 streaming gate (sequential per-batch updates
  // compose to the one-shot update)
  private[graft] val mm14Oracle = phashProbeOracle(
    dHashCtesFrom(CurationQueries.updatedDocsSrc))

  // ---- mm15: VIDEO-index UPDATE (Multimodal.videoSketchUpdate) — the
  // two-face twin of mm14: a re-edited video changes BOTH artifact
  // faces (its scene segmentation moves with the new payload, so the
  // coverage denominators must move with the postings), and the gate
  // certifies the update through the mm10 increment probe against the
  // re-derived serving VideoIndex. Oracle = mm10's chain over the
  // corpus-with-new-payloads. ----
  private def mm15(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    def media(c: DataFrame) = Multimodal.withPayload(c, "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    def kf(c: DataFrame) = Multimodal.keyframeHashes(media(c),
      frameBytes = 72, cutPm = 8L).toDF()
    val d = docs(s, dir)
    val isNew = col("doc_id") % 10 === 0
    val arch = d.filter(!isNew)
    val sketch = Multimodal.videoKeyframeSketch(kf(arch))
    val newVersions = arch.filter(col("doc_id") % 7 === 1)
      .withColumn("text", concat(col("text"), lit(" "), col("text")))
    val updated = Multimodal.videoSketchUpdate(sketch, kf(newVersions))
    Multimodal.videoProbePairs(kf(d.filter(isNew)),
        Multimodal.VideoIndex(
          Multimodal.phashServingIndex(updated.chunks, maxBucket = 100),
          updated.counts),
        maxHamming = 3)
      .orderBy("doc_new", "doc_arch")
  }

  // shared with the s34 streaming gate
  private[graft] val mm15Oracle = videoProbeOracle(
    docsSrc = CurationQueries.updatedDocsSrc)

  /** The probe-vs-archive hash-dedup oracle shared by the streaming
    * gates (s17 image, s20 audio) and the retraction gates (mm12,
    * mm13): `ctes` must end in a `ph` face (doc_id, ph_lo, ph_hi) —
    * [[dHashCtes]] or [[audioFpCtes]]; probes are the doc_id % 10 = 0
    * docs, the archive is the rest, and `archExtra` further restricts
    * the archive (the retraction gates' survivor filter). */
  private[graft] def phashProbeOracle(ctes: String,
      archExtra: String = ""): String =
    s"""WITH $ctes,
      |probe AS (SELECT * FROM ph WHERE doc_id % 10 = 0),
      |arch AS (SELECT * FROM ph WHERE doc_id % 10 <> 0$archExtra),
      |${phashChunkCtes("ac", "arch")},
      |ok AS (SELECT ck, cv FROM ac2 GROUP BY ck, cv HAVING COUNT(*) <= 100),
      |af AS (SELECT ac2.* FROM ac2 JOIN ok USING (ck, cv)),
      |${phashChunkCtes("pc", "probe")},
      |p AS (
      |  SELECT DISTINCT pc2.doc_id AS new_id, af.doc_id AS corpus_id,
      |    CAST(bit_count(xor(pc2.ph_lo, af.ph_lo))
      |      + bit_count(xor(pc2.ph_hi, af.ph_hi)) AS INT) AS hamming
      |  FROM pc2 JOIN af USING (ck, cv))
      |SELECT new_id, corpus_id, hamming FROM p
      |WHERE hamming <= 3 ORDER BY new_id, corpus_id""".stripMargin

  // shared with the s21 streaming gate: per-batch coverage rollups
  // partition the global result (videos arrive whole), so the batch
  // oracle adjudicates the drained stream verbatim
  private[graft] val mm10Oracle = videoProbeOracle()

  /** The incremental-video-probe oracle chain, parameterized by extra
    * ARCHIVE predicates so mm11 (retraction) replays the same probe
    * against a shrunken archive: `akExtra` filters the packed keyframe
    * rows (`doc_id` here is the packed kid), `caExtra` the per-video
    * archive counts (plain doc ids). Empty strings = mm10/s21. */
  private def videoProbeOracle(akExtra: String = "",
      caExtra: String = "", docsSrc: String = "documents"): String =
    s"""WITH ${keyframeCtesFrom(docsSrc)},
      |pk AS (SELECT * FROM kid WHERE (doc_id // 65536) % 10 = 0),
      |ak AS (SELECT * FROM kid
      |  WHERE (doc_id // 65536) % 10 <> 0$akExtra),
      |${phashChunkCtes("ac", "ak")},
      |ok AS (
      |  SELECT ck, cv FROM ac2 GROUP BY ck, cv HAVING COUNT(*) <= 100),
      |af AS (SELECT ac2.* FROM ac2 JOIN ok USING (ck, cv)),
      |${phashChunkCtes("pc", "pk")},
      |p AS (
      |  SELECT DISTINCT pc2.doc_id AS new_kid, af.doc_id AS arch_kid,
      |    CAST(bit_count(xor(pc2.ph_lo, af.ph_lo))
      |      + bit_count(xor(pc2.ph_hi, af.ph_hi)) AS INT) AS hamming
      |  FROM pc2 JOIN af USING (ck, cv)),
      |sp AS (
      |  SELECT new_kid // 65536 AS doc_new, new_kid % 65536 AS scene_new,
      |    arch_kid // 65536 AS doc_arch, arch_kid % 65536 AS scene_arch
      |  FROM p WHERE hamming <= 3),
      |cov AS (
      |  SELECT doc_new, doc_arch,
      |    COUNT(DISTINCT scene_new) AS matched_new,
      |    COUNT(DISTINCT scene_arch) AS matched_arch
      |  FROM sp GROUP BY doc_new, doc_arch),
      |cn AS (
      |  SELECT doc_id, COUNT(*) AS n FROM kph
      |  WHERE doc_id % 10 = 0 GROUP BY doc_id),
      |ca AS (
      |  SELECT doc_id, COUNT(*) AS n FROM kph
      |  WHERE doc_id % 10 <> 0$caExtra GROUP BY doc_id)
      |SELECT cov.doc_new, cov.doc_arch, cn.n AS n_new, ca.n AS n_arch,
      |  cov.matched_new, cov.matched_arch
      |FROM cov
      |JOIN cn ON cn.doc_id = cov.doc_new
      |JOIN ca ON ca.doc_id = cov.doc_arch
      |WHERE cov.matched_new * 2 >= cn.n OR cov.matched_arch * 2 >= ca.n
      |ORDER BY cov.doc_new, cov.doc_arch""".stripMargin

  private val mm5Oracle =
    """WITH d AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
      |f AS (
      |  SELECT doc_id, text, n,
      |    unnest(generate_series(0, (n + 15) // 16 - 1)) AS fi
      |  FROM d),
      |e AS (
      |  SELECT doc_id, fi,
      |    (list_sum(list_transform(
      |      generate_series(fi * 16 + 1, least(fi * 16 + 16, n)),
      |      p -> ord(substr(text, CAST(p AS INT), 1)))) * 1000)
      |      // (255 * (least(fi * 16 + 16, n) - fi * 16)) AS epm
      |  FROM f),
      |b AS (
      |  SELECT doc_id, fi, epm,
      |    CASE WHEN LAG(epm) OVER w IS NULL
      |           OR abs(epm - LAG(epm) OVER w) >= 25 THEN 1 ELSE 0 END AS cut
      |  FROM e WINDOW w AS (PARTITION BY doc_id ORDER BY fi)),
      |g AS (
      |  SELECT doc_id, fi, epm,
      |    SUM(cut) OVER (PARTITION BY doc_id ORDER BY fi
      |      ROWS UNBOUNDED PRECEDING) AS scene
      |  FROM b)
      |SELECT doc_id, CAST(scene AS BIGINT) AS scene_id,
      |  CAST(MIN(fi) AS BIGINT) AS start_idx,
      |  CAST(MAX(fi) AS BIGINT) AS end_idx,
      |  COUNT(*) AS n_frames,
      |  CAST(SUM(epm) // COUNT(*) AS BIGINT) AS mean_pm
      |FROM g GROUP BY doc_id, scene
      |ORDER BY doc_id, scene_id""".stripMargin

  private val mm4Oracle =
    """WITH d AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
      |f AS (
      |  SELECT doc_id, text, n,
      |    unnest(generate_series(0, (n + 15) // 16 - 1)) AS fi
      |  FROM d),
      |e AS (
      |  SELECT doc_id, fi,
      |    list_sum(list_transform(
      |      generate_series(fi * 16 + 1, least(fi * 16 + 16, n)),
      |      p -> ord(substr(text, CAST(p AS INT), 1)))) AS s,
      |    least(fi * 16 + 16, n) - fi * 16 AS len
      |  FROM f),
      |a AS (
      |  SELECT doc_id, fi,
      |    CASE WHEN (s * 1000) // (255 * len) >= 390 THEN 1 ELSE 0 END
      |      AS active
      |  FROM e),
      |b AS (
      |  SELECT doc_id, fi, active,
      |    CASE WHEN LAG(active) OVER w IS NULL
      |           OR active <> LAG(active) OVER w THEN 1 ELSE 0 END AS brk
      |  FROM a WINDOW w AS (PARTITION BY doc_id ORDER BY fi)),
      |g AS (
      |  SELECT doc_id, fi, active,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY fi
      |      ROWS UNBOUNDED PRECEDING) AS seg
      |  FROM b)
      |SELECT doc_id, CAST(seg AS BIGINT) AS seg_id,
      |  CAST(active AS BIGINT) AS active,
      |  CAST(MIN(fi) AS BIGINT) AS start_idx,
      |  CAST(MAX(fi) AS BIGINT) AS end_idx,
      |  COUNT(*) AS n_frames
      |FROM g GROUP BY doc_id, seg, active
      |ORDER BY doc_id, seg_id""".stripMargin

  // ---- d43: cluster-balanced subsample — e5's literal quantizer routes
  // every embedding to a cell, then a per-cell cap keeps the sha-ordered
  // first 25 (DataComp's cluster sampling / the balancing half of
  // SemDeDup). The oracle replays assignment (the e5 CTE chain verbatim)
  // plus the per-cell COUNT/ROW_NUMBER windows; both kept and rejected
  // rows are certified. ----
  private def d43(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterBalancedSample(emb(s, dir), "vec_id", "embedding",
        nlist = 16, cap = 25)
      .orderBy("id")

  private val d43Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cents AS (
      |  SELECT vec_id AS cid, v AS cv FROM e
      |  ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      |assign AS (
      |  SELECT e.vec_id, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ROUND(list_dot_product(e.v, c.cv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) DESC,
      |      c.cid DESC) AS rn
      |  FROM e CROSS JOIN cents c),
      |cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      |ranked AS (
      |  SELECT vec_id, cell,
      |    COUNT(*) OVER (PARTITION BY cell) AS cell_n,
      |    ROW_NUMBER() OVER (PARTITION BY cell
      |      ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id) AS rn
      |  FROM cells)
      |SELECT vec_id AS id, cell, cell_n::BIGINT AS cell_n, rn::BIGINT AS rn,
      |  (CASE WHEN rn <= 25 THEN 1 ELSE 0 END)::BIGINT AS kept
      |FROM ranked ORDER BY id""".stripMargin

  // ---- e18: ANN index-quality evaluation — recall@5 of the composed
  // IVF-PQ index (e9) against exact brute-force ground truth (e1), per
  // query. The operator every index deployment runs before trusting an
  // approximate path; here the evaluation ITSELF is the certified
  // query: both sides run in-engine, the join/aggregate computes hits
  // and integer recall percent, and the oracle replays BOTH retrieval
  // chains (e1's and e9's CTEs verbatim) plus the same evaluation
  // arithmetic. 100*hits/k is exact in double at k=5, so the BIGINT
  // truncation agrees on both engines. ----
  private def e18(s: SparkSession, dir: String): DataFrame = {
    val exact = Similarity.bruteForceTopK(emb(s, dir), "vec_id",
        "embedding", _ < 20, k = 5)
      .select(col("q_id"), col("nn_id"))
    val approx = Similarity.ivfPqTopK(emb(s, dir), "vec_id", "embedding",
        _ < 20, k = 5)
      .select(col("q_id"), col("nn_id"))
    val hits = exact.join(approx, Seq("q_id", "nn_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    exact.groupBy("q_id").agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("k"),
        (coalesce(col("hits"), lit(0L)) * 100 / col("k")).cast("long")
          .as("recall_pct"))
      .orderBy("q_id")
  }

  private val e18Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id < 20),
      |sc AS (
      |  SELECT q.vec_id AS q_id, e.vec_id AS nn_id,
      |    ROUND(list_dot_product(q.v, e.v) /
      |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))), 6) AS sim
      |  FROM q JOIN e ON q.vec_id <> e.vec_id),
      |er AS (
      |  SELECT q_id, nn_id,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM sc),
      |samp AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY sha, vec_id) - 1 AS c, vec_id AS cid, v
      |  FROM (SELECT vec_id, v, sha256(CAST(vec_id AS VARCHAR)) AS sha
      |        FROM e ORDER BY sha, vec_id LIMIT 16)),
      |assign AS (
      |  SELECT e.vec_id, e.v, s.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ROUND(list_dot_product(e.v, s.v) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.v, s.v))), 9) DESC,
      |      s.cid DESC) AS rn
      |  FROM e CROSS JOIN samp s),
      |cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS q_id, v AS qv, cid AS cell FROM assign
      |  WHERE vec_id < 20 AND rn <= 4),
      |enc0 AS (
      |  SELECT e.vec_id, js.j, s.c,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (e.v[js.j*8 + i] - s.v[js.j*8 + i])
      |           * (e.v[js.j*8 + i] - s.v[js.j*8 + i]))) AS d
      |  FROM e CROSS JOIN generate_series(0, 7) AS js(j) CROSS JOIN samp s),
      |enc AS (
      |  SELECT vec_id, j, c FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM enc0) WHERE rn = 1),
      |recon AS (
      |  SELECT enc.vec_id,
      |    flatten(list(s.v[enc.j*8+1 : enc.j*8+8] ORDER BY enc.j)) AS rv
      |  FROM enc JOIN samp s ON s.c = enc.c
      |  GROUP BY enc.vec_id),
      |adc AS (
      |  SELECT p.q_id, cl.vec_id AS nn_id,
      |    ROUND(list_sum(list_transform(generate_series(0, 7),
      |      j -> list_sum(list_transform(generate_series(1, 8),
      |        i -> (p.qv[j*8+i] - r.rv[j*8+i])
      |             * (p.qv[j*8+i] - r.rv[j*8+i]))))), 6) AS adist
      |  FROM probes p
      |  JOIN cells cl ON p.cell = cl.cell AND p.q_id <> cl.vec_id
      |  JOIN recon r ON r.vec_id = cl.vec_id),
      |rk AS (
      |  SELECT q_id, nn_id,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, nn_id) AS rank
      |  FROM adc),
      |ex AS (SELECT q_id, nn_id FROM er WHERE rank <= 5),
      |ap AS (SELECT q_id, nn_id FROM rk WHERE rank <= 5),
      |h AS (
      |  SELECT ex.q_id, COUNT(*) AS hits
      |  FROM ex JOIN ap ON ex.q_id = ap.q_id AND ex.nn_id = ap.nn_id
      |  GROUP BY ex.q_id),
      |b AS (SELECT q_id, COUNT(*) AS k FROM ex GROUP BY q_id)
      |SELECT b.q_id, COALESCE(h.hits, 0)::BIGINT AS hits, b.k::BIGINT AS k,
      |  CAST(COALESCE(h.hits, 0) * 100 / b.k AS BIGINT) AS recall_pct
      |FROM b LEFT JOIN h ON h.q_id = b.q_id
      |ORDER BY b.q_id""".stripMargin

  // ---- e19: per-cluster embedding outliers — the farthest-from-centroid
  // sweep over each label group (mislabeled/off-distribution candidates).
  // Integer-exact: coordinates scaled to round(v·1e5) BIGINT, score is
  // n²·‖x − centroid‖² = Σ(n·x_d − S_d)² computed wholly in BIGINT —
  // no float-summation-order hazard (integer sums are order-free on
  // both engines). DuckDB SUM(BIGINT)→HUGEINT casts back (d33
  // precedent). ----
  private def e19(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidOutliers(emb(s, dir), "vec_id", "embedding",
        "label", topK = 5)
      .orderBy("label", "rank")

  private val e19Oracle =
    """WITH x AS (
      |  SELECT vec_id, label,
      |    unnest(list_transform(CAST(embedding AS DOUBLE[]),
      |      v -> CAST(ROUND(v * 100000) AS BIGINT))) AS x,
      |    generate_subscripts(embedding, 1) AS d
      |  FROM embeddings),
      |c AS (
      |  SELECT label, d, SUM(x)::BIGINT AS s, COUNT(*)::BIGINT AS n
      |  FROM x GROUP BY label, d),
      |dist AS (
      |  SELECT x.vec_id, x.label,
      |    CAST(SUM((c.n * x.x - c.s) * (c.n * x.x - c.s)) AS BIGINT)
      |      AS dist2_q,
      |    MAX(c.n) AS n
      |  FROM x JOIN c ON x.label = c.label AND x.d = c.d
      |  GROUP BY x.vec_id, x.label),
      |r AS (
      |  SELECT label, vec_id, dist2_q, n,
      |    ROW_NUMBER() OVER (PARTITION BY label
      |      ORDER BY dist2_q DESC, vec_id) AS rank
      |  FROM dist)
      |SELECT label, CAST(rank AS INT) AS rank, vec_id, dist2_q, n
      |FROM r WHERE rank <= 5 ORDER BY label, rank""".stripMargin

  // ---- d48: MinHash index-quality evaluation — the dedup twin of e18's
  // ANN recall row. For every LSH candidate pair (the sha-certified d14
  // family), report the signature ESTIMATE next to the EXACT shingle-set
  // Jaccard, so the gate certifies the estimator's error itself, not just
  // the candidate set. Exact Jaccard runs over the 32-bit sha shingle
  // hashes on BOTH engines (any truncation collision is shared, so the
  // comparison stays exact), restricted to candidate documents — the
  // d15 slice argument: the quadratic-ish stage never sees the corpus.
  // The verify self-join carries the SAME df-cap as every other member
  // of the shingle family (d6's maxDf = 100, over the flagged slice):
  // without it, a flagged cohort sharing one stop-shingle fans out
  // quadratically on that key — the last quadratic on a dedup path
  // (round-12 verdict). Capped shingles contribute nothing to the
  // intersection (sizes stay uncapped), so the reported Jaccard is
  // d6's capped-exact measure; the oracle replays the cap identically.
  // est_jaccard is agreement/64 (the certified d14 double); exact is
  // integer ppm via truncating division. ----
  private def d48(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cands = MinHashLSH.candidatePairs(d, "text", "doc_id",
      k = 5, numHashes = 64, bands = 16, estThreshold = 0.5,
      maxBucket = Int.MaxValue, shingleRows = TextAnalysis.shaShingleRows)
    val candIds = cands
      .select(explode(array(col("doc_a"), col("doc_b"))).as("cid"))
      .distinct()
    // Semi-join BEFORE shingling: the second sha pass (the expensive
    // per-shingle crypto hash) runs only on the flagged slice, not the
    // corpus — at realistic near-dup rates a few percent of the data.
    val flagged = d.join(candIds, col("doc_id") === col("cid"), "left_semi")
    // materialized once: the flagged slice is tiny (the d15 argument)
    // but its sha-shingle pass is not — sizes, the df-cap, and both
    // sides of the verify join all read these rows
    val shing = TextAnalysis.shaShingleRows(flagged, "text", "doc_id", 5)
      .select(col("id"), col("shingle").as("h")).distinct()
      .localCheckpoint(true)
    val sizes = shing.groupBy("id").agg(count(lit(1)).as("n"))
    // df ∈ [2, 100] over the flagged slice: df-1 shingles cannot
    // intersect (pure pruning); the upper cap bounds the per-key fan-out
    val dfOk = shing.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 100)
      .select("h")
    val capped = shing.join(dfOk, "h")
    val inter = capped.as("x").join(capped.as("y"), "h")
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    cands.select("doc_a", "doc_b", "est_jaccard")
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.withColumnsRenamed(Map("id" -> "doc_a", "n" -> "na")),
        "doc_a")
      .join(sizes.withColumnsRenamed(Map("id" -> "doc_b", "n" -> "nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        (col("na") + col("nb") - coalesce(col("n_inter"), lit(0L)))
          .as("n_union"))
      .withColumn("exact_ppm",
        expr("(1000000 * n_inter) div n_union"))
      .orderBy("doc_a", "doc_b")
  }

  private val d48Oracle: String = {
    val mod = MinHashLSH.Modulus
    val ps = MinHashLSH.perms(64)
    val minExprs = ps.zipWithIndex.map { case ((a, b), i) =>
      s"MIN((h * $a + $b) % $mod) AS m$i"
    }.mkString(", ")
    val bandEq = (0 until 16).map { b =>
      (0 until 4).map(r => s"a.m${b * 4 + r} = b.m${b * 4 + r}")
        .mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val agree = (0 until 64)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) >= 5 THEN
       |      list_transform(generate_series(1, len(ws) - 4),
       |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])
       |    ELSE CAST([] AS VARCHAR[]) END AS shingles
       |  FROM w),
       |u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |hs AS (SELECT DISTINCT doc_id, ('0x' || substr(sha256(s), 1, 8))::BIGINT AS h FROM u),
       |sig AS (
       |  SELECT doc_id, $minExprs
       |  FROM hs GROUP BY doc_id),
       |pf AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    ROUND(($agree) / 64.0, 6) AS est_jaccard
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE ($bandEq) AND ROUND(($agree) / 64.0, 6) >= 0.5),
       |cd AS (SELECT DISTINCT doc_id FROM (
       |  SELECT doc_a AS doc_id FROM pf UNION ALL SELECT doc_b FROM pf)),
       |ch AS (SELECT hs.doc_id, hs.h FROM hs JOIN cd USING (doc_id)),
       |sz AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM ch GROUP BY doc_id),
       |chdf AS (SELECT h FROM ch GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 100),
       |cf AS (SELECT ch.doc_id, ch.h FROM ch JOIN chdf USING (h)),
       |iv AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*)::BIGINT AS n_inter
       |  FROM cf x JOIN cf y ON x.h = y.h AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT pf.doc_a, pf.doc_b, pf.est_jaccard,
       |  COALESCE(iv.n_inter, 0)::BIGINT AS n_inter,
       |  (sa.n + sb.n - COALESCE(iv.n_inter, 0))::BIGINT AS n_union,
       |  ((1000000 * COALESCE(iv.n_inter, 0))
       |    // (sa.n + sb.n - COALESCE(iv.n_inter, 0)))::BIGINT AS exact_ppm
       |FROM pf
       |JOIN sz sa ON sa.doc_id = pf.doc_a
       |JOIN sz sb ON sb.doc_id = pf.doc_b
       |LEFT JOIN iv ON iv.doc_a = pf.doc_a AND iv.doc_b = pf.doc_b
       |ORDER BY pf.doc_a, pf.doc_b""".stripMargin
  }

  // ---- e20: reciprocal rank fusion — the OTHER canonical hybrid
  // combiner next to e16's rerank: BM25 lexical ranks (d25's scorer,
  // top-20) fused with more-like-this cosine ranks (top-20 vs doc 0's
  // embedding — query-by-example) via Similarity.rrfFuse. Every fused
  // score is an exact BIGINT sum of 1000000 div (60 + rank) terms, so
  // the gate certifies the fusion arithmetic bit-for-bit; a document
  // needs only one list to surface (FULL OUTER — q53's join face doing
  // retrieval work). ----
  private def e20(s: SparkSession, dir: String): DataFrame = {
    val lex = Curation.bm25Rank(docs(s, dir), "text", "doc_id",
        Seq("spark", "window", "merge"), topK = 20)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score").desc, col("id"))))
      .select(col("id").as("doc_id"), col("lex_rank"))
    val vecs = emb(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val qv = vecs.filter(col("vec_id") === 0L).select(col("v").as("qv"))
    // top-20 via orderBy+limit (TakeOrdered: per-partition heaps, no
    // global corpus sort), then the rank window runs on 20 rows
    val semTop = vecs.crossJoin(broadcast(qv))
      .withColumn("sim",
        round(Similarity.cosineFast(col("qv"), col("v")), 6))
      .orderBy(col("sim").desc, col("vec_id")).limit(20)
    val sem = semTop
      .withColumn("sem_rank", row_number().over(
        Window.orderBy(col("sim").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("sem_rank"))
    Similarity.rrfFuse(lex, sem, k = 60, topN = 10).orderBy("rank")
  }

  private val e20Oracle =
    """WITH d AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents),
      |st AS (SELECT doc_id,
      |  CAST(len(ws) AS DOUBLE) AS dl,
      |  CAST(len(list_filter(ws, x -> x = 'spark')) AS DOUBLE) AS tf0,
      |  CAST(len(list_filter(ws, x -> x = 'window')) AS DOUBLE) AS tf1,
      |  CAST(len(list_filter(ws, x -> x = 'merge')) AS DOUBLE) AS tf2
      |  FROM d),
      |g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
      |  CAST(COUNT(*) FILTER (WHERE tf0 > 0) AS DOUBLE) AS df0,
      |  CAST(COUNT(*) FILTER (WHERE tf1 > 0) AS DOUBLE) AS df1,
      |  CAST(COUNT(*) FILTER (WHERE tf2 > 0) AS DOUBLE) AS df2
      |  FROM st),
      |sc AS (SELECT doc_id, ROUND(
      |    ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.25
      |      / (tf0 + 1.25 * (0.25 + 0.75 * dl / avgdl))
      |  + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.25
      |      / (tf1 + 1.25 * (0.25 + 0.75 * dl / avgdl))
      |  + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.25
      |      / (tf2 + 1.25 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
      |  FROM st CROSS JOIN g),
      |bm AS (SELECT doc_id, score FROM sc WHERE score > 0
      |  ORDER BY score DESC, doc_id LIMIT 20),
      |lex AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
      |    ORDER BY score DESC, doc_id) AS INT) AS lex_rank FROM bm),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
      |sims AS (
      |  SELECT e.vec_id,
      |    ROUND(list_dot_product(q, v) /
      |      (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(v, v))), 6) AS sim
      |  FROM e CROSS JOIN qv),
      |sem AS (SELECT vec_id AS doc_id, CAST(rn AS INT) AS sem_rank FROM (
      |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rn
      |  FROM sims) WHERE rn <= 20),
      |f AS (
      |  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
      |    lex_rank, sem_rank,
      |    (COALESCE(1000000 // (60 + lex_rank), 0)
      |     + COALESCE(1000000 // (60 + sem_rank), 0))::BIGINT AS rrf_u
      |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id),
      |r AS (
      |  SELECT doc_id, lex_rank, sem_rank, rrf_u,
      |    CAST(ROW_NUMBER() OVER (ORDER BY rrf_u DESC, doc_id) AS INT)
      |      AS rank
      |  FROM f)
      |SELECT doc_id, rank, lex_rank, sem_rank, rrf_u
      |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin

  // ---- e21: graph ANN (Similarity.graphTopK) — the navigable-small-
  // world family, the ladder rung whose per-query cost is CONSTANT in
  // corpus size (hops × beam × degree lookups). Index: e5's literal
  // cells, then each node keeps its 6 nearest in-cell neighbours
  // (rounded cosine, id ties). Query: score the 16 sampled entry nodes,
  // keep the best 8, expand neighbourhoods and re-score twice, rank the
  // final candidate set minus self. The oracle replays the WHOLE walk:
  // sha sample, 9-dp cell assignment (e5 tie rule), the 6-dp top-6
  // adjacency, both unrolled hops as UNION-distinct candidate sets, and
  // the final top-5 — candidate sets are identical by construction, so
  // every rounded sim matches hash-exactly. ----
  private def e21(s: SparkSession, dir: String): DataFrame =
    Similarity.graphTopK(emb(s, dir), "vec_id", "embedding", _ < 20,
        k = 5, nlist = 16, degree = 6, beam = 8, hops = 2)
      .orderBy("q_id", "rank")

  private val e21Oracle = {
    def cos(a: String, b: String): String =
      s"""ROUND(list_dot_product($a, $b) /
         |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |samp AS (
      |  SELECT vec_id AS cid, v AS cv FROM e
      |  ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      |assign AS (
      |  SELECT e.vec_id, e.v, s.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ROUND(list_dot_product(e.v, s.cv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.cv, s.cv))), 9) DESC,
      |      s.cid DESC) AS rn
      |  FROM e CROSS JOIN samp s),
      |cells AS (SELECT vec_id, v, cid AS cell FROM assign WHERE rn = 1),
      |adj AS (
      |  SELECT node, nbr FROM (
      |    SELECT x.vec_id AS node, y.vec_id AS nbr,
      |      ROW_NUMBER() OVER (PARTITION BY x.vec_id ORDER BY
      |        ${cos("x.v", "y.v")} DESC, y.vec_id) AS rn
      |    FROM cells x JOIN cells y ON x.cell = y.cell AND x.vec_id <> y.vec_id)
      |  WHERE rn <= 6),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
      |s0 AS (
      |  SELECT q.q_id, s.cid AS nn_id, ${cos("q.qv", "s.cv")} AS sim
      |  FROM q CROSS JOIN samp s),
      |f0 AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM s0) WHERE rn <= 8),
      |c1 AS (SELECT q_id, nn_id FROM f0
      |  UNION SELECT f0.q_id, a.nbr FROM f0 JOIN adj a ON a.node = f0.nn_id),
      |s1 AS (
      |  SELECT c1.q_id, c1.nn_id, ${cos("q.qv", "t.v")} AS sim
      |  FROM c1 JOIN q USING (q_id) JOIN e t ON t.vec_id = c1.nn_id),
      |f1 AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM s1) WHERE rn <= 8),
      |c2 AS (SELECT q_id, nn_id FROM f1
      |  UNION SELECT f1.q_id, a.nbr FROM f1 JOIN adj a ON a.node = f1.nn_id),
      |s2 AS (
      |  SELECT c2.q_id, c2.nn_id, ${cos("q.qv", "t.v")} AS sim
      |  FROM c2 JOIN q USING (q_id) JOIN e t ON t.vec_id = c2.nn_id),
      |rk AS (
      |  SELECT q_id, nn_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM s2 WHERE q_id <> nn_id)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, sim
      |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  // ---- e22: NN-descent graph refinement (Similarity.nnDescentAdj) —
  // the production build path for e21's index, now LINEAR end to end:
  // the seed multi-assigns each node to its top-2 cells (the bridges)
  // but scores it only against each cell's 8 sha-elected
  // REPRESENTATIVES (n·2·8 pairs, reps broadcast — the round-10 probe
  // measured the old in-cell all-pairs seed at ~100% of build cost);
  // each refinement round mixes in per-target DEGREE-BOUNDED reverse
  // edges (so hub reps can't recreate the quadratic) and wedges over
  // the union, rescores exactly at 6 dp, cuts back to degree 6. The
  // oracle replays the rn≤2 multi-assignment, the per-cell rep
  // election window, the seed top-6, the bounded reverse window, the
  // DISTINCT candidate expansion (the top-k buffer's duplicate
  // collapse matches SQL DISTINCT), rescoring, and the final per-node
  // rank; output restricted to node < 25 to keep the row set
  // bounded. ----
  private def e22(s: SparkSession, dir: String): DataFrame =
    Similarity.nnDescentAdj(emb(s, dir), "vec_id", "embedding",
        degree = 6, rounds = 1)
      .filter(col("node") < 25)
      .orderBy("node", "rank")

  /** The shared adjacency-build CTE chain (through `adj1`, the
    * one-round NN-descent graph) — e22 certifies it directly; e23
    * serves the e21 walk over it; e27 re-enters it with the seed
    * origins restricted to a post-takedown survivor set (`extraCtes`
    * inserts the retraction CTEs after the frozen-quantizer `reps`;
    * `seedOrigin` swaps the seed's origin relation — the quantizer
    * CTEs above the swap stay full-corpus, exactly the frozen-quantizer
    * discipline the engine's retract face keeps; e34 instead swaps
    * `corpusSrc` so the WHOLE quantizer trains on a survivor relation
    * injected through `preCtes` — the migrate face's re-train). */
  private def nndAdjCtes(cos: (String, String) => String,
      extraCtes: String = "", seedOrigin: String = "cells2",
      scoreSrc: String = "e", preCtes: String = "",
      corpusSrc: String = "e", nlistSql: String = "16"): String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),$preCtes
      |samp AS (
      |  SELECT vec_id AS cid, v AS cv FROM $corpusSrc
      |  ORDER BY sha256(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nlistSql),
      |assign AS (
      |  SELECT e.vec_id, e.v, s.cid,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |      ROUND(list_dot_product(e.v, s.cv) /
      |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.cv, s.cv))), 9) DESC,
      |      s.cid DESC) AS rn
      |  FROM $corpusSrc AS e CROSS JOIN samp s),
      |cells2 AS (SELECT vec_id, v, cid AS cell FROM assign WHERE rn <= 2),
      |reps AS (
      |  SELECT cell, vec_id AS rep_id, v AS rv FROM (
      |    SELECT cell, vec_id, v,
      |      ROW_NUMBER() OVER (PARTITION BY cell ORDER BY
      |        sha256(CAST(vec_id AS VARCHAR)), vec_id) AS rn
      |    FROM cells2)
      |  WHERE rn <= 8),$extraCtes
      |seedp AS (
      |  SELECT DISTINCT x.vec_id AS node, x.v AS xv, r.rep_id AS nbr, r.rv AS yv
      |  FROM $seedOrigin x JOIN reps r ON x.cell = r.cell AND x.vec_id <> r.rep_id),
      |adj0 AS (
      |  SELECT node, nbr, nsim FROM (
      |    SELECT node, nbr, ${cos("xv", "yv")} AS nsim,
      |      ROW_NUMBER() OVER (PARTITION BY node ORDER BY
      |        ${cos("xv", "yv")} DESC, nbr) AS rn
      |    FROM seedp)
      |  WHERE rn <= 6),
      |rev AS (
      |  SELECT nbr AS node, node AS nbr FROM (
      |    SELECT node, nbr,
      |      ROW_NUMBER() OVER (PARTITION BY nbr ORDER BY nsim DESC, node) AS rn
      |    FROM adj0)
      |  WHERE rn <= 6),
      |und AS (
      |  SELECT node, nbr FROM adj0 UNION SELECT node, nbr FROM rev),
      |cand AS (
      |  SELECT node, nbr FROM und
      |  UNION
      |  SELECT a.node, b.nbr FROM und a JOIN und b ON a.nbr = b.node
      |  WHERE a.node <> b.nbr),
      |scored AS (
      |  SELECT c.node, c.nbr, ${cos("x.v", "y.v")} AS nsim
      |  FROM cand c JOIN $scoreSrc x ON x.vec_id = c.node
      |  JOIN $scoreSrc y ON y.vec_id = c.nbr),
      |adj1 AS (
      |  SELECT node, nbr, nsim,
      |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY nsim DESC, nbr) AS rank
      |  FROM scored)""".stripMargin

  /** The full one-round build oracle (shared: e22 certifies the batch
    * build; s16 certifies that the incrementally-maintained streaming
    * artifact EQUALS it — the frozen-quantizer induction). */
  private[graft] def nndBuildOracle(restrictNode: Int): String = {
    def cos(a: String, b: String): String =
      s"""ROUND(list_dot_product($a, $b) /
         |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
    s"""WITH ${nndAdjCtes(cos)}
      |SELECT node, CAST(rank AS INT) AS rank, nbr, nsim
      |FROM adj1 WHERE rank <= 6 AND node < $restrictNode
      |ORDER BY node, rank""".stripMargin
  }

  private val e22Oracle = nndBuildOracle(restrictNode = 25)

  // ---- e27: graph-ANN index RETRACTION (Similarity.retractNndIndex)
  // — the ANN-family delete face beside d55 (groups) and d56
  // (fingerprints): build the e22 index, retract every 9th vector that
  // is not a quantizer anchor (centroids/reps are the frozen artifact
  // every incremental face shares — an anchor takedown needs a
  // re-train, and the engine REFUSES it loudly; the predicate replays
  // that exclusion), and emit the retracted REFINED face. The oracle
  // is the e22 build chain re-entered with the seed origins restricted
  // to the survivors under the SAME full-corpus frozen quantizer —
  // i.e. a from-scratch rebuild-without-them — so green certifies
  // retract ≡ rebuild at the gate, while the spec additionally pins
  // both faces unrestricted, the serve-excludes-retracted contract,
  // and the anchor refusal. ----
  private def e27(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = Similarity.buildNndIndex(e, "vec_id", "embedding")
    val removable = e.filter(col("vec_id") % 9 === 4).select("vec_id")
      .join(idx.quant.reps.select(col("rep_id").as("vec_id")),
        Seq("vec_id"), "left_anti")
      .filter(!col("vec_id").isInCollection(idx.quant.centIds.toSeq))
    Similarity.retractNndIndex(idx, e, "vec_id", "embedding", removable)
      .refined
      .filter(col("node") < 25)
      .orderBy("node", "rank")
  }

  private val e27Oracle = {
    def cos(a: String, b: String): String =
      s"""ROUND(list_dot_product($a, $b) /
         |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
    val retractCtes =
      """
        |rem AS (
        |  SELECT vec_id FROM e
        |  WHERE vec_id % 9 = 4
        |    AND vec_id NOT IN (SELECT rep_id FROM reps)
        |    AND vec_id NOT IN (SELECT cid FROM samp)),
        |surv2 AS (
        |  SELECT * FROM cells2
        |  WHERE vec_id NOT IN (SELECT vec_id FROM rem)),""".stripMargin
    s"""WITH ${nndAdjCtes(cos, retractCtes, seedOrigin = "surv2")}
      |SELECT node, CAST(rank AS INT) AS rank, nbr, nsim
      |FROM adj1 WHERE rank <= 6 AND node < 25
      |ORDER BY node, rank""".stripMargin
  }

  // ---- e32: graph-ANN index UPDATE (Similarity.updateNndIndex) —
  // the re-embed edit path for the NndIndex family, e29's graph-ANN
  // twin: every 9th vector that is not a quantizer anchor is
  // re-crawled with a CHANGED embedding (list-reversed — an exact
  // permutation: norms identical, neighbourhoods genuinely move, no
  // float drift between Spark and DuckDB), the update face retracts
  // the old vector and appends the new one against the same FROZEN
  // quantizer, and the oracle replays the e22 build chain with cell
  // assignment + seed + refinement scoring over the UPDATED corpus
  // under the frozen (full-corpus) quantizer — a from-scratch
  // rebuild-with-the-new-vectors. Anchor updates are REFUSED by the
  // retract leg (the quantizer stores anchor vectors; an anchor edit
  // invalidates the estimator — the migrate path's job), exactly like
  // anchor takedowns; the predicate replays that exclusion. Ordering
  // spec-pinned in UpdateFacesSpec. ----
  private def e32(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = Similarity.buildNndIndex(e, "vec_id", "embedding")
    val anchorIds = idx.quant.reps.select(col("rep_id")).collect()
      .map(_.getLong(0)).toSet ++ idx.quant.centIds
    val isUpd = (c: org.apache.spark.sql.Column) =>
      c % 9 === 4 && !c.isInCollection(anchorIds.toSeq)
    val updated = e.select(col("vec_id"),
      when(isUpd(col("vec_id")), reverse(col("embedding")))
        .otherwise(col("embedding")).as("embedding"))
    Similarity.updateNndIndex(idx, updated, "vec_id", "embedding",
        isUpd)
      .refined
      .filter(col("node") < 25)
      .orderBy("node", "rank")
  }

  private val e32Oracle = {
    def cos(a: String, b: String): String =
      s"""ROUND(list_dot_product($a, $b) /
         |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
    val updCtes =
      """
        |e2 AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 9 = 4
        |           AND vec_id NOT IN (SELECT rep_id FROM reps)
        |           AND vec_id NOT IN (SELECT cid FROM samp)
        |      THEN list_reverse(v) ELSE v END AS v
        |  FROM e),
        |assign2 AS (
        |  SELECT e2.vec_id, e2.v, s.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e2.vec_id ORDER BY
        |      ROUND(list_dot_product(e2.v, s.cv) /
        |        (sqrt(list_dot_product(e2.v, e2.v)) * sqrt(list_dot_product(s.cv, s.cv))), 9) DESC,
        |      s.cid DESC) AS rn
        |  FROM e2 CROSS JOIN samp s),
        |cells2u AS (SELECT vec_id, v, cid AS cell FROM assign2 WHERE rn <= 2),""".stripMargin
    s"""WITH ${nndAdjCtes(cos, updCtes, seedOrigin = "cells2u",
        scoreSrc = "e2")}
      |SELECT node, CAST(rank AS INT) AS rank, nbr, nsim
      |FROM adj1 WHERE rank <= 6 AND node < 25
      |ORDER BY node, rank""".stripMargin
  }

  // ---- e28: IVF-PQ index RETRACTION (Similarity.ivfPqIndexRetract) —
  // the delete face of the OTHER persisted ANN artifact (VERDICT r14
  // missing item 1; e27 covered the graph family, this row covers the
  // cell/codes family that s15 builds and s14 serves): build the e9
  // index, retract every 7th vector, and emit the surviving listed
  // face — cell routing and codes verbatim, codes joined to a string
  // for a DuckDB-comparable shape (s15's convention). The oracle
  // replays s15's full build chain — quantizer-sample CTEs over the
  // FULL corpus (the frozen-quantizer discipline: a takedown must not
  // silently re-train the estimator) — and restricts only the encoded
  // rows to survivors: a from-scratch rebuild-without-them under the
  // frozen quantizer, so green certifies retract ≡ rebuild including
  // per-cell membership (cell counts are a projection of this result
  // set). The spec additionally pins the artifact leg (save → load →
  // retract → serve never returns a retracted id) and the re-encode
  // identity (anti-joined stored codes == survivors re-encoded from
  // raw vectors). ----
  private def e28(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = Similarity.buildIvfPqIndex(e, "vec_id", "embedding")
    val removed = e.filter(col("vec_id") % 7 === 3).select("vec_id")
    Similarity.ivfPqIndexRetract(idx, removed).listed
      .select(col("cell"), col("nn_id").as("vec_id"),
        array_join(col("codes").cast("array<string>"), "-").as("codes_str"))
      .orderBy("vec_id")
  }

  /** The IVF-PQ listed-face rebuild oracle shared by e28 (retract),
    * e29 (update) and e31 (migrate): train the 16-row sha-sampled
    * quantizer over `sampSrc`, route + PQ-encode `encSrc`, emit
    * (cell, vec_id, codes_str). The three gate rows differ ONLY in
    * which corpus face trains the ESTIMATOR vs which rows are the
    * EVIDENCE — exactly the line the engine faces draw (retract/update
    * freeze the quantizer; migrate deliberately re-trains it). */
  private def ivfPqListedOracle(extraCtes: String, sampSrc: String,
      encSrc: String): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),$extraCtes
      |samp AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY sha, vec_id) - 1 AS c, vec_id AS cid, v
      |  FROM (SELECT vec_id, v, sha256(CAST(vec_id AS VARCHAR)) AS sha
      |        FROM $sampSrc ORDER BY sha, vec_id LIMIT 16)),
      |assign AS (
      |  SELECT x.vec_id, x.v, s.cid,
      |    ROW_NUMBER() OVER (PARTITION BY x.vec_id ORDER BY
      |      ROUND(list_dot_product(x.v, s.v) /
      |        (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(s.v, s.v))), 9) DESC,
      |      s.cid DESC) AS rn
      |  FROM $encSrc x CROSS JOIN samp s),
      |cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      |enc0 AS (
      |  SELECT x.vec_id, js.j, s.c,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (x.v[js.j*8 + i] - s.v[js.j*8 + i])
      |           * (x.v[js.j*8 + i] - s.v[js.j*8 + i]))) AS d
      |  FROM $encSrc x CROSS JOIN generate_series(0, 7) AS js(j) CROSS JOIN samp s),
      |enc AS (
      |  SELECT vec_id, j, c FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM enc0) WHERE rn = 1),
      |codes AS (
      |  SELECT vec_id, string_agg(CAST(c AS VARCHAR), '-' ORDER BY j) AS codes_str
      |  FROM enc GROUP BY vec_id)
      |SELECT cl.cell, c.vec_id, c.codes_str
      |FROM codes c JOIN cells cl USING (vec_id)
      |ORDER BY c.vec_id""".stripMargin

  private val e28Oracle = ivfPqListedOracle(
    """
      |surv AS (SELECT vec_id, v FROM e WHERE vec_id % 7 <> 3),""".stripMargin,
    sampSrc = "e", encSrc = "surv")

  // ---- e29: IVF-PQ index UPDATE (Similarity.ivfPqIndexUpdate) — the
  // re-crawl edit path over the persisted ANN artifact (VERDICT r15
  // missing item 1, the composition of e28's retract with the s15
  // append face on ONE artifact): every 7th vector is re-crawled as a
  // CHANGED version (its embedding reversed — routing cell and codes
  // both move for a non-palindromic vector), the update face retracts
  // the old list rows and appends the new versions re-encoded under
  // the FROZEN quantizer, and the gate emits the updated listed face
  // (e28's shape). The oracle keeps e28's full-corpus quantizer-sample
  // CTEs (a re-crawl must not silently re-train the estimator) and
  // encodes the UPDATED corpus: a from-scratch
  // rebuild-with-the-new-versions under the frozen quantizer, so green
  // certifies update ≡ rebuild including per-cell membership. The
  // ordering hazard (append-before-retract anti-joins BOTH versions
  // out — the vector vanishes instead of serving its new embedding) is
  // spec-pinned in PipelineSpec. ----
  private def e29(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = Similarity.buildIvfPqIndex(e, "vec_id", "embedding")
    val newVersions = e.filter(col("vec_id") % 7 === 3)
      .withColumn("embedding", reverse(col("embedding")))
    Similarity.ivfPqIndexUpdate(idx, newVersions, "vec_id", "embedding")
      .listed
      .select(col("cell"), col("nn_id").as("vec_id"),
        array_join(col("codes").cast("array<string>"), "-").as("codes_str"))
      .orderBy("vec_id")
  }

  private val e29Oracle = ivfPqListedOracle(
    """
      |upd AS (
      |  SELECT vec_id,
      |    CASE WHEN vec_id % 7 = 3 THEN list_reverse(v) ELSE v END AS v
      |  FROM e),""".stripMargin,
    sampSrc = "e", encSrc = "upd")

  // ---- e30: recall-after-heavy-retract — the index-QUALITY face of
  // the delete lifecycle, e26's twin on the retract side (VERDICT r15
  // missing item 3): e28 certifies the retracted artifact is exactly
  // the frozen-quantizer rebuild, but after a MASS takedown the frozen
  // estimator drifts from the surviving distribution and recall decays
  // with no row-level certification ever failing. This row measures
  // the thing an operator pages on: recall@5 of serve-after-retract
  // (two thirds of the archive retracted, queries survive) vs brute
  // force over the survivors — the instrument that says WHEN to pay
  // for migrateIvfPqIndex (e31, whose re-train is the refresh this
  // number triggers). Oracle = e18's serve/exact/recall chain with the
  // quantizer CTEs kept FULL-corpus (frozen) and cells/codes/exact
  // restricted to survivors. ----
  private def e30(s: SparkSession, dir: String): DataFrame = {
    // five consumers of the small vector table (build, takedown list,
    // survivor serve + brute force) — pinned once, the e26 shape
    val e = emb(s, dir).localCheckpoint(false)
    val idx = Similarity.buildIvfPqIndex(e, "vec_id", "embedding")
    val removed = e.filter(col("vec_id") >= 20 && col("vec_id") % 3 =!= 0)
      .select("vec_id")
    val surv = e.join(removed, Seq("vec_id"), "left_anti")
    val ret = Similarity.ivfPqIndexRetract(idx, removed)
    val approx = Similarity.ivfPqQuery(ret, surv, "vec_id", "embedding",
        _ < 20, k = 5)
      .select(col("q_id"), col("nn_id"))
    val exact = Similarity.bruteForceTopK(surv, "vec_id", "embedding",
        _ < 20, k = 5)
      .select(col("q_id"), col("nn_id"))
    val hits = exact.join(approx, Seq("q_id", "nn_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    exact.groupBy("q_id").agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("k"),
        (coalesce(col("hits"), lit(0L)) * 100 / col("k")).cast("long")
          .as("recall_pct"))
      .orderBy("q_id")
  }

  private val e30Oracle =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |surv AS (SELECT vec_id, v FROM e WHERE vec_id < 20 OR vec_id % 3 = 0),
      |q AS (SELECT * FROM surv WHERE vec_id < 20),
      |sc AS (
      |  SELECT q.vec_id AS q_id, t.vec_id AS nn_id,
      |    ROUND(list_dot_product(q.v, t.v) /
      |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(t.v, t.v))), 6) AS sim
      |  FROM q JOIN surv t ON q.vec_id <> t.vec_id),
      |er AS (
      |  SELECT q_id, nn_id,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM sc),
      |samp AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY sha, vec_id) - 1 AS c, vec_id AS cid, v
      |  FROM (SELECT vec_id, v, sha256(CAST(vec_id AS VARCHAR)) AS sha
      |        FROM e ORDER BY sha, vec_id LIMIT 16)),
      |assign AS (
      |  SELECT x.vec_id, x.v, s.cid,
      |    ROW_NUMBER() OVER (PARTITION BY x.vec_id ORDER BY
      |      ROUND(list_dot_product(x.v, s.v) /
      |        (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(s.v, s.v))), 9) DESC,
      |      s.cid DESC) AS rn
      |  FROM surv x CROSS JOIN samp s),
      |cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS q_id, v AS qv, cid AS cell FROM assign
      |  WHERE vec_id < 20 AND rn <= 4),
      |enc0 AS (
      |  SELECT x.vec_id, js.j, s.c,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (x.v[js.j*8 + i] - s.v[js.j*8 + i])
      |           * (x.v[js.j*8 + i] - s.v[js.j*8 + i]))) AS d
      |  FROM surv x CROSS JOIN generate_series(0, 7) AS js(j) CROSS JOIN samp s),
      |enc AS (
      |  SELECT vec_id, j, c FROM (
      |    SELECT vec_id, j, c,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |    FROM enc0) WHERE rn = 1),
      |recon AS (
      |  SELECT enc.vec_id,
      |    flatten(list(s.v[enc.j*8+1 : enc.j*8+8] ORDER BY enc.j)) AS rv
      |  FROM enc JOIN samp s ON s.c = enc.c
      |  GROUP BY enc.vec_id),
      |adc AS (
      |  SELECT p.q_id, cl.vec_id AS nn_id,
      |    ROUND(list_sum(list_transform(generate_series(0, 7),
      |      j -> list_sum(list_transform(generate_series(1, 8),
      |        i -> (p.qv[j*8+i] - r.rv[j*8+i])
      |             * (p.qv[j*8+i] - r.rv[j*8+i]))))), 6) AS adist
      |  FROM probes p
      |  JOIN cells cl ON p.cell = cl.cell AND p.q_id <> cl.vec_id
      |  JOIN recon r ON r.vec_id = cl.vec_id),
      |rk AS (
      |  SELECT q_id, nn_id,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, nn_id) AS rank
      |  FROM adc),
      |ex AS (SELECT q_id, nn_id FROM er WHERE rank <= 5),
      |ap AS (SELECT q_id, nn_id FROM rk WHERE rank <= 5),
      |h AS (
      |  SELECT ex.q_id, COUNT(*) AS hits
      |  FROM ex JOIN ap ON ex.q_id = ap.q_id AND ex.nn_id = ap.nn_id
      |  GROUP BY ex.q_id),
      |b AS (SELECT q_id, COUNT(*) AS k FROM ex GROUP BY q_id)
      |SELECT b.q_id, COALESCE(h.hits, 0)::BIGINT AS hits, b.k::BIGINT AS k,
      |  CAST(COALESCE(h.hits, 0) * 100 / b.k AS BIGINT) AS recall_pct
      |FROM b LEFT JOIN h ON h.q_id = b.q_id
      |ORDER BY b.q_id""".stripMargin

  // ---- e33: recall-after-heavy-retract for the GRAPH-ANN family —
  // e30's NndIndex twin (VERDICT r16 missing item 3): the frozen
  // NndQuantizer drifts exactly like the IVF-PQ quantizer under a
  // heavy takedown, with no row-level cert ever failing — this is the
  // number that tells an operator when migrateNndIndex (e27's routing
  // sibling) is due. Build the e22 index, take down two thirds of the
  // archive (e30's predicate, minus quantizer anchors — an anchor
  // takedown ROUTES to migrate, and the instrument measures serving
  // quality before that migrate runs), retract through
  // retractNndIndex, and measure recall@5 of graphServeTopK over the
  // survivors against brute force over the same survivors — e18's
  // hits / integer recall-percent arithmetic. Oracle = the e27
  // retract-chain CTEs (frozen full-corpus quantizer, seed origins
  // restricted to survivors) + e23's two-hop serve chain over that
  // adjacency + the exact top-5 over survivors. ----
  private def e33(s: SparkSession, dir: String): DataFrame = {
    // five consumers of the small vector table (build, takedown list,
    // survivor serve + brute force) — pinned once, the e30 shape
    val e = emb(s, dir).localCheckpoint(false)
    val idx = Similarity.buildNndIndex(e, "vec_id", "embedding")
    val anchorIds = idx.quant.reps.select(col("rep_id")).collect()
      .map(_.getLong(0)).toSet ++ idx.quant.centIds
    val removed = e.filter(col("vec_id") >= 20 &&
        col("vec_id") % 3 =!= 0 &&
        !col("vec_id").isInCollection(anchorIds.toSeq))
      .select("vec_id")
    val surv = e.join(removed, Seq("vec_id"), "left_anti")
    val ret = Similarity.retractNndIndex(idx, e, "vec_id", "embedding",
      removed)
    val approx = Similarity.graphServeTopK(surv, "vec_id", "embedding",
        ret, _ < 20, k = 5, beam = 8, hops = 2)
      .select(col("q_id"), col("nn_id"))
    val exact = Similarity.bruteForceTopK(surv, "vec_id", "embedding",
        _ < 20, k = 5)
      .select(col("q_id"), col("nn_id"))
    val hits = exact.join(approx, Seq("q_id", "nn_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    exact.groupBy("q_id").agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("k"),
        (coalesce(col("hits"), lit(0L)) * 100 / col("k")).cast("long")
          .as("recall_pct"))
      .orderBy("q_id")
  }

  private val e33Oracle = {
    def cos(a: String, b: String): String =
      s"""ROUND(list_dot_product($a, $b) /
         |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
    val retractCtes =
      """
        |rem AS (
        |  SELECT vec_id FROM e
        |  WHERE vec_id >= 20 AND vec_id % 3 <> 0
        |    AND vec_id NOT IN (SELECT rep_id FROM reps)
        |    AND vec_id NOT IN (SELECT cid FROM samp)),
        |surv2 AS (
        |  SELECT * FROM cells2
        |  WHERE vec_id NOT IN (SELECT vec_id FROM rem)),""".stripMargin
    s"""WITH ${nndAdjCtes(cos, retractCtes, seedOrigin = "surv2")},
      |sv AS (SELECT vec_id, v FROM e
      |  WHERE vec_id NOT IN (SELECT vec_id FROM rem)),
      |${nndRecallTail(cos)}""".stripMargin
  }

  /** The serve-vs-exact recall tail shared by the e33/e34 instruments:
    * the e23 two-hop beam walk (entries = `samp`, adjacency = `adj1`)
    * against brute-force top-5, both over the survivor relation `sv`,
    * reduced to e18's hits / integer recall-percent arithmetic. */
  private def nndRecallTail(cos: (String, String) => String): String =
    s"""adj AS (SELECT node, nbr FROM adj1 WHERE rank <= 6),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM sv WHERE vec_id < 20),
      |s0 AS (
      |  SELECT q.q_id, s.cid AS nn_id, ${cos("q.qv", "s.cv")} AS sim
      |  FROM q CROSS JOIN samp s),
      |f0 AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM s0) WHERE rn <= 8),
      |c1 AS (SELECT q_id, nn_id FROM f0
      |  UNION SELECT f0.q_id, a.nbr FROM f0 JOIN adj a ON a.node = f0.nn_id),
      |s1 AS (
      |  SELECT c1.q_id, c1.nn_id, ${cos("q.qv", "t.v")} AS sim
      |  FROM c1 JOIN q USING (q_id) JOIN sv t ON t.vec_id = c1.nn_id),
      |f1 AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM s1) WHERE rn <= 8),
      |c2 AS (SELECT q_id, nn_id FROM f1
      |  UNION SELECT f1.q_id, a.nbr FROM f1 JOIN adj a ON a.node = f1.nn_id),
      |s2 AS (
      |  SELECT c2.q_id, c2.nn_id, ${cos("q.qv", "t.v")} AS sim
      |  FROM c2 JOIN q USING (q_id) JOIN sv t ON t.vec_id = c2.nn_id),
      |ap AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM s2 WHERE q_id <> nn_id) WHERE rn <= 5),
      |exs AS (
      |  SELECT q.q_id, t.vec_id AS nn_id, ${cos("q.qv", "t.v")} AS sim
      |  FROM q JOIN sv t ON q.q_id <> t.vec_id),
      |ex AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM exs) WHERE rn <= 5),
      |h AS (
      |  SELECT ex.q_id, COUNT(*) AS hits
      |  FROM ex JOIN ap ON ex.q_id = ap.q_id AND ex.nn_id = ap.nn_id
      |  GROUP BY ex.q_id),
      |b AS (SELECT q_id, COUNT(*) AS k FROM ex GROUP BY q_id)
      |SELECT b.q_id, COALESCE(h.hits, 0)::BIGINT AS hits, b.k::BIGINT AS k,
      |  CAST(COALESCE(h.hits, 0) * 100 / b.k AS BIGINT) AS recall_pct
      |FROM b LEFT JOIN h ON h.q_id = b.q_id
      |ORDER BY b.q_id""".stripMargin

  // ---- e34: recall-AFTER-MIGRATE for the graph-ANN family — the
  // instrument that closes the drift loop e33 opens (VERDICT r17
  // missing item 3; the e30→e31 pattern applied to the NndIndex
  // family): after the SAME heavy takedown geometry (two thirds of the
  // archive — the unrestricted e30 predicate, because anchor hits are
  // precisely what routes a takedown to migrate), migrateNndIndex
  // re-trains the quantizer on the survivors and rebuilds both
  // adjacency faces, and recall@5 of graphServeTopK over the survivors
  // is re-measured against the same brute-force truth. e33 reads the
  // drifted frozen-quantizer serving of the SAME survivor task (52%
  // mean at sf0.01); this row reads the re-trained index's 58% — which
  // is the FRESH-BUILD CEILING by the spec-pinned migrate ≡ rebuild
  // equivalence, so the operator's before/after pair is drifted vs
  // best-achievable, not drifted vs an absolute band (absolute recall
  // here is geometry-bound: the full-corpus no-takedown serve reads
  // 29% at the same 16-cell/beam-8 parameters — `Scratch nndrecall` —
  // because more vectors per fixed cell count is a harder task, and
  // the instruments' value is the paired delta). Oracle = the full
  // build chain with
  // the quantizer TRAINED ON SURVIVORS (corpusSrc swap — a
  // from-scratch re-trained rebuild, the spec-pinned migrate
  // equivalence) + the shared serve/exact recall tail. ----
  private def e34(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).localCheckpoint(false)
    val idx = Similarity.buildNndIndex(e, "vec_id", "embedding")
    val removed = e.filter(col("vec_id") >= 20 && col("vec_id") % 3 =!= 0)
      .select("vec_id")
    val surv = e.join(removed, Seq("vec_id"), "left_anti")
    val mig = Similarity.migrateNndIndex(idx, e, "vec_id", "embedding",
      removed)
    val approx = Similarity.graphServeTopK(surv, "vec_id", "embedding",
        mig, _ < 20, k = 5, beam = 8, hops = 2)
      .select(col("q_id"), col("nn_id"))
    val exact = Similarity.bruteForceTopK(surv, "vec_id", "embedding",
        _ < 20, k = 5)
      .select(col("q_id"), col("nn_id"))
    val hits = exact.join(approx, Seq("q_id", "nn_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    exact.groupBy("q_id").agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("k"),
        (coalesce(col("hits"), lit(0L)) * 100 / col("k")).cast("long")
          .as("recall_pct"))
      .orderBy("q_id")
  }

  private val e34Oracle = {
    def cos(a: String, b: String): String =
      s"""ROUND(list_dot_product($a, $b) /
         |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
    val survPre =
      """
        |rem AS (
        |  SELECT vec_id FROM e WHERE vec_id >= 20 AND vec_id % 3 <> 0),
        |surv AS (
        |  SELECT vec_id, v FROM e
        |  WHERE vec_id NOT IN (SELECT vec_id FROM rem)),""".stripMargin
    s"""WITH ${nndAdjCtes(cos, preCtes = survPre, corpusSrc = "surv")},
      |sv AS (SELECT vec_id, v FROM surv),
      |${nndRecallTail(cos)}""".stripMargin
  }

  // ---- e35: graph-ANN recall at CORPUS-SCALED geometry — the
  // nlist-scales-with-corpus rule (the `Similarity.graphTopK` scaladoc:
  // cells stay executor-sized because nlist grows with n) applied to
  // the NND family as a driver-gated instrument row (VERDICT r18
  // missing item 3: e33/e34 run at FIXED 16 cells / beam 8, where the
  // fresh-build ceiling is 26% recall at sf0.1 — correct as a paired
  // calibration instrument, but no row showed the realistic operating
  // point). Here nlist = min(64, round(√n)) is computed FROM the
  // corpus in both engines (Spark: one count; DuckDB: a scalar-
  // subquery LIMIT), so the same query text demonstrates the scaling
  // rule at every SF: 22 cells at sf0.01's 500 vectors, 45 at sf0.1's
  // 2000 — more, smaller cells ⇒ finer seed neighbourhoods AND more
  // walk entry points (one per cell), which is exactly how the family
  // holds recall as the corpus grows under a constant per-query cost
  // of hops × beam × degree + nlist entry scores. Everything else
  // (degree 6, beam 8, hops 2, k 5, the q_id < 20 query set, the
  // brute-force truth) is the e33/e34 geometry, so this row reads
  // directly against their fixed-16 calibration pair. The 64 cap is
  // the literal-centroid oracle-replayability bound, not an engine
  // limit (the fused-kernel path takes over past it — ivfTopK's
  // nlist > 64 branch). ----
  private def e35(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).localCheckpoint(false)
    // the scaling rule itself: nlist ≈ √n, capped at the literal-
    // centroid bound (the count is one job over an already-pinned
    // table; at production scale this is a table-stats lookup)
    val nlist = math.min(64L,
      math.round(math.sqrt(e.count().toDouble))).toInt
    val idx = Similarity.buildNndIndex(e, "vec_id", "embedding",
      degree = 6, nlist = nlist)
    val approx = Similarity.graphServeTopK(e, "vec_id", "embedding",
        idx, _ < 20, k = 5, beam = 8, hops = 2)
      .select(col("q_id"), col("nn_id"))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        _ < 20, k = 5)
      .select(col("q_id"), col("nn_id"))
    val hits = exact.join(approx, Seq("q_id", "nn_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    exact.groupBy("q_id").agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("k"),
        (coalesce(col("hits"), lit(0L)) * 100 / col("k")).cast("long")
          .as("recall_pct"))
      .orderBy("q_id")
  }

  private val e35Oracle = {
    def cos(a: String, b: String): String =
      s"""ROUND(list_dot_product($a, $b) /
         |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
    s"""WITH ${nndAdjCtes(cos, nlistSql =
        "(SELECT CAST(LEAST(64, round(sqrt(COUNT(*)), 0)) AS BIGINT) FROM e)")},
      |sv AS (SELECT vec_id, v FROM e),
      |${nndRecallTail(cos)}""".stripMargin
  }

  // ---- e31: IVF-PQ index MIGRATION (Similarity.migrateIvfPqIndex) —
  // the re-train/refresh face behind e30's drift instrument (VERDICT
  // r15 missing item 3; the IVF-PQ twin of the NndIndex family's
  // migrateNndIndex): after e30's heavy takedown (two thirds of the
  // archive), re-train centroids AND codebook on the survivors and
  // re-encode them — the one operation in this family that
  // deliberately breaks the frozen-quantizer discipline, because the
  // estimator itself drifted. Emits the migrated listed face (e28's
  // shape); the oracle is the shared listed-face chain with BOTH the
  // quantizer sample and the encoded rows over the survivors — a
  // from-scratch re-trained rebuild, so green certifies migrate ≡
  // buildIvfPqIndex(survivors) end to end in SQL; the fresh-build
  // equivalence on all faces plus serve-after-migrate exclusion are
  // spec-pinned in PipelineSpec. ----
  private def e31(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val idx = Similarity.buildIvfPqIndex(e, "vec_id", "embedding")
    val removed = e.filter(col("vec_id") >= 20 && col("vec_id") % 3 =!= 0)
      .select("vec_id")
    Similarity.migrateIvfPqIndex(idx, e, "vec_id", "embedding", removed)
      .listed
      .select(col("cell"), col("nn_id").as("vec_id"),
        array_join(col("codes").cast("array<string>"), "-").as("codes_str"))
      .orderBy("vec_id")
  }

  private val e31Oracle = ivfPqListedOracle(
    """
      |surv AS (SELECT vec_id, v FROM e WHERE vec_id < 20 OR vec_id % 3 = 0),""".stripMargin,
    sampSrc = "surv", encSrc = "surv")

  // ---- e23: graph-ANN SERVING over the production-built index
  // (Similarity.graphServeTopK ∘ nnDescentAdj) — the composition the
  // round-10 verdict flagged as missing #1: e22 certifies the linear
  // build and e21 the corpus-independent walk, but only separately.
  // This row builds the one-round NN-descent adjacency, then answers
  // the e21 query set (q_id < 20, k=5, beam=8, hops=2) by walking THAT
  // graph from the 16 sha-sampled entry points. The oracle replays the
  // whole lifecycle end-to-end: the e22 build CTEs verbatim, then both
  // unrolled hops as UNION-distinct candidate sets over adj1. ----
  private def e23(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val adj = Similarity.nnDescentAdj(e, "vec_id", "embedding",
      degree = 6, rounds = 1)
    val entries = e
      .orderBy(sha2(col("vec_id").cast("string"), 256), col("vec_id"))
      .limit(16).select(col("vec_id"))
    Similarity.graphServeTopK(e, "vec_id", "embedding", adj, entries,
        _ < 20, k = 5, beam = 8, hops = 2)
      .orderBy("q_id", "rank")
  }

  private val e23Oracle = {
    def cos(a: String, b: String): String =
      s"""ROUND(list_dot_product($a, $b) /
         |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
    s"""WITH ${nndAdjCtes(cos)},
      |adj AS (SELECT node, nbr FROM adj1 WHERE rank <= 6),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
      |s0 AS (
      |  SELECT q.q_id, s.cid AS nn_id, ${cos("q.qv", "s.cv")} AS sim
      |  FROM q CROSS JOIN samp s),
      |f0 AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM s0) WHERE rn <= 8),
      |c1 AS (SELECT q_id, nn_id FROM f0
      |  UNION SELECT f0.q_id, a.nbr FROM f0 JOIN adj a ON a.node = f0.nn_id),
      |s1 AS (
      |  SELECT c1.q_id, c1.nn_id, ${cos("q.qv", "t.v")} AS sim
      |  FROM c1 JOIN q USING (q_id) JOIN e t ON t.vec_id = c1.nn_id),
      |f1 AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM s1) WHERE rn <= 8),
      |c2 AS (SELECT q_id, nn_id FROM f1
      |  UNION SELECT f1.q_id, a.nbr FROM f1 JOIN adj a ON a.node = f1.nn_id),
      |s2 AS (
      |  SELECT c2.q_id, c2.nn_id, ${cos("q.qv", "t.v")} AS sim
      |  FROM c2 JOIN q USING (q_id) JOIN e t ON t.vec_id = c2.nn_id),
      |rk AS (
      |  SELECT q_id, nn_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rank
      |  FROM s2 WHERE q_id <> nn_id)
      |SELECT q_id, CAST(rank AS INT) AS rank, nn_id, sim
      |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  // ---- e26: recall-after-append — the index-QUALITY face of the
  // append lifecycle. e23/s16 certify that serve-over-appended-index
  // is row-identical to the rebuild; this row certifies the thing a
  // deployment actually cares about: recall@5 vs exact ground truth,
  // measured AFTER the archive has absorbed two append batches. The
  // quantizer trains ONCE on the full table and freezes (the s16
  // train/freeze contract), the archive builds over a third of the
  // corpus, two appendNndIndex batches absorb the rest, and the
  // appended ARTIFACT answers the e23 query set; both retrieval sides
  // (graph serve + brute force) run in-engine, the join computes
  // e18's hits / integer recall-percent arithmetic. The oracle leans
  // on the spec-certified append induction — the appended refined
  // face equals the from-scratch frozen-quantizer build — so it
  // replays e22's build CTEs, e23's two-hop serve chain over that
  // adjacency, the exact top-5, and the same recall arithmetic. ----
  private def e26(s: SparkSession, dir: String): DataFrame = {
    // pinned once: the quantizer training, the archive build, both
    // appends, the serve walk, and the brute-force side all scan the
    // vector table — eight consumers of one small corpus
    val e = emb(s, dir).localCheckpoint(false)
    val quant = Similarity.nndQuantizer(e, "vec_id", "embedding")
    val archive = Similarity.buildNndIndexWith(
      e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", quant)
    val after1 = Similarity.appendNndIndex(archive,
      e.filter(col("vec_id") % 3 <= 1), "vec_id", "embedding",
      _ % 3 === 1)
    val after2 = Similarity.appendNndIndex(after1, e, "vec_id",
      "embedding", _ % 3 === 2)
    val approx = Similarity.graphServeTopK(e, "vec_id", "embedding",
        after2, _ < 20, k = 5, beam = 8, hops = 2)
      .select(col("q_id"), col("nn_id"))
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
        _ < 20, k = 5)
      .select(col("q_id"), col("nn_id"))
    val hits = exact.join(approx, Seq("q_id", "nn_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    exact.groupBy("q_id").agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("k"),
        (coalesce(col("hits"), lit(0L)) * 100 / col("k")).cast("long")
          .as("recall_pct"))
      .orderBy("q_id")
  }

  private val e26Oracle = {
    def cos(a: String, b: String): String =
      s"""ROUND(list_dot_product($a, $b) /
         |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
    s"""WITH ${nndAdjCtes(cos)},
      |adj AS (SELECT node, nbr FROM adj1 WHERE rank <= 6),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
      |s0 AS (
      |  SELECT q.q_id, s.cid AS nn_id, ${cos("q.qv", "s.cv")} AS sim
      |  FROM q CROSS JOIN samp s),
      |f0 AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM s0) WHERE rn <= 8),
      |c1 AS (SELECT q_id, nn_id FROM f0
      |  UNION SELECT f0.q_id, a.nbr FROM f0 JOIN adj a ON a.node = f0.nn_id),
      |s1 AS (
      |  SELECT c1.q_id, c1.nn_id, ${cos("q.qv", "t.v")} AS sim
      |  FROM c1 JOIN q USING (q_id) JOIN e t ON t.vec_id = c1.nn_id),
      |f1 AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM s1) WHERE rn <= 8),
      |c2 AS (SELECT q_id, nn_id FROM f1
      |  UNION SELECT f1.q_id, a.nbr FROM f1 JOIN adj a ON a.node = f1.nn_id),
      |s2 AS (
      |  SELECT c2.q_id, c2.nn_id, ${cos("q.qv", "t.v")} AS sim
      |  FROM c2 JOIN q USING (q_id) JOIN e t ON t.vec_id = c2.nn_id),
      |ap AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM s2 WHERE q_id <> nn_id) WHERE rn <= 5),
      |exs AS (
      |  SELECT q.q_id, t.vec_id AS nn_id, ${cos("q.qv", "t.v")} AS sim
      |  FROM q JOIN e t ON q.q_id <> t.vec_id),
      |ex AS (SELECT q_id, nn_id FROM (
      |    SELECT q_id, nn_id,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, nn_id) AS rn
      |    FROM exs) WHERE rn <= 5),
      |h AS (
      |  SELECT ex.q_id, COUNT(*) AS hits
      |  FROM ex JOIN ap ON ex.q_id = ap.q_id AND ex.nn_id = ap.nn_id
      |  GROUP BY ex.q_id),
      |b AS (SELECT q_id, COUNT(*) AS k FROM ex GROUP BY q_id)
      |SELECT b.q_id, COALESCE(h.hits, 0)::BIGINT AS hits, b.k::BIGINT AS k,
      |  CAST(COALESCE(h.hits, 0) * 100 / b.k AS BIGINT) AS recall_pct
      |FROM b LEFT JOIN h ON h.q_id = b.q_id
      |ORDER BY b.q_id""".stripMargin
  }

  def all: Seq[QueryDef] = Seq(
    QueryDef("e26_append_recall", e26, Some(e26Oracle)),
    QueryDef("e23_graph_serve", e23, Some(e23Oracle)),
    QueryDef("e22_nn_descent", e22, Some(e22Oracle)),
    QueryDef("e27_nnd_retract", e27, Some(e27Oracle)),
    QueryDef("e32_nnd_update", e32, Some(e32Oracle)),
    QueryDef("e28_ivfpq_retract", e28, Some(e28Oracle)),
    QueryDef("e29_ivfpq_update", e29, Some(e29Oracle)),
    QueryDef("e30_retract_recall", e30, Some(e30Oracle)),
    QueryDef("e31_ivfpq_migrate", e31, Some(e31Oracle)),
    QueryDef("e33_nnd_retract_recall", e33, Some(e33Oracle)),
    QueryDef("e34_nnd_migrate_recall", e34, Some(e34Oracle)),
    QueryDef("e35_nnd_scaled_recall", e35, Some(e35Oracle)),
    QueryDef("d62_video_delta_compact", d62, Some(mm11Oracle)),
    QueryDef("e21_graph_ann", e21, Some(e21Oracle)),
    QueryDef("e20_rrf_fusion", e20, Some(e20Oracle)),
    QueryDef("d48_minhash_accuracy", d48, Some(d48Oracle)),
    QueryDef("e19_centroid_outliers", e19, Some(e19Oracle)),
    QueryDef("e18_ann_recall", e18, Some(e18Oracle)),
    QueryDef("d43_cluster_sample", d43, Some(d43Oracle)),
    QueryDef("d1_exact_dedup", d1, Some(d1Oracle)),
    QueryDef("d2_token_stats", d2, Some(d2Oracle)),
    QueryDef("d3_lang_id", d3, Some(d3Oracle)),
    QueryDef("d4_quality_score", d4, Some(d4Oracle)),
    QueryDef("d5_fingerprint", d5, Some(d5Oracle)),
    QueryDef("d6_jaccard_pairs", d6, Some(d6Oracle)),
    QueryDef("d41_containment_pairs", d41, Some(d41Oracle)),
    QueryDef("d7_minhash_pairs", d7, None),
    QueryDef("d8_simhash_pairs", d8, None),
    QueryDef("d9_bpe_tokens", d9, Some(d9Oracle)),
    QueryDef("d10_hash_split", d10, Some(d10Oracle)),
    QueryDef("d11_neardup_groups", d11, Some(d11Oracle)),
    QueryDef("d50_altstar_components", d50, Some(d50Oracle)),
    QueryDef("d52_components_append", d52, Some(d52Oracle)),
    QueryDef("d55_components_retract", d55, Some(d55Oracle)),
    QueryDef("d60_groups_update", d60, Some(d60Oracle)),
    QueryDef("d12_stratified_sample", d12, Some(d12Oracle)),
    QueryDef("d13_simhash_sha", d13, Some(d13Oracle)),
    QueryDef("d14_minhash_sha", d14, Some(d14Oracle)),
    QueryDef("d15_neardup_pipeline", d15, Some(d15Oracle)),
    QueryDef("e1_cosine_topk", e1, Some(e1Oracle)),
    QueryDef("e2_knn_classify", e2, Some(e2Oracle)),
    QueryDef("e3_lsh_ann", e3, Some(e3Oracle)),
    QueryDef("e5_ivf_ann", e5, Some(e5Oracle)),
    QueryDef("e7_ivf2_ann", e7, Some(e7Oracle)),
    QueryDef("e8_pq_adc_ann", e8, Some(e8Oracle)),
    QueryDef("e9_ivfpq_ann", e9, Some(e9Oracle)),
    QueryDef("e11_pq_rerank", e11, Some(e11Oracle)),
    QueryDef("e24_sq8_rerank", e24, Some(e24Oracle)),
    QueryDef("e25_filtered_ann", e25, Some(e25Oracle)),
    QueryDef("e12_ivfpq_residual", e12, Some(e12Oracle)),
    QueryDef("e13_kmeans_refined_ann", e13, Some(e13Oracle)),
    QueryDef("e14_hamming_rerank", e14, Some(e14Oracle)),
    QueryDef("e15_matryoshka_rerank", e15, Some(e15Oracle)),
    QueryDef("e16_hybrid_retrieval", e16, Some(e16Oracle)),
    QueryDef("e17_triplet_mine", e17, Some(e17Oracle)),
    QueryDef("e6_quantized_topk", e6, Some(e6Oracle)),
    QueryDef("e4_cosine_neardup", e4, Some(e4Oracle)),
    QueryDef("e10_semantic_dedup", e10, Some(e10Oracle)),
    QueryDef("mm1_multimodal_meta", mm1, Some(mm1Oracle)),
    QueryDef("mm2_frame_sample", mm2, Some(mm2Oracle)),
    QueryDef("mm3_visual_topk", mm3, Some(mm3Oracle)),
    QueryDef("mm4_audio_segments", mm4, Some(mm4Oracle)),
    QueryDef("mm5_scene_cuts", mm5, Some(mm5Oracle)),
    QueryDef("mm6_phash", mm6, Some(mm6Oracle)),
    QueryDef("mm7_phash_pairs", mm7, Some(mm7Oracle)),
    QueryDef("mm8_video_dup_pairs", mm8, Some(mm8Oracle)),
    QueryDef("mm9_audio_dup_pairs", mm9, Some(mm9Oracle)),
    QueryDef("mm10_video_probe_pairs", mm10, Some(mm10Oracle)),
    QueryDef("mm11_video_retract", mm11, Some(mm11Oracle)),
    QueryDef("mm12_phash_retract", mm12, Some(mm12Oracle)),
    QueryDef("mm13_audio_retract", mm13, Some(mm13Oracle)),
    QueryDef("mm14_phash_update", mm14, Some(mm14Oracle)),
    QueryDef("mm15_video_update", mm15, Some(mm15Oracle)),
    QueryDef("d34_leakage_safe_split", d34, Some(d34Oracle)),
    QueryDef("d35_cms_estimates", d35, Some(d35Oracle)),
    QueryDef("d36_weighted_sample", d36, Some(d36Oracle)),
    QueryDef("d30_heavy_hitters", d30, Some(d30Oracle)))
}
