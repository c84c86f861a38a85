package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection — the 100 TB-scale dedup
  * path (SURVEY §2b). Pure DataFrame ops:
  *
  *   1. signature: for each of `numHashes` seeds, min over the document's
  *      shingles of xxhash64(seed, shingle). Constant size per document
  *      (numHashes × 8 bytes) regardless of document length, so the shuffle
  *      volume is bounded.
  *   2. banding: the signature splits into `bands` rows of `rowsPerBand`
  *      values; two documents land in the same bucket when one band matches
  *      exactly. P(candidate) = 1-(1-J^r)^b — with 16 bands × 8 rows the
  *      curve knees near J≈0.7.
  *   3. candidates: groupBy (band, bandHash) — only intra-bucket pairs are
  *      generated, never the full cross product.
  *   4. estimate: signature agreement fraction; final exact verification can
  *      reuse Dedup.jaccardPairs on the candidate set.
  */
object MinHashLSH {

  /** Prime just above 2^32 for the permutation family. */
  private val P = 4294967311L

  /** Prime exposed for oracle construction (d14 embeds the same modulus). */
  val Modulus: Long = P

  /** Deterministic permutation constants: a_i odd < 2^30, b_i < 2^30, so
    * a_i · h (h < 2^32) stays under 2^62 — no int64 overflow under ANSI.
    * Public so the d14 oracle can embed the identical (a_i, b_i) pairs as
    * SQL literals (same fixed seed ⇒ same family everywhere). */
  def perms(n: Int): IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    IndexedSeq.fill(n)(((rnd.nextInt(1 << 29).toLong << 1) | 1L,
      rnd.nextInt(1 << 30).toLong))
  }

  /** (id, sig ARRAY<BIGINT>) MinHash signatures from word k-shingles.
    * Default 64 hashes as 16 bands × 4 rows: P(candidate) knees near
    * J≈(1/16)^(1/4)=0.5, and a J=0.85 pair is missed with p<1e-5.
    *
    * Each shingle is string-hashed ONCE (xxhash64 → low 32 bits); the
    * numHashes permutations are then cheap integer maps h → (a·h + b) mod P
    * over the 32-bit value (products stay < 2^63, no overflow). This is
    * ~2 orders of magnitude cheaper than re-hashing every shingle string
    * per seed and is the standard construction (universal hash family).
    */
  def signatures(df: DataFrame, textCol: String, idCol: String,
      k: Int = 5, numHashes: Int = 128,
      shingleRows: (DataFrame, String, String, Int) => DataFrame =
        TextAnalysis.hashedShingleRows): DataFrame = {
    // Shingles are hashed straight off the word columns (no shingle string,
    // no array_distinct — min() over a multiset equals min() over its set,
    // and TextAnalysis.hashedShingleRows keeps tokenize→generate→hash in
    // one codegen span). min()-aggregates over the exploded rows partial-
    // aggregate map-side, so the shuffle carries one row per doc.
    // `shingleRows` swaps in TextAnalysis.shaShingleRows for the
    // oracle-replayable d14 variant (already < 2^32 — the mask is a no-op).
    val hashed = shingleRows(df, textCol, idCol, k)
      .select(col("id"), col("shingle").bitwiseAND(lit(0xffffffffL)).as("h"))
      // One null-hash sentinel row per doc: min() ignores nulls, so docs
      // with shingles are unaffected while docs with < k tokens (which
      // produce no shingle rows at all) still surface — with an all-null
      // signature. A union feeding the same hash aggregate is two whole
      // stages cheaper than the distinct + left-join restore it replaces.
      .unionAll(df.select(col(idCol).as("id"), lit(null).cast("long").as("h")))
    val minCols = perms(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(P))).as(s"m$i")
    }
    hashed.groupBy(col("id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** (id, band, band_hash): one row per band, hash of that signature slice.
    * Band hashes are direct multi-argument xxhash64 over element_at
    * extracts — array slice + cast-to-string + lambda was measured ~100×
    * slower (interpreted + string building). */
  def banded(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
    }
    sigs.select(col("id"), posexplode(array(bandCols: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
  }

  /** Candidate near-dup pairs with estimated Jaccard (signature agreement).
    * maxBucket caps pathological buckets (all-identical spam) the same way
    * maxDf caps Dedup.jaccardPairs. */
  def candidatePairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 5, numHashes: Int = 64, bands: Int = 16,
      estThreshold: Double = 0.5, maxBucket: Int = 200,
      shingleRows: (DataFrame, String, String, Int) => DataFrame =
        TextAnalysis.hashedShingleRows): DataFrame = {
    val rowsPerBand = numHashes / bands
    // No .cache(): signatures() ends in a hash aggregate whose Exchange
    // subtree is identical in all three consumers below (banding + the two
    // signature re-joins), so ReuseExchange runs the expensive stage —
    // scan → shingle → hash → partial min-agg — once and the consumers
    // replay only the final aggregation from its shuffle files. Unlike the
    // r2 .cache(), nothing stays pinned in the block manager after the
    // caller's action completes.
    val sigs = signatures(df, textCol, idCol, k, numHashes, shingleRows)
    val bd = banded(sigs, bands, rowsPerBand)
    val smallBuckets = bd.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") >= 2 && col("bucket_n") <= maxBucket)
      .select("band", "band_hash")
    val inBucket = bd.join(smallBuckets, Seq("band", "band_hash"))
    val pairs = inBucket.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .join(inBucket.select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard", round(
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes.toDouble), 6))
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("est_jaccard"))
  }
}
