package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting: one 63-bit fingerprint per
  * document whose Hamming distance approximates the angular distance
  * between token multisets. Everything is a pure Catalyst expression over
  * the token array — zero shuffles to fingerprint a corpus.
  *
  * Scale path for pairing: split the fingerprint into 4 chunks of 16 bits —
  * any pair within Hamming distance 3 agrees on ≥1 chunk (pigeonhole), so
  * candidate generation is 4 equi-joins on small keys, never a cross
  * product.
  */
object SimHash {

  /** Token-hash array — compute this ONCE per row (materialize as a column)
    * before fanning out to the 63 per-bit sums. */
  def tokenHashes(textCol: Column): Column =
    transform(TextAnalysis.words(textCol), t => xxhash64(t))

  /** Cross-engine-replayable token hash: first 15 hex chars (60 bits) of
    * sha256, parsed as an integer — DuckDB computes the identical value via
    * ('0x' || substr(sha256(t), 1, 15))::BIGINT, so a fingerprint built on
    * it is fully oracle-checkable (d13). ~20× the per-token cost of
    * xxhash64; the xxhash64 default stays the 100 TB path (d8). */
  def shaTokenHash(t: Column): Column =
    conv(substring(sha2(t, 256), 1, 15), 16, 10).cast("long")

  /** Fingerprint from a precomputed token-hash array column. */
  def simhashFromHashes(hs: Column): Column = {
    val bitCols = (0 until 63).map { b =>
      val bitSum = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftrightunsigned(h, b).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Bits 0..62 of a 64-bit hash, folded into a non-negative long (63 bits
    * keeps the fingerprint inside LongType without sign issues). Bit b is 1
    * iff sum over tokens of ±1 (per bit b of xxhash64(token)) is > 0.
    * Note: tokenizes once per bit when used as a single Column — prefer the
    * two-step tokenHashes/simhashFromHashes on large data (see pairs). */
  def simhash(textCol: Column): Column =
    simhashFromHashes(tokenHashes(textCol))

  /** Chunk c (0..3) of a fingerprint, `width` bits each — the LSH band
    * key. Four chunks always cover all fingerprint bits (pigeonhole). */
  def chunk(fp: Column, c: Int, width: Int = 16): Column =
    shiftrightunsigned(fp, c * width).bitwiseAND(lit((1L << width) - 1))

  /** Hamming distance between two fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup candidate pairs within `maxHamming`, via the 4×16-bit chunk
    * join (exact for maxHamming <= 3 by pigeonhole). */
  /** Fingerprints via explode + codegen'd hash aggregate (the array-lambda
    * form evaluates interpreted per element; this form partial-aggregates
    * map-side and shuffles one row per doc). Docs with zero tokens get
    * fingerprint 0, matching the Column form's empty-fold. */
  def fingerprints(df: DataFrame, textCol: String, idCol: String,
      hashFn: Column => Column = xxhash64(_), numBits: Int = 63): DataFrame = {
    val tok = df
      .select(col(idCol).as("id"), explode(TextAnalysis.words(col(textCol))).as("t"))
      .select(col("id"), hashFn(col("t")).as("h"))
    val sumCols = (0 until numBits).map { b =>
      sum(when(shiftrightunsigned(col("h"), b).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as(s"s$b")
    }
    val folded = tok.groupBy(col("id"))
      .agg(sumCols.head, sumCols.tail: _*)
      .select(col("id"),
        (0 until numBits).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
    df.select(col(idCol).as("id")).distinct()
      .join(folded, Seq("id"), "left")
      .select(col("id"), coalesce(col("fp"), lit(0L)).as("fp"))
  }

  /** The shared banded-pigeonhole candidate machinery: `chunked` holds
    * one row per (id, chunk index, chunk value) with any payload
    * columns alongside; buckets are df-capped to [2, maxBucket] and
    * surviving buckets self-joined with id_a < id_b — every payload
    * column rides along twice, suffixed _a/_b, for the caller's exact
    * verify (single-word Hamming here, two-word Hamming in
    * [[Multimodal.phashPairs]]). One copy of the cap/join semantics for
    * every chunk-LSH family member. */
  private[pipeline] def bucketSelfJoin(chunked: DataFrame,
      maxBucket: Int): DataFrame = {
    val payload = chunked.columns.filterNot(Set("chunk", "chunk_val", "id"))
    val ok = chunked.groupBy("chunk", "chunk_val")
      .agg(count(lit(1)).as("nb"))
      .filter(col("nb").between(2, maxBucket))
      .select("chunk", "chunk_val")
    val inB = chunked.join(ok, Seq("chunk", "chunk_val"))
    def side(s: String) = inB.select(
      Seq(col("chunk"), col("chunk_val"), col("id").as(s"id_$s")) ++
        payload.map(p => col(p).as(s"${p}_$s")): _*)
    side("a").join(side("b"), Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .drop("chunk", "chunk_val")
  }

  /** [[bucketSelfJoin]]'s two-sided face for INCREMENTAL pairing: probe
    * rows (a side) match PRE-INDEXED archive rows (b side) through the
    * chunk buckets. The archive side must already carry its df-cap —
    * applied ONCE at snapshot build by the index builder (e.g.
    * [[Multimodal.phashChunkIndex]]), the d21 persisted-index contract —
    * so this join aggregates NOTHING over the archive: per-batch probe
    * cost is |probe chunks| × bounded archive fan-out regardless of
    * archive size. (No min-2 bound: a probe row pairs against a single
    * archive occupant.) */
  private[pipeline] def bucketProbeJoin(probeChunked: DataFrame,
      archiveIndexed: DataFrame): DataFrame = {
    val payloadA = probeChunked.columns
      .filterNot(Set("chunk", "chunk_val", "id"))
    val payloadB = archiveIndexed.columns
      .filterNot(Set("chunk", "chunk_val", "id"))
    val a = probeChunked.select(
      Seq(col("chunk"), col("chunk_val"), col("id").as("id_a")) ++
        payloadA.map(p => col(p).as(s"${p}_a")): _*)
    val b = archiveIndexed.select(
      Seq(col("chunk"), col("chunk_val"), col("id").as("id_b")) ++
        payloadB.map(p => col(p).as(s"${p}_b")): _*)
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") =!= col("id_b"))
      .drop("chunk", "chunk_val")
  }

  def pairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 200,
      hashFn: Column => Column = xxhash64(_), numBits: Int = 63): DataFrame = {
    val width = (numBits + 3) / 4
    val fps = fingerprints(df, textCol, idCol, hashFn, numBits)
    val chunked = fps.select(col("id"), col("fp"),
      posexplode(array((0 until 4).map(c => chunk(col("fp"), c, width)): _*)))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "chunk_val"))
    bucketSelfJoin(chunked, maxBucket)
      .select(col("id_a"), col("id_b"),
        hamming(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
  }
}
