package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.pipeline.Dedup

/** Streaming incremental dedup must equal the batch computation on the
  * same increments, with the corpus index built once and reused across
  * micro-batches (the archive is never re-tokenized per batch). */
class CurationStreamSpec extends SparkSpec {

  test("streamed increments vs persisted index == batch incrementalPairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "one two three four five six seven"),
      (2L, "red orange yellow green blue indigo violet"),
      (3L, "alpha beta gamma delta epsilon zeta eta")).toDF(
      "doc_id", "text")

    // index persisted once per corpus snapshot, read back as any
    // production run would
    val idxDir = tmpDir("graft_shidx")
    Dedup.hashedShingleIndex(corpus, "text", "doc_id").write
      .mode("overwrite").parquet(idxDir)
    val corpusIdx = spark.read.parquet(idxDir)

    val increments = Seq(
      (100L, "one two three four five six seven"),     // dup of 1
      (101L, "totally novel content nothing matches"), // clean
      (102L, "red orange yellow green blue indigo violet"), // dup of 2
      (103L, "alpha beta gamma delta epsilon zeta eta")) // dup of 3

    val out = tmpDir("graft_cstr")
    val input = MemoryStream[(Long, String)]
    val docsStream = input.toDF().toDF("doc_id", "text")
    val q = CurationStream.incrementalDedupSink(docsStream, corpusIdx,
      "text", "doc_id", out, s"$out/_cp").start()
    try {
      // two micro-batches: pairing must be correct within each batch
      // independently (no cross-batch state is needed for this op)
      input.addData(increments.take(2): _*)
      q.processAllAvailable()
      input.addData(increments.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$out/pairs")
      .select("new_id", "corpus_id", "inter", "jaccard")
    val batch = Dedup.incrementalPairs(corpus,
      increments.toDF("doc_id", "text"), "text", "doc_id")
    assert(streamed.count() === 3) // 100→1, 102→2, 103→3
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }
}
