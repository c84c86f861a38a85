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

  test("streamed takedowns maintain the hash-index artifact: every " +
      "prefix equals the one-shot retract; index = capped sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.pipeline.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.load(spark, sf(), "documents")
    val media = Multimodal.withPayload(d, "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    val arch = media.filter(col("doc_id") % 10 =!= 0)
    val sketch0 = Multimodal.phashChunkSketch(Multimodal.dHash(arch))
      .localCheckpoint(true)
    val art = tmpDir("graft_hret")
    sketch0.write.mode("overwrite").parquet(s"$art/init/sketch")
    val takedowns = d
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1)
      .select("doc_id").as[Long].collect().sorted
    assert(takedowns.length >= 2, "fixture must yield a takedown per batch")
    val (b0, b1) = takedowns.splitAt(takedowns.length / 2)
    val input = MemoryStream[Long]
    val q = CurationStream.hashRetractSink(input.toDF().toDF("doc_id"),
      art, "init", s"$art/_cp").start()
    try {
      input.addData(b0.toSeq: _*); q.processAllAvailable()
      input.addData(b1.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // after batch 0 the maintained sketch is the one-shot retract of b0
    assert(rows(spark.read.parquet(s"$art/0/sketch")) ===
      rows(Multimodal.phashSketchRetract(sketch0, b0.toSeq.toDF("doc_id"))))
    // after batch 1 it composes to the one-shot retract of the union,
    // and the serving index is exactly the shared capped view of it —
    // what mm12's batch face would produce in one call
    assert(rows(spark.read.parquet(s"$art/1/sketch")) ===
      rows(Multimodal.phashSketchRetract(sketch0,
        takedowns.toSeq.toDF("doc_id"))))
    assert(rows(spark.read.parquet(s"$art/1/index")) ===
      rows(Multimodal.phashIndexRetract(sketch0,
        takedowns.toSeq.toDF("doc_id"))))
  }

  test("streamed shingle takedowns compose to the one-shot retract " +
      "through the shared chain sink") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.load(spark, sf(), "documents")
    val arch = d.filter(col("doc_id") % 10 =!= 0)
    val sketch0 = Dedup.hashedShingleSketch(arch, "text", "doc_id", k = 5)
      .localCheckpoint(true)
    val art = tmpDir("graft_sret")
    sketch0.write.mode("overwrite").parquet(s"$art/init/sketch")
    val takedowns = d
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1)
      .select("doc_id").as[Long].collect().sorted
    assert(takedowns.length >= 2, "fixture must yield a takedown per batch")
    val (b0, b1) = takedowns.splitAt(takedowns.length / 2)
    val input = MemoryStream[Long]
    val q = CurationStream.shingleRetractSink(input.toDF().toDF("doc_id"),
      art, "init", s"$art/_cp").start()
    try {
      input.addData(b0.toSeq: _*); q.processAllAvailable()
      input.addData(b1.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // prefix 0 == one-shot sketch retract of b0; final sketch == the
    // union's; final serving index == the batch face's one-shot output
    assert(rows(spark.read.parquet(s"$art/0/sketch")) ===
      rows(Dedup.shingleSketchRetract(sketch0, b0.toSeq.toDF("doc_id"))))
    assert(rows(spark.read.parquet(s"$art/1/sketch")) ===
      rows(Dedup.shingleSketchRetract(sketch0,
        takedowns.toSeq.toDF("doc_id"))))
    assert(rows(spark.read.parquet(s"$art/1/index")) ===
      rows(Dedup.shingleIndexRetract(sketch0,
        takedowns.toSeq.toDF("doc_id"))))
  }

  test("streamed winnow takedowns compose to the one-shot retract " +
      "through the shared chain sink") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.pipeline.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.load(spark, sf(), "documents")
    val arch = d.filter(col("doc_id") % 10 =!= 0)
    val sketch0 = TextAnalysis.winnowSketch(arch, "text", "doc_id",
      k = 5, w = 4).localCheckpoint(true)
    val art = tmpDir("graft_wret")
    sketch0.write.mode("overwrite").parquet(s"$art/init/sketch")
    val takedowns = d
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1)
      .select("doc_id").as[Long].collect().sorted
    assert(takedowns.length >= 2, "fixture must yield a takedown per batch")
    val (b0, b1) = takedowns.splitAt(takedowns.length / 2)
    val input = MemoryStream[Long]
    val q = CurationStream.winnowRetractSink(input.toDF().toDF("doc_id"),
      art, "init", s"$art/_cp").start()
    try {
      input.addData(b0.toSeq: _*); q.processAllAvailable()
      input.addData(b1.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(spark.read.parquet(s"$art/0/sketch")) ===
      rows(TextAnalysis.winnowSketchRetract(sketch0,
        b0.toSeq.toDF("doc_id"))))
    assert(rows(spark.read.parquet(s"$art/1/sketch")) ===
      rows(TextAnalysis.winnowSketchRetract(sketch0,
        takedowns.toSeq.toDF("doc_id"))))
    assert(rows(spark.read.parquet(s"$art/1/index")) ===
      rows(TextAnalysis.winnowIndexRetract(sketch0,
        takedowns.toSeq.toDF("doc_id"))))
  }

  test("streamed video takedowns compose to the one-shot retract on " +
      "both artifact faces (chunks + counts) through the chain core") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.pipeline.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.load(spark, sf(), "documents")
    val media = Multimodal.withPayload(d, "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    val arch = media.filter(col("doc_id") % 10 =!= 0)
    val sk0 = Multimodal.videoKeyframeSketch(
      Multimodal.keyframeHashes(arch, frameBytes = 72, cutPm = 8L).toDF())
    val sketch0 = Multimodal.VideoIndex(
      sk0.chunks.localCheckpoint(true), sk0.counts.localCheckpoint(true))
    val art = tmpDir("graft_vret")
    sketch0.chunks.write.mode("overwrite").parquet(s"$art/init/chunks")
    sketch0.counts.write.mode("overwrite").parquet(s"$art/init/counts")
    val takedowns = d
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1)
      .select("doc_id").as[Long].collect().sorted
    assert(takedowns.length >= 2, "fixture must yield a takedown per batch")
    val (b0, b1) = takedowns.splitAt(takedowns.length / 2)
    val input = MemoryStream[Long]
    val q = CurationStream.videoRetractSink(input.toDF().toDF("doc_id"),
      art, "init", s"$art/_cp").start()
    try {
      input.addData(b0.toSeq: _*); q.processAllAvailable()
      input.addData(b1.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // prefix 0 == one-shot sketch retract of b0 (both faces)
    val ret0 = Multimodal.videoSketchRetract(sketch0,
      b0.toSeq.toDF("doc_id"))
    assert(rows(spark.read.parquet(s"$art/0/chunks")) === rows(ret0.chunks))
    assert(rows(spark.read.parquet(s"$art/0/counts")) === rows(ret0.counts))
    // final state composes to the union's one-shot retract, and the
    // serving index is the batch face's one-shot output
    val retAll = Multimodal.videoIndexRetract(sketch0,
      takedowns.toSeq.toDF("doc_id"))
    val sketchAll = Multimodal.videoSketchRetract(sketch0,
      takedowns.toSeq.toDF("doc_id"))
    assert(rows(spark.read.parquet(s"$art/1/chunks")) ===
      rows(sketchAll.chunks))
    assert(rows(spark.read.parquet(s"$art/1/counts")) ===
      rows(retAll.counts))
    assert(rows(spark.read.parquet(s"$art/1/index")) ===
      rows(retAll.chunks))
  }

  test("retract chain refuses a batch-0 restart against an existing " +
      "artifact chain (lost checkpoint must not resurrect takedowns)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.load(spark, sf(), "documents")
    val arch = d.filter(col("doc_id") % 10 =!= 0)
    // the guard must hold on non-local artifact dirs too (VERDICT r15:
    // a java.io.File listing returns null on an object-store path and
    // passes vacuously) — exercise it through an explicit file: URI,
    // the minimum scheme-qualified path a local suite can drive
    val art = "file:" + tmpDir("graft_gret")
    Dedup.hashedShingleSketch(arch, "text", "doc_id", k = 5)
      .write.mode("overwrite").parquet(s"$art/init/sketch")
    // simulate a prior run's surviving chain: batches 0 AND 1 committed
    // (a lone "0" is indistinguishable from batch 0's own pre-commit
    // partial output and is tolerated — the replay test below)
    val prior = Dedup.hashedShingleSketch(
        arch.filter(col("doc_id") % 7 =!= 1), "text", "doc_id", k = 5)
      .localCheckpoint(true)
    prior.write.mode("overwrite").parquet(s"$art/0/sketch")
    prior.write.mode("overwrite").parquet(s"$art/1/sketch")
    // ...then restart with a FRESH checkpoint: batch 0 must refuse
    val input = MemoryStream[Long]
    val q = CurationStream.shingleRetractSink(input.toDF().toDF("doc_id"),
      art, "init", s"$art/_cp_fresh").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        input.addData(1L); q.processAllAvailable()
      } finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("RESURRECT")),
      s"expected the resurrect refusal, got: ${messages(e).mkString(" | ")}")
  }

  test("AUTO-compacted update sink: compactEvery folds generations " +
      "mid-stream, serving ≡ recount, and a fresh-checkpoint batch-0 " +
      "restart against a later generation refuses") {
    import spark.implicits._
    import graft.pipeline.DeltaUpdate
    implicit val sqlCtx = spark.sqlContext
    val texts = (1 to 6).map(i =>
      s"auto${i}a auto${i}b auto${i}c auto${i}d auto${i}e")
    val docs = Seq((1L, texts(0)), (2L, texts(1)), (9L, texts(2)))
      .toDF("doc_id", "text")
    val art = tmpDir("graft_autosink")
    Dedup.shingleDeltaBase(spark, docs, "text", "doc_id",
      s"${DeltaUpdate.genDir(art, 0L)}/init", k = 5, maxDf = 100)
    // three re-crawl micro-batches at compactEvery = 2: batch 2 is the
    // threshold batch and must fold gen 0 into gen 1 INSIDE the sink
    val input = MemoryStream[(Long, String)]
    val q = CurationStream.shingleDeltaUpdateSink(
      input.toDF().toDF("doc_id", "text"), art, "init", s"$art/_cp",
      compactEvery = 2).start()
    try {
      Seq(Seq((1L, texts(3))), Seq((2L, texts(4))),
        Seq((1L, texts(5)))).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"${DeltaUpdate.genDir(art, 1L)}/init/sketch")),
      "the threshold micro-batch must fold generation 0 into gen 1")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // global batch 2 = gen 1, local 0; serving ≡ one-shot rebuild
    assert(rows(Dedup.shingleUpdateServing(spark,
        DeltaUpdate.genDir(art, 1L), "init", 0L, k = 5, maxDf = 100)) ===
      rows(Dedup.shingleServingIndex(Dedup.hashedShingleSketch(
          Seq((1L, texts(5)), (2L, texts(4)), (9L, texts(2)))
            .toDF("doc_id", "text"), "text", "doc_id", k = 5),
        k = 5, maxDf = 100)),
      "auto-compacted sink serving diverged from the rebuild")
    // a FRESH checkpoint restarting at batch 0 against the gen-1
    // artifact must refuse (gen-aware stale-chain guard): serving the
    // gen-0 base would resurrect every superseded version
    val input2 = MemoryStream[(Long, String)]
    val q2 = CurationStream.shingleDeltaUpdateSink(
      input2.toDF().toDF("doc_id", "text"), art, "init",
      s"$art/_cp_fresh", compactEvery = 2).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        input2.addData((1L, texts(0))); q2.processAllAvailable()
      } finally q2.stop()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("auto-compacted chain")),
      s"expected the gen-aware refusal, got: ${messages(e).mkString(" | ")}")
  }

  test("retract chain tolerates a batch-0 REPLAY over its own partial " +
      "artifact (crash between write and checkpoint commit recovers)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.load(spark, sf(), "documents")
    val arch = d.filter(col("doc_id") % 10 =!= 0)
    val art = tmpDir("graft_rret")
    val sketch0 = Dedup
      .hashedShingleSketch(arch, "text", "doc_id", k = 5)
      .localCheckpoint(true)
    sketch0.write.mode("overwrite").parquet(s"$art/init/sketch")
    // simulate the crash window: batch 0 wrote its artifact but the
    // checkpoint never committed, so the restart re-invokes batchId 0
    // with artDir already holding "0" — the ADVICE r15 case. The
    // partial content is deliberately WRONG (an un-retracted copy) to
    // prove the replay overwrites rather than trusts it.
    sketch0.write.mode("overwrite").parquet(s"$art/0/sketch")
    val takedowns = d
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1)
      .select("doc_id").as[Long].collect().sorted
    val input = MemoryStream[Long]
    val q = CurationStream.shingleRetractSink(input.toDF().toDF("doc_id"),
      art, "init", s"$art/_cp_fresh").start()
    try {
      input.addData(takedowns.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(spark.read.parquet(s"$art/0/sketch")) ===
      rows(Dedup.shingleSketchRetract(sketch0,
        takedowns.toSeq.toDF("doc_id"))))
  }
}
