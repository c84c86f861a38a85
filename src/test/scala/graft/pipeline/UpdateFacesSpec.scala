package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat, lit}

import graft.SparkSpec

/** The UPDATE (re-crawl edit) faces for the winnow, image/audio hash,
  * and video index families — d58's contract replicated per family:
  * update ≡ rebuild-with-the-new-versions on every artifact face, the
  * upsert composes cleanly, and the REVERSED composition
  * (append-before-retract) demonstrably loses the document — the
  * ordering bug the fixed retract-then-append encoding exists to
  * prevent. */
class UpdateFacesSpec extends SparkSpec {

  private def rows(d: DataFrame): Seq[String] =
    d.collect().map(_.toString).sorted.toSeq

  test("winnowSketchUpdate: ≡ rebuild-with-the-new-versions through " +
      "the serving view; append-before-retract loses the doc") {
    import spark.implicits._
    val df = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "red orange yellow green blue indigo violet cyan teal pink"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val sketch = TextAnalysis.winnowSketch(df, "text", "doc_id",
      k = 5, w = 4)
    val newV = Seq(
      (2L, "red orange yellow fresh green blue indigo violet cyan teal"),
      (4L, "an upserted document never seen before right here at all"))
      .toDF("doc_id", "text")
    val updatedCorpus = df.filter(col("doc_id") =!= 2L).unionAll(newV)
    val upd = TextAnalysis.winnowSketchUpdate(sketch, newV, "text",
      "doc_id", k = 5, w = 4)
    assert(rows(upd) === rows(TextAnalysis.winnowSketch(updatedCorpus,
      "text", "doc_id", k = 5, w = 4)))
    assert(rows(TextAnalysis.winnowServingIndex(upd, maxDf = 100)) ===
      rows(TextAnalysis.winnowIndex(updatedCorpus, "text", "doc_id",
        k = 5, w = 4, maxDf = 100)))
    // the ordering hazard: append first, then retract "the updated
    // ids" — the anti-join removes BOTH versions' fingerprints
    val wrong = TextAnalysis.winnowSketchRetract(
      sketch.unionByName(TextAnalysis.winnowSketch(newV, "text",
        "doc_id", k = 5, w = 4)),
      newV.select("doc_id"))
    assert(wrong.filter(col("id").isin(2L, 4L)).count() === 0,
      "reversed composition must demonstrate the vanished-doc bug")
    assert(upd.filter(col("id") === 2L).count() > 0)
  }

  test("phashSketchUpdate: ≡ rebuild-with-the-new-payloads through " +
      "the serving view; reversed composition loses the doc") {
    import spark.implicits._
    def media(c: DataFrame) = Multimodal.withPayload(c, "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    val df = Seq(
      (1L, "first archive payload with its own distinct bytes"),
      (2L, "second archive payload that is about to be re-encoded"),
      (3L, "third archive payload sitting quietly unchanged"))
      .toDF("doc_id", "text")
    val sketch = Multimodal.phashChunkSketch(Multimodal.dHash(media(df)))
    val newV = Seq(
      (2L, "second archive payload re-encoded with different bytes now"),
      (4L, "a brand new upserted payload never fingerprinted before"))
      .toDF("doc_id", "text")
    val updatedCorpus = df.filter(col("doc_id") =!= 2L).unionAll(newV)
    val upd = Multimodal.phashSketchUpdate(sketch,
      Multimodal.dHash(media(newV)))
    assert(rows(upd) === rows(Multimodal.phashChunkSketch(
      Multimodal.dHash(media(updatedCorpus)))))
    assert(rows(Multimodal.phashServingIndex(upd, maxBucket = 100)) ===
      rows(Multimodal.phashChunkIndex(
        Multimodal.dHash(media(updatedCorpus)), maxBucket = 100)))
    val wrong = Multimodal.phashSketchRetract(
      sketch.unionByName(Multimodal.phashChunkSketch(
        Multimodal.dHash(media(newV)))),
      newV.select("doc_id"))
    assert(wrong.filter(col("id").isin(2L, 4L)).count() === 0,
      "reversed composition must demonstrate the vanished-doc bug")
    assert(upd.filter(col("id") === 2L).count() > 0)
  }

  test("videoSketchUpdate: ≡ rebuild-with-the-new-payloads on BOTH " +
      "faces (a re-edit moves the scene counts with the postings)") {
    import spark.implicits._
    def media(c: DataFrame) = Multimodal.withPayload(c, "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[Multimodal.MediaRow]
    def kf(c: DataFrame) = Multimodal.keyframeHashes(media(c),
      frameBytes = 72, cutPm = 8L).toDF()
    val base = Seq(
      (1L, "first video payload with its own distinct byte stream " +
        "padded out to span several seventy-two byte stub frames aaaa"),
      (2L, "second video payload that is about to be re-edited ZZZZZZZZ " +
        "quiet low energy tail                                      ."),
      (3L, "third video payload left entirely alone this crawl " +
        "also padded to cover more than one frame of stub bytes zzzz"))
      .toDF("doc_id", "text")
    val sketch = Multimodal.videoKeyframeSketch(kf(base))
    // the re-edit doubles the payload: more frames, MORE SCENES — the
    // counts face must move with the postings
    val newV = base.filter(col("doc_id") === 2L)
      .withColumn("text", concat(col("text"), lit(" "), col("text")))
    val updatedCorpus = base.filter(col("doc_id") =!= 2L).unionAll(newV)
    val upd = Multimodal.videoSketchUpdate(sketch, kf(newV))
    val want = Multimodal.videoKeyframeSketch(kf(updatedCorpus))
    assert(rows(upd.chunks) === rows(want.chunks))
    assert(rows(upd.counts) === rows(want.counts))
    val oldN = sketch.counts.filter(col("doc_id") === 2L)
      .head.getAs[Long]("n_scenes")
    val newN = upd.counts.filter(col("doc_id") === 2L)
      .head.getAs[Long]("n_scenes")
    assert(newN > oldN,
      "fixture must actually change the scene segmentation")
  }
}
