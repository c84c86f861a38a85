package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * payload columns plus typed metadata, with decode / feature-extraction
  * staged as a `mapPartitions` over the binary batch (SURVEY §2b).
  *
  * The actual codec is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake decoder, so the Spark-side contract
  * (schema, batch iteration, partitioning, feature array shape) is real and
  * tested while the codec is swappable.
  *
  * Scale notes: payloads never enter a shuffle — decode happens map-side
  * straight off the scan, and only the (small) features/metadata survive
  * into downstream joins. Partition sizing for fat binary rows is the same
  * concern as the meter raw table (46 KB/row): bound
  * spark.sql.files.maxPartitionBytes so a partition of payloads fits in
  * executor memory.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  case class DecodedRow(doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Float])

  /** STUB decoder — deterministic fake standing in for an image codec.
    * Real implementation would parse the container format here. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 16 + (n % 624)   // fake dimensions derived from size
    val height = 16 + ((n / 7) % 464)
    val features = Array.tabulate(8) { i =>
      // fake feature: byte-sum of the i-th stripe, normalized
      var s = 0L
      var j = i
      while (j < n) { s += (payload(j) & 0xff); j += 8 }
      (s % 1000L).toFloat / 1000.0f
    }
    (width, height, features)
  }

  /** Attach a binary payload column (here: utf-8 bytes of a text column as
    * the stand-in payload; real pipelines read files or blob columns). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_type", lit("image/fake"))

  /** Batch decode via mapPartitions: one JVM-side pass per partition,
    * mirroring an Arrow-batched UDF's shape (iterator in → iterator out). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, feats) = decodeStub(r.payload)
        DecodedRow(r.doc_id, r.media_type, r.payload.length, w, h, feats)
      }
    }
  }

  /** End-to-end: documents → payload → decode → features table. */
  def featureTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = withPayload(docs, "text")
      .select(col("doc_id"), col("payload"), col("media_type"))
      .as[MediaRow]
    decode(media).toDF()
  }

  case class ResizedRow(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, pixels: Array[Float])

  /** STUB resize — real codec would interpolate pixels; the stub emits a
    * deterministic out_w×out_h grid from the fake decode. The Spark
    * contract it exercises is the real one: fat rows in, bounded-size rows
    * out, map-side only (payloads never shuffle). */
  def resize(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, feats) = decodeStub(r.payload)
        val px = Array.tabulate(outW * outH) { i =>
          feats(i % feats.length) * ((i / feats.length + 1).toFloat /
            (outW * outH / feats.length + 1))
        }
        ResizedRow(r.doc_id, w, h, outW, outH, px)
      }
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, frame_ts_ms: Long,
      features: Array[Float])

  /** STUB video frame-sampling: every `everyMs` (fake) milliseconds up to a
    * payload-derived duration, one frame row with per-frame features — a
    * 1→N generator per video, which is the shape that matters: output rows
    * are independent downstream units (dedup/embed per frame), and the
    * explode happens map-side off the scan with no payload shuffle. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val durationMs = 1000L + (r.payload.length % 9000) // fake duration
        val (_, _, feats) = decodeStub(r.payload)
        (0L to durationMs by everyMs).zipWithIndex.map { case (ts, i) =>
          FrameRow(r.doc_id, i, ts,
            feats.map(f => f + i * 0.001f)) // fake per-frame drift
        }
      }
    }
  }
}
