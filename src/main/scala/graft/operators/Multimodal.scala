package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata. The Spark-side machinery — schema, batched
 * mapPartitions, partitioning, output shapes — is real and tested; the
 * actual codec calls are STUBBED behind `DecodeStub` (deterministic fake
 * decode) because no image/audio libraries ship in this environment. A
 * production deployment swaps `DecodeStub.decodeImage` for an actual codec
 * (or routes the same schema through mapInPandas + PIL on PySpark); nothing
 * else changes.
 */
object Multimodal {

  /** Standard media relation schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("doc_id", LongType),
    StructField("kind", StringType), // "image" | "audio" | "video"
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("duration_ms", IntegerType), StructField("format", StringType))))))

  /** Deterministic fake decoders: features derive from the byte content so
    * tests are reproducible. Replace with real codecs in production. */
  object DecodeStub {
    /** STUB — stands in for a real image decode (PIL/ImageIO/javacv). */
    def decodeImage(bytes: Array[Byte], w: Int, h: Int): Array[Float] = {
      // deterministic pseudo-pixels: rolling hash of bytes seeds a LCG
      var seed = bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 2147483647L)
      Array.fill(8) { seed = (seed * 1103515245L + 12345L) % 2147483647L
        (seed % 1000).toFloat / 1000f }
    }
    /** STUB — frame timestamps a real demuxer would return. */
    def sampleFrames(durationMs: Int, everyMs: Int): Seq[Int] =
      (0 until durationMs by everyMs).toSeq

    /** STUB — stands in for a real decode→scale→re-encode (PIL.resize /
      * javacv). Deterministic crop to 32 bytes so tests and the oracle can
      * state the output exactly; a real codec keeps this signature. */
    def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      bytes.take(math.min(bytes.length, 32))
  }

  /**
   * Batched feature extraction over media rows — the `mapPartitions` shape
   * used for any model/codec hosting (reference hosts BERT the same way,
   * io/bert.py:141-153): one decoder instance per partition, rows streamed
   * through it, output one feature vector per media row.
   */
  def extractImageFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    val mid = media.schema.fieldIndex("media_id")
    val bid = media.schema.fieldIndex("bytes")
    val metaIdx = media.schema.fieldIndex("meta")
    val out = media.toDF().mapPartitions { rows =>
      // per-partition decoder init happens here (stubbed)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val meta = r.getStruct(metaIdx)
          val feats = DecodeStub.decodeImage(r.getAs[Array[Byte]](bid),
            if (meta.isNullAt(0)) 0 else meta.getInt(0),
            if (meta.isNullAt(1)) 0 else meta.getInt(1))
          Row(r.getLong(mid), feats.toSeq)
        }
      }
    }(Encoders.row(schema))
    out
  }

  /**
   * Frame sampling for video rows: one output row per sampled frame
   * timestamp. Narrow generate — no shuffle.
   */
  def sampleVideoFrames(media: DataFrame, everyMs: Int = 1000): DataFrame = {
    // duration 0 (or negative/null) yields NO frames — consistent with
    // DecodeStub.sampleFrames, which returns an empty range for 0 duration.
    media.filter(col("kind") === "video" && col("meta")("duration_ms") > 0)
      .select(col("media_id"), col("doc_id"),
        explode(sequence(lit(0), col("meta")("duration_ms") - 1, lit(everyMs)))
          .as("frame_ms"))
  }

  /**
   * Resize every image row to (w, h): the binary column is transformed in
   * a batched mapPartitions (same host shape as extractImageFeatures — one
   * codec instance per partition), and the metadata struct is updated to
   * the new dimensions. Narrow map — no shuffle.
   */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val images = media.filter(col("kind") === "image")
    val mid = images.schema.fieldIndex("media_id")
    val did = images.schema.fieldIndex("doc_id")
    val kid = images.schema.fieldIndex("kind")
    val bid = images.schema.fieldIndex("bytes")
    val metaIdx = images.schema.fieldIndex("meta")
    images.toDF().mapPartitions { rows =>
      rows.map { r =>
        val resized = DecodeStub.resizeImage(r.getAs[Array[Byte]](bid), w, h)
        val oldMeta = r.getStruct(metaIdx)
        Row(r.getLong(mid), r.getLong(did), r.getString(kid), resized,
          Row(w, h, oldMeta.get(2), oldMeta.get(3)))
      }
    }(Encoders.row(mediaSchema))
  }

  /**
   * Fixed-window chunking for audio rows — the standard front end for
   * feature extraction (MFCC/fbank) or ASR batching: one output row per
   * (window of `windowMs`, hopped by `hopMs`) that fits entirely inside
   * the clip. Narrow generate — no shuffle; the (stubbed) sample decode
   * happens downstream per chunk, exactly like extractImageFeatures.
   */
  def chunkAudio(media: DataFrame, windowMs: Int = 1000, hopMs: Int = 500): DataFrame =
    media.filter(col("kind") === "audio" && col("meta")("duration_ms") >= windowMs)
      .select(col("media_id"), col("doc_id"),
        posexplode(sequence(lit(0), col("meta")("duration_ms") - windowMs, lit(hopMs)))
          .as(Seq("chunk_idx", "start_ms")))
      .withColumn("end_ms", col("start_ms") + windowMs)

  /** Synthesize a deterministic media relation from the documents table —
    * test/bench input standing in for real binary payloads. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    docs.select(
      col("doc_id").as("media_id"), col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(substring(col("text"), 1, 64), "UTF-8").as("bytes"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 10).cast("int").as("duration_ms"),
        lit("synthetic").as("format")).as("meta"))
  }
}
