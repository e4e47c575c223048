package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, decoded by the dependency-free real
 * codecs in [[Codecs]] (PPM, WAV PCM16, YUV4MPEG2). The Spark-side
 * machinery is the batched `mapPartitions` host shape the reference
 * uses for model hosting (io/bert.py:141-153): one decoder instance per
 * partition, rows streamed through it, narrow output — no shuffle
 * anywhere in this file. A production deployment swaps the codec calls
 * for JPEG/FLAC/H.264 libraries behind the same signatures; the host,
 * schema, and partitioning do not change.
 *
 * Scale: every operator here is a narrow per-row map or generate over
 * the media relation — it partitions by whatever partitioning the scan
 * provides and needs no co-location, so it holds at any corpus size as
 * long as single payloads fit in a task (multi-GB video would move to a
 * chunked-payload layout; the row shape below is for clip/image-sized
 * assets).
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

  // ---- deterministic synthetic payloads (REAL format bytes) ----
  // Every payload is a genuine decodable file whose content is a closed
  // form of doc_id — which is what lets the DuckDB oracle state the
  // decoded pixels/samples exactly without a codec of its own.

  /** Image payload: P6 PPM, (4 + id%5)x(3 + id%4), RGB byte i of the
    * interleaved raster = (id·31 + i·7) mod 256. */
  def syntheticPpm(docId: Long): Array[Byte] = {
    val sw = (4 + docId % 5).toInt
    val sh = (3 + docId % 4).toInt
    Codecs.encodePpm(sw, sh, Array.tabulate(sw * sh * 3)(i =>
      ((docId * 31 + i.toLong * 7) % 256).toByte))
  }

  /** Audio payload: 8 kHz PCM16 mono WAV, 160 + id%64 samples,
    * sample i = ((id·13 + i·7) mod 65536) − 32768. */
  def syntheticWav(docId: Long): Array[Byte] = {
    val n = (160 + docId % 64).toInt
    Codecs.encodeWavPcm16(8000, Array.tabulate(n)(i =>
      (((docId * 13 + i.toLong * 7) % 65536) - 32768).toShort))
  }

  /** Video payload: 4x4 C420 YUV4MPEG2 at 5 fps, 3 + id%5 frames; luma
    * byte j of frame f = (id·17 + f·29 + j·7) mod 256, chroma 128. */
  def syntheticY4m(docId: Long): Array[Byte] = {
    val nFrames = (3 + docId % 5).toInt
    Codecs.encodeY4m(4, 4, 5, 1, (0 until nFrames).map(f =>
      Array.tabulate(24)(j =>
        if (j < 16) ((docId * 17 + f.toLong * 29 + j.toLong * 7) % 256).toByte
        else 128.toByte)))
  }

  private val syntheticBytes = udf((docId: Long, kind: String) => kind match {
    case "image" => syntheticPpm(docId)
    case "audio" => syntheticWav(docId)
    case _       => syntheticY4m(docId)
  })

  /** Synthesize a deterministic media relation from the documents table —
    * test/bench input whose binary payloads are REAL PPM/WAV/Y4M files
    * (closed-form content, so the oracle can recompute the decoded
    * values). Image metadata carries the true raster dimensions;
    * `duration_ms` is the logical asset length used by the
    * planning-level [[chunkAudio]]/catalog queries (the byte payload is
    * a real decodable excerpt, not required to span it). */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val kind = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
    docs.select(
      col("doc_id").as("media_id"), col("doc_id"),
      kind.as("kind"),
      syntheticBytes(col("doc_id"), kind).as("bytes"),
      struct(
        when(col("doc_id") % 3 === 0, (lit(4) + col("doc_id") % 5))
          .otherwise(col("n_chars") % 640).cast("int").as("width"),
        when(col("doc_id") % 3 === 0, (lit(3) + col("doc_id") % 4))
          .otherwise(col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 10).cast("int").as("duration_ms"),
        when(col("doc_id") % 3 === 0, "ppm")
          .when(col("doc_id") % 3 === 1, "wav").otherwise("y4m").as("format"))
        .as("meta"))
  }

  /** floor(x·1e4 + 0.5)/1e4 — half-up 4dp round for non-negative means,
    * the same op sequence the DuckDB oracle runs (Spark's round() takes
    * a per-row BigDecimal path; this stays in plain doubles). */
  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /**
   * Batched image feature extraction — decodes each PPM payload and
   * computes raster statistics: [width, height, meanR, meanG, meanB,
   * min, max, meanAll] (means half-up 4dp). The `mapPartitions` shape
   * is the generic codec/model host: one decoder instance per
   * partition, rows streamed through in `batchSize` groups (a real
   * vision model would forward each group as one batch).
   */
  def extractImageFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val images = media.filter(col("kind") === "image")
    val mid = images.schema.fieldIndex("media_id")
    val bid = images.schema.fieldIndex("bytes")
    images.toDF().mapPartitions { rows =>
      // per-partition decoder init happens here
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, px) = Codecs.decodePpm(r.getAs[Array[Byte]](bid))
          var sr = 0L; var sg = 0L; var sb = 0L
          var mn = 255; var mx = 0
          var i = 0
          while (i < px.length) {
            val v = px(i) & 0xff
            (i % 3: @unchecked) match {
              case 0 => sr += v
              case 1 => sg += v
              case 2 => sb += v
            }
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          val n = w.toLong * h
          val feats = Array[Double](w, h,
            round4(sr.toDouble / n), round4(sg.toDouble / n),
            round4(sb.toDouble / n), mn, mx,
            round4((sr + sg + sb).toDouble / (3L * n)))
          Row(r.getLong(mid), feats.toSeq)
        }
      }
    }(Encoders.row(schema))
  }

  /**
   * Frame sampling for video rows — a REAL y4m decode: parse the stream
   * header (dims, frame rate), walk the FRAME-delimited raw frames, and
   * emit one row per `everyMs` sampling instant inside the clip with
   * the selected frame's index and luma-plane checksum (the cheap
   * "did we actually read the pixels" proof; a real pipeline would
   * hand the frame bytes to a vision encoder here). Narrow flatMap.
   */
  def sampleVideoFrames(media: DataFrame, everyMs: Int = 1000): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("doc_id", LongType),
      StructField("frame_ms", IntegerType), StructField("frame_idx", IntegerType),
      StructField("y_sum", LongType)))
    val videos = media.filter(col("kind") === "video")
    val mid = videos.schema.fieldIndex("media_id")
    val did = videos.schema.fieldIndex("doc_id")
    val bid = videos.schema.fieldIndex("bytes")
    videos.toDF().mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, fpsNum, fpsDen, frames) =
          Codecs.decodeY4m(r.getAs[Array[Byte]](bid))
        // Rational timing: idx = t*num/(1000*den) avoids the integer
        // frame-duration truncation that breaks fps > 1000 (dur 0 →
        // zero frames) and drifts on non-integer rates like 30000:1001.
        val durMs = (frames.length.toLong * 1000L * fpsDen / fpsNum).toInt
        (0 until durMs by everyMs).map { t =>
          val idx = (t.toLong * fpsNum / (1000L * fpsDen)).toInt
          val f = frames(idx)
          var ySum = 0L
          var j = 0
          while (j < w * h) { ySum += f(j) & 0xff; j += 1 }
          Row(r.getLong(mid), r.getLong(did), t, idx, ySum)
        }
      }
    }(Encoders.row(schema))
  }

  /**
   * Resize every image row to (w, h): decode the PPM, nearest-neighbor
   * resample ([[Codecs.resizeNearest]]), re-encode, and update the
   * metadata struct to the new dimensions. Same one-codec-per-partition
   * host as [[extractImageFeatures]]; narrow map — no shuffle.
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
        val (sw, sh, px) = Codecs.decodePpm(r.getAs[Array[Byte]](bid))
        val resized = Codecs.encodePpm(w, h, Codecs.resizeNearest(sw, sh, px, w, h))
        val oldMeta = r.getStruct(metaIdx)
        Row(r.getLong(mid), r.getLong(did), r.getString(kid), resized,
          Row(w, h, oldMeta.get(2), oldMeta.get(3)))
      }
    }(Encoders.row(mediaSchema))
  }

  /** Rolling 31-base polynomial hash (mod 2^31−1) over raw payload
    * bytes — the binary twin of TextAnalysis.portableHash, used to
    * fingerprint re-encoded files under the oracle. */
  val byteFingerprint: Column => Column = {
    val f = udf((bytes: Array[Byte]) =>
      bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 2147483647L))
    c => f(c)
  }

  /**
   * Per-clip audio statistics — a REAL WAV parse: RIFF chunk walk, fmt
   * validation, PCM16 samples. Output (media_id, sample_rate,
   * n_samples, min_amp, max_amp, sum_amp) — the integer stats an audio
   * curation pass filters on (clipping, silence, DC offset), all
   * oracle-exact. Narrow map.
   */
  def audioStats(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType), StructField("n_samples", IntegerType),
      StructField("min_amp", IntegerType), StructField("max_amp", IntegerType),
      StructField("sum_amp", LongType)))
    val audio = media.filter(col("kind") === "audio")
    val mid = audio.schema.fieldIndex("media_id")
    val bid = audio.schema.fieldIndex("bytes")
    audio.toDF().mapPartitions { rows =>
      rows.map { r =>
        val (sr, samples) = Codecs.decodeWavPcm16(r.getAs[Array[Byte]](bid))
        var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
        var i = 0
        while (i < samples.length) {
          val v = samples(i).toInt
          if (v < mn) mn = v
          if (v > mx) mx = v
          sum += v
          i += 1
        }
        Row(r.getLong(mid), sr, samples.length, mn, mx, sum)
      }
    }(Encoders.row(schema))
  }

  /**
   * Sample-accurate audio chunking over the DECODED waveform: windows
   * of `windowMs` hopped by `hopMs` against the real PCM sample count
   * (vs [[chunkAudio]], which plans chunks from catalog metadata
   * without touching bytes). Each chunk carries its sample range and
   * amplitude sum — the front end for per-chunk feature extraction.
   */
  def chunkAudioSamples(media: DataFrame, windowMs: Int = 10,
      hopMs: Int = 5): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("doc_id", LongType),
      StructField("chunk_idx", IntegerType),
      StructField("start_sample", IntegerType), StructField("end_sample", IntegerType),
      StructField("sum_amp", LongType)))
    val audio = media.filter(col("kind") === "audio")
    val mid = audio.schema.fieldIndex("media_id")
    val did = audio.schema.fieldIndex("doc_id")
    val bid = audio.schema.fieldIndex("bytes")
    audio.toDF().mapPartitions { rows =>
      rows.flatMap { r =>
        val (sr, samples) = Codecs.decodeWavPcm16(r.getAs[Array[Byte]](bid))
        val winLen = windowMs * sr / 1000
        val hopLen = hopMs * sr / 1000
        require(winLen > 0 && hopLen > 0,
          s"chunkAudioSamples: windowMs=$windowMs / hopMs=$hopMs too small " +
            s"for sampleRate=$sr (winLen=$winLen, hopLen=$hopLen samples)")
        (0 to samples.length - winLen by hopLen).zipWithIndex.map {
          case (start, idx) =>
            var sum = 0L
            var i = start
            while (i < start + winLen) { sum += samples(i); i += 1 }
            Row(r.getLong(mid), r.getLong(did), idx, start, start + winLen, sum)
        }
      }
    }(Encoders.row(schema))
  }

  /**
   * Metadata-level chunk planning for audio rows — no byte access: one
   * output row per (window of `windowMs`, hopped by `hopMs`) that fits
   * inside the cataloged clip length. This is the 100 TB-side shape (a
   * chunk MANIFEST is computed without reading payloads; the decode
   * happens downstream per selected chunk); [[chunkAudioSamples]] is
   * the decoded twin. Narrow generate — no shuffle.
   */
  def chunkAudio(media: DataFrame, windowMs: Int = 1000, hopMs: Int = 500): DataFrame =
    media.filter(col("kind") === "audio" && col("meta")("duration_ms") >= windowMs)
      .select(col("media_id"), col("doc_id"),
        posexplode(sequence(lit(0), col("meta")("duration_ms") - windowMs, lit(hopMs)))
          .as(Seq("chunk_idx", "start_ms")))
      .withColumn("end_ms", col("start_ms") + windowMs)
}
