package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Dependency-free binary media codecs for the multimodal operators —
 * real byte-level encoders/parsers, not stubs. The formats are chosen
 * because each is a fully-specified header-plus-raw-payload container
 * decodable without any codec library:
 *
 *  - PPM P6 (Netpbm): ASCII header, raw interleaved RGB.
 *  - WAV PCM16 mono (RIFF): chunked little-endian container, raw PCM.
 *  - YUV4MPEG2 (y4m): ASCII stream header, `FRAME\n`-delimited raw
 *    4:2:0 planar frames — the standard uncompressed video interchange
 *    format (what ffmpeg pipes between tools).
 *
 * A production deployment swaps these for JPEG/FLAC/H.264 codecs behind
 * the same signatures; the Spark-side hosting in [[Multimodal]]
 * (batched mapPartitions, one decoder per partition) does not change.
 * Malformed input fails with IllegalArgumentException, not a crash or a
 * silent wrong answer — an executor task error surfaces per-row context.
 */
object Codecs {

  // ---- PPM (Netpbm P6, maxval 255) ----

  /** Serialize interleaved RGB bytes as a P6 PPM file. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodePpm: need ${w * h * 3} RGB bytes for ${w}x$h, got ${rgb.length}")
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
  }

  /**
   * Parse a P6 PPM: returns (width, height, interleaved RGB bytes).
   * Full header grammar — any whitespace between tokens, `#` comments —
   * so externally-produced files (ImageMagick, netpbm tools) decode too.
   */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var going = true
      while (going && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else going = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      require(pos > start, s"decodePpm: truncated header at offset $start")
      new String(bytes, start, pos - start, "US-ASCII")
    }
    val magic = token()
    require(magic == "P6", s"decodePpm: not a P6 PPM (magic '$magic')")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(w > 0 && h > 0, s"decodePpm: bad dimensions ${w}x$h")
    require(maxval == 255, s"decodePpm: unsupported maxval $maxval")
    pos += 1 // exactly one whitespace byte separates maxval from raster
    require(bytes.length - pos >= w * h * 3,
      s"decodePpm: raster truncated (${bytes.length - pos} of ${w * h * 3} bytes)")
    (w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3))
  }

  /** Nearest-neighbor resample of an interleaved RGB raster: target
    * pixel (x, y) copies source pixel (x·sw/tw, y·sh/th) (floor). */
  def resizeNearest(sw: Int, sh: Int, rgb: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    require(rgb.length == sw * sh * 3, "resizeNearest: raster/dims mismatch")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = y * sh / th
      var x = 0
      while (x < tw) {
        val si = (sy * sw + x * sw / tw) * 3
        val di = (y * tw + x) * 3
        out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- WAV (RIFF, PCM16 mono) ----

  /** Serialize 16-bit mono PCM samples as a canonical 44-byte-header WAV. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate = sr * block
      .putShort(2).putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /**
   * Parse a PCM16 mono WAV: returns (sampleRate, samples). Walks the
   * RIFF chunk list (skipping unknown chunks and their odd-length pad
   * bytes), so files with LIST/INFO metadata decode too.
   */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 12 && fourcc() == "RIFF", "decodeWav: not a RIFF file")
    bb.getInt // riff size (unreliable in the wild; chunk walk below is truth)
    require(fourcc() == "WAVE", "decodeWav: not a WAVE form")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = fourcc()
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(), s"decodeWav: bad chunk '$id' length $len")
      id match {
        case "fmt " =>
          require(len >= 16, "decodeWav: short fmt chunk")
          val fmt = bb.getShort; val channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          val bits = bb.getShort
          require(fmt == 1 && channels == 1 && bits == 16,
            s"decodeWav: only PCM16 mono supported (fmt=$fmt ch=$channels bits=$bits)")
          bb.position(bb.position() + (len - 16) + (len & 1))
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
          bb.position(bb.position() + (len & 1))
        case _ =>
          bb.position(bb.position() + len + (len & 1))
      }
    }
    require(sampleRate > 0, "decodeWav: missing fmt chunk")
    require(samples != null, "decodeWav: missing data chunk")
    (sampleRate, samples)
  }

  // ---- YUV4MPEG2 (uncompressed 4:2:0 planar video) ----

  /** Serialize raw 4:2:0 frames (each w·h luma + 2·(w/2·h/2) chroma
    * bytes) as a YUV4MPEG2 stream at fpsNum/fpsDen frames per second. */
  def encodeY4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "encodeY4m: 4:2:0 needs even dims")
    val frameLen = w * h + 2 * (w / 2) * (h / 2)
    frames.foreach(f => require(f.length == frameLen,
      s"encodeY4m: frame must be $frameLen bytes, got ${f.length}"))
    val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420\n"
      .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = ByteBuffer.allocate(
      header.length + frames.size * (marker.length + frameLen))
    out.put(header)
    frames.foreach { f => out.put(marker); out.put(f) }
    out.array()
  }

  /** Parse a YUV4MPEG2 stream: returns (w, h, fpsNum, fpsDen, frames). */
  def decodeY4m(bytes: Array[Byte])
      : (Int, Int, Int, Int, IndexedSeq[Array[Byte]]) = {
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      require(pos < bytes.length, "decodeY4m: unterminated header line")
      pos += 1
      new String(bytes, start, pos - 1 - start, "US-ASCII")
    }
    val header = line()
    val tags = header.split(' ')
    require(tags.headOption.contains("YUV4MPEG2"), "decodeY4m: bad magic")
    def tag(prefix: Char): Option[String] =
      tags.drop(1).find(t => t.nonEmpty && t.head == prefix).map(_.tail)
    val w = tag('W').map(_.toInt).getOrElse(
      throw new IllegalArgumentException("decodeY4m: missing W tag"))
    val h = tag('H').map(_.toInt).getOrElse(
      throw new IllegalArgumentException("decodeY4m: missing H tag"))
    val (fpsNum, fpsDen) = tag('F') match {
      case Some(f) =>
        val Array(n, d) = f.split(':'); (n.toInt, d.toInt)
      case None => (30, 1) // spec default when F is absent
    }
    tag('C').foreach(c => require(c.startsWith("420"),
      s"decodeY4m: only C420 supported (got C$c)"))
    require(w % 2 == 0 && h % 2 == 0,
      s"decodeY4m: C420 requires even dimensions (got ${w}x$h)")
    val frameLen = w * h + 2 * (w / 2) * (h / 2)
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    while (pos < bytes.length) {
      val fl = line()
      require(fl == "FRAME" || fl.startsWith("FRAME "),
        s"decodeY4m: expected FRAME marker, got '${fl.take(16)}'")
      require(bytes.length - pos >= frameLen, "decodeY4m: truncated frame")
      frames += java.util.Arrays.copyOfRange(bytes, pos, pos + frameLen)
      pos += frameLen
    }
    (w, h, fpsNum, fpsDen, frames.result())
  }
}
