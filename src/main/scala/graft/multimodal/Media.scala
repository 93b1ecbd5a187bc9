package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs — the Spark-side schema,
  * partitioning, and batch shape are real, [[Media.HeaderDecoder]] does
  * REAL container parsing for PPM/BMP/WAV/PNG/GIF/JPEG (pure JVM, zero
  * libraries), and [[Jpeg]] does full baseline-DCT entropy DECODE. Only
  * codecs genuinely absent from a bare JVM (video codecs, audio
  * resampling) remain behind [[NotImplementedDecoder]].
  *
  * Scale design: media payloads stay as binary columns in parquet (row
  * groups keep them columnar-compressed); metadata extraction is a narrow
  * map (no shuffle); frame sampling explodes to one row per sampled frame,
  * partition-pruned by whatever key the table is laid out on.
  */
object Media {

  /** Decoder contract. Real implementations (JPEG/PNG/WAV) plug in here. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
  }

  final case class MediaMeta(width: Int, height: Int, format: String,
      nFrames: Int)

  /** STUB — a real build links an image codec; this container has none. */
  object NotImplementedDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta =
      throw new NotImplementedError(
        "codec decode is stubbed in this environment (no image libs)")
  }

  /** Deterministic fake decoder: derives metadata purely from payload
    * length, mirroring what a real header parse would return in shape.
    */
  object FakeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      MediaMeta(
        width = 64 + n % 512,
        height = 64 + (n * 7) % 512,
        format = (n % 3) match {
          case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
        },
        nFrames = n / 100 + 1)
    }
  }

  /** REAL header decoder for formats whose container layouts are
    * parseable with zero libraries: PPM P6 (ASCII header), BMP
    * (BITMAPINFOHEADER, little-endian), WAV (RIFF/PCM), PNG, GIF, and
    * JPEG (marker walk to SOFn). This is the codec seam doing genuine
    * work — magic-byte sniffing, comment-skipping tokenization,
    * fixed-offset little-endian fields, chunk scanning; full JPEG
    * entropy decode lives in [[Jpeg]]. Meta mapping for audio:
    * width = sample rate, height = channels, nFrames = sample frames.
    */
  object HeaderDecoder extends MediaDecoder {
    def decode(p: Array[Byte]): MediaMeta =
      if (p.length >= 2 && p(0) == 'P' && p(1) == '6') decodePpm(p)
      else if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') decodeBmp(p)
      else if (p.length >= 44 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F'
        && p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V'
        && p(11) == 'E') decodeWav(p)
      else if (p.length >= 33 && (p(0) & 0xff) == 0x89 && p(1) == 'P'
        && p(2) == 'N' && p(3) == 'G') decodePng(p)
      else if (p.length >= 14 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F'
        && p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
        decodeGif(p)
      else if (p.length >= 4 && (p(0) & 0xff) == 0xff
        && (p(1) & 0xff) == 0xd8) decodeJpegHeader(p)
      else throw new IllegalArgumentException(
        s"unrecognized media magic (${p.take(4).mkString(",")})")

    private def decodePpm(p: Array[Byte]): MediaMeta = {
      val (w, h, _) = ppmHeader(p)
      MediaMeta(w, h, "ppm", nFrames = 1)
    }

    private def le16(p: Array[Byte], o: Int): Int =
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    private def le32(p: Array[Byte], o: Int): Int =
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
        ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)

    private def decodeBmp(p: Array[Byte]): MediaMeta =
      // BITMAPINFOHEADER: int32 width at 18, int32 height at 22 —
      // a NEGATIVE height means top-down row order, the dimension is |h|
      MediaMeta(le32(p, 18), math.abs(le32(p, 22)), "bmp", nFrames = 1)

    private def decodeWav(p: Array[Byte]): MediaMeta = {
      val channels = le16(p, 22)
      val sampleRate = le32(p, 24)
      val blockAlign = le16(p, 32)
      // scan chunks from offset 36 for "data" (canonical files have it
      // there, but fmt extensions may push it further)
      var o = 36
      var dataSize = -1
      while (dataSize < 0 && o + 8 <= p.length) {
        val sz = le32(p, o + 4)
        if (p(o) == 'd' && p(o + 1) == 'a' && p(o + 2) == 't'
          && p(o + 3) == 'a') dataSize = sz
        else o += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(dataSize >= 0, "WAV without a data chunk")
      MediaMeta(sampleRate, channels, "wav", nFrames = dataSize / blockAlign)
    }

    private def be32(p: Array[Byte], o: Int): Int =
      ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) |
        ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)

    /** PNG: 8-byte signature, then length-tagged chunks (big-endian
      * length, 4-char type, data, CRC). Dimensions come from the IHDR
      * chunk the spec requires first; the chunk WALK finds APNG's acTL
      * animation-control chunk, whose num_frames makes an animated PNG
      * report its real frame count (a plain PNG has no acTL → 1 frame).
      */
    private def decodePng(p: Array[Byte]): MediaMeta = {
      require(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R',
        "PNG without a leading IHDR chunk")
      val w = be32(p, 16)
      val h = be32(p, 20)
      var o = 8
      var frames = 1
      var ok = true
      while (ok && o + 8 <= p.length) {
        val len = be32(p, o)
        if (len < 0 || o + 12 + len > p.length) ok = false
        else {
          if (p(o + 4) == 'a' && p(o + 5) == 'c' && p(o + 6) == 'T'
            && p(o + 7) == 'L' && len >= 4) frames = be32(p, o + 8)
          o += 12 + len // length + type + data + CRC
        }
      }
      MediaMeta(w, h, "png", nFrames = frames)
    }

    /** GIF: logical-screen dimensions at fixed little-endian offsets,
      * then a real BLOCK WALK — skip the global color table if the flags
      * byte declares one, skip extensions (label + length-prefixed
      * sub-blocks), and count image descriptors (0x2C), each with its
      * own optional local color table and LZW data sub-blocks. The
      * descriptor count IS the frame count — GIF has no header field
      * for it.
      */
    private def decodeGif(p: Array[Byte]): MediaMeta = {
      val w = le16(p, 6)
      val h = le16(p, 8)
      val flags = p(10) & 0xff
      var o = 13 +
        (if ((flags & 0x80) != 0) 3 * (1 << ((flags & 7) + 1)) else 0)
      var frames = 0
      var done = false
      while (!done && o < p.length) {
        (p(o) & 0xff) match {
          case 0x3b => done = true // trailer
          case 0x21 => // extension: introducer + label, then sub-blocks
            o = skipSubBlocks(p, o + 2)
          case 0x2c => // image descriptor
            frames += 1
            val lf = p(o + 9) & 0xff
            o += 10 +
              (if ((lf & 0x80) != 0) 3 * (1 << ((lf & 7) + 1)) else 0)
            o += 1 // LZW minimum code size
            o = skipSubBlocks(p, o)
          case other => throw new IllegalArgumentException(
            f"bad GIF block 0x$other%02x at offset $o")
        }
      }
      require(done, "GIF without a trailer")
      MediaMeta(w, h, "gif", nFrames = frames)
    }

    /** Length-prefixed sub-blocks ending at a zero terminator; returns
      * the offset just past the terminator.
      */
    private def skipSubBlocks(p: Array[Byte], start: Int): Int = {
      var o = start
      while ((p(o) & 0xff) != 0) o += 1 + (p(o) & 0xff)
      o + 1
    }

    /** Byte offset of every image descriptor (0x2C) — the container-level
      * frame index a sampler seeks to WITHOUT LZW-decoding anything; the
      * same block walk as [[decodeGif]], recording positions instead of
      * counting.
      */
    def gifFrameOffsets(p: Array[Byte]): Array[Int] = {
      require(p.length >= 14 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F',
        "not a GIF")
      val flags = p(10) & 0xff
      var o = 13 +
        (if ((flags & 0x80) != 0) 3 * (1 << ((flags & 7) + 1)) else 0)
      val offs = Array.newBuilder[Int]
      var done = false
      while (!done && o < p.length) {
        (p(o) & 0xff) match {
          case 0x3b => done = true
          case 0x21 => o = skipSubBlocks(p, o + 2)
          case 0x2c =>
            offs += o
            val lf = p(o + 9) & 0xff
            o += 10 +
              (if ((lf & 0x80) != 0) 3 * (1 << ((lf & 7) + 1)) else 0)
            o += 1
            o = skipSubBlocks(p, o)
          case other => throw new IllegalArgumentException(
            f"bad GIF block 0x$other%02x at offset $o")
        }
      }
      require(done, "GIF without a trailer")
      offs.result()
    }

    private def be16(p: Array[Byte], o: Int): Int =
      ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)

    /** JPEG: SOI, then a marker walk (APPn/DQT/DHT/... are all
      * length-tagged) to the first SOFn frame header, which carries the
      * dimensions. Any SOF flavor serves for metadata; full baseline
      * pixel decode is [[Jpeg.decode]].
      */
    private def decodeJpegHeader(p: Array[Byte]): MediaMeta = {
      var o = 2
      while (o + 4 <= p.length) {
        require((p(o) & 0xff) == 0xff,
          f"bad JPEG marker byte 0x${p(o) & 0xff}%02x at $o")
        val m = p(o + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          // SOFn: len(2) precision(1) height(2) width(2)
          return MediaMeta(be16(p, o + 7), be16(p, o + 5), "jpeg",
            nFrames = 1)
        require(m != 0xd9 && m != 0xda, "JPEG scan before any SOF header")
        o += 2 + be16(p, o + 2)
      }
      throw new IllegalArgumentException("JPEG without a SOF header")
    }
  }

  /** Parse a P6 header: `P6 <ws> width <ws> height <ws> maxval <one ws>
    * raster`, with '#' comments to end-of-line anywhere in the header.
    * Returns (width, height, raster offset).
    */
  private[multimodal] def ppmHeader(p: Array[Byte]): (Int, Int, Int) = {
    var i = 2
    def nextInt(): Int = {
      while (i < p.length && (p(i).toChar.isWhitespace || p(i) == '#')) {
        if (p(i) == '#') while (i < p.length && p(i) != '\n') i += 1
        else i += 1
      }
      var v = 0
      require(i < p.length && p(i) >= '0' && p(i) <= '9', "bad PPM header")
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0'); i += 1
      }
      v
    }
    val (w, h) = (nextInt(), nextInt())
    nextInt() // maxval — exactly one whitespace follows, then the raster
    (w, h, i + 1)
  }

  /** REAL pixel work: nearest-neighbor resample of a PPM P6 raster to
    * outW×outH (source pixel = (i·w/outW, j·h/outH), integer division —
    * the standard NN index map), returning the sampled bytes' sum as a
    * compact proof an oracle can recompute arithmetically. This is the
    * resample stage [[graft.queries.MultimodalOps]]'s letterbox GEOMETRY
    * plans for — here executed on real raster bytes.
    */
  def resamplePpmChecksum(p: Array[Byte], outW: Int, outH: Int): Long = {
    val (w, h, off) = ppmHeader(p)
    var sum = 0L
    var j = 0
    while (j < outH) {
      val sy = j * h / outH
      var i = 0
      while (i < outW) {
        val sx = i * w / outW
        val o = off + (sy * w + sx) * 3
        sum += (p(o) & 0xff) + (p(o + 1) & 0xff) + (p(o + 2) & 0xff)
        i += 1
      }
      j += 1
    }
    sum
  }

  /** PPM whose raster is the deterministic gradient
    * pixel(x, y)(c) = (x·7 + y·13 + c) mod 256 — real bytes whose any
    * resample/crop an oracle can predict in closed form.
    */
  def encodePpmGradient(w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        var c = 0
        while (c < 3) {
          raster(base + c) = ((x * 7 + y * 13 + c) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    header ++ raster
  }

  // Deterministic REAL-format payload builders — the fixture stand-in for
  // reading actual media files off storage (construction is the stub;
  // the decode above is not).

  def encodePpm(w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n# graft synthetic\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ new Array[Byte](w * h * 3)
  }

  def encodeBmp(w: Int, h: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4 // rows pad to 4-byte boundaries
    val dataSize = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54) // reserved + pixel offset
      .putInt(40).putInt(w).putInt(h)     // BITMAPINFOHEADER
      .putShort(1).putShort(24)           // planes, bpp
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    buf.array()
  }

  def encodeWav(sampleRate: Int, channels: Int, samples: Int): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit PCM
    val dataSize = samples * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort) // PCM
      .putInt(sampleRate).putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    buf.array()
  }

  /** Like [[encodeWav]] but with REAL sample data: 16-bit LE PCM where
    * interleaved sample k is ((k·37 + 13) mod 2048) − 1024 — a
    * deterministic full-range pattern whose amplitude statistics an
    * oracle can recompute in closed form.
    */
  def encodeWavPattern(sampleRate: Int, channels: Int,
      frames: Int): Array[Byte] = {
    val buf = encodeWav(sampleRate, channels, frames)
    val n = frames * channels
    var k = 0
    while (k < n) {
      val v = ((k * 37 + 13) % 2048) - 1024
      buf(44 + 2 * k) = (v & 0xff).toByte
      buf(44 + 2 * k + 1) = ((v >> 8) & 0xff).toByte
      k += 1
    }
    buf
  }

  /** Parse a RIFF/PCM WAV's data chunk into interleaved signed 16-bit
    * samples — the sample-decode tier above [[HeaderDecoder.decode]]'s
    * header-only parse (same chunk walk, then real LE16 payload reads).
    */
  def wavSamples(p: Array[Byte]): Array[Int] = {
    require(p.length >= 44 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F'
      && p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V'
      && p(11) == 'E', "not a RIFF/WAVE payload")
    require(le16(p, 34) == 16, "only 16-bit PCM supported")
    var o = 36
    var dataOff = -1
    var dataSize = -1
    while (dataOff < 0 && o + 8 <= p.length) {
      val sz = le32(p, o + 4)
      if (p(o) == 'd' && p(o + 1) == 'a' && p(o + 2) == 't'
        && p(o + 3) == 'a') { dataOff = o + 8; dataSize = sz }
      else o += 8 + sz + (sz & 1)
    }
    require(dataOff >= 0, "WAV without a data chunk")
    require(dataOff + dataSize <= p.length, "truncated WAV data chunk")
    Array.tabulate(dataSize / 2) { k =>
      val v = (p(dataOff + 2 * k) & 0xff) |
        ((p(dataOff + 2 * k + 1) & 0xff) << 8)
      if (v >= 0x8000) v - 0x10000 else v
    }
  }

  private def le16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
  private def le32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)

  /** doc_id → a real PPM / BMP / WAV payload, parameters derived from the
    * id so an oracle can recompute what the decoder must recover.
    */
  def syntheticPayload(id: Long): Array[Byte] = (id % 3) match {
    case 0 => encodePpm(16 + (id % 64).toInt, 16 + ((id * 3) % 64).toInt)
    case 1 => encodeBmp(16 + (id % 64).toInt, 16 + ((id * 3) % 64).toInt)
    case _ => encodeWav(8000 + ((id % 8) * 1000).toInt, 1 + (id % 2).toInt,
      128 + (id % 256).toInt)
  }

  /** A real PNG: signature, CRC-correct chunks (IHDR, optional APNG acTL
    * when frames > 1, a deflated IDAT, IEND). java.util.zip supplies CRC32
    * and DEFLATE — still zero external libraries.
    */
  def encodePng(w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be(data.length))
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    chunk("IHDR", be(w) ++ be(h) ++ Array[Byte](8, 2, 0, 0, 0))
    if (frames > 1) chunk("acTL", be(frames) ++ be(0))
    val d = new java.util.zip.Deflater()
    d.setInput(new Array[Byte](8)); d.finish()
    val buf = new Array[Byte](64)
    chunk("IDAT", buf.take(d.deflate(buf)))
    d.end()
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** A real GIF89a: logical screen descriptor (optional global color
    * table when `gct`), and per frame a graphic-control extension + image
    * descriptor + LZW sub-blocks, ending in the trailer.
    */
  def encodeGif(w: Int, h: Int, frames: Int,
      gct: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    out.write(le16(w)); out.write(le16(h))
    out.write(if (gct) 0x80 else 0x00) // GCT flag, size code 0 → 2 entries
    out.write(0); out.write(0)         // background, aspect
    if (gct) out.write(new Array[Byte](2 * 3))
    (0 until frames).foreach { _ =>
      out.write(0x21); out.write(0xf9) // graphic control extension
      out.write(4); out.write(new Array[Byte](4)); out.write(0)
      out.write(0x2c)                  // image descriptor
      out.write(le16(0)); out.write(le16(0))
      out.write(le16(w)); out.write(le16(h))
      out.write(0)                     // no local color table
      out.write(2)                     // LZW minimum code size
      out.write(3); out.write(new Array[Byte](3)); out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** doc_id → a real PNG / GIF payload (the second image-format tier;
    * animated when the id says so), parameters id-derived for the oracle.
    */
  def syntheticPayload2(id: Long): Array[Byte] = {
    val (w, h) = (16 + (id % 64).toInt, 16 + ((id * 3) % 64).toInt)
    if (id % 2 == 0) encodePng(w, h, 1 + (id % 4).toInt)
    else encodeGif(w, h, 1 + (id % 5).toInt)
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Column-expression metadata extraction — the whole-stage-codegen path
    * used when metadata is derivable without a codec (here: the FakeDecoder
    * arithmetic expressed as Catalyst expressions, byte-identical to it).
    */
  def imageMetaExpr(payloadCol: String): org.apache.spark.sql.Column = {
    val n = length(col(payloadCol))
    struct(
      (lit(64) + n % 512).cast("int").as("width"),
      (lit(64) + (n * 7) % 512).cast("int").as("height"),
      when(n % 3 === 0, "jpeg").when(n % 3 === 1, "png").otherwise("webp")
        .as("format"),
      (n / lit(100) + 1).cast("int").as("n_frames"))
  }

  /** mapPartitions decode path — the batch shape a real codec uses (one
    * decoder instance per partition, iterator-to-iterator, no collect).
    */
  def decodeBatch(df: DataFrame, idCol: String, payloadCol: String,
      decoder: MediaDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one decoder per partition; iterator stays lazy (no materialization)
        it.map { case (id, payload) =>
          val m = decoder.decode(payload)
          (id, m.width, m.height, m.format, m.nFrames)
        }
      }
      .toDF("id", "width", "height", "format", "n_frames")
  }

  /** Frame sampling: one output row per sampled frame index (every
    * `stride`-th frame), offset = frame * frameBytes — the explode shape a
    * video pipeline uses before per-frame feature extraction.
    */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
      stride: Int = 2, frameBytes: Int = 100): DataFrame =
    df.withColumn("meta", imageMetaExpr(payloadCol))
      .select(col(idCol), col("meta.n_frames").as("n_frames"),
        explode(expr(s"sequence(0, meta.n_frames - 1, $stride)"))
          .as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * frameBytes)
}
