package graft.multimodal

/** WebP container metadata (pure JVM) — the third web-image format next
  * to the JPEG/PNG/GIF pixel tiers: a real RIFF chunk walk (little-endian
  * sizes, even-byte padding) covering all three bitstream variants —
  * "VP8 " lossy (frame-tag start code + 14-bit dims), "VP8L" lossless
  * (0x2f signature + LSB-packed 14-bit width-1/height-1 + alpha bit) and
  * "VP8X" extended (24-bit LE canvas-1 dims, feature flags, ANIM/ANMF
  * animation frames counted by the chunk walk). Pixel decode of the VP8
  * entropy-coded payloads is genuinely out of JVM scope and stays behind
  * the documented seam — this layer is the sniff/dims/frames metadata a
  * curation pipeline filters on before any decode.
  *
  * Format is the public WebP container/bitstream spec; beyond-reference
  * multimodal surface (SURVEY §5 scope).
  */
object Webp {

  final case class WebpMeta(variant: String, width: Int, height: Int,
      hasAlpha: Boolean, nFrames: Int)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le24(b: Array[Byte], o: Int): Int =
    le16(b, o) | ((b(o + 2) & 0xff) << 16)

  private def le32(b: Array[Byte], o: Int): Long =
    (le16(b, o) & 0xffffL) | ((le16(b, o + 2) & 0xffffL) << 16)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  def parse(p: Array[Byte]): WebpMeta = Torn.guard("WEBP") {
    require(p.length > 20 && fourcc(p, 0) == "RIFF" &&
      fourcc(p, 8) == "WEBP", "not a RIFF/WEBP container")
    var o = 12
    var meta: WebpMeta = null
    var frames = 0
    while (o + 8 <= p.length) {
      val typ = fourcc(p, o)
      val len = le32(p, o + 4).toInt
      val d = o + 8
      typ match {
        case "VP8 " =>
          // 3-byte frame tag, then the 0x9d 0x01 0x2a start code
          require((p(d + 3) & 0xff) == 0x9d && (p(d + 4) & 0xff) == 0x01 &&
            (p(d + 5) & 0xff) == 0x2a, "VP8 frame without start code")
          val w = le16(p, d + 6) & 0x3fff
          val h = le16(p, d + 8) & 0x3fff
          if (meta == null) meta = WebpMeta("vp8", w, h, hasAlpha = false, 1)
        case "VP8L" =>
          require((p(d) & 0xff) == 0x2f, "VP8L without its 0x2f signature")
          val bits = le32(p, d + 1)
          val w = 1 + (bits & 0x3fff).toInt
          val h = 1 + ((bits >> 14) & 0x3fff).toInt
          val alpha = ((bits >> 28) & 1) == 1
          if (meta == null) meta = WebpMeta("vp8l", w, h, alpha, 1)
        case "VP8X" =>
          val flags = p(d) & 0xff
          val w = 1 + le24(p, d + 4)
          val h = 1 + le24(p, d + 7)
          meta = WebpMeta("vp8x", w, h, (flags & 0x10) != 0, 0)
        case "ANMF" => frames += 1
        case _ => // ANIM params, ICCP, EXIF, XMP ... skipped
      }
      o = d + len + (len & 1) // chunks pad to even
    }
    require(meta != null, "WEBP without a recognized bitstream chunk")
    if (meta.variant == "vp8x")
      meta.copy(nFrames = if (frames > 0) frames else 1)
    else meta
  }

  // -------------------------------------------------------------------
  // Deterministic fixture

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val head = typ.getBytes("US-ASCII") ++ Array(
      (data.length & 0xff).toByte, ((data.length >> 8) & 0xff).toByte,
      ((data.length >> 16) & 0xff).toByte,
      ((data.length >> 24) & 0xff).toByte)
    head ++ data ++ (if (data.length % 2 == 1) Array(0.toByte)
                     else Array.emptyByteArray)
  }

  private def riff(chunks: Array[Byte]): Array[Byte] = {
    val size = chunks.length + 4
    "RIFF".getBytes("US-ASCII") ++ Array(
      (size & 0xff).toByte, ((size >> 8) & 0xff).toByte,
      ((size >> 16) & 0xff).toByte, ((size >> 24) & 0xff).toByte) ++
      "WEBP".getBytes("US-ASCII") ++ chunks
  }

  /** id-derived variant/dims/alpha/frames, mirrored by the oracle. */
  def fixturePayload(id: Long): Array[Byte] = {
    val w = 32 + (id % 300).toInt
    val h = 24 + ((id * 3) % 200).toInt
    id % 3 match {
      case 0 => // lossy VP8: frame tag + start code + 14-bit dims
        val data = Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++
          Array((w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
            (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte) ++
          new Array[Byte](8)
        riff(chunk("VP8 ", data))
      case 1 => // lossless VP8L: 0x2f + packed width-1/height-1/alpha
        val alpha = id % 2 == 1
        val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
          ((if (alpha) 1L else 0L) << 28)
        val data = Array(0x2f.toByte) ++ Array(
          (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
          ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte) ++
          new Array[Byte](6)
        riff(chunk("VP8L", data))
      case _ => // extended VP8X with an animation
        val nf = 1 + (id % 4).toInt
        val alpha = id % 2 == 0
        val flags = (if (alpha) 0x10 else 0) | 0x02 // animation bit
        val vp8x = chunk("VP8X", Array[Byte](flags.toByte, 0, 0, 0) ++ Array(
          ((w - 1) & 0xff).toByte, (((w - 1) >> 8) & 0xff).toByte,
          (((w - 1) >> 16) & 0xff).toByte,
          ((h - 1) & 0xff).toByte, (((h - 1) >> 8) & 0xff).toByte,
          (((h - 1) >> 16) & 0xff).toByte))
        val anim = chunk("ANIM", new Array[Byte](6))
        val anmfs = (0 until nf).map(i =>
          chunk("ANMF", new Array[Byte](16 + (i % 3))))
          .reduce(_ ++ _)
        riff(vp8x ++ anim ++ anmfs)
    }
  }
}
