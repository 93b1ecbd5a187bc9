package graft.multimodal

/** Real MP4 / ISO-BMFF container parsing (pure JVM) — the video-modality
  * metadata tier: a genuine box walker (32-bit and 64-bit `largesize`
  * boxes, nested containers moov/trak/mdia/minf/stbl), mvhd version 0 AND
  * 1 time fields, tkhd 16.16 fixed-point dimensions, the stsd sample
  * entry's codec fourcc, and the stsz sample-size table — read in full,
  * so frame count AND total sample bytes come from the index, the way a
  * 100-TB video sampler seeks frames without touching `mdat` (the same
  * byte-offset-index story as the GIF frame index, mm_gif_frames).
  *
  * PIXEL decode of video codecs is genuinely out of JVM scope and stays
  * behind the documented NotImplementedDecoder seam; the container layer
  * — everything a pipeline needs for sampling, stats, and pushdown — is
  * real and closed-form tested.
  *
  * Reference context: the reference stores no binary media; beyond-
  * reference multimodal surface (SURVEY §5 scope).
  */
object Mp4 {

  final case class Mp4Meta(brand: String, codec: String, width: Int,
      height: Int, durationMs: Long, nSamples: Int, totalBytes: Long)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Walk the sibling boxes in [from, to), invoking `f(type, payloadFrom,
    * payloadTo)`; handles 64-bit largesize (size == 1) boxes.
    */
  private def walk(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var o = from
    while (o + 8 <= to) {
      val size32 = be32(b, o)
      val typ = fourcc(b, o + 4)
      val (payload, end) =
        if (size32 == 1) (o + 16, o + be64(b, o + 8).toInt)
        else if (size32 == 0) (o + 8, to) // box extends to EOF
        else (o + 8, o + size32.toInt)
      require(end <= to && end > o, s"malformed MP4 box $typ at $o")
      f(typ, payload, end)
      o = end
    }
  }

  def parse(p: Array[Byte]): Mp4Meta = Torn.guard("MP4") {
    require(p.length >= 12 && fourcc(p, 4) == "ftyp",
      "not an MP4: no leading ftyp box")
    var brand = ""
    var codec = ""
    var width, height = -1
    var durationMs = -1L
    var nSamples = -1
    var totalBytes = -1L
    var timescale = 0L

    def stbl(from: Int, to: Int): Unit =
      walk(p, from, to) {
        case ("stsd", o, _) =>
          // version+flags, entry_count, then the first sample entry:
          // size(4) + format fourcc(4)
          codec = fourcc(p, o + 12)
        case ("stsz", o, _) =>
          val sampleSize = be32(p, o + 4)
          val count = be32(p, o + 8).toInt
          nSamples = count
          totalBytes =
            if (sampleSize != 0) sampleSize * count
            else (0 until count).map(i => be32(p, o + 12 + 4 * i)).sum
        case _ =>
      }

    def minf(from: Int, to: Int): Unit =
      walk(p, from, to) {
        case ("stbl", o, e) => stbl(o, e)
        case _ =>
      }

    def mdia(from: Int, to: Int): Unit =
      walk(p, from, to) {
        case ("minf", o, e) => minf(o, e)
        case _ =>
      }

    def trak(from: Int, to: Int): Unit =
      walk(p, from, to) {
        case ("tkhd", o, _) =>
          val ver = p(o) & 0xff
          // width/height close the box as 16.16 fixed-point: v0 after
          // 4 (FullBox) + 20 (times/id/duration) + 16 (layer block)
          // + 36 (matrix) = 76; v1's 64-bit times add 12
          val base = if (ver == 1) o + 88 else o + 76
          width = (be32(p, base) >> 16).toInt
          height = (be32(p, base + 4) >> 16).toInt
        case ("mdia", o, e) => mdia(o, e)
        case _ =>
      }

    walk(p, 0, p.length) {
      case ("ftyp", o, _) => brand = fourcc(p, o)
      case ("moov", o, e) =>
        walk(p, o, e) {
          case ("mvhd", mo, _) =>
            val ver = p(mo) & 0xff
            if (ver == 1) {
              timescale = be32(p, mo + 20)
              val dur = be64(p, mo + 24)
              durationMs = dur * 1000 / timescale
            } else {
              timescale = be32(p, mo + 12)
              val dur = be32(p, mo + 16)
              durationMs = dur * 1000 / timescale
            }
          case ("trak", to_, te) => trak(to_, te)
          case _ =>
        }
      case _ => // mdat, free, ... skipped — metadata never touches them
    }
    require(nSamples >= 0 && width >= 0 && durationMs >= 0,
      "MP4 missing moov/trak/stbl structure")
    Mp4Meta(brand, codec, width, height, durationMs, nSamples, totalBytes)
  }

  // -------------------------------------------------------------------
  // Deterministic fixture builder (a REAL box tree; mdat payload fake)

  private def box(typ: String, payload: Array[Byte],
      large: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    if (large) {
      w32(1)
      out.write(typ.getBytes("US-ASCII"))
      val sz = 16L + payload.length
      w32(sz >>> 32); w32(sz & 0xffffffffL)
    } else {
      w32(8L + payload.length)
      out.write(typ.getBytes("US-ASCII"))
    }
    out.write(payload)
    out.toByteArray
  }

  private def b32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def b64(v: Long): Array[Byte] = b32(v >>> 32) ++ b32(v)

  /** Closed-form fixture: id drives brand, codec, dims, duration, the
    * mvhd/tkhd VERSION (odd ids use the 64-bit v1 layout — both parser
    * paths exercised), and the per-sample size table.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val v1 = id % 2 == 1
    val w = 160 + (id % 8).toInt * 16
    val h = 90 + (id % 6).toInt * 18
    val durMs = 1000 + (id % 9000)
    val n = 10 + (id % 50).toInt
    val sizes = Array.tabulate(n)(i => 100L + (i + id) % 32)
    val brand = if (id % 3 == 0) "isom" else "mp42"
    val codecS = if (id % 2 == 0) "avc1" else "hev1"

    val ftyp = box("ftyp",
      brand.getBytes("US-ASCII") ++ b32(0) ++ "isom".getBytes("US-ASCII"))
    val mvhd =
      if (v1) box("mvhd", Array[Byte](1, 0, 0, 0) ++ b64(0) ++ b64(0) ++
        b32(1000) ++ b64(durMs) ++ new Array[Byte](80))
      else box("mvhd", Array[Byte](0, 0, 0, 0) ++ b32(0) ++ b32(0) ++
        b32(1000) ++ b32(durMs) ++ new Array[Byte](80))
    val tkhd = // spec sizes: v0 payload 84 (box 92), v1 payload 96 (104)
      if (v1) box("tkhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](84) ++
        b32(w.toLong << 16) ++ b32(h.toLong << 16))
      else box("tkhd", Array[Byte](0, 0, 0, 0) ++ new Array[Byte](72) ++
        b32(w.toLong << 16) ++ b32(h.toLong << 16))
    val stsd = box("stsd", b32(0) ++ b32(1) ++
      box(codecS, new Array[Byte](70)))
    val stsz = box("stsz", b32(0) ++ b32(0) ++ b32(n) ++
      sizes.flatMap(b32))
    val stbl = box("stbl", stsd ++ stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    // a largesize mdat exercises the 64-bit box-size path on every file
    val mdat = box("mdat", new Array[Byte](16), large = true)
    ftyp ++ moov ++ mdat
  }
}
