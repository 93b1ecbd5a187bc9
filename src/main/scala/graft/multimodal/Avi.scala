package graft.multimodal

/** AVI / MJPEG video decode (pure JVM) — the tier that closes the video
  * seam for the one video codec a bare JVM CAN decode: Motion-JPEG, where
  * every frame is an ordinary baseline JPEG inside an AVI RIFF container.
  * The parse is the real thing — RIFF LIST recursion with even-byte
  * padding, the 56-byte `avih` main header, the `strl` stream pair
  * (`strh` 'vids'/'MJPG' with dwScale/dwRate timing, `strf`
  * BITMAPINFOHEADER), the `movi` data walk collecting every '00dc' video
  * chunk, and the trailing `idx1` index whose entries are verified
  * against the walk (a torn or lying index fails loudly instead of
  * mis-seeking). Frame extraction is a SEEK: `frame(k)` slices the k-th
  * chunk's bytes straight out of the container by its index offset — the
  * 100-TB sampling pattern where one frame of a long video is decoded
  * without touching the rest — and [[Jpeg.decode]] turns it into pixels.
  *
  * Format is the public Microsoft AVI RIFF specification (and OpenDML
  * conventions for idx1 offsets relative to the 'movi' fourcc); the JPEG
  * payloads are ITU-T T.81 baseline streams from the existing encoder.
  * Beyond-reference multimodal surface (SURVEY §5 scope).
  */
object Avi {

  /** Parsed container metadata. `frameOffsets(k)` is the ABSOLUTE byte
    * offset of frame k's chunk header in the payload; `frameSizes(k)` is
    * its unpadded data size.
    */
  final case class AviMeta(width: Int, height: Int, fps: Int, nFrames: Int,
      handler: String, frameOffsets: Array[Int], frameSizes: Array[Int])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    le16(b, o) | (le16(b, o + 2) << 16)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  def parse(p: Array[Byte]): AviMeta = {
    require(p.length > 24 && fourcc(p, 0) == "RIFF" &&
      fourcc(p, 8) == "AVI ", "not a RIFF/AVI container")
    var width = -1; var height = -1; var fps = -1; var totalFrames = -1
    var strhLength = -1; var handler = ""
    var moviFourccPos = -1
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    val sizes = scala.collection.mutable.ArrayBuffer[Int]()
    var idx1Checked = false

    // Walk one LIST body [from, to); `listType` names the enclosing list.
    def walk(from: Int, to: Int, listType: String): Unit = {
      var o = from
      while (o + 8 <= to) {
        val typ = fourcc(p, o)
        val len = le32(p, o + 4)
        // a length with the high bit set reads as a NEGATIVE Int, which
        // passes the overrun check below (o+8+len <= to holds) and can
        // stall the walk (len = -8 leaves o unchanged every iteration) —
        // reject it loudly before it is used as an advance
        require(len >= 0,
          s"torn AVI chunk '$typ' at offset $o: negative length $len")
        require(o + 8 + len <= to,
          s"torn AVI chunk '$typ' at offset $o: length $len overruns")
        val d = o + 8
        typ match {
          case "LIST" =>
            val lt = fourcc(p, d)
            if (lt == "movi") moviFourccPos = d
            walk(d + 4, d + len, lt)
          case "avih" =>
            require(len >= 56, "avih shorter than its 56-byte layout")
            totalFrames = le32(p, d + 16)
            width = le32(p, d + 32)
            height = le32(p, d + 36)
          case "strh" if listType == "strl" =>
            require(len >= 56, "strh shorter than its 56-byte layout")
            require(fourcc(p, d) == "vids",
              s"unsupported stream type '${fourcc(p, d)}'")
            handler = fourcc(p, d + 4)
            val scale = le32(p, d + 20)
            val rate = le32(p, d + 24)
            require(scale > 0, "strh dwScale must be positive")
            fps = rate / scale
            strhLength = le32(p, d + 32)
          case "strf" if listType == "strl" =>
            require(len >= 40, "strf shorter than BITMAPINFOHEADER")
            val bw = le32(p, d + 4)
            val bh = le32(p, d + 8)
            require(width < 0 || (bw == width && bh == height),
              s"strf dims ${bw}x$bh disagree with avih ${width}x$height")
          case "00dc" if listType == "movi" =>
            offsets += o
            sizes += len
          case "idx1" =>
            require(moviFourccPos >= 0, "idx1 before any movi list")
            val n = len / 16
            require(n == offsets.length,
              s"idx1 has $n entries but the movi walk found " +
                s"${offsets.length} video chunks")
            var i = 0
            while (i < n) {
              val e = d + i * 16
              require(fourcc(p, e) == "00dc",
                s"idx1 entry $i is '${fourcc(p, e)}', expected 00dc")
              val off = le32(p, e + 8)
              val sz = le32(p, e + 12)
              require(moviFourccPos + off == offsets(i),
                s"idx1 entry $i points at movi+$off but the walk found " +
                  s"the chunk at movi+${offsets(i) - moviFourccPos}")
              require(sz == sizes(i),
                s"idx1 entry $i size $sz != chunk size ${sizes(i)}")
              i += 1
            }
            idx1Checked = true
          case _ => // strn, JUNK, audio chunks ... skipped
        }
        o = d + len + (len & 1) // chunks pad to even
      }
    }

    walk(12, p.length, "AVI ")
    require(width > 0 && height > 0, "AVI without avih dimensions")
    require(offsets.nonEmpty, "AVI without video chunks")
    require(totalFrames == offsets.length,
      s"avih declares $totalFrames frames but movi holds ${offsets.length}")
    require(strhLength == offsets.length,
      s"strh dwLength $strhLength != ${offsets.length} video chunks")
    require(idx1Checked, "AVI without a verified idx1 index")
    AviMeta(width, height, fps, offsets.length, handler,
      offsets.toArray, sizes.toArray)
  }

  /** Seek to frame k and return its raw codec bytes (here: one baseline
    * JPEG) without touching any other chunk.
    */
  def frame(p: Array[Byte], meta: AviMeta, k: Int): Array[Byte] = {
    require(k >= 0 && k < meta.nFrames, s"frame $k of ${meta.nFrames}")
    java.util.Arrays.copyOfRange(p, meta.frameOffsets(k) + 8,
      meta.frameOffsets(k) + 8 + meta.frameSizes(k))
  }

  // -------------------------------------------------------------------
  // Encoder (fixture side)

  private def b32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def b16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] =
    typ.getBytes("US-ASCII") ++ b32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    "LIST".getBytes("US-ASCII") ++ b32(body.length + 4) ++
      listType.getBytes("US-ASCII") ++ body

  /** Assemble a spec-shaped MJPEG AVI: hdrl (avih + strl), movi with one
    * '00dc' chunk per frame, and an idx1 whose offsets are relative to
    * the 'movi' fourcc.
    */
  def encode(w: Int, h: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty)
    val avih = chunk("avih",
      b32(1000000 / fps) ++ b32(0) ++ b32(0) ++ b32(0) ++
        b32(frames.length) ++ b32(0) ++ b32(1) ++ b32(0) ++
        b32(w) ++ b32(h) ++ new Array[Byte](16))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        b32(0) ++ b16(0) ++ b16(0) ++ b32(0) ++
        b32(1) ++ b32(fps) ++ b32(0) ++ b32(frames.length) ++
        b32(frames.map(_.length).max) ++ b32(-1) ++ b32(0) ++
        b16(0) ++ b16(0) ++ b16(w) ++ b16(h))
    val strf = chunk("strf",
      b32(40) ++ b32(w) ++ b32(h) ++ b16(1) ++ b16(24) ++
        "MJPG".getBytes("US-ASCII") ++ b32(w * h * 3) ++
        new Array[Byte](16))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val moviChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", moviChunks.reduce(_ ++ _))
    // idx1 offsets are relative to the 'movi' fourcc, which sits 8 bytes
    // into the movi LIST; the first chunk header follows 4 bytes later.
    var off = 4
    val idxEntries = moviChunks.map { c =>
      val e = "00dc".getBytes("US-ASCII") ++ b32(0x10) ++ b32(off) ++
        b32(le32(c, 4))
      off += c.length
      e
    }
    val idx1 = chunk("idx1", idxEntries.reduce(_ ++ _))

    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ idx1
    "RIFF".getBytes("US-ASCII") ++ b32(body.length) ++ body
  }

  /** doc_id → a real MJPEG AVI whose frames are the deterministic DC-only
    * grayscale JPEGs of the [[Jpeg.fixturePayload]] family, seeded per
    * frame: frame f's block (bx, by) decodes to the flat value
    * 128 + 2·(((id + 31·f + 7·bx + 13·by) mod 64) − 32), so any sampled
    * frame's pixel sum has a closed form an oracle recomputes from
    * (doc_id, f) alone.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val w = 8 * (2 + (id % 5).toInt)
    val h = 8 * (2 + ((id * 3) % 4).toInt)
    val nf = 2 + (id % 4).toInt
    val fps = 10 + (id % 20).toInt
    val frames = (0 until nf).map { f =>
      Jpeg.encodeGray(w, h, Jpeg.QuantFlat16, (bx, by) => {
        val coef = new Array[Int](64)
        coef(0) = ((id + 31L * f + 7L * bx + 13L * by) % 64).toInt - 32
        coef
      })
    }
    encode(w, h, fps, frames)
  }
}
