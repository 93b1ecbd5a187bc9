package graft.multimodal

/** FLAC STREAMINFO extraction (pure JVM) — the lossless-audio member of
  * the container-metadata family (WAV is decoded fully, MP3 carries ID3
  * tags, FLAC fronts its stream with a bit-packed STREAMINFO block): the
  * "fLaC" magic, the metadata-block walk (1-bit last flag + 7-bit type +
  * 24-bit big-endian length), and STREAMINFO's dense bit layout —
  * 16+16-bit block sizes, 24+24-bit frame sizes, then a 64-bit field
  * packing sample rate (20 bits), channels-1 (3), bits-per-sample-1 (5)
  * and total samples (36). A VORBIS_COMMENT block en route exercises the
  * skip path; torn structures reject loudly. Audio SAMPLE decode (the
  * Rice-coded subframes) stays behind the documented seam — this is the
  * filter-before-decode pass, exactly like the WebP/MP4 tiers.
  *
  * Format is the public xiph.org FLAC specification. Beyond-reference
  * multimodal surface (SURVEY §5 scope).
  */
object Flac {

  final case class FlacMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, minBlock: Int, maxBlock: Int)

  private def be(b: Array[Byte], o: Int, n: Int): Long = {
    var v = 0L
    for (i <- 0 until n) v = (v << 8) | (b(o + i) & 0xff)
    v
  }

  def parse(p: Array[Byte]): FlacMeta = {
    require(p.length > 8 && new String(p, 0, 4, "US-ASCII") == "fLaC",
      "not a FLAC stream")
    var o = 4
    var meta: FlacMeta = null
    var last = false
    while (!last && o + 4 <= p.length) {
      val header = be(p, o, 4)
      last = (header >>> 31) == 1
      val typ = ((header >>> 24) & 0x7f).toInt
      val len = (header & 0xffffff).toInt
      require(o + 4 + len <= p.length,
        s"torn FLAC block type $typ: length $len overruns")
      if (typ == 0) { // STREAMINFO
        require(len == 34, s"STREAMINFO must be 34 bytes, got $len")
        val d = o + 4
        val minBlock = be(p, d, 2).toInt
        val maxBlock = be(p, d + 2, 2).toInt
        // 8 bytes at d+10: rate(20) | channels-1(3) | bps-1(5) | total(36)
        val packed = be(p, d + 10, 8)
        val rate = (packed >>> 44).toInt
        val channels = ((packed >>> 41) & 0x7).toInt + 1
        val bps = ((packed >>> 36) & 0x1f).toInt + 1
        val total = packed & 0xfffffffffL
        meta = FlacMeta(rate, channels, bps, total, minBlock, maxBlock)
      }
      o += 4 + len
    }
    require(meta != null, "FLAC without a STREAMINFO block")
    meta
  }

  // -------------------------------------------------------------------
  // Encoder (fixture side)

  private def beBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)

  /** doc_id → a FLAC header: STREAMINFO + a skippable VORBIS_COMMENT as
    * the LAST block, every field a closed form of the id.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val rate = 8000 + ((id % 6) * 8000).toInt // up to 48 kHz, 20 bits
    val channels = 1 + (id % 2).toInt
    val bps = 16 + ((id % 2) * 8).toInt // 16 or 24
    val total = 10000L + (id % 90000) * 7
    val minBlock = 1024; val maxBlock = 4096
    val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | total
    val streaminfo = beBytes(minBlock, 2) ++ beBytes(maxBlock, 2) ++
      beBytes(0, 3) ++ beBytes(0, 3) ++ beBytes(packed, 8) ++
      new Array[Byte](16) // MD5 of the raw audio, zeroed in the fixture
    val comment = s"graft=${id % 10}".getBytes("US-ASCII")
    "fLaC".getBytes("US-ASCII") ++
      beBytes(0x00, 1) ++ beBytes(34, 3) ++ streaminfo ++ // STREAMINFO
      beBytes(0x80L | 4L, 1) ++ beBytes(comment.length, 3) ++ comment
  }
}
