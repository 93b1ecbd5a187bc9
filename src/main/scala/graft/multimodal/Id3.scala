package graft.multimodal

/** ID3v2 tag extraction (pure JVM) — the audio modality's metadata layer
  * next to the WAV/PCM feature tiers: the provenance fields (title,
  * artist, album, track, declared duration) an audio-curation pass
  * filters and dedups on before any sample decode. The parse is the real
  * thing: the 10-byte header with its SYNCSAFE (7-bits-per-byte) tag
  * size, then the frame walk — and the v2.3/v2.4 split that trips real
  * parsers: v2.3 frame sizes are PLAIN big-endian 32-bit, v2.4 frame
  * sizes are syncsafe; the fixture family encodes both (even ids v2.3,
  * odd v2.4) so both size decoders run on every corpus. Text frames are
  * encoding-byte-prefixed ISO-8859-1; unknown frames are skipped by
  * size; torn tags reject loudly.
  *
  * Format is the public id3.org ID3v2.3/2.4 specification.
  * Beyond-reference multimodal surface (SURVEY §5 scope).
  */
object Id3 {

  final case class Id3Meta(version: Int, title: String, artist: String,
      album: String, track: Int, lengthMs: Long)

  private def syncsafe(b: Array[Byte], o: Int): Int =
    ((b(o) & 0x7f) << 21) | ((b(o + 1) & 0x7f) << 14) |
      ((b(o + 2) & 0x7f) << 7) | (b(o + 3) & 0x7f)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  def parse(p: Array[Byte]): Id3Meta = {
    require(p.length > 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3',
      "not an ID3v2 stream")
    val major = p(3) & 0xff
    require(major == 3 || major == 4, s"unsupported ID3v2.$major")
    val tagSize = syncsafe(p, 6) // tag size is syncsafe in BOTH versions
    val end = 10 + tagSize
    require(end <= p.length, s"torn ID3 tag: declares $tagSize past EOF")

    var title = ""; var artist = ""; var album = ""
    var track = 0; var lengthMs = 0L
    var o = 10
    while (o + 10 <= end && p(o) != 0) { // zero byte = padding start
      val id = new String(p, o, 4, "US-ASCII")
      val size = if (major == 4) syncsafe(p, o + 4) else be32(p, o + 4)
      // a v2.3 plain-be32 size with the high bit set reads as a NEGATIVE
      // Int, which passes the overrun check and moves the walk BACKWARD
      // (o += 10 + size) — reject it loudly instead of looping
      require(size >= 0,
        s"torn ID3 frame '$id': negative size $size")
      require(o + 10 + size <= end,
        s"torn ID3 frame '$id': size $size overruns the tag")
      def text: String = {
        require(size >= 1 && p(o + 10) == 0,
          s"frame '$id': only ISO-8859-1 text supported")
        new String(p, o + 11, size - 1, "ISO-8859-1")
      }
      id match {
        case "TIT2" => title = text
        case "TPE1" => artist = text
        case "TALB" => album = text
        case "TRCK" => track = text.toInt
        case "TLEN" => lengthMs = text.toLong
        case _ => // unknown frames skipped by size
      }
      o += 10 + size
    }
    require(title.nonEmpty, "ID3 tag without a TIT2 title frame")
    Id3Meta(major, title, artist, album, track, lengthMs)
  }

  // -------------------------------------------------------------------
  // Encoder (fixture side)

  private def ss4(v: Int): Array[Byte] = Array(
    ((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
    ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)

  private def b32(v: Int): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def frame(major: Int, id: String, value: String): Array[Byte] = {
    val body = Array(0.toByte) ++ value.getBytes("ISO-8859-1")
    id.getBytes("US-ASCII") ++
      (if (major == 4) ss4(body.length) else b32(body.length)) ++
      Array(0.toByte, 0.toByte) ++ body
  }

  /** doc_id → an ID3v2-tagged stream (even ids v2.3, odd v2.4) with
    * title/artist/album/track/length frames, an unknown frame the walk
    * must skip, trailing padding, and filler audio bytes after the tag —
    * every field a closed form of the id, mirrored by the oracle.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val major = if (id % 2 == 0) 3 else 4
    val frames =
      frame(major, "TIT2", s"Track ${id % 100}") ++
        frame(major, "TPE1", s"Artist ${id % 12}") ++
        frame(major, "TALB", s"Album ${id % 9}") ++
        frame(major, "TRCK", (1 + id % 20).toString) ++
        frame(major, "TLEN", (30000 + (id % 300) * 1000).toString) ++
        frame(major, "TXXX", s"custom ${id % 3}") // unknown: must skip
    val padding = new Array[Byte](8)
    val tag = frames ++ padding
    "ID3".getBytes("US-ASCII") ++
      Array(major.toByte, 0.toByte, 0.toByte) ++ ss4(tag.length) ++
      tag ++ Array.fill[Byte](16)(0x55)
  }
}
