package graft.operators

import java.util.zip.{CRC32, Deflater, GZIPInputStream}

/** WARC (ISO 28500) ingestion — the Common Crawl shape: a `.warc.gz`
  * file is a CONCATENATION of gzip members, one per WARC record; each
  * record is a version line + CRLF-terminated named headers + blank line
  * + a Content-Length-framed block, and a `response` record's block is a
  * full HTTP response whose payload starts after the HTTP header CRLFCRLF.
  * This is the canonical web-crawl ingestion step of an LLM data
  * pipeline: archive bytes in, one row per document out.
  *
  * The gzip layer uses the JDK inflater; multi-member concatenation is
  * handled natively (GZIPInputStream continues across member boundaries),
  * and WarcSpec pins that a member-per-record file and a single-member
  * file of the same records parse identically. The record walk itself is
  * pure framing arithmetic — Content-Length bytes, never a regex over the
  * payload — so a malformed length fails loudly instead of resyncing.
  *
  * Reference context: beyond-reference surface (the reference ingests
  * ticks, not crawls); format is the public ISO 28500 / Common Crawl
  * layout.
  */
object Warc {

  /** One parsed record. `status`/`payload` are filled for `response`
    * records (the HTTP block is parsed); other types carry the raw block.
    */
  final case class WarcRecord(warcType: String, targetUri: String,
      status: Int, payload: Array[Byte])

  private val Crlf = "\r\n"

  /** Decompress (multi-member) gzip if the magic matches, else pass
    * through — mirroring how a crawler handles both .warc and .warc.gz.
    */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f ||
      (bytes(1) & 0xff) != 0x8b) return bytes
    val in = new GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 1 << 16)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  def parse(fileBytes: Array[Byte]): Vector[WarcRecord] = {
    val b = gunzipAll(fileBytes)
    val out = Vector.newBuilder[WarcRecord]
    var o = 0
    while (o < b.length) {
      // skip inter-record CRLFs
      while (o + 1 < b.length && b(o) == '\r' && b(o + 1) == '\n') o += 2
      if (o >= b.length) return out.result()
      val headEnd = indexOfDoubleCrlf(b, o)
      require(headEnd >= 0, s"WARC record at $o without a header block")
      val head = new String(b, o, headEnd - o, "UTF-8")
      val lines = head.split(Crlf)
      require(lines.head.startsWith("WARC/"),
        s"expected a WARC version line at $o, got '${lines.head.take(20)}'")
      var typ = ""; var uri = ""; var len = -1L
      lines.tail.foreach { l =>
        val i = l.indexOf(':')
        if (i > 0) {
          val (k, v) = (l.substring(0, i).trim, l.substring(i + 1).trim)
          k.toLowerCase match {
            case "warc-type" => typ = v
            case "warc-target-uri" => uri = v
            case "content-length" => len = v.toLong
            case _ =>
          }
        }
      }
      require(len >= 0, s"WARC record at $o without Content-Length")
      val blockStart = headEnd + 4
      require(blockStart + len <= b.length,
        s"WARC Content-Length $len overruns the file at $o")
      val block = java.util.Arrays.copyOfRange(
        b, blockStart, blockStart + len.toInt)
      if (typ == "response") {
        val he = indexOfDoubleCrlf(block, 0)
        require(he >= 0, "HTTP response block without header terminator")
        val statusLine = new String(block, 0,
          block.indexWhere(_ == '\r'.toByte), "UTF-8")
        val status = statusLine.split(' ')(1).toInt
        out += WarcRecord(typ, uri, status,
          java.util.Arrays.copyOfRange(block, he + 4, block.length))
      } else out += WarcRecord(typ, uri, 0, block)
      o = blockStart + len.toInt
    }
    out.result()
  }

  private def indexOfDoubleCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  // -------------------------------------------------------------------
  // Deterministic fixture: a warcinfo record + N response records, ONE
  // GZIP MEMBER PER RECORD (the Common Crawl .warc.gz layout)

  private[operators] def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // 10-byte header: magic, deflate, no flags, zero mtime, OS=255
    out.write(Array(0x1f, 0x8b, 8, 0, 0, 0, 0, 0, 0, 255)
      .map(_.toByte), 0, 10)
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](1 << 16)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new CRC32(); crc.update(data)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(crc.getValue); le32(data.length.toLong)
    out.toByteArray
  }

  private def record(typ: String, uri: String,
      block: Array[Byte]): Array[Byte] = {
    val uriLine = if (uri.isEmpty) "" else s"WARC-Target-URI: $uri$Crlf"
    (s"WARC/1.0${Crlf}WARC-Type: $typ$Crlf$uriLine" +
      s"Content-Length: ${block.length}$Crlf$Crlf").getBytes("UTF-8") ++
      block ++ (Crlf + Crlf).getBytes("UTF-8")
  }

  private def httpResponse(status: Int, payload: String): Array[Byte] = {
    val reason = status match {
      case 200 => "OK"; case 301 => "Moved"; case _ => "NotFound"
    }
    (s"HTTP/1.1 $status $reason${Crlf}Content-Type: text/plain$Crlf$Crlf" +
      payload).getBytes("UTF-8")
  }

  /** Closed-form fixture mirrored by the DuckDB oracle: 1 + id % 3
    * response records behind a warcinfo, statuses cycling 200/301/404 by
    * (id + i) % 3, payload `payload-<id>-<i>-` plus (id·7 + i) % 64 'x's.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val n = 1 + (id % 3).toInt
    val members = Vector.newBuilder[Array[Byte]]
    members += gzipMember(record("warcinfo", "",
      s"software: graft-fixture$Crlf".getBytes("UTF-8")))
    (0 until n).foreach { i =>
      val status = Array(200, 301, 404)(((id + i) % 3).toInt)
      val payload = s"payload-$id-$i-" + "x" * ((id * 7 + i) % 64).toInt
      members += gzipMember(record("response",
        s"https://example.com/doc/$id/$i", httpResponse(status, payload)))
    }
    members.result().reduce(_ ++ _)
  }
}
