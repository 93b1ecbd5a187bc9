package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Warc

/** WARC / .warc.gz ingestion (operators.Warc): the Common Crawl layout —
  * one gzip member per record — must parse identically to a single-member
  * gzip and to the uncompressed bytes; record framing is Content-Length
  * arithmetic; HTTP payload extraction skips exactly the response
  * headers; malformed framing rejects loudly.
  */
class WarcSpec extends AnyFunSuite {

  test("fixture family parses to the closed form") {
    for (id <- 0L until 9L) {
      val recs = Warc.parse(Warc.fixturePayload(id))
      assert(recs.head.warcType == "warcinfo", "leading warcinfo record")
      val resp = recs.filter(_.warcType == "response")
      val n = 1 + (id % 3).toInt
      assert(resp.size == n)
      resp.zipWithIndex.foreach { case (r, i) =>
        assert(r.targetUri == s"https://example.com/doc/$id/$i")
        assert(r.status == Array(200, 301, 404)(((id + i) % 3).toInt))
        val expect = s"payload-$id-$i-" + "x" * ((id * 7 + i) % 64).toInt
        assert(new String(r.payload, "UTF-8") == expect,
          s"id=$id record $i payload")
      }
    }
  }

  test("member-per-record, single-member, and plain bytes parse alike") {
    val id = 7L
    val perRecord = Warc.fixturePayload(id)
    val plain = Warc.gunzipAll(perRecord)
    def render(v: Vector[Warc.WarcRecord]) =
      v.map(r => (r.warcType, r.targetUri, r.status,
        new String(r.payload, "UTF-8")))
    val fromMembers = render(Warc.parse(perRecord))
    val fromPlain = render(Warc.parse(plain))
    // re-gzip the WHOLE decompressed stream as one member
    val single = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(plain); g.close()
      bos.toByteArray
    }
    val fromSingle = render(Warc.parse(single))
    assert(fromMembers == fromPlain && fromPlain == fromSingle,
      "gzip framing must be transparent to record parsing")
  }

  test("malformed framing rejects loudly") {
    val noVersion = "NOPE/1.0\r\nContent-Length: 0\r\n\r\n"
      .getBytes("UTF-8")
    val e1 = intercept[IllegalArgumentException](Warc.parse(noVersion))
    assert(e1.getMessage.contains("version"))
    val overrun = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "Content-Length: 999\r\n\r\nshort").getBytes("UTF-8")
    val e2 = intercept[IllegalArgumentException](Warc.parse(overrun))
    assert(e2.getMessage.contains("overruns"))
    val noLen = "WARC/1.0\r\nWARC-Type: resource\r\n\r\nbody"
      .getBytes("UTF-8")
    val e3 = intercept[IllegalArgumentException](Warc.parse(noLen))
    assert(e3.getMessage.contains("Content-Length"))
  }
}
