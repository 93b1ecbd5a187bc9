package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tar

/** POSIX ustar ingestion (operators.Tar): closed-form fixture parsing,
  * gzip/plain envelope equivalence, loud rejection of corrupted headers,
  * and a cross-validation of the encoder against the system GNU `tar`
  * binary (independent implementation, same bytes).
  */
class TarSpec extends AnyFunSuite {

  test("fixture family parses to the closed form") {
    for (id <- 0L until 9L) {
      val entries = Tar.parse(Tar.fixturePayload(id))
      assert(entries.head.typeflag == '5' &&
        entries.head.name == s"docs/$id/")
      val files = entries.filter(_.typeflag == '0')
      val n = 1 + (id % 4).toInt
      assert(files.size == n)
      files.zipWithIndex.foreach { case (e, i) =>
        assert(e.name == s"docs/$id/part-$i.txt")
        val expect = s"member-$id-$i-" + "y" * ((id * 5 + i) % 96).toInt
        assert(new String(e.bytes, "UTF-8") == expect,
          s"member $i of archive $id")
      }
    }
  }

  test("gzip and plain envelopes of the same members parse identically") {
    val entries = Seq(
      ("a/x.txt", '0', "hello tar".getBytes("UTF-8")),
      ("a/", '5', Array.empty[Byte]),
      ("a/y.txt", '0', Array.fill[Byte](513)('z'.toByte)))
    val plain = Tar.archive(entries)
    val gz = graft.operators.Warc.gunzipAll(plain) // passthrough, no magic
    assert(gz eq plain)
    // parse(plain) == parse(gzipped(plain)) member-for-member
    val a = Tar.parse(plain)
    val b = Tar.parse(TarSpecHelper.gzip(plain))
    assert(a.map(_.name) == b.map(_.name))
    assert(a.zip(b).forall { case (x, y) =>
      java.util.Arrays.equals(x.bytes, y.bytes) })
  }

  test("corrupted header checksum rejects loudly, naming the offset") {
    val bytes = Tar.archive(Seq(("f.txt", '0', "data".getBytes("UTF-8"))))
    bytes(0) = (bytes(0) + 1).toByte // flip a name byte: checksum now wrong
    val e = intercept[IllegalArgumentException](Tar.parse(bytes))
    assert(e.getMessage.contains("checksum"))
  }

  test("truncated member size overruns loudly") {
    val bytes = Tar.archive(Seq(("f.txt", '0',
      Array.fill[Byte](600)('q'.toByte))))
    val cut = java.util.Arrays.copyOf(bytes, 512 + 100)
    val e = intercept[IllegalArgumentException](Tar.parse(cut))
    assert(e.getMessage.contains("overruns"))
  }

  test("system tar lists and extracts our archives byte-for-byte") {
    val id = 3L // odd: plain .tar
    val tmp = java.nio.file.Files.createTempFile("graft-tar", ".tar")
    try {
      java.nio.file.Files.write(tmp, Tar.fixturePayload(id))
      def run(cmd: String*): String = {
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed:\n$out")
        out
      }
      val listed = run("tar", "-tf", tmp.toString)
        .linesIterator.toVector
      val parsed = Tar.parse(Tar.fixturePayload(id)).map(_.name)
      assert(listed == parsed, s"GNU tar sees $listed, we see $parsed")
      // extract one member to stdout and compare content exactly
      val content = run("tar", "-xOf", tmp.toString, s"docs/$id/part-0.txt")
      val ours = new String(Tar.parse(Tar.fixturePayload(id))
        .filter(_.typeflag == '0').head.bytes, "UTF-8")
      assert(content == ours)
      // and the gzipped variant through tar -z
      val idGz = 4L
      val tgz = java.nio.file.Files.createTempFile("graft-tar", ".tar.gz")
      try {
        java.nio.file.Files.write(tgz, Tar.fixturePayload(idGz))
        val gzListed = run("tar", "-tzf", tgz.toString).linesIterator.toVector
        assert(gzListed == Tar.parse(Tar.fixturePayload(idGz)).map(_.name))
      } finally java.nio.file.Files.deleteIfExists(tgz)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}

private object TarSpecHelper {
  /** Single-member gzip via the JDK stream (independent of Warc's raw
    * Deflater encoder, which the WARC fixtures already exercise).
    */
  def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }
}
