package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Zip

/** ZIP ingestion (operators.Zip): closed-form fixture parsing with both
  * compression methods, and a cross-validation against the system
  * `unzip` binary (independent implementation, same bytes).
  */
class ZipSpec extends AnyFunSuite {

  test("fixture family parses to the closed form, methods preserved") {
    for (id <- 0L until 10L) {
      val members = Zip.parse(Zip.fixturePayload(id))
      assert(members.head.name == "manifest.txt")
      assert(members.head.method == "stored")
      assert(new String(members.head.bytes, "UTF-8") == s"archive-$id")
      val files = members.tail
      val n = 1 + (id % 5).toInt
      assert(files.size == n)
      files.zipWithIndex.foreach { case (m, i) =>
        assert(m.name == s"docs/$id/part-$i.txt")
        assert(m.method == "deflated")
        val expect = s"zipmem-$id-$i-" + "w" * ((id * 11 + i) % 80).toInt
        assert(new String(m.bytes, "UTF-8") == expect)
      }
    }
  }

  test("system unzip lists and extracts our archives byte-for-byte") {
    val id = 7L
    val tmp = java.nio.file.Files.createTempFile("graft-zip", ".zip")
    try {
      java.nio.file.Files.write(tmp, Zip.fixturePayload(id))
      def run(cmd: String*): String = {
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed:\n$out")
        out
      }
      // zipinfo -1: bare member names, archive order
      val listed = run("zipinfo", "-1", tmp.toString).linesIterator.toVector
      val parsed = Zip.parse(Zip.fixturePayload(id)).map(_.name)
      assert(listed == parsed, s"unzip sees $listed, we see $parsed")
      val content = run("unzip", "-p", tmp.toString, s"docs/$id/part-0.txt")
      val ours = new String(Zip.parse(Zip.fixturePayload(id))
        .find(_.name == s"docs/$id/part-0.txt").get.bytes, "UTF-8")
      assert(content == ours)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}
