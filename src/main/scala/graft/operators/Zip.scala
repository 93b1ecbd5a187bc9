package graft.operators

import java.util.zip.{CRC32, ZipEntry, ZipInputStream, ZipOutputStream}

/** ZIP archive ingestion — the third archive envelope next to WARC and
  * tar: user uploads and dataset mirrors overwhelmingly ship as `.zip`.
  * Unlike tar, ZIP compresses per member, so a corpus bundle mixes
  * STORED and DEFLATED entries; both are exercised.
  *
  * Codec layer is the JDK's (ZipInputStream — the battle-tested inflate
  * path, like the PNG tier's zlib); what the engine adds is the pipeline
  * shape (archives parse independently per task, no shuffle before
  * aggregation), the deterministic fixture family, and the closed-form
  * audit the oracle replays. ZipSpec cross-validates the encoder against
  * the system `unzip` binary.
  */
object Zip {

  /** One parsed member: name, compression method ("stored"/"deflated"),
    * decompressed bytes.
    */
  final case class ZipMember(name: String, method: String,
      bytes: Array[Byte])

  def parse(fileBytes: Array[Byte]): Vector[ZipMember] = {
    val in = new ZipInputStream(new java.io.ByteArrayInputStream(fileBytes))
    val out = Vector.newBuilder[ZipMember]
    var e = in.getNextEntry
    while (e != null) {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](1 << 16)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      val method =
        if (e.getMethod == ZipEntry.STORED) "stored" else "deflated"
      out += ZipMember(e.getName, method, buf.toByteArray)
      e = in.getNextEntry
    }
    in.close()
    out.result()
  }

  /** Closed-form fixture mirrored by the DuckDB oracle: one STORED
    * manifest (`archive-<id>`) plus 1 + id % 5 DEFLATED members
    * `docs/<id>/part-<i>.txt` holding `zipmem-<id>-<i>-` and
    * (id·11 + i) % 80 'w's. Entry times are pinned so the bytes are
    * deterministic per JVM.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    val manifest = s"archive-$id".getBytes("UTF-8")
    val me = new ZipEntry("manifest.txt")
    me.setMethod(ZipEntry.STORED)
    me.setSize(manifest.length.toLong)
    val crc = new CRC32(); crc.update(manifest)
    me.setCrc(crc.getValue)
    me.setTime(0L)
    zos.putNextEntry(me)
    zos.write(manifest)
    zos.closeEntry()
    val n = 1 + (id % 5).toInt
    (0 until n).foreach { i =>
      val e = new ZipEntry(s"docs/$id/part-$i.txt")
      e.setTime(0L)
      zos.putNextEntry(e)
      zos.write((s"zipmem-$id-$i-" + "w" * ((id * 11 + i) % 80).toInt)
        .getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }
}
