package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ArrowIpc

/** Arrow IPC file decode (operators.ArrowIpc), cross-validated against
  * the INDEPENDENT arrow-vector implementation: foreign-origin fixture
  * files across single- and multi-batch layouts, every supported
  * column type with real nulls, and loud torn-file rejects.
  */
class ArrowIpcSpec extends AnyFunSuite {

  test("fixture family decodes to the closed form, single and " +
      "multi-batch") {
    for (id <- 0L until 18L) {
      val f = ArrowIpc.decode(ArrowIpc.fixturePayload(id))
      assert(f.fields.map(_.name) ==
        Seq("key", "n", "tag", "q", "flag", "opt"), s"id=$id names")
      assert(f.fields.map(_.typ) ==
        Seq("int64", "int32", "utf8", "float64", "bool", "int64"))
      assert(f.fields.last.nullable && !f.fields.head.nullable)
      assert(f.nBatches == (if (id % 3 == 1) 2 else 1), s"id=$id batches")
      assert(f.rows.length == ArrowIpc.fixtureRowCount(id), s"id=$id")
      f.rows.zipWithIndex.foreach { case (row, k) =>
        val (kk, nn, tt, qq, ff, oo) = ArrowIpc.fixtureRow(id, k)
        assert(row(0) == kk && row(1) == nn && row(2) == tt,
          s"id=$id k=$k")
        assert(row(3) == qq, s"id=$id k=$k q")
        assert(row(4) == ff, s"id=$id k=$k flag")
        assert(row(5) == oo.map(java.lang.Long.valueOf).orNull,
          s"id=$id k=$k opt")
      }
    }
  }

  test("every supported primitive width roundtrips through " +
      "arrow-vector bytes") {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      import org.apache.arrow.vector.types.pojo.{ArrowType, Field,
        FieldType, Schema}
      import scala.jdk.CollectionConverters._
      def f(name: String, t: ArrowType) =
        new Field(name, new FieldType(true, t, null), null)
      val schema = new Schema(List(
        f("i8", new ArrowType.Int(8, true)),
        f("i16", new ArrowType.Int(16, true)),
        f("f32", new ArrowType.FloatingPoint(
          org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE)))
        .asJava)
      val root = org.apache.arrow.vector.VectorSchemaRoot
        .create(schema, alloc)
      val bos = new java.io.ByteArrayOutputStream()
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(
        root, null, java.nio.channels.Channels.newChannel(bos))
      w.start()
      root.allocateNew()
      val i8 = root.getVector("i8")
        .asInstanceOf[org.apache.arrow.vector.TinyIntVector]
      val i16 = root.getVector("i16")
        .asInstanceOf[org.apache.arrow.vector.SmallIntVector]
      val f32 = root.getVector("f32")
        .asInstanceOf[org.apache.arrow.vector.Float4Vector]
      val rnd = new scala.util.Random(47)
      val vals = (0 until 300).map { i =>
        (rnd.nextInt(256).toByte, rnd.nextInt(65536).toShort,
          rnd.nextFloat())
      }
      vals.zipWithIndex.foreach { case ((a, b, c), i) =>
        if (i % 5 == 0) { i8.setNull(i); i16.setNull(i); f32.setNull(i) }
        else { i8.setSafe(i, a); i16.setSafe(i, b); f32.setSafe(i, c) }
      }
      root.setRowCount(300)
      w.writeBatch()
      w.end(); w.close(); root.close()
      val dec = ArrowIpc.decode(bos.toByteArray)
      assert(dec.fields.map(_.typ) == Seq("int8", "int16", "float32"))
      dec.rows.zip(vals).zipWithIndex.foreach {
        case ((row, (a, b, c)), i) =>
          if (i % 5 == 0)
            assert(row(0) == null && row(1) == null && row(2) == null)
          else {
            assert(row(0) == a && row(1) == b, s"i=$i ints")
            assert(row(2) == c, s"i=$i float")
          }
      }
    } finally alloc.close()
  }

  test("torn files and out-of-scope shapes reject loudly") {
    val notArrow = intercept[IllegalArgumentException](
      ArrowIpc.decode("ARROW2 is not a thing, sorry....."
        .getBytes("US-ASCII")))
    assert(notArrow.getMessage.contains("ARROW1"), notArrow.getMessage)
    val good = ArrowIpc.fixturePayload(2L)
    // truncation (keeping the tail magic would still tear the blocks)
    intercept[IllegalArgumentException](
      ArrowIpc.decode(good.take(good.length / 3)))
    // clobber the footer length
    val bad = good.clone()
    bad(bad.length - 10) = 0x7f
    intercept[IllegalArgumentException](ArrowIpc.decode(bad))
  }
}
