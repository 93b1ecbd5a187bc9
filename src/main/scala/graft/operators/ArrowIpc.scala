package graft.operators

/** Arrow IPC FILE reader from scratch (pure JVM) — the interchange
  * format ML data pipelines hand tensors and tables around in (the
  * "feather v2" shape), decoded without arrow-vector: the FLATBUFFERS
  * wire format itself (soffset→vtable indirection, u16 slot tables,
  * uoffset vectors/strings, inline structs, unions), the Arrow file
  * framing (ARROW1 magics, the trailing Footer flatbuffer with its
  * Block index), the encapsulated message stream (0xFFFFFFFF
  * continuation + metadata length + Message flatbuffer + 8-aligned
  * body), and the columnar data layer — validity bitmaps, primitive
  * data buffers, UTF-8 offset+data buffers — for int8..64, float32/64,
  * bool and utf8 columns of a flat schema. Dictionaries, compression
  * and nested types reject loudly by name.
  *
  * The point at 100 TB: Arrow IPC is an mmap-friendly format whose
  * Footer lets a reader target one record batch of one column without
  * touching the rest — the same footer-first planning lever as the
  * [[ParquetFooter]]/[[OrcMeta]] tiers, for the format training
  * loaders actually exchange.
  *
  * Cross-validated in ArrowIpcSpec against the INDEPENDENT
  * arrow-vector implementation on Spark's classpath (fixtures are
  * arrow-vector-WRITTEN — foreign-origin bytes, like the [[Bzip2]] and
  * [[Xz]] tiers). Format is the public Apache Arrow columnar spec +
  * flatbuffers internals.
  */
object ArrowIpc {

  final case class ArrowField(name: String, typ: String,
      nullable: Boolean)

  final case class ArrowFile(fields: Seq[ArrowField], nBatches: Int,
      rows: Seq[Seq[Any]]) // null for null cells

  // -------------------------------------------------------------------
  // little-endian primitives + flatbuffers access

  private final class Buf(val p: Array[Byte]) {
    def u8(o: Int): Int = { check(o, 1); p(o) & 0xff }
    def u16(o: Int): Int = { check(o, 2)
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) }
    def i32(o: Int): Int = { check(o, 4);
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
        ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24) }
    def i64(o: Int): Long = { check(o, 8)
      var v = 0L
      var i = 0
      while (i < 8) { v |= (p(o + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    private def check(o: Int, n: Int): Unit =
      require(o >= 0 && o + n <= p.length,
        s"torn arrow: read [$o,${o + n}) of ${p.length}")
    // flatbuffers table field: slot -> absolute position, -1 if absent
    def field(table: Int, slot: Int): Int = {
      val vt = table - i32(table) // soffset, signed
      val vtSize = u16(vt)
      val slotOff = 4 + 2 * slot
      if (slotOff + 2 > vtSize) -1
      else {
        val off = u16(vt + slotOff)
        if (off == 0) -1 else table + off
      }
    }
    def indirect(pos: Int): Int = pos + i32(pos) // uoffset
    def str(pos: Int): String = {
      val t = indirect(pos)
      val n = i32(t)
      require(n >= 0 && t + 4 + n <= p.length, "torn arrow: string")
      new String(p, t + 4, n, "UTF-8")
    }
    def vectorLen(pos: Int): Int = i32(indirect(pos))
    def vectorBase(pos: Int): Int = indirect(pos) + 4
  }

  // -------------------------------------------------------------------

  private def parseFieldType(b: Buf, fieldTable: Int): String = {
    val typeType = {
      val pos = b.field(fieldTable, 2) // type_type union byte
      if (pos < 0) 0 else b.u8(pos)
    }
    val typePos = b.field(fieldTable, 3)
    typeType match {
      case 2 => // Int table: bitWidth slot 0, is_signed slot 1
        require(typePos >= 0, "torn arrow: Int field without type table")
        val t = b.indirect(typePos)
        val bwPos = b.field(t, 0)
        val bw = if (bwPos < 0) 0 else b.i32(bwPos)
        val sgPos = b.field(t, 1)
        val signed = sgPos >= 0 && b.u8(sgPos) != 0
        require(Set(8, 16, 32, 64).contains(bw) && signed,
          s"arrow int width $bw signed=$signed unsupported")
        s"int$bw"
      case 3 => // FloatingPoint: precision slot 0 (1=single, 2=double)
        require(typePos >= 0, "torn arrow: FP field without type table")
        val t = b.indirect(typePos)
        val prPos = b.field(t, 0)
        val pr = if (prPos < 0) 0 else b.u16(prPos)
        require(pr == 1 || pr == 2, s"arrow FP precision $pr unsupported")
        if (pr == 1) "float32" else "float64"
      case 5 => "utf8"
      case 6 => "bool"
      case t => throw new IllegalArgumentException(
        s"arrow type union value $t unsupported " +
          "(flat int/float/utf8/bool schema scope)")
    }
  }

  def decode(p: Array[Byte]): ArrowFile =
    graft.multimodal.Torn.guard("ARROW")(decodeImpl(p))

  private def decodeImpl(p: Array[Byte]): ArrowFile = {
    val b = new Buf(p)
    require(p.length > 24 &&
      new String(p, 0, 6, "US-ASCII") == "ARROW1" &&
      new String(p, p.length - 6, 6, "US-ASCII") == "ARROW1",
      "not an arrow IPC file (ARROW1 magics)")
    val footerLen = b.i32(p.length - 10)
    require(footerLen > 0 && footerLen < p.length - 18,
      s"torn arrow: footer length $footerLen")
    val footerStart = p.length - 10 - footerLen
    val footer = footerStart + b.i32(footerStart) // root table uoffset
    // Footer: version 0, schema 1, dictionaries 2, recordBatches 3
    val dictPos = b.field(footer, 2)
    require(dictPos < 0 || b.vectorLen(dictPos) == 0,
      "arrow dictionary batches unsupported (flat schema scope)")
    val schemaPos = b.field(footer, 1)
    require(schemaPos >= 0, "torn arrow: footer without a schema")
    val schema = b.indirect(schemaPos)
    val fieldsPos = b.field(schema, 1)
    require(fieldsPos >= 0, "torn arrow: schema without fields")
    val nFields = b.vectorLen(fieldsPos)
    val fieldsBase = b.vectorBase(fieldsPos)
    val fields = (0 until nFields).map { i =>
      val ft = b.indirect(fieldsBase + 4 * i)
      val namePos = b.field(ft, 0)
      val name = if (namePos < 0) "" else b.str(namePos)
      val nullPos = b.field(ft, 1)
      val nullable = nullPos >= 0 && b.u8(nullPos) != 0
      val children = b.field(ft, 5)
      require(children < 0 || b.vectorLen(children) == 0,
        s"arrow nested field '$name' unsupported (flat schema scope)")
      ArrowField(name, parseFieldType(b, ft), nullable)
    }
    val batchesPos = b.field(footer, 3)
    val nBatches = if (batchesPos < 0) 0 else b.vectorLen(batchesPos)
    val batchesBase = if (batchesPos < 0) 0 else b.vectorBase(batchesPos)
    val rows = Vector.newBuilder[Seq[Any]]
    for (bi <- 0 until nBatches) {
      // Block struct: offset i64, metaDataLength i32 (+pad), bodyLength
      val block = batchesBase + 24 * bi
      val off = b.i64(block)
      val metaLen = b.i32(block + 8)
      val bodyLen = b.i64(block + 16)
      require(off >= 0 && off + metaLen + bodyLen <= p.length,
        s"torn arrow: block $bi overruns the file")
      var mo = off.toInt
      require(b.i32(mo) == -1, // 0xFFFFFFFF continuation marker
        "torn arrow: message without a continuation marker")
      val msgLen = b.i32(mo + 4)
      require(msgLen > 0 && mo + 8 + msgLen <= p.length,
        "torn arrow: message length")
      val msg = mo + 8 + b.i32(mo + 8)
      // Message: version 0, header_type 1, header 2, bodyLength 3
      val htPos = b.field(msg, 1)
      val headerType = if (htPos < 0) 0 else b.u8(htPos)
      require(headerType == 3,
        s"arrow message header type $headerType (expected RecordBatch)")
      val rbPos = b.field(msg, 2)
      require(rbPos >= 0, "torn arrow: message without a RecordBatch")
      val rb = b.indirect(rbPos)
      // RecordBatch: length 0, nodes 1, buffers 2, compression 3
      require(b.field(rb, 3) < 0,
        "arrow body compression unsupported (plain buffers scope)")
      val lenPos = b.field(rb, 0)
      val nRows = if (lenPos < 0) 0L else b.i64(lenPos)
      val nodesPos = b.field(rb, 1)
      val buffersPos = b.field(rb, 2)
      require(nodesPos >= 0 && buffersPos >= 0,
        "torn arrow: RecordBatch without nodes/buffers")
      require(b.vectorLen(nodesPos) == nFields,
        "arrow node count != field count (flat schema scope)")
      val bufsBase = b.vectorBase(buffersPos)
      val nBufs = b.vectorLen(buffersPos)
      // Block.metaDataLength covers prefix + flatbuffer + padding, so
      // the body begins exactly metaLen bytes into the block
      val body = (off + metaLen).toInt
      // walk buffers per field: validity + data (+offsets for utf8)
      var bufIdx = 0
      def nextBuf(): (Long, Long) = {
        require(bufIdx < nBufs, "torn arrow: ran out of buffers")
        val s = bufsBase + 16 * bufIdx
        bufIdx += 1
        (b.i64(s), b.i64(s + 8))
      }
      val cols = fields.map { f =>
        val (vOff, vLen) = nextBuf()
        def validAt(i: Long): Boolean =
          vLen == 0 || {
            val byte = b.u8((body + vOff + (i >> 3)).toInt)
            ((byte >> (i & 7).toInt) & 1) != 0
          }
        f.typ match {
          case "utf8" =>
            val (oOff, _) = nextBuf()
            val (dOff, _) = nextBuf()
            (0L until nRows).map { i =>
              if (!validAt(i)) null
              else {
                val s = b.i32((body + oOff + 4 * i).toInt)
                val e = b.i32((body + oOff + 4 * (i + 1)).toInt)
                require(s >= 0 && e >= s &&
                  body + dOff + e <= p.length.toLong,
                  "torn arrow: utf8 offsets out of range")
                new String(p, (body + dOff + s).toInt, e - s, "UTF-8")
              }
            }
          case "bool" =>
            val (dOff, _) = nextBuf()
            (0L until nRows).map { i =>
              if (!validAt(i)) null
              else {
                val byte = b.u8((body + dOff + (i >> 3)).toInt)
                java.lang.Boolean.valueOf(((byte >> (i & 7).toInt) & 1) != 0)
              }
            }
          case t =>
            val (dOff, _) = nextBuf()
            val width = t match {
              case "int8" => 1
              case "int16" => 2
              case "int32" | "float32" => 4
              case _ => 8
            }
            (0L until nRows).map { i =>
              if (!validAt(i)) null
              else {
                val at = (body + dOff + width * i).toInt
                t match {
                  case "int8" => java.lang.Byte.valueOf(b.p(at))
                  case "int16" => java.lang.Short.valueOf(
                    (b.u16(at) << 16 >> 16).toShort)
                  case "int32" => java.lang.Integer.valueOf(b.i32(at))
                  case "int64" => java.lang.Long.valueOf(b.i64(at))
                  case "float32" => java.lang.Float.valueOf(
                    java.lang.Float.intBitsToFloat(b.i32(at)))
                  case _ => java.lang.Double.valueOf(
                    java.lang.Double.longBitsToDouble(b.i64(at)))
                }
              }
            }
        }
      }
      var r = 0
      while (r < nRows) {
        rows += cols.map(_(r))
        r += 1
      }
    }
    ArrowFile(fields, nBatches, rows.result())
  }

  // -------------------------------------------------------------------
  // Fixture: arrow-vector-written shards (foreign-origin corpus)

  def fixtureRowCount(id: Long): Int = 30 + (id % 45).toInt

  /** Closed-form row k of shard id. */
  def fixtureRow(id: Long, k: Int): (Long, Int, String, Double, Boolean,
      Option[Long]) = (
    id * 1000 + k,
    (k * 19 + id % 7).toInt % 1000,
    s"r${k % 9}",
    ((k * 13 + id % 5) % 400).toDouble / 4.0,
    (k + id) % 2 == 0,
    if (k % 4 == 0) None else Some((k * 7 + id % 3) % 500))

  /** doc_id → an Arrow IPC file WRITTEN BY arrow-vector: id%3==1
    * shards split into multiple record batches.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      import org.apache.arrow.vector.types.pojo.{ArrowType, Field,
        FieldType, Schema}
      import scala.jdk.CollectionConverters._
      def f(name: String, t: ArrowType, nullable: Boolean) =
        new Field(name, new FieldType(nullable, t, null), null)
      val schema = new Schema(List(
        f("key", new ArrowType.Int(64, true), nullable = false),
        f("n", new ArrowType.Int(32, true), nullable = false),
        f("tag", new ArrowType.Utf8(), nullable = false),
        f("q", new ArrowType.FloatingPoint(
          org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE),
          nullable = false),
        f("flag", new ArrowType.Bool(), nullable = false),
        f("opt", new ArrowType.Int(64, true), nullable = true)).asJava)
      val root = org.apache.arrow.vector.VectorSchemaRoot
        .create(schema, alloc)
      val bos = new java.io.ByteArrayOutputStream()
      val writer = new org.apache.arrow.vector.ipc.ArrowFileWriter(
        root, null, java.nio.channels.Channels.newChannel(bos))
      writer.start()
      val total = fixtureRowCount(id)
      val batchSizes =
        if (id % 3 == 1) Seq(total / 2, total - total / 2) else Seq(total)
      var base = 0
      batchSizes.foreach { n =>
        root.allocateNew()
        val key = root.getVector("key")
          .asInstanceOf[org.apache.arrow.vector.BigIntVector]
        val nv = root.getVector("n")
          .asInstanceOf[org.apache.arrow.vector.IntVector]
        val tag = root.getVector("tag")
          .asInstanceOf[org.apache.arrow.vector.VarCharVector]
        val q = root.getVector("q")
          .asInstanceOf[org.apache.arrow.vector.Float8Vector]
        val flag = root.getVector("flag")
          .asInstanceOf[org.apache.arrow.vector.BitVector]
        val opt = root.getVector("opt")
          .asInstanceOf[org.apache.arrow.vector.BigIntVector]
        for (i <- 0 until n) {
          val (kk, nn, tt, qq, ff, oo) = fixtureRow(id, base + i)
          key.setSafe(i, kk)
          nv.setSafe(i, nn)
          tag.setSafe(i, tt.getBytes("UTF-8"))
          q.setSafe(i, qq)
          flag.setSafe(i, if (ff) 1 else 0)
          oo match {
            case Some(v) => opt.setSafe(i, v)
            case None => opt.setNull(i)
          }
        }
        root.setRowCount(n)
        writer.writeBatch()
        base += n
      }
      writer.end()
      writer.close()
      root.close()
      bos.toByteArray
    } finally alloc.close()
  }
}
