package graft.operators

/** Parquet WRITER from scratch (pure JVM) — the other half of owning
  * the engine's storage format: [[ParquetFooter]]/[[ParquetData]] read
  * foreign parquet without parquet-mr, this module writes parquet
  * without it. Emits the classic, maximally-interoperable shape every
  * reader accepts: PAR1 framing, v1 data pages behind
  * RLE/bit-packed-hybrid definition levels (bit width 1, flat optional
  * leaves), values either PLAIN or — when a row group's column repeats
  * enough to pay for it (parquet-mr's own policy shape: bounded
  * dictionary attempt, fall back to PLAIN past 64 Ki distinct or under
  * 2× repetition) — a PLAIN dictionary page + RLE_DICTIONARY index
  * pages, page compression through THIS REPO'S OWN codecs
  * ([[Snappy.compress]], [[Zstd.compress]], or UNCOMPRESSED),
  * per-chunk Statistics (min_value/max_value/null_count, the modern
  * field ids), and a FileMetaData footer in the THRIFT COMPACT
  * PROTOCOL — short-form delta field headers, zigzag varints,
  * length-prefixed binaries, size+type list headers — mirrored against
  * the reader's TReader.
  *
  * Supported leaves: BOOLEAN, INT32 (+DATE days), INT64
  * (+TIMESTAMP_MICROS), FLOAT, DOUBLE, BYTE_ARRAY (UTF8 strings).
  * Anything else rejects loudly by name. Row groups and pages split at
  * caller-set row counts, so multi-GB chunks can't accumulate in one
  * page; every offset the footer records is absolute, which is what
  * lets [[sources.GraftParquet]] (and any foreign reader) plan
  * byte-range tasks over files this module wrote.
  *
  * Validated three ways in ParquetWriteSpec: Spark's own parquet-mr
  * vectorized reader and this repo's [[ParquetData]] both decode
  * written files row-identically, and `graftpq` prunes row groups from
  * the written footer statistics. Formats per the public
  * parquet-format specification (parquet.thrift, Encodings.md) and the
  * Thrift compact protocol spec.
  */
object ParquetWrite {

  /** One leaf of the flat schema being written. `physicalType` and
    * `convertedType` use the parquet-format enum ids ([[PwFields]] has
    * the common shapes).
    */
  final case class PwField(name: String, physicalType: Int,
      convertedType: Option[Int] = None)

  object PwFields {
    def boolean(n: String): PwField = PwField(n, 0)
    def int32(n: String): PwField = PwField(n, 1)
    def int64(n: String): PwField = PwField(n, 2)
    def float(n: String): PwField = PwField(n, 4)
    def double(n: String): PwField = PwField(n, 5)
    def string(n: String): PwField = PwField(n, 6, Some(0)) // UTF8
    def date(n: String): PwField = PwField(n, 1, Some(6)) // epoch days
    def timestampMicros(n: String): PwField =
      PwField(n, 2, Some(10)) // TIMESTAMP_MICROS
  }

  // thrift compact element types (mirror of ParquetFooter's TReader)
  private val T_TRUE = 1
  private val T_I32 = 5
  private val T_I64 = 6
  private val T_BINARY = 8
  private val T_LIST = 9
  private val T_STRUCT = 12

  /** Thrift compact WRITER: tracks the per-struct last-field-id stack
    * the short-form delta headers need.
    */
  private final class TWriter(out: java.io.ByteArrayOutputStream) {
    private var last: List[Int] = List(0)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
    }
    private def zig(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    private def fieldHeader(id: Int, typ: Int): Unit = {
      val delta = id - last.head
      if (delta > 0 && delta <= 15) out.write((delta << 4) | typ)
      else { out.write(typ); zig(id.toLong) }
      last = id :: last.tail
    }
    def i32(id: Int, v: Int): Unit = { fieldHeader(id, T_I32); zig(v) }
    def i64(id: Int, v: Long): Unit = { fieldHeader(id, T_I64); zig(v) }
    def bool(id: Int, v: Boolean): Unit =
      fieldHeader(id, if (v) T_TRUE else 2)
    def binary(id: Int, b: Array[Byte]): Unit = {
      fieldHeader(id, T_BINARY)
      varint(b.length)
      out.write(b, 0, b.length)
    }
    def str(id: Int, s: String): Unit = binary(id, s.getBytes("UTF-8"))
    def listHeader(id: Int, elemType: Int, size: Int): Unit = {
      fieldHeader(id, T_LIST)
      if (size < 15) out.write((size << 4) | elemType)
      else { out.write(0xf0 | elemType); varint(size.toLong) }
    }
    /** Open a struct field; the caller writes its fields then calls
      * [[structEnd]]. List elements use [[structBegin]] directly (no
      * field header).
      */
    def structField(id: Int): Unit = { fieldHeader(id, T_STRUCT); structBegin() }
    def structBegin(): Unit = last = 0 :: last
    def structEnd(): Unit = { out.write(0); last = last.tail }
  }

  // -------------------------------------------------------------------
  // value encoding

  private final class Ba extends java.io.ByteArrayOutputStream {
    def le32(v: Int): Unit = {
      write(v & 0xff); write((v >>> 8) & 0xff)
      write((v >>> 16) & 0xff); write((v >>> 24) & 0xff)
    }
    def le64(v: Long): Unit = { le32(v.toInt); le32((v >>> 32).toInt) }
  }

  /** RLE/bit-packed hybrid definition levels for a flat optional leaf
    * (bit width 1): a single RLE run when nothing is null, bit-packed
    * groups of 8 otherwise — both shapes the spec's readers must
    * accept. Returns the 4-byte-length-prefixed region v1 data pages
    * carry.
    */
  private def defLevels(nulls: Array[Boolean], n: Int): Array[Byte] = {
    val body = new Ba
    val w = new TWriter(body)
    var anyNull = false
    var i = 0
    while (i < n && !anyNull) { anyNull = nulls(i); i += 1 }
    if (!anyNull) {
      w.varint((n.toLong << 1)) // RLE run of n
      body.write(1) // value 1 in ceil(1/8) = 1 byte
    } else {
      val groups = (n + 7) / 8
      w.varint((groups.toLong << 1) | 1) // bit-packed header
      var g = 0
      while (g < groups) {
        var b = 0
        var k = 0
        while (k < 8) {
          val idx = g * 8 + k
          if (idx < n && !nulls(idx)) b |= 1 << k
          k += 1
        }
        body.write(b)
        g += 1
      }
    }
    val out = new Ba
    out.le32(body.size())
    body.writeTo(out)
    out.toByteArray
  }

  /** PLAIN-encode the non-null values of one page. */
  private def plainValues(f: PwField, vals: Array[Any], n: Int)
      : Array[Byte] = {
    val out = new Ba
    f.physicalType match {
      case 0 => // BOOLEAN: bit-packed LSB-first
        var b = 0
        var fill = 0
        var i = 0
        while (i < n) {
          if (vals(i) != null) {
            if (vals(i).asInstanceOf[Boolean]) b |= 1 << fill
            fill += 1
            if (fill == 8) { out.write(b); b = 0; fill = 0 }
          }
          i += 1
        }
        if (fill > 0) out.write(b)
      case 1 =>
        var i = 0
        while (i < n) {
          if (vals(i) != null) out.le32(vals(i).asInstanceOf[Int])
          i += 1
        }
      case 2 =>
        var i = 0
        while (i < n) {
          if (vals(i) != null) out.le64(vals(i).asInstanceOf[Long])
          i += 1
        }
      case 4 =>
        var i = 0
        while (i < n) {
          if (vals(i) != null) out.le32(
            java.lang.Float.floatToRawIntBits(vals(i).asInstanceOf[Float]))
          i += 1
        }
      case 5 =>
        var i = 0
        while (i < n) {
          if (vals(i) != null) out.le64(java.lang.Double
            .doubleToRawLongBits(vals(i).asInstanceOf[Double]))
          i += 1
        }
      case 6 =>
        var i = 0
        while (i < n) {
          vals(i) match {
            case null => ()
            case s: String =>
              val b = s.getBytes("UTF-8")
              out.le32(b.length)
              out.write(b, 0, b.length)
            case b: Array[Byte] =>
              out.le32(b.length)
              out.write(b, 0, b.length)
            case v => throw new IllegalArgumentException(
              s"BYTE_ARRAY column '${f.name}' got ${v.getClass.getName}")
          }
          i += 1
        }
      case t => throw new IllegalArgumentException(
        s"parquet physical type $t unsupported by the writer " +
          "(INT96/FIXED_LEN_BYTE_ARRAY reject by name)")
    }
    out.toByteArray
  }

  /** Little-endian statistics encoding of one value (the same bytes
    * [[ParquetFooter.statDouble]] decodes).
    */
  private def statBytes(physicalType: Int, v: Any): Array[Byte] = {
    val out = new Ba
    physicalType match {
      case 1 => out.le32(v.asInstanceOf[Int])
      case 2 => out.le64(v.asInstanceOf[Long])
      case 4 => out.le32(
        java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float]))
      case 5 => out.le64(
        java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]))
      case t => throw new IllegalArgumentException(s"stats on type $t")
    }
    out.toByteArray
  }

  private def compressBody(body: Array[Byte], codec: Int)
      : Array[Byte] = codec match {
    case 0 => body
    case 1 => Snappy.compress(body)
    case 6 => Zstd.compress(body)
    case c => throw new IllegalArgumentException(
      s"parquet writer codec $c unsupported (UNCOMPRESSED=0, SNAPPY=1, " +
        "ZSTD=6)")
  }

  /** RLE_DICTIONARY value region of one data page: the index bit width
    * byte, then the RLE / bit-packed hybrid of the page's non-null
    * dictionary indices — one RLE run when the page is constant, one
    * bit-packed run otherwise (trailing pad values in the final groups
    * are dropped by readers, which read exactly num_values).
    */
  private def dictIndexPage(idx: Array[Int], n: Int, width: Int)
      : Array[Byte] = {
    val out = new Ba
    out.write(width)
    val w = new TWriter(out)
    var allSame = true
    var i = 1
    while (i < n && allSame) { allSame = idx(i) == idx(0); i += 1 }
    if (n == 0) () // all-null page: empty index region
    else if (allSame) {
      w.varint(n.toLong << 1)
      val byteW = (width + 7) / 8
      var k = 0
      while (k < byteW) { out.write((idx(0) >>> (8 * k)) & 0xff); k += 1 }
    } else {
      val groups = (n + 7) / 8
      w.varint((groups.toLong << 1) | 1)
      var g = 0
      while (g < groups) {
        val bits = new Array[Byte](width)
        var k = 0
        while (k < 8) {
          val v = if (g * 8 + k < n) idx(g * 8 + k) else 0
          var j = 0
          while (j < width) {
            if (((v >>> j) & 1) != 0) {
              val bit = k * width + j
              bits(bit >> 3) = (bits(bit >> 3) | (1 << (bit & 7))).toByte
            }
            j += 1
          }
          k += 1
        }
        out.write(bits, 0, width)
        g += 1
      }
    }
    out.toByteArray
  }

  private def bitsFor(max: Int): Int =
    32 - Integer.numberOfLeadingZeros(max)

  private final case class ChunkInfo(field: PwField, numValues: Long,
      nullCount: Long, minV: Option[Array[Byte]],
      maxV: Option[Array[Byte]], dataPageOffset: Long,
      totalUncompressed: Long, totalCompressed: Long,
      dictPageOffset: Option[Long] = None, chunkStart: Long = -1L)

  private final case class GroupInfo(numRows: Long,
      chunks: Seq[ChunkInfo])

  /** Write one complete parquet file; returns the row count. `rows`
    * yields one `Array[Any]` per row aligned with `fields` (nulls as
    * null; BOOLEAN/INT32/INT64/FLOAT/DOUBLE/BYTE_ARRAY carried as
    * Boolean/Int/Long/Float/Double/String-or-Array[Byte]).
    */
  def writeFile(path: java.nio.file.Path, fields: Seq[PwField],
      rows: Iterator[Array[Any]], codec: Int = 1,
      rowGroupRows: Int = 1 << 20, pageRows: Int = 1 << 16): Long = {
    require(fields.nonEmpty, "parquet writer needs at least one field")
    require(rowGroupRows > 0 && pageRows > 0 && pageRows <= rowGroupRows,
      s"bad page/row-group geometry $pageRows/$rowGroupRows")
    val os = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path))
    var pos = 0L
    def emit(b: Array[Byte]): Unit = { os.write(b, 0, b.length); pos += b.length }
    try {
      emit("PAR1".getBytes("US-ASCII"))
      val groups = Vector.newBuilder[GroupInfo]
      var total = 0L
      val batch = new scala.collection.mutable.ArrayBuffer[Array[Any]]()
      def flushGroup(): Unit = if (batch.nonEmpty) {
        val nRows = batch.length
        val chunks = fields.zipWithIndex.map { case (f, c) =>
          val chunkStart = pos
          var unc = 0L
          var comp = 0L
          var nulls = 0L
          // Integer stats compare in the long domain (a double ulp at
          // 2^53 would let a rounding tie record a wrong extremum that
          // spec-compliant pruners then trust); float stats skip NaN
          // entirely, matching parquet-mr — a NaN min/max makes every
          // pruner comparison false and silently drops row groups.
          var minL = 0L
          var maxL = 0L
          var minD = Double.NaN
          var maxD = Double.NaN
          var minV: Any = null
          var maxV: Any = null
          // Pass 1 over the whole row group: statistics + the bounded
          // dictionary attempt (parquet-mr's shape: try dictionary,
          // fall back to PLAIN when the value set is too large or not
          // repetitive enough to pay for the extra page).
          val dictIdx = new java.util.LinkedHashMap[Any, Integer]()
          var dictOk = f.physicalType != 0 // booleans: PLAIN is 1 bit
          var nonNullCount = 0L
          var r0 = 0
          while (r0 < nRows) {
            val v = batch(r0)(c)
            if (v == null) nulls += 1
            else {
              nonNullCount += 1
              if (f.physicalType >= 1 && f.physicalType <= 5) {
                v match {
                  case x: Int =>
                    val l = x.toLong
                    if (minV == null || l < minL) { minL = l; minV = v }
                    if (maxV == null || l > maxL) { maxL = l; maxV = v }
                  case x: Long =>
                    if (minV == null || x < minL) { minL = x; minV = v }
                    if (maxV == null || x > maxL) { maxL = x; maxV = v }
                  case x: Float => if (!x.isNaN) {
                    val d = x.toDouble
                    if (minV == null || d < minD) { minD = d; minV = v }
                    if (maxV == null || d > maxD) { maxD = d; maxV = v }
                  }
                  case x: Double => if (!x.isNaN) {
                    if (minV == null || x < minD) { minD = x; minV = v }
                    if (maxV == null || x > maxD) { maxD = x; maxV = v }
                  }
                  case x => throw new IllegalArgumentException(
                    s"column '${f.name}' got ${x.getClass.getName}")
                }
              }
              if (dictOk) v match {
                case _: Array[Byte] => // no stable equality: PLAIN
                  dictOk = false; dictIdx.clear()
                case key => if (!dictIdx.containsKey(key)) {
                  if (dictIdx.size >= 65536) {
                    dictOk = false; dictIdx.clear()
                  } else dictIdx.put(key, Integer.valueOf(dictIdx.size))
                }
              }
            }
            r0 += 1
          }
          val useDict = dictOk && dictIdx.size > 0 &&
            dictIdx.size.toLong * 2 <= nonNullCount
          val dictWidth =
            math.max(1, bitsFor(math.max(dictIdx.size - 1, 0)))
          var dictOffset: Option[Long] = None
          if (useDict) { // dictionary page first, PLAIN entries in
            // first-seen order (ids are assigned by first appearance)
            val entries = new Array[Any](dictIdx.size)
            val it = dictIdx.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next(); entries(e.getValue.intValue) = e.getKey
            }
            val raw = plainValues(f, entries, entries.length)
            val packed = compressBody(raw, codec)
            val hdr = new Ba
            val w = new TWriter(hdr)
            w.structBegin()
            w.i32(1, 2) // type: DICTIONARY_PAGE
            w.i32(2, raw.length)
            w.i32(3, packed.length)
            w.structField(7) // DictionaryPageHeader
            w.i32(1, entries.length) // num_values
            w.i32(2, 0) // encoding: PLAIN
            w.structEnd()
            w.structEnd()
            val hb = hdr.toByteArray
            dictOffset = Some(pos)
            emit(hb)
            emit(packed)
            unc += hb.length + raw.length
            comp += hb.length + packed.length
          }
          val firstDataPage = pos
          var row = 0
          while (row < nRows) {
            val n = math.min(pageRows, nRows - row)
            val pageNulls = new Array[Boolean](n)
            val pageVals = new Array[Any](n)
            var i = 0
            while (i < n) {
              val v = batch(row + i)(c)
              pageVals(i) = v
              pageNulls(i) = v == null
              i += 1
            }
            val body = new Ba
            val dl = defLevels(pageNulls, n)
            body.write(dl, 0, dl.length)
            val pv =
              if (useDict) {
                val idx = new Array[Int](n)
                var nn = 0
                var k = 0
                while (k < n) {
                  if (pageVals(k) != null) {
                    idx(nn) = dictIdx.get(pageVals(k)).intValue
                    nn += 1
                  }
                  k += 1
                }
                dictIndexPage(idx, nn, dictWidth)
              } else plainValues(f, pageVals, n)
            body.write(pv, 0, pv.length)
            val raw = body.toByteArray
            val packed = compressBody(raw, codec)
            val hdr = new Ba
            val w = new TWriter(hdr)
            w.structBegin()
            w.i32(1, 0) // type: DATA_PAGE
            w.i32(2, raw.length)
            w.i32(3, packed.length)
            w.structField(5) // DataPageHeader
            w.i32(1, n) // num_values
            w.i32(2, if (useDict) 8 else 0) // RLE_DICTIONARY / PLAIN
            w.i32(3, 3) // definition_level_encoding: RLE
            w.i32(4, 3) // repetition_level_encoding: RLE
            w.structEnd()
            w.structEnd()
            val hb = hdr.toByteArray
            emit(hb)
            emit(packed)
            unc += hb.length + raw.length
            comp += hb.length + packed.length
            row += n
          }
          ChunkInfo(f, nRows.toLong, nulls,
            Option(minV).map(statBytes(f.physicalType, _)),
            Option(maxV).map(statBytes(f.physicalType, _)),
            firstDataPage, unc, comp, dictOffset, chunkStart)
        }
        groups += GroupInfo(nRows.toLong, chunks)
        total += nRows
        batch.clear()
      }
      while (rows.hasNext) {
        val r = rows.next()
        require(r.length == fields.length,
          s"row arity ${r.length} vs ${fields.length} fields")
        batch += r
        if (batch.length >= rowGroupRows) flushGroup()
      }
      flushGroup()
      // footer: FileMetaData in thrift compact
      val fb = new Ba
      val w = new TWriter(fb)
      val gs = groups.result()
      w.structBegin()
      w.i32(1, 1) // version
      w.listHeader(2, T_STRUCT, fields.length + 1) // schema
      w.structBegin() // root SchemaElement
      w.i32(3, 0) // repetition: REQUIRED
      w.str(4, "schema")
      w.i32(5, fields.length) // num_children
      w.structEnd()
      for (f <- fields) {
        w.structBegin()
        w.i32(1, f.physicalType)
        w.i32(3, 1) // repetition: OPTIONAL
        w.str(4, f.name)
        f.convertedType.foreach(ct => w.i32(6, ct))
        w.structEnd()
      }
      w.i64(3, total) // num_rows
      w.listHeader(4, T_STRUCT, gs.length) // row_groups
      for (g <- gs) {
        w.structBegin()
        w.listHeader(1, T_STRUCT, g.chunks.length)
        for (ch <- g.chunks) {
          w.structBegin() // ColumnChunk
          w.i64(2, if (ch.chunkStart >= 0) ch.chunkStart
            else ch.dataPageOffset) // file_offset
          w.structField(3) // ColumnMetaData
          w.i32(1, ch.field.physicalType)
          if (ch.dictPageOffset.isDefined) {
            w.listHeader(2, T_I32, 3)
            w.varint((0L << 1)) // PLAIN (dictionary page; zigzag 0)
            w.varint((3L << 1)) // RLE (levels; zigzag 3)
            w.varint((8L << 1)) // RLE_DICTIONARY (zigzag 8)
          } else {
            w.listHeader(2, T_I32, 2)
            w.varint((0L << 1)) // PLAIN (zigzag 0)
            w.varint((3L << 1)) // RLE (zigzag 3)
          }
          w.listHeader(3, T_BINARY, 1)
          val nb = ch.field.name.getBytes("UTF-8")
          w.varint(nb.length.toLong)
          fb.write(nb, 0, nb.length)
          w.i32(4, codec)
          w.i64(5, ch.numValues)
          w.i64(6, ch.totalUncompressed)
          w.i64(7, ch.totalCompressed)
          w.i64(9, ch.dataPageOffset)
          ch.dictPageOffset.foreach(w.i64(11, _))
          if (ch.minV.isDefined || ch.nullCount >= 0) {
            w.structField(12) // Statistics
            w.i64(3, ch.nullCount)
            ch.maxV.foreach(w.binary(5, _)) // max_value
            ch.minV.foreach(w.binary(6, _)) // min_value
            w.structEnd()
          }
          w.structEnd() // ColumnMetaData
          w.structEnd() // ColumnChunk
        }
        w.i64(2, g.chunks.map(_.totalUncompressed).sum)
        w.i64(3, g.numRows)
        w.structEnd()
      }
      // created_by must parse under parquet-mr's VersionParser
      // ("<app> version <ver> (build <hash>)") — an unparseable string
      // trips the PARQUET-251 corrupt-statistics guard and makes
      // foreign readers IGNORE the written min/max (observed: orc-mr
      // logged "Ignoring statistics because created_by could not be
      // parsed: graft" and lost pruning on our files)
      w.str(6, "graft version 1.0.0 (build graft)")
      w.structEnd()
      val footer = fb.toByteArray
      emit(footer)
      val tail = new Ba
      tail.le32(footer.length)
      emit(tail.toByteArray)
      emit("PAR1".getBytes("US-ASCII"))
      total
    } finally os.close()
  }

  // -------------------------------------------------------------------
  // Spark surface

  /** Map a Spark schema to writer fields; unsupported Spark types
    * reject loudly by name.
    */
  def fieldsOf(schema: org.apache.spark.sql.types.StructType)
      : Seq[PwField] = {
    import org.apache.spark.sql.types._
    schema.fields.toSeq.map { f =>
      f.dataType match {
        case BooleanType => PwFields.boolean(f.name)
        case IntegerType => PwFields.int32(f.name)
        case LongType => PwFields.int64(f.name)
        case FloatType => PwFields.float(f.name)
        case DoubleType => PwFields.double(f.name)
        case StringType => PwFields.string(f.name)
        case DateType => PwFields.date(f.name)
        case TimestampType => PwFields.timestampMicros(f.name)
        case t => throw new IllegalArgumentException(
          s"parquet writer: column '${f.name}' type ${t.sql} unsupported")
      }
    }
  }

  /** Distributed write: every partition writes its own
    * `part-NNNNN.parquet` with [[writeFile]] — the writer runs WHERE
    * THE DATA IS, one task per partition, no driver collection —
    * then `_SUCCESS` commits the directory. Returns the row count.
    */
  def writeDataFrame(df: org.apache.spark.sql.DataFrame, dir: String,
      codec: Int = 1, rowGroupRows: Int = 1 << 20,
      pageRows: Int = 1 << 16): Long = {
    import org.apache.spark.sql.types._
    val fields = fieldsOf(df.schema)
    val schema = df.schema
    val target = new java.io.File(dir)
    target.mkdirs()
    val adapt: Array[Any => Any] = schema.fields.map[Any => Any] { f =>
      f.dataType match {
        case DateType => {
          case null => null
          case d: java.sql.Date => Int.box(d.toLocalDate.toEpochDay.toInt)
          case d: java.time.LocalDate => Int.box(d.toEpochDay.toInt)
          case v => v
        }
        case TimestampType => {
          case null => null
          case t: java.sql.Timestamp =>
            Long.box(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
          case t: java.time.Instant =>
            Long.box(t.getEpochSecond * 1000000L + t.getNano / 1000)
          case v => v
        }
        case _ => identity
      }
    }
    val counts = df.rdd.mapPartitionsWithIndex { (i, it) =>
      val f = new java.io.File(target, f"part-$i%05d.parquet")
      val rows = it.map { row =>
        Array.tabulate[Any](fields.length)(c =>
          if (row.isNullAt(c)) null else adapt(c)(row.get(c)))
      }
      val n = writeFile(f.toPath, fields, rows, codec, rowGroupRows,
        pageRows)
      if (n == 0) f.delete() // empty partitions leave no file
      Iterator.single(n)
    }.collect().sum
    new java.io.FileOutputStream(new java.io.File(target, "_SUCCESS"))
      .close()
    counts
  }
}
