package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{ParquetData, ParquetFooter}
import graft.operators.ParquetFooter.{PqColumn, PqSchemaField}

/** `graftpq` — the engine's own parquet scan as a first-class Spark
  * DataSource V2, planned entirely from the from-scratch readers:
  * schema inference and row-group planning from [[ParquetFooter]]
  * (footer-tail IO only, never a data byte), pages decoded by
  * [[ParquetData]] through this repo's own
  * Snappy/Inflate/Zstd/Lz4 codecs. The scan-planning surface Spark's
  * built-in parquet source gets from parquet-mr is re-derived here:
  *
  *  - '''column pruning''' ([[SupportsPushDownRequiredColumns]]): only
  *    the requested leaves' chunk ranges are ever read or decoded;
  *  - '''filter pushdown''' ([[SupportsPushDownFilters]]): numeric
  *    comparisons prune whole ROW GROUPS against footer min/max stats
  *    before any task launches (every filter is still re-evaluated by
  *    Spark post-scan — stats pruning is row-group-granular, so the
  *    pushed set is advisory, exactly like parquet-mr's);
  *  - '''split planning''': one [[InputPartition]] per surviving row
  *    group, and each task fetches ONLY its chunks' byte ranges
  *    ([[ParquetData.chunkRange]]) via positional reads — at 100 TB a
  *    task touches O(its row group), not O(its file).
  *
  * Registered as `graftpq` via DataSourceRegister (META-INF/services),
  * so `spark.read.format("graftpq").load(dir)` resolves it. Flat
  * schemas only (the [[ParquetData]] contract); unsupported physical /
  * converted types reject loudly by name at schema-inference time.
  */
class GraftParquet extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graftpq"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap)
      : StructType = {
    val files = GraftParquet.listFiles(GraftParquet.pathOf(options))
    require(files.nonEmpty, "graftpq: no .parquet files under the path")
    GraftParquet.toSparkSchema(
      ParquetFooter.readTail(files.head.toPath).schema)
  }

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftParquetTable(schema,
      GraftParquet.pathOf(new CaseInsensitiveStringMap(properties)))
}

object GraftParquet {

  private[sources] def pathOf(options: CaseInsensitiveStringMap)
      : String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graftpq: a `path` is required")
    // accept file: URIs (Spark normalizes load() paths through Hadoop)
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p
  }

  private[sources] def listFiles(dir: String): Seq[java.io.File] = {
    val f = new java.io.File(dir)
    if (f.isFile) Seq(f)
    else {
      val kids = f.listFiles()
      require(kids != null, s"graftpq: cannot list $dir")
      kids.filter(c => c.isFile && c.getName.endsWith(".parquet"))
        .sortBy(_.getName).toSeq
    }
  }

  /** Map the footer's flat leaves to a Spark schema; parquet physical
    * types per format spec §Types, converted types per
    * §LogicalTypes.md's compat table (Spark writes converted_type
    * alongside logicalType for all shapes mapped here).
    */
  private[sources] def toSparkSchema(schema: Seq[PqSchemaField])
      : StructType = {
    val leaves = flatLeaves(schema)
    StructType(leaves.map { f =>
      val t = (f.physicalType, f.convertedType) match {
        case (0, _) => BooleanType
        case (1, Some(6)) => DateType // DATE: days since epoch
        case (1, Some(15)) => ByteType // INT_8
        case (1, Some(16)) => ShortType // INT_16
        case (1, Some(5)) => throw new IllegalArgumentException(
          s"graftpq: DECIMAL column '${f.name}' unsupported")
        case (1, _) => IntegerType
        case (2, Some(10)) => TimestampType // TIMESTAMP_MICROS
        case (2, Some(9)) => throw new IllegalArgumentException(
          s"graftpq: TIMESTAMP_MILLIS column '${f.name}' unsupported " +
            "(writers emit micros)")
        case (2, Some(5)) => throw new IllegalArgumentException(
          s"graftpq: DECIMAL column '${f.name}' unsupported")
        case (2, _) => LongType
        case (4, _) => FloatType
        case (5, _) => DoubleType
        case (6, _) => StringType // BYTE_ARRAY (UTF8)
        case (p, _) => throw new IllegalArgumentException(
          s"graftpq: column '${f.name}' physical type $p unsupported " +
            "(INT96/FIXED_LEN_BYTE_ARRAY reject by name)")
      }
      StructField(f.name, t, nullable = !f.repetition.contains(0))
    })
  }

  private[sources] def flatLeaves(schema: Seq[PqSchemaField])
      : Seq[PqSchemaField] = {
    require(schema.nonEmpty, "graftpq: empty parquet schema")
    val leaves = schema.drop(1)
    require(leaves.forall(_.numChildren == 0),
      "graftpq: nested parquet schemas unsupported (flat leaves only)")
    leaves
  }
}

private[sources] class GraftParquetTable(schema: StructType,
    path: String) extends Table with SupportsRead {
  override def name(): String = s"graftpq $path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new GraftParquetScanBuilder(schema, path)
}

private[sources] class GraftParquetScanBuilder(fullSchema: StructType,
    path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty projections (count(*)) still need row counts: keep the
    // first leaf so every partition knows its cardinality
    required =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(fullSchema.fields.take(1))

  /** Accept the comparisons row-group stats can act on; EVERYTHING is
    * returned for Spark to re-evaluate (stats pruning is row-group
    * granular, never row-exact).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def prunable(f: Filter): Boolean = f match {
      case EqualTo(c, v) => numericCol(c) && v.isInstanceOf[Number]
      case GreaterThan(c, v) => numericCol(c) && v.isInstanceOf[Number]
      case GreaterThanOrEqual(c, v) =>
        numericCol(c) && v.isInstanceOf[Number]
      case LessThan(c, v) => numericCol(c) && v.isInstanceOf[Number]
      case LessThanOrEqual(c, v) =>
        numericCol(c) && v.isInstanceOf[Number]
      case IsNotNull(c) => numericCol(c)
      case _ => false
    }
    pushed = filters.filter(prunable)
    filters
  }

  private def numericCol(name: String): Boolean =
    fullSchema.fields.find(_.name == name).exists(f => f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType => true
      case _ => false
    })

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GraftParquetScan(fullSchema, required, pushed, path)
}

/** One surviving row group: the unit of scan parallelism. Columns carry
  * their absolute chunk offsets, so the reader fetches byte ranges.
  */
final case class GraftPqPartition(path: String,
    rgRows: Long, columns: Seq[PqColumn], leaves: Seq[PqSchemaField])
  extends InputPartition

private[sources] class GraftParquetScan(fullSchema: StructType,
    required: StructType, pushed: Array[Filter], path: String)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"graftpq $path PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  /** Driver-side planning from footer tails only — the same O(KB per
    * multi-GB file) IO shape parquet-mr planning has. A row group is
    * planned out when any pushed comparison is disjoint with its
    * footer min/max.
    */
  override def planInputPartitions(): Array[InputPartition] =
    GraftParquet.listFiles(path).flatMap { f =>
      val footer = ParquetFooter.readTail(f.toPath)
      val leaves = GraftParquet.flatLeaves(footer.schema)
      val byName = leaves.map(l => l.name -> l).toMap
      val reqLeaves = required.fields.map { rf =>
        byName.getOrElse(rf.name, throw new IllegalArgumentException(
          s"graftpq: column '${rf.name}' not in ${f.getName}"))
      }.toSeq
      footer.rowGroups.iterator.filter { rg =>
        pushed.forall(survives(rg.columns, byName, _))
      }.map { rg =>
        val cols = reqLeaves.map(l =>
          rg.columns.find(_.path == l.name).getOrElse(
            throw new IllegalArgumentException(
              s"graftpq: chunk for '${l.name}' missing in ${f.getName}")))
        GraftPqPartition(f.getAbsolutePath, rg.numRows, cols, reqLeaves)
      }
    }.toArray

  /** False only when the row group's stats PROVE the filter matches no
    * row — absent stats keep the group (conservative).
    */
  private def survives(cols: Seq[PqColumn],
      leaves: Map[String, PqSchemaField], f: Filter): Boolean = {
    def stats(name: String): Option[(Double, Double)] = for {
      col <- cols.find(_.path == name)
      leaf <- leaves.get(name)
      if Set(1, 2, 4, 5).contains(leaf.physicalType)
      mn <- col.minValue
      mx <- col.maxValue
    } yield (ParquetFooter.statDouble(leaf.physicalType, mn),
      ParquetFooter.statDouble(leaf.physicalType, mx))
    f match {
      case EqualTo(c, v: Number) => stats(c).forall { case (mn, mx) =>
        v.doubleValue >= mn && v.doubleValue <= mx }
      case GreaterThan(c, v: Number) =>
        stats(c).forall(_._2 > v.doubleValue)
      case GreaterThanOrEqual(c, v: Number) =>
        stats(c).forall(_._2 >= v.doubleValue)
      case LessThan(c, v: Number) =>
        stats(c).forall(_._1 < v.doubleValue)
      case LessThanOrEqual(c, v: Number) =>
        stats(c).forall(_._1 <= v.doubleValue)
      case _ => true // IsNotNull etc: never disjoint by construction
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftPqReaderFactory(required)
}

private[sources] class GraftPqReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new GraftPqReader(partition.asInstanceOf[GraftPqPartition], required)
}

/** Decodes one row group: positional reads of each required chunk's
  * byte range, pages through [[ParquetData.readChunk]], values adapted
  * to Spark's internal representations (UTF8String; DateType's day int
  * and TimestampType's micro long are already the physical values).
  */
private[sources] class GraftPqReader(p: GraftPqPartition,
    required: StructType) extends PartitionReader[InternalRow] {

  private val cols: Array[Array[Any]] = {
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(p.path),
      java.nio.file.StandardOpenOption.READ)
    try {
      p.columns.zip(p.leaves).map { case (col, leaf) =>
        val (start, end) = ParquetData.chunkRange(col)
        require(end - start <= Int.MaxValue,
          s"graftpq: ${end - start}-byte chunk exceeds buffer limits")
        val bb = java.nio.ByteBuffer.allocate((end - start).toInt)
        var pos = start
        while (bb.hasRemaining) {
          val r = ch.read(bb, pos)
          require(r > 0, "torn parquet: short chunk read")
          pos += r
        }
        ParquetData.readChunk(bb.array(), col, leaf, p.rgRows.toInt,
          base = start)
      }.toArray
    } finally ch.close()
  }

  private val adapt: Array[Any => Any] =
    required.fields.map[Any => Any] { f =>
      f.dataType match {
        case StringType =>
          v => if (v == null) null
            else UTF8String.fromString(v.asInstanceOf[String])
        case ByteType =>
          v => if (v == null) null
            else java.lang.Byte.valueOf(v.asInstanceOf[Int].toByte)
        case ShortType =>
          v => if (v == null) null
            else java.lang.Short.valueOf(v.asInstanceOf[Int].toShort)
        case _ => identity
      }
    }

  private var row = -1

  override def next(): Boolean = { row += 1; row < p.rgRows }

  override def get(): InternalRow =
    InternalRow.fromSeq((0 until cols.length).map(c =>
      adapt(c)(cols(c)(row))))

  override def close(): Unit = ()
}
