package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ParquetFooter

/** Parquet footer parsing (operators.ParquetFooter), cross-validated
  * against parquet-mr (the independent implementation Spark itself
  * uses) on both Spark-written files and the driver's real testdata,
  * plus loud torn-footer rejects.
  */
class ParquetFooterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def mrFooter(path: String) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(path), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getFooter finally reader.close()
  }

  test("Spark-written files: num_rows, row groups, per-column counts, " +
      "null counts and int min/max all match parquet-mr") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pqfooter").toString
    val df = (0 until 5000).map(i =>
      (i.toLong * 3 - 1000, if (i % 7 == 0) None else Some(i * 2),
        s"s$i", i.toDouble / 4))
      .toDF("k", "opt", "s", "d")
    df.repartition(3).write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 3)
    for (f <- files) {
      val ours = ParquetFooter.readFile(f.toPath)
      val mr = mrFooter(f.getAbsolutePath)
      val mrRows = {
        var t = 0L
        mr.getBlocks.forEach(b => t += b.getRowCount)
        t
      }
      assert(ours.numRows == mrRows, s"${f.getName} num_rows")
      assert(ours.rowGroups.length == mr.getBlocks.size(),
        s"${f.getName} row groups")
      ours.rowGroups.zip(
        scala.jdk.CollectionConverters.ListHasAsScala(mr.getBlocks)
          .asScala).foreach { case (og, mg) =>
        assert(og.numRows == mg.getRowCount)
        assert(og.columns.length == mg.getColumns.size())
        og.columns.zip(scala.jdk.CollectionConverters
          .ListHasAsScala(mg.getColumns).asScala).foreach {
          case (oc, mc) =>
            assert(oc.path == mc.getPath.toDotString, "column order")
            assert(oc.numValues == mc.getValueCount, oc.path)
            val st = mc.getStatistics
            assert(oc.nullCount.contains(st.getNumNulls), oc.path)
            if (oc.path == "k") { // INT64 with negatives
              assert(ParquetFooter.statLong(oc.physicalType,
                oc.minValue.get) ==
                st.genericGetMin.asInstanceOf[java.lang.Long].longValue)
              assert(ParquetFooter.statLong(oc.physicalType,
                oc.maxValue.get) ==
                st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
            }
            if (oc.path == "opt") { // INT32 with real nulls
              assert(oc.nullCount.get > 0, "opt should carry nulls")
            }
        }
      }
      // schema walk: root carries the 4 fields
      assert(ours.schema.head.numChildren == 4)
      assert(ours.schema.map(_.name).slice(1, 5) ==
        Seq("k", "opt", "s", "d"))
    }
    graft.streaming.WorkDirs.deleteRecursively(new java.io.File(dir))
  }

  test("INT32 statistics decode negative minima correctly") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pqi32").toString
    (0 until 1000).map(i => Tuple1(i * 7 - 3000)).toDF("v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val ours = ParquetFooter.readFile(f.toPath)
    val c = ours.rowGroups.head.columns.head
    assert(c.physicalType == 1, "Spark IntegerType must be INT32")
    assert(ParquetFooter.statLong(1, c.minValue.get) == -3000L)
    assert(ParquetFooter.statLong(1, c.maxValue.get) == 999L * 7 - 3000)
    graft.streaming.WorkDirs.deleteRecursively(new java.io.File(dir))
  }

  test("the real testdata footers parse and agree with parquet-mr") {
    for (t <- Seq("region", "nation", "orders", "lineitem", "documents",
        "events", "embeddings")) {
      val path = s"${SparkTestSession.sfSmoke}/$t.parquet"
      val ours = ParquetFooter.readFile(java.nio.file.Paths.get(path))
      val mr = mrFooter(path)
      var mrRows = 0L
      mr.getBlocks.forEach(b => mrRows += b.getRowCount)
      assert(ours.numRows == mrRows, s"$t rows")
      assert(ours.rowGroups.length == mr.getBlocks.size(), s"$t groups")
      assert(ours.createdBy.isEmpty || ours.createdBy.get.nonEmpty)
      // the first leaf column's stats decode to the table's key range
      val first = ours.rowGroups.head.columns.head
      assert(first.minValue.isDefined && first.maxValue.isDefined, s"$t")
      val lo = ParquetFooter.statLong(first.physicalType, first.minValue.get)
      val hi = ParquetFooter.statLong(first.physicalType, first.maxValue.get)
      assert(lo <= hi, s"$t stat range")
    }
  }

  test("the from-scratch reader agrees with the commit protocol's " +
      "recorded data-skipping stats") {
    import spark.implicits._
    val M = graft.operators.Maintenance
    val p = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-pqbridge-${java.util.UUID.randomUUID()}/t").getAbsolutePath
    M.commitAppend(spark, p,
      (0 until 2000).map(i => (i.toLong * 11 - 7000, i * 3 - 50))
        .toDF("a", "b"))
    M.commitAppend(spark, p,
      (0 until 1000).map(i => (i.toLong + 50000, i - 9999)).toDF("a", "b"))
    val stats = M.readFileStats(p)
    val files = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty && stats.nonEmpty)
    var checked = 0
    for (f <- files) {
      val footer = ParquetFooter.readFile(f.toPath)
      for (col <- Seq("a", "b")) {
        // fold our per-row-group stats to per-file bounds like the
        // protocol does
        val perGroup = footer.rowGroups.map(_.columns
          .find(_.path == col).get)
        val ourLo = perGroup.map(c =>
          ParquetFooter.statLong(c.physicalType, c.minValue.get)).min
        val ourHi = perGroup.map(c =>
          ParquetFooter.statLong(c.physicalType, c.maxValue.get)).max
        val (lo, hi) = stats((f.getName, col))
        // the protocol records one-ulp-widened doubles
        assert(lo == Math.nextDown(ourLo.toDouble) &&
          hi == Math.nextUp(ourHi.toDouble),
          s"${f.getName}.$col: ours [$ourLo,$ourHi] vs recorded [$lo,$hi]")
        checked += 1
      }
    }
    assert(checked >= 4, s"only $checked (file, column) pairs compared")
    graft.streaming.WorkDirs.deleteRecursively(
      new java.io.File(p).getParentFile)
  }

  test("torn footers reject loudly") {
    val path = java.nio.file.Paths.get(
      s"${SparkTestSession.sfSmoke}/region.parquet")
    val good = java.nio.file.Files.readAllBytes(path)
    val notPq = intercept[IllegalArgumentException](
      ParquetFooter.read("PARQUET? not really".getBytes("US-ASCII")))
    assert(notPq.getMessage.contains("PAR1"), notPq.getMessage)
    // oversize footer length
    val badLen = good.clone()
    badLen(badLen.length - 5) = 0x7f
    val e1 = intercept[IllegalArgumentException](ParquetFooter.read(badLen))
    assert(e1.getMessage.contains("footer length"), e1.getMessage)
    // truncation mid-footer
    intercept[IllegalArgumentException](
      ParquetFooter.read(good.take(good.length - 20) ++
        good.takeRight(8)))
  }
}
