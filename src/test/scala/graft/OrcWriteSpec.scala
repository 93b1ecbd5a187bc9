package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{OrcData, OrcWrite}
import graft.operators.OrcWrite.OwFields

/** The from-scratch ORC writer (operators.OrcWrite), validated against
  * two independent readers: Spark's own orc-core reader must decode
  * written files row-identically (the strong foreign-reader
  * direction), and this repo's [[OrcData]] must round-trip them.
  */
class OrcWriteSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmpDir(tag: String): java.io.File =
    java.nio.file.Files.createTempDirectory(s"graft-orcwrite-$tag")
      .toFile

  test("Spark's orc-core reads written files row-identically " +
      "(all types, nulls, multiple stripes)") {
    val dir = tmpDir("types")
    try {
      val fields = Seq(OwFields.long("id"), OwFields.int("k"),
        OwFields.string("s"), OwFields.boolean("b"),
        OwFields.double("d"), OwFields.date("dt"),
        OwFields.timestamp("ts"))
      // micros spanning both sides of 1970 with ragged sub-seconds
      // (ORC's truncate-vs-floor corner second is avoided by stepping
      // well clear of [-1s, 0))
      def micros(i: Int): Long = i.toLong * 77777777L - 50000000000000L
      val rows = (0 until 3000).iterator.map { i =>
        Array[Any](
          Long.box(i.toLong),
          if (i % 7 == 0) null else Int.box(i * 3 - 1000),
          if (i % 11 == 0) null else s"v$i-${i % 5}",
          Boolean.box(i % 2 == 0),
          Double.box(i * 1.25 - 300.0),
          Int.box(19723 + i % 365), // epoch days
          if (i % 13 == 0) null else Long.box(micros(i)))
      }
      val n = OrcWrite.writeFile(
        new java.io.File(dir, "part-00000.orc").toPath, fields,
        rows, stripeRows = 700) // 700+700+700+700+200: 5 stripes
      assert(n == 3000)
      val got = spark.read.orc(dir.toString)
      assert(got.count() == 3000)
      val r = got.orderBy("id").collect()
      assert(r(0).getLong(0) == 0L)
      assert(r(0).isNullAt(1)) // i % 7 == 0
      assert(r(1).getInt(1) == -997)
      assert(r(0).isNullAt(2))
      assert(r(1).getString(2) == "v1-1")
      assert(r(2).getBoolean(3))
      assert(r(4).getDouble(4) == -295.0)
      assert(r(5).getDate(5).toLocalDate ==
        java.time.LocalDate.ofEpochDay(19728))
      assert(r(0).isNullAt(6)) // i % 13 == 0
      for (i <- Seq(1, 2, 991, 2999))
        assert(r(i).getTimestamp(6).toInstant ==
          java.time.Instant.EPOCH.plus(micros(i),
            java.time.temporal.ChronoUnit.MICROS), s"ts row $i")
      assert(got.filter("k IS NULL").count() ==
        (0 until 3000).count(_ % 7 == 0))
      // wide values stress the RLEv2 DIRECT width selection
      assert(got.agg(org.apache.spark.sql.functions.sum("id"))
        .head.getLong(0) == (0 until 3000).map(_.toLong).sum)
    } finally graft.streaming.WorkDirs.deleteRecursively(dir)
  }

  test("this repo's own reader round-trips written files") {
    val dir = tmpDir("own")
    try {
      val fields = Seq(OwFields.long("id"), OwFields.string("s"),
        OwFields.double("d"))
      val rows = (0 until 2500).iterator.map(i => Array[Any](
        Long.box(i.toLong * 1000000007L - 900000000000L), // wide longs
        if (i % 9 == 0) null else s"row-$i",
        Double.box(i / 4.0)))
      val f = new java.io.File(dir, "part-00000.orc")
      OrcWrite.writeFile(f.toPath, fields, rows, stripeRows = 600)
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val got = OrcData.readRows(bytes, Seq("id", "s", "d")).toVector
      assert(got.length == 2500)
      assert(got(0)(0) == -900000000000L && got(0)(1) == null)
      assert(got(10)(1) == "row-10")
      assert(got(2499)(0) == 2499L * 1000000007L - 900000000000L)
      assert(got(2499)(2) == 2499 / 4.0)
    } finally graft.streaming.WorkDirs.deleteRecursively(dir)
  }

  test("ZSTD-framed files (every section through our own compressor) " +
      "read back via orc-core AND this repo's reader, and shrink") {
    val dir = tmpDir("zstd")
    val dirNone = tmpDir("none")
    try {
      val fields = Seq(OwFields.long("id"), OwFields.string("ev"),
        OwFields.double("d"))
      def rows = (0 until 30000).iterator.map(i => Array[Any](
        Long.box(i.toLong),
        if (i % 50 == 0) null else s"type_${i % 8}", // repetitive
        Double.box((i % 300) * 0.25)))
      val fz = new java.io.File(dir, "part-00000.orc")
      OrcWrite.writeFile(fz.toPath, fields, rows, stripeRows = 8000,
        compression = 5)
      val fn = new java.io.File(dirNone, "part-00000.orc")
      OrcWrite.writeFile(fn.toPath, fields, rows, stripeRows = 8000)
      assert(fz.length() < fn.length() / 2,
        s"zstd ${fz.length()} vs none ${fn.length()}")
      val got = spark.read.orc(dir.toString) // orc-core + its zstd
      assert(got.count() == 30000)
      assert(got.filter("ev = 'type_3'").count() ==
        (0 until 30000).count(i => i % 50 != 0 && i % 8 == 3))
      val bytes = java.nio.file.Files.readAllBytes(fz.toPath)
      val own = OrcData.readRows(bytes, Seq("id", "ev", "d")).toVector
      assert(own.length == 30000)
      assert(own(3)(1) == "type_3" && own(50)(1) == null)
      assert(own(299)(2) == 299 * 0.25)
    } finally {
      graft.streaming.WorkDirs.deleteRecursively(dir)
      graft.streaming.WorkDirs.deleteRecursively(dirNone)
    }
  }

  test("writeDataFrame writes one file per partition where the data " +
      "is; Spark reads the directory back row-identically") {
    import spark.implicits._
    val dir = tmpDir("df")
    try {
      val df = (0 until 20000).map(i =>
        (i.toLong, s"u${i % 97}", i * 0.75,
          if (i % 13 == 0) None else Some(i % 1000)))
        .toDF("id", "u", "v", "opt").repartition(6)
      val n = OrcWrite.writeDataFrame(df, dir.toString)
      assert(n == 20000)
      val parts = dir.listFiles().filter(_.getName.endsWith(".orc"))
      assert(parts.length == 6, s"${parts.length} part files")
      val got = spark.read.orc(dir.toString)
      assert(got.count() == 20000)
      val want = df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      val have = got.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      for ((w, g) <- want.zip(have)) assert(w == g, s"$w vs $g")
      // graftorc (the from-scratch DSv2 source) reads the same dir too
      val own = spark.read.format("graftorc").load(dir.toString)
      assert(own.count() == 20000)
      assert(own.agg(org.apache.spark.sql.functions.sum("opt"))
        .head.getLong(0) ==
        (0 until 20000).filter(_ % 13 != 0).map(i => (i % 1000).toLong).sum)
    } finally graft.streaming.WorkDirs.deleteRecursively(dir)
  }

  test("unsupported shapes reject loudly by name") {
    import org.apache.spark.sql.types._
    val e = intercept[IllegalArgumentException] {
      OrcWrite.fieldsOf(StructType(Seq(
        StructField("m", MapType(StringType, LongType)))))
    }
    assert(e.getMessage.contains("unsupported"))
  }
}
