package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Scd2

/** Dimension-build operators — SURVEY.md §2: S6 row generators (dimdate /
  * dimtime), P8 date parts, P9 hashing, W2/W3 surrogate-key windows, and the
  * K4/J4 SCD2 merge expressed through [[graft.operators.Scd2]].
  *
  * Integer-typed derived columns are cast to long on the Spark side so the
  * schema matches DuckDB's BIGINT arithmetic outputs.
  */
object Dimensions {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // S6/P8: date dimension 2020-01-01..2030-12-31 via explode(sequence(...))
  // (reference: populate_dim.py:33-59 — identical generator SQL). 4,018
  // rows; at any scale this is generated, never stored per-SF.
  private def s6DimDate(s: SparkSession, dir: String): DataFrame = {
    val d = col("calendar_date")
    s.range(1)
      .select(explode(expr(
        "sequence(to_date('2020-01-01'), to_date('2030-12-31'), interval 1 day)"))
        .as("calendar_date"))
      .select(
        (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast("long").as("id"),
        d,
        year(d).cast("long").as("calendar_year"),
        date_format(d, "MMMM").as("month_name"),
        month(d).cast("long").as("month_of_year"),
        date_format(d, "EEEE").as("day_name"),
        (((dayofweek(d) + 5) % 7) + 1).cast("long").as("day_of_week_iso"),
        dayofmonth(d).cast("long").as("day_of_month"),
        dayofyear(d).cast("long").as("day_of_year"),
        weekofyear(d).cast("long").as("week_of_year_iso"))
      .orderBy(col("id"))
  }

  private val s6DimDateSql =
    """SELECT year(d)*10000 + month(d)*100 + day(d) AS id,
      |  d AS calendar_date, year(d) AS calendar_year, monthname(d) AS month_name,
      |  month(d) AS month_of_year, dayname(d) AS day_name,
      |  isodow(d) AS day_of_week_iso, day(d) AS day_of_month,
      |  dayofyear(d) AS day_of_year, weekofyear(d) AS week_of_year_iso
      |FROM (SELECT CAST(ts AS DATE) AS d
      |      FROM generate_series(DATE '2020-01-01', DATE '2030-12-31',
      |                           INTERVAL 1 DAY) t(ts))
      |ORDER BY id""".stripMargin

  // ---------------------------------------------------------------------
  // S6: time-of-day dimension, one row per second (86,400 rows; reference:
  // populate_dim.py:11-31). Pure integer arithmetic + lpad so both engines
  // agree bit-for-bit.
  private def s6DimTime(s: SparkSession, dir: String): DataFrame = {
    val h = expr("id div 3600")
    val m = expr("(id div 60) % 60")
    val sec = expr("id % 60")
    def pad2(c: org.apache.spark.sql.Column) = lpad(c.cast("string"), 2, "0")
    s.range(0, 86400)
      .select(
        col("id"),
        (h * 10000 + m * 100 + sec).as("id_hhmmss"),
        concat_ws(":", pad2(h), pad2(m), pad2(sec)).as("time24"),
        h.as("hour24"),
        m.as("minute_of_hour"),
        sec.as("second_of_minute"),
        (((h + 11) % 12) + 1).as("hour12"),
        when(h < 12, "AM").otherwise("PM").as("am_pm"))
      .orderBy(col("id"))
  }

  private val s6DimTimeSql =
    """SELECT id, (id // 3600)*10000 + ((id // 60) % 60)*100 + (id % 60) AS id_hhmmss,
      |  lpad(CAST(id // 3600 AS VARCHAR), 2, '0') || ':' ||
      |  lpad(CAST((id // 60) % 60 AS VARCHAR), 2, '0') || ':' ||
      |  lpad(CAST(id % 60 AS VARCHAR), 2, '0') AS time24,
      |  id // 3600 AS hour24, (id // 60) % 60 AS minute_of_hour,
      |  id % 60 AS second_of_minute,
      |  ((id // 3600 + 11) % 12) + 1 AS hour12,
      |  CASE WHEN id // 3600 < 12 THEN 'AM' ELSE 'PM' END AS am_pm
      |FROM range(0, 86400) t(id) ORDER BY id""".stripMargin

  // ---------------------------------------------------------------------
  // P9 + W3: attribute hash + surrogate keys in (key, hash) total order
  // (reference: populate_dim.py:112-129). Doubles are canonicalized to
  // integer cents before hashing so the hash string is engine-independent.
  private def p9SurrogateHash(s: SparkSession, dir: String): DataFrame =
    graft.operators.IdAssign.orderedIds(
      t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
        .withColumn("hash", sha2(concat_ws("~",
          col("s_name"),
          round(col("s_acctbal") * 100).cast("long"),
          col("s_nationkey")), 256)),
      Seq(col("s_suppkey"), col("hash")), 0L, "surrogate_key")
      .orderBy(col("surrogate_key"))

  private val p9SurrogateHashSql =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
      |  sha256(concat_ws('~', s_name, CAST(round(s_acctbal*100) AS BIGINT),
      |                   s_nationkey)) AS hash,
      |  row_number() OVER (ORDER BY s_suppkey,
      |    sha256(concat_ws('~', s_name, CAST(round(s_acctbal*100) AS BIGINT),
      |                     s_nationkey))) AS surrogate_key
      |FROM supplier ORDER BY surrogate_key""".stripMargin

  // ---------------------------------------------------------------------
  // W2 + A2: dense sequential id assignment with max-offset (reference:
  // populate_dim.py:91-94,104-106 — row_number over ORDER BY name, offset
  // by current max id). Input is a distinct-values frame (tiny), so the
  // global window is safe; the fact-scale alternative is
  // operators.IdAssign.withSequentialIds (zipWithIndex).
  private def w2DenseIds(s: SparkSession, dir: String): DataFrame =
    graft.operators.IdAssign.orderedIds(
      t(s, dir, "part").select(col("p_brand")).distinct(),
      Seq(col("p_brand")), 100L, "brand_id")
      .orderBy(col("brand_id"))

  private val w2DenseIdsSql =
    """SELECT p_brand, 100 + row_number() OVER (ORDER BY p_brand) AS brand_id
      |FROM (SELECT DISTINCT p_brand FROM part) ORDER BY brand_id""".stripMargin

  // ---------------------------------------------------------------------
  // K4/J4: SCD2 merge — two snapshots of a supplier-derived dimension run
  // through the join-rewrite MERGE engine (reference: populate_dim.py:
  // 131-171 + MERGE statements :71-78,153-163). 1/3 of keys change, two
  // keys are brand new, the rest pass through untouched.
  private def k4Scd2Merge(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val current = graft.operators.IdAssign.orderedIds(
      Scd2.withHash(
        sup.select(
          col("s_suppkey").as("coin_id"),
          col("s_name").as("name"),
          col("s_acctbal").as("supply"))
          .withColumn("cents", round(col("supply") * 100).cast("long")),
        Seq("name", "cents")),
      Seq(col("coin_id")), 0L, "surrogate_key")
      .withColumn("start_date", to_date(lit("2024-01-01")))
      .withColumn("end_date", to_date(lit(Scd2.FarFuture)))
      .withColumn("is_current", lit("Y"))
      .drop("cents")
      .select("surrogate_key", "coin_id", "name", "supply", "hash",
        "start_date", "end_date", "is_current")

    val stagedBase = sup.select(
      col("s_suppkey").as("coin_id"),
      col("s_name").as("name"),
      when(col("s_suppkey") % 3 === 0, col("s_acctbal") + 100.0)
        .otherwise(col("s_acctbal")).as("supply"))
    val stagedNew = sup.filter(col("s_suppkey") < 2).select(
      (col("s_suppkey") + 1000).as("coin_id"),
      concat(lit("NEW_"), col("s_name")).as("name"),
      (col("s_acctbal") * 2.0).as("supply"))
    val staged = Scd2.withHash(
      stagedBase.unionByName(stagedNew)
        .withColumn("cents", round(col("supply") * 100).cast("long")),
      Seq("name", "cents")).drop("cents")

    Scd2.merge(current, staged, "coin_id", "2024-06-01")
      .orderBy(col("coin_id"), col("start_date"), col("surrogate_key"))
  }

  private val k4Scd2MergeSql =
    """WITH cur AS (
      |  SELECT CAST(row_number() OVER (ORDER BY s_suppkey) AS BIGINT) AS surrogate_key,
      |         s_suppkey AS coin_id, s_name AS name, s_acctbal AS supply,
      |         sha256(concat_ws('~', s_name, CAST(round(s_acctbal*100) AS BIGINT))) AS hash,
      |         DATE '2024-01-01' AS start_date, DATE '9999-12-31' AS end_date,
      |         'Y' AS is_current
      |  FROM supplier),
      |staged0 AS (
      |  SELECT s_suppkey AS coin_id, s_name AS name,
      |         CASE WHEN s_suppkey % 3 = 0 THEN s_acctbal + 100.0
      |              ELSE s_acctbal END AS supply
      |  FROM supplier
      |  UNION ALL
      |  SELECT s_suppkey + 1000, 'NEW_' || s_name, s_acctbal * 2.0
      |  FROM supplier WHERE s_suppkey < 2),
      |staged AS (
      |  SELECT *, sha256(concat_ws('~', name, CAST(round(supply*100) AS BIGINT))) AS hash
      |  FROM staged0),
      |changed AS (
      |  SELECT st.* FROM staged st
      |  LEFT JOIN cur ON st.coin_id = cur.coin_id AND st.hash = cur.hash
      |  WHERE cur.coin_id IS NULL),
      |expired AS (
      |  SELECT surrogate_key, coin_id, name, supply, hash, start_date,
      |         DATE '2024-06-01' AS end_date, 'N' AS is_current
      |  FROM cur WHERE coin_id IN (SELECT coin_id FROM changed)),
      |untouched AS (
      |  SELECT * FROM cur WHERE coin_id NOT IN (SELECT coin_id FROM changed)),
      |newrows AS (
      |  SELECT (SELECT max(surrogate_key) FROM cur)
      |           + row_number() OVER (ORDER BY coin_id, hash) AS surrogate_key,
      |         coin_id, name, supply, hash,
      |         DATE '2024-06-01' AS start_date, DATE '9999-12-31' AS end_date,
      |         'Y' AS is_current
      |  FROM changed)
      |SELECT * FROM untouched UNION ALL SELECT * FROM expired
      |UNION ALL SELECT * FROM newrows
      |ORDER BY coin_id, start_date, surrogate_key""".stripMargin

  // ---------------------------------------------------------------------
  // K4 streaming: the reference's ACTUAL dimension architecture — a stream
  // of staged snapshots merged into the SCD2 dimension per micro-batch via
  // foreachBatch (reference: populate_dim.py runs per ingest batch;
  // AutomateTable.py:31-40 wires it behind the stream). Three full
  // snapshot files replay mtime-ordered at maxFilesPerTrigger=1; the
  // handler groups each batch by effective_date and applies merges in date
  // order, so the result is identical under ANY trigger slicing (all
  // three files coalescing into one batch included). Dimension state
  // persists across batches as a parquet dir: the merge output is
  // localCheckpointed (materialized off its input files) before
  // overwriting the dir it read — the atomic-swap pattern at micro-batch
  // cadence. The oracle is the CLOSED FORM of the three sequential merges
  // (per-key version chains with exact start/end dates and the same
  // (key, hash)-ordered surrogate assignment), so every mechanic — change
  // detection by hash, expiry, surrogate offsets across batches — is
  // value-checked end to end.
  private def stScd2Stream(s: SparkSession, dir: String): DataFrame =
    scd2StreamBody(s, dir, filesPerTrigger = Some(1))

  /** Spec surface: the same pipeline with ALL snapshot files coalescing
    * into one micro-batch — exercises the handler's multi-date sequential
    * merge branch, which must produce the identical dimension.
    */
  private[graft] def scd2StreamOneBatch(s: SparkSession, dir: String): DataFrame =
    scd2StreamBody(s, dir, filesPerTrigger = None)

  private def scd2StreamBody(s: SparkSession, dir: String,
      filesPerTrigger: Option[Int]): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-scd2s-${java.util.UUID.randomUUID()}").getAbsolutePath
    val spool = s"$work/spool"
    val stateDir = s"$work/dim"
    val sup = t(s, dir, "supplier").select(
      col("s_suppkey").as("coin_id"), col("s_name").as("name"),
      col("s_acctbal").as("base"))
    val snap1 = sup.select(col("coin_id"), col("name"),
      col("base").as("supply"), lit("2024-01-01").as("effective_date"))
    val supply2 = when(pmod(col("coin_id"), lit(3L)) === 0,
      col("base") + 100.0).otherwise(col("base"))
    val news12 = sup.filter(col("coin_id") < 2).select(
      (col("coin_id") + 1000L).as("coin_id"),
      concat(lit("NEW_"), col("name")).as("name"),
      (col("base") * 2.0).as("supply"))
    val snap2 = sup.select(col("coin_id"), col("name"),
      supply2.as("supply")).unionByName(news12)
      .withColumn("effective_date", lit("2024-06-01"))
    val supply3 = when(pmod(col("coin_id"), lit(5L)) === 0,
      supply2 + 7.0).otherwise(supply2)
    val new3 = sup.filter(col("coin_id") < 1).select(
      (col("coin_id") + 2000L).as("coin_id"),
      concat(lit("NEW2_"), col("name")).as("name"),
      (col("base") * 3.0).as("supply"))
    val snap3 = sup.select(col("coin_id"), col("name"),
      supply3.as("supply")).unionByName(news12).unionByName(new3)
      .withColumn("effective_date", lit("2024-09-01"))
    val t0 = System.currentTimeMillis()
    Seq(snap1, snap2, snap3).zipWithIndex.foreach { case (df, i) =>
      graft.streaming.EventTimeOrderedSpool.spoolSingleFile(df,
        s"$spool/snap-$i.parquet", t0 + i * 1000L)
    }
    val inSchema = StructType(Seq(
      StructField("coin_id", LongType), StructField("name", StringType),
      StructField("supply", DoubleType),
      StructField("effective_date", StringType)))
    val dimSchema = StructType(Seq(
      StructField("surrogate_key", LongType),
      StructField("coin_id", LongType), StructField("name", StringType),
      StructField("supply", DoubleType), StructField("hash", StringType),
      StructField("start_date", DateType), StructField("end_date", DateType),
      StructField("is_current", StringType)))
    val reader0 = s.readStream.schema(inSchema)
    val reader = filesPerTrigger
      .map(n => reader0.option("maxFilesPerTrigger", n)).getOrElse(reader0)
    val q = reader
      .parquet(s"$spool/*.parquet")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dates = batch.select(col("effective_date")).distinct()
          .collect().map(_.getString(0)).sorted
        dates.foreach { d =>
          val staged = Scd2.withHash(
            batch.filter(col("effective_date") === d)
              .drop("effective_date")
              .withColumn("cents", round(col("supply") * 100).cast("long")),
            Seq("name", "cents")).drop("cents")
          val cur =
            if (new java.io.File(stateDir).exists())
              s.read.schema(dimSchema).parquet(stateDir)
            else s.createDataFrame(
              java.util.List.of[org.apache.spark.sql.Row](), dimSchema)
          Scd2.merge(cur, staged, "coin_id", d)
            .localCheckpoint() // materialize BEFORE overwriting the input
            .write.mode("overwrite").parquet(stateDir)
        }
        ()
      }
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.streaming.WorkDirs.materializeAndClean(
      s.read.schema(dimSchema).parquet(stateDir)
        .orderBy(col("coin_id"), col("start_date"), col("surrogate_key")),
      work)
  }

  private val stScd2StreamSql =
    """WITH base AS (
      |  SELECT s_suppkey AS k, s_name AS name, s_acctbal AS base
      |  FROM supplier),
      |n1 AS (SELECT count(*) AS c FROM base),
      |v1 AS (
      |  SELECT CAST(row_number() OVER (ORDER BY k) AS BIGINT)
      |           AS surrogate_key,
      |         k AS coin_id, name, base AS supply,
      |         DATE '2024-01-01' AS start_date,
      |         CASE WHEN k % 3 = 0 THEN DATE '2024-06-01'
      |              WHEN k % 5 = 0 THEN DATE '2024-09-01'
      |              ELSE DATE '9999-12-31' END AS end_date,
      |         CASE WHEN k % 3 = 0 OR k % 5 = 0 THEN 'N' ELSE 'Y' END
      |           AS is_current
      |  FROM base),
      |chg2 AS (
      |  SELECT k AS coin_id, name, base + 100.0 AS supply, k % 5 = 0 AS chg3
      |  FROM base WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT k + 1000, 'NEW_' || name, base * 2.0, FALSE
      |  FROM base WHERE k < 2),
      |v2 AS (
      |  SELECT (SELECT c FROM n1)
      |           + CAST(row_number() OVER (ORDER BY coin_id) AS BIGINT)
      |           AS surrogate_key,
      |         coin_id, name, supply,
      |         DATE '2024-06-01' AS start_date,
      |         CASE WHEN chg3 THEN DATE '2024-09-01'
      |              ELSE DATE '9999-12-31' END AS end_date,
      |         CASE WHEN chg3 THEN 'N' ELSE 'Y' END AS is_current
      |  FROM chg2),
      |n2 AS (SELECT (SELECT c FROM n1) + count(*) AS c FROM chg2),
      |chg3 AS (
      |  SELECT k AS coin_id, name,
      |         (CASE WHEN k % 3 = 0 THEN base + 100.0 ELSE base END) + 7.0
      |           AS supply
      |  FROM base WHERE k % 5 = 0
      |  UNION ALL
      |  SELECT k + 2000, 'NEW2_' || name, base * 3.0 FROM base WHERE k < 1),
      |v3 AS (
      |  SELECT (SELECT c FROM n2)
      |           + CAST(row_number() OVER (ORDER BY coin_id) AS BIGINT)
      |           AS surrogate_key,
      |         coin_id, name, supply,
      |         DATE '2024-09-01' AS start_date,
      |         DATE '9999-12-31' AS end_date, 'Y' AS is_current
      |  FROM chg3)
      |SELECT surrogate_key, coin_id, name, supply,
      |  sha256(concat_ws('~', name, CAST(round(supply*100) AS BIGINT)))
      |    AS hash,
      |  start_date, end_date, is_current
      |FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2
      |      UNION ALL SELECT * FROM v3)
      |ORDER BY coin_id, start_date, surrogate_key""".stripMargin

  // P11 follow-on: current-state view of the merged dimension (reference:
  // populate_dim.py:141 `where("is_current = 'Y'")` before joining facts).
  private def k4Scd2Current(s: SparkSession, dir: String): DataFrame =
    k4Scd2Merge(s, dir)
      .filter(col("is_current") === "Y")
      .select(col("coin_id"), col("name"), col("supply"), col("surrogate_key"))
      .orderBy(col("coin_id"))

  private val k4Scd2CurrentSql =
    s"""SELECT coin_id, name, supply, surrogate_key
       |FROM ($k4Scd2MergeSql)
       |WHERE is_current = 'Y' ORDER BY coin_id""".stripMargin

  // ---------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "s6_dimdate" -> s6DimDate _,
    "s6_dimtime" -> s6DimTime _,
    "p9_surrogate_hash" -> p9SurrogateHash _,
    "w2_dense_ids" -> w2DenseIds _,
    "k4_scd2_merge" -> k4Scd2Merge _,
    "k4_scd2_current" -> k4Scd2Current _,
    "st_scd2_stream" -> stScd2Stream _
  )

  val oracle: Map[String, String] = Map(
    "s6_dimdate" -> s6DimDateSql,
    "s6_dimtime" -> s6DimTimeSql,
    "p9_surrogate_hash" -> p9SurrogateHashSql,
    "w2_dense_ids" -> w2DenseIdsSql,
    "k4_scd2_merge" -> k4Scd2MergeSql,
    "k4_scd2_current" -> k4Scd2CurrentSql,
    "st_scd2_stream" -> stScd2StreamSql
  )
}
