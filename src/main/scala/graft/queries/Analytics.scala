package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t

/** Analytic-function coverage beyond the reference's row_number/lag-only
  * surface (SURVEY §2.6 notes rank/dense_rank/ntile/lead and grouping sets
  * are absent there) — a user migrating real dashboards needs them.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  // rank / dense_rank / ntile / lead over per-customer order history.
  private def w6RankSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rnk"), col("drnk"), col("quartile"), col("next_price"))
      .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
  }

  private val w6RankSuiteSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk, drnk, quartile, next_price
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
      |    ntile(4) OVER w AS quartile,
      |    lead(o_totalprice, 1) OVER w AS next_price
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY o_totalprice DESC, o_orderkey))
      |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin

  // Rollup subtotals over the star join (grouping-set family). NULL
  // indicator rows are coalesced to 'ALL' so output is null-free and
  // total-ordered identically in both engines.
  private def a5Rollup(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("revenue"), col("n_lines"))
      .orderBy(col("region"), col("nation"))
  }

  private val a5RollupSql =
    """SELECT coalesce(r_name, 'ALL') AS region,
      |  coalesce(n_name, 'ALL') AS nation,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  // ---------------------------------------------------------------------
  // A9: CUBE — all four grouping combinations in one pass (rollup's
  // lattice completion; one shuffle, grouping-set expansion handled by
  // the planner). 'ALL' coalescing keeps the oracle free of engine null-
  // ordering differences, same as a5_rollup.
  private def a9Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(round(col("l_quantity") * 100).cast("long")) / 100.0)
          .as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n_lines"))
      .orderBy(col("returnflag"), col("linestatus"))

  private val a9CubeSql =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
      |  count(*) AS n_lines
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // K7: bucketed co-located join — both sides written bucketed+sorted on
  // the join key, so the sort-merge join runs with no exchange on either
  // side (asserted in BucketStreamSpec). The query itself is plain
  // revenue-per-priority; its plan is the point.
  private def k7BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = graft.operators.Bucketing.ensureBucketed(
      s, dir, "lineitem", "l_orderkey", 8)
    val o = graft.operators.Bucketing.ensureBucketed(
      s, dir, "orders", "o_orderkey", 8)
    s.table(li)
      .join(s.table(o), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0)
          .as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  private val k7BucketedJoinSql =
    """SELECT o_orderpriority,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS revenue,
      |  count(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // Stream-stream interval join (absent from the reference — §2.9 notes no
  // stream-stream joins): clicks joined to the same user's purchases
  // within the following 2 hours, both sides watermarked. Runs as a real
  // two-source streaming query; oracle is the equivalent batch interval
  // join.
  //
  // BENCH FLOOR NOTE (the whole ss_* family): each query pays a fixed
  // streaming-machinery cost — two full source scans, stream-stream
  // state-store initialization on both sides, and the watermark/commit
  // barrier — that dominates its wall time; the batch twin (the oracle's
  // interval join) runs in ~0.3 s at sf0.1 while the streaming form
  // floors at ~2.2–2.6 s. The r13 record's 2.0↔6.6 s run-to-run jitter
  // was in-JVM accumulation in the old single-JVM sweep, not query
  // variance: under the r14 per-shard-forked harness three consecutive
  // isolated runs measured every ss_* query within ±10 % of that floor.
  //
  // RESIDUAL-JITTER MECHANISM (r15, measured via the bench's per-query
  // JIT counter): the multi-trigger tail (`k2_stream_fact`,
  // `st_incremental_neardup`, `st_ivm_stream`) generates fresh
  // whole-stage-codegen classes per micro-batch, and background C2
  // compilation of those classes burns 4–20 s of process CPU inside a
  // 4–10 s wall — compiler-queue timing, not query work, is what moves
  // between runs. Three consecutive isolated runs (r15): k2 3.99–4.84 s,
  // st_ivm 6.58–9.14 s, neardup 7.58–10.68 s — all inside the ±30 %
  // band the floor contract promises; bench.json's `jit` map carries
  // the per-query evidence every round.
  private def ssStreamStreamJoin(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-ssjoin-${java.util.UUID.randomUUID()}").getAbsolutePath
    // footer-derived schema + canonical ts (graft.Tables.eventsStream)
    def stream() = graft.Tables.eventsStream(s, dir)
    val clicks = stream().filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 2 HOURS"))
      .select(col("click_id"), col("purchase_id"), col("user_id"))
    val q = joined.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.streaming.WorkDirs.materializeAndClean(
      s.read.parquet(s"$work/out")
        .orderBy(col("click_id"), col("purchase_id")), work)
  }

  private val ssStreamStreamJoinSql =
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
      |ORDER BY click_id, purchase_id""".stripMargin

  // ---------------------------------------------------------------------
  // Stream-stream LEFT OUTER interval join — the hard half of streaming
  // joins: an unmatched click can only emit its null row once the
  // purchase-side WATERMARK has passed the click's whole join window
  // (otherwise a late purchase could still match). With a 2h watermark
  // delay and a 2h window, the final GLOBAL watermark is
  // min(max click ts, max purchase ts) − 2h — each side's watermark
  // advances on ITS OWN stream's max event time (millisecond-truncated,
  // Spark watermarks are epoch-ms) and the join takes the minimum — so
  // unmatched clicks whose window end is not strictly below that are
  // still held in state when the bounded replay ends: exactly the rows
  // the closed-form oracle must also exclude. Matched pairs are never
  // held back.
  private def ssStreamStreamLeft(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-ssleft-${java.util.UUID.randomUUID()}").getAbsolutePath
    // footer-derived schema + canonical ts (graft.Tables.eventsStream)
    def stream() = graft.Tables.eventsStream(s, dir)
    val clicks = stream().filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 2 HOURS"),
      "leftOuter")
      .select(col("click_id"), col("purchase_id"), col("user_id"))
    val q = joined.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.streaming.WorkDirs.materializeAndClean(
      s.read.parquet(s"$work/out")
        .orderBy(col("click_id"), col("purchase_id")), work)
  }

  private val ssStreamStreamLeftSql =
    """WITH clicks AS (
      |  SELECT event_id AS click_id, user_id, ts FROM events
      |  WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT event_id AS purchase_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase'),
      |matched AS (
      |  SELECT c.click_id, p.purchase_id, c.user_id
      |  FROM clicks c JOIN purchases p
      |    ON c.user_id = p.user_id
      |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR),
      |unmatched AS (
      |  SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id
      |  FROM clicks c
      |  WHERE NOT EXISTS (
      |      SELECT 1 FROM purchases p
      |      WHERE p.user_id = c.user_id
      |        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR)
      |    AND c.ts + INTERVAL 2 HOUR
      |        < make_timestamp(least(
      |            (SELECT epoch_ms(max(ts)) FROM clicks),
      |            (SELECT epoch_ms(max(ts)) FROM purchases))
      |            * 1000) - INTERVAL 2 HOUR)
      |SELECT * FROM matched
      |UNION ALL SELECT * FROM unmatched
      |ORDER BY click_id, purchase_id""".stripMargin

  // ---------------------------------------------------------------------
  // Stream-stream LEFT SEMI interval join — the "which clicks converted"
  // probe without purchase columns: a click emits ONCE when its first
  // in-window purchase arrives, and never again (the engine's semi-join
  // state dedups further matches); state on both sides is bounded by the
  // same watermark arithmetic as the inner join. The batch EXISTS form
  // is the oracle — every click with at least one in-window purchase,
  // exactly once.
  private def ssStreamStreamSemi(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-sssemi-${java.util.UUID.randomUUID()}").getAbsolutePath
    // footer-derived schema + canonical ts (graft.Tables.eventsStream)
    def stream() = graft.Tables.eventsStream(s, dir)
    val clicks = stream().filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 2 HOURS"),
      "left_semi")
      .select(col("click_id"), col("user_id"))
    val q = joined.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.streaming.WorkDirs.materializeAndClean(
      s.read.parquet(s"$work/out").orderBy(col("click_id")), work)
  }

  private val ssStreamStreamSemiSql =
    """SELECT c.event_id AS click_id, c.user_id
      |FROM events c
      |WHERE c.event_type = 'click'
      |  AND EXISTS (
      |    SELECT 1 FROM events p
      |    WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
      |      AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR)
      |ORDER BY click_id""".stripMargin

  // ---------------------------------------------------------------------
  // Stream-stream FULL OUTER interval join — both null directions at
  // once: an unmatched click emits once the purchase watermark clears
  // its whole 2h match window (the left-outer condition), and an
  // unmatched purchase emits once the click watermark clears ITS window
  // — clicks that could match purchase p have ts in [p.ts − 2h, p.ts],
  // so p's null row needs the global watermark past p.ts only. State on
  // both sides stays watermark-bounded exactly as in the inner join.
  private def ssStreamStreamFull(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-ssfull-${java.util.UUID.randomUUID()}").getAbsolutePath
    // footer-derived schema + canonical ts (graft.Tables.eventsStream)
    def stream() = graft.Tables.eventsStream(s, dir)
    val clicks = stream().filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 2 HOURS"),
      "full_outer")
      .select(col("click_id"), col("purchase_id"),
        coalesce(col("user_id"), col("p_user_id")).as("user_id"))
    val q = joined.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.streaming.WorkDirs.materializeAndClean(
      s.read.parquet(s"$work/out")
        .orderBy(col("click_id"), col("purchase_id")), work)
  }

  private val ssStreamStreamFullSql =
    """WITH clicks AS (
      |  SELECT event_id AS click_id, user_id, ts FROM events
      |  WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT event_id AS purchase_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase'),
      |wm AS (
      |  SELECT make_timestamp(least(
      |      (SELECT epoch_ms(max(ts)) FROM clicks),
      |      (SELECT epoch_ms(max(ts)) FROM purchases)) * 1000)
      |      - INTERVAL 2 HOUR AS g),
      |matched AS (
      |  SELECT c.click_id, p.purchase_id, c.user_id
      |  FROM clicks c JOIN purchases p
      |    ON c.user_id = p.user_id
      |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR),
      |unmatched_c AS (
      |  SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id
      |  FROM clicks c, wm
      |  WHERE NOT EXISTS (
      |      SELECT 1 FROM purchases p
      |      WHERE p.user_id = c.user_id
      |        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR)
      |    AND c.ts + INTERVAL 2 HOUR < wm.g),
      |unmatched_p AS (
      |  SELECT CAST(NULL AS BIGINT) AS click_id, p.purchase_id, p.user_id
      |  FROM purchases p, wm
      |  WHERE NOT EXISTS (
      |      SELECT 1 FROM clicks c
      |      WHERE c.user_id = p.user_id
      |        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR)
      |    AND p.ts < wm.g)
      |SELECT * FROM matched
      |UNION ALL SELECT * FROM unmatched_c
      |UNION ALL SELECT * FROM unmatched_p
      |ORDER BY click_id, purchase_id""".stripMargin

  // ---------------------------------------------------------------------
  // Streaming deduplication with state (dropDuplicates + watermark): keep
  // one row per (user, minute). Only the KEY SET is deterministic (which
  // physical row survives depends on shuffle arrival order), so the query
  // projects the keys — exactly what a dedup pipeline keys on.
  private def stDropdupStream(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
      dropdupBody(s, dir)
    }

  // The same dedup pipeline with its state in the RocksDB state store
  // provider — the tier a 100-TB stream needs once keyed state outgrows
  // the executor heap: RocksDB holds state off-heap/on-disk per partition
  // with incremental (changelog-capable) checkpointing, where the default
  // HDFS-backed provider keeps every key in JVM memory. State BACKEND is
  // an operational knob, never semantics: the same DuckDB oracle as
  // st_dropdup_stream asserts bit-identical results.
  private def stRocksdbDedup(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try dropdupBody(s, dir)
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }

  private def dropdupBody(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-dropdup-${java.util.UUID.randomUUID()}").getAbsolutePath
    val deduped = graft.Tables.eventsStream(s, dir)
      .withColumn("minute", date_trunc("minute", col("ts")))
      .withWatermark("minute", "10 minutes")
      .dropDuplicates("user_id", "minute")
      .select(col("user_id"), col("minute"))
    val q = deduped.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.streaming.WorkDirs.materializeAndClean(
      s.read.parquet(s"$work/out")
        .orderBy(col("user_id"), col("minute")), work)
  }

  private val stRocksdbDedupSql =
    """SELECT DISTINCT user_id, date_trunc('minute', ts) AS minute
      |FROM events ORDER BY user_id, minute""".stripMargin

  private val stDropdupStreamSql =
    """SELECT DISTINCT user_id, date_trunc('minute', ts) AS minute
      |FROM events ORDER BY user_id, minute""".stripMargin

  // ---------------------------------------------------------------------
  // Streaming data-quality gate: the DLT expectations tier applied per
  // micro-batch (expect_or_drop semantics on a live stream) — kept rows
  // land in the silver sink, quarantined rows in the audit sink tagged
  // with every rule they failed. The summary is computed from the SINK
  // CONTENTS after the replay, so it is trigger-slicing independent by
  // construction, and the DuckDB oracle recomputes the same kept/
  // quarantine partition — including rows failing BOTH drop rules —
  // from the batch table.
  private def stExpectStream(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.sql.types._
      import graft.operators.Expectations
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-expstream-${java.util.UUID.randomUUID()}").getAbsolutePath
      val q = graft.Tables.eventsStream(s, dir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val res = Expectations.check(batch, Seq(
            Expectations.Rule("type_known",
              col("event_type") =!= "error", Expectations.Drop),
            Expectations.Rule("value_cap",
              col("value") <= 400.0, Expectations.Drop),
            Expectations.Rule("value_floor",
              col("value") >= 0.5, Expectations.Warn)))
          res.kept.select(col("event_id"), col("value"))
            .write.mode("append").parquet(s"$work/kept")
          res.quarantined.select(col("event_id"), col("value"),
              col("_failed_rules"))
            .write.mode("append").parquet(s"$work/quarantine")
          ()
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // a sink never written to (input with zero violations / zero passes)
      // must read as empty, not crash the summary
      def sink(path: String, schema: StructType) =
        if (new java.io.File(path).exists()) s.read.schema(schema).parquet(path)
        else s.createDataFrame(
          java.util.List.of[org.apache.spark.sql.Row](), schema)
      val kept = sink(s"$work/kept", StructType(Seq(
          StructField("event_id", LongType),
          StructField("value", DoubleType))))
        .select(lit("_kept").as("bucket"), col("value"))
      val quar = sink(s"$work/quarantine", StructType(Seq(
          StructField("event_id", LongType),
          StructField("value", DoubleType),
          StructField("_failed_rules", ArrayType(StringType)))))
        .select(array_join(array_sort(col("_failed_rules")), ",")
          .as("bucket"), col("value"))
      val out = kept.unionByName(quar)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .orderBy(col("bucket"))
      graft.streaming.WorkDirs.materializeAndClean(out, work)
    }

  private val stExpectStreamSql =
    """WITH ev AS (
      |  SELECT value,
      |    NOT coalesce(event_type <> 'error', FALSE) AS f_type,
      |    NOT coalesce(value <= 400.0, FALSE) AS f_cap
      |  FROM events),
      |tagged AS (
      |  SELECT CASE WHEN NOT f_type AND NOT f_cap THEN '_kept'
      |    ELSE concat_ws(',',
      |      CASE WHEN f_type THEN 'type_known' END,
      |      CASE WHEN f_cap THEN 'value_cap' END) END AS bucket, value
      |  FROM ev)
      |SELECT bucket, count(*) AS n_rows,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
      |FROM tagged GROUP BY bucket ORDER BY bucket""".stripMargin

  // Arbitrary streaming state: mapGroupsWithState accumulating a per-user
  // profile (count, value cents total, first/last second) — the custom
  // state-machine tier the tumbling/session windows can't express.
  //
  // Multi-batch safe: update mode emits a group's CUMULATIVE state in every
  // micro-batch that touches it, and the foreachBatch sink appends all of
  // them — so each emission is tagged with its batch id and the read-back
  // keeps only the LATEST emission per user (max_by on batch_id). Correct
  // for any trigger slicing (maxFilesPerTrigger=1, multi-file input, …),
  // not just the single-batch accident.
  /** @param maxFilesPerTrigger forces multi-micro-batch replay when the
    *                           input has several files (mirrors the
    *                           reference's repeated-trigger ingestion,
    *                           streaming_pipeline.py:41-48)
    */
  def mapGroupsProfiles(s: SparkSession, basePath: String, glob: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(glob)) {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
    import org.apache.spark.sql.types._
    import s.implicits._
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-mgs-${java.util.UUID.randomUUID()}").getAbsolutePath
    val events = graft.Tables.streamEvents(s, basePath, glob,
        maxFilesPerTrigger.map("maxFilesPerTrigger" -> _.toString).toMap)
      .select(col("user_id"),
        unix_timestamp(col("ts")).as("sec"), // floor epoch seconds
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)]
    // state: (n_events, total_cents, first_sec, last_sec)
    val update = (user: Long, it: Iterator[(Long, Long, Long)],
        state: GroupState[(Long, Long, Long, Long)]) => {
      val prev = state.getOption.getOrElse((0L, 0L, Long.MaxValue, Long.MinValue))
      val next = it.foldLeft(prev) { case ((n, tot, f, l), (_, sec, cents)) =>
        (n + 1, tot + cents, math.min(f, sec), math.max(l, sec))
      }
      state.update(next)
      (user, next._1, next._2 / 100.0, next._3, next._4)
    }
    val profiles = events.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long),
        (Long, Long, Double, Long, Long)](GroupStateTimeout.NoTimeout)(update)
      .toDF("user_id", "n_events", "total_value", "first_sec", "last_sec")
    val q = profiles.writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        df.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(s"$work/out")
      }
      .option("checkpointLocation", s"$work/_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Latest emission per user == complete accumulated state for that user
    // (state is monotone-cumulative; later batches re-emit everything seen).
    graft.streaming.WorkDirs.materializeAndClean(
      s.read.parquet(s"$work/out")
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("n_events"), col("total_value"),
            col("first_sec"), col("last_sec")),
          col("batch_id")).as("p"))
        .select(col("user_id"), col("p.n_events").as("n_events"),
          col("p.total_value").as("total_value"),
          col("p.first_sec").as("first_sec"), col("p.last_sec").as("last_sec"))
        .orderBy(col("user_id")), work)
  }

  private def stMapgroupsState(s: SparkSession, dir: String): DataFrame =
    // maxFilesPerTrigger=1: every input file becomes its own micro-batch,
    // so the production query exercises the multi-batch path whenever the
    // source directory holds more than one events file.
    mapGroupsProfiles(s, dir, s"$dir/events*.parquet", Some(1))

  // ---------------------------------------------------------------------
  // Streaming ordered-funnel detection (view → click → purchase) — the
  // CEP (complex-event-processing) tier of the stateful family: a per-
  // user state machine over an UNORDERED event stream, anchored to the
  // batch funnel's closed form (an_funnel), so the streamed result must
  // equal the batch answer under any trigger slicing. Arrival order is
  // the crux: a later-arriving EARLIER view can newly admit clicks that
  // were already seen, so the sufficient state is (min view ts, click ts
  // multiset, purchase ts multiset), re-deriving (t1, t2, t3) per
  // emission — events per user bound the state here; a production
  // deployment bounds it with the watermark (events older than the
  // watermark can be folded irrevocably). Same update-mode + batch-id +
  // latest-emission-per-user read-back contract as st_mapgroups_state.
  private def stFunnelStream(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
      Trigger}
    import s.implicits._
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-funnel-${java.util.UUID.randomUUID()}").getAbsolutePath
    val events = graft.Tables.eventsStream(s, dir,
        Map("maxFilesPerTrigger" -> "1"))
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .as[(Long, String, Long)]
    type St = (Long, Seq[Long], Seq[Long]) // (minView, clicks, purchases)
    val update = (user: Long, it: Iterator[(Long, String, Long)],
        state: GroupState[St]) => {
      var (mv, clicks, purch) = state.getOption
        .getOrElse((Long.MaxValue, Seq.empty[Long], Seq.empty[Long]))
      it.foreach {
        case (_, "view", us) => mv = math.min(mv, us)
        case (_, "click", us) => clicks = clicks :+ us
        case (_, _, us) => purch = purch :+ us
      }
      state.update((mv, clicks, purch))
      val t1 = if (mv == Long.MaxValue) None else Some(mv)
      val t2 = t1.flatMap(a => clicks.filter(_ > a).minOption)
      val t3 = t2.flatMap(b => purch.filter(_ > b).minOption)
      (user, t1.isDefined, t2.isDefined, t3.isDefined)
    }
    val reached = events.groupByKey(_._1)
      .mapGroupsWithState[(Long, Seq[Long], Seq[Long]),
        (Long, Boolean, Boolean, Boolean)](
        GroupStateTimeout.NoTimeout)(update)
      .toDF("user_id", "s1", "s2", "s3")
    val q = reached.writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        df.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(s"$work/out")
      }
      .option("checkpointLocation", s"$work/_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fin = s.read.parquet(s"$work/out")
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("s1"), col("s2"), col("s3")), col("batch_id"))
        .as("p"))
    val agg = fin.agg(
      sum(when(col("p.s1"), lit(1L)).otherwise(lit(0L))).as("n1"),
      sum(when(col("p.s2"), lit(1L)).otherwise(lit(0L))).as("n2"),
      sum(when(col("p.s3"), lit(1L)).otherwise(lit(0L))).as("n3"))
    graft.streaming.WorkDirs.materializeAndClean(
      agg.select(explode(array(
          struct(lit("1_view").as("stage"), col("n1").as("n_users")),
          struct(lit("2_click").as("stage"), col("n2").as("n_users")),
          struct(lit("3_purchase").as("stage"), col("n3").as("n_users"))))
          .as("st"), col("n1"))
        .select(col("st.stage").as("stage"),
          col("st.n_users").as("n_users"),
          round(col("st.n_users") / col("n1").cast("double"), 6)
            .as("conv_rate"))
        .orderBy(col("stage")), work)
  }

  // Identical closed form to an_funnel (Relational) — the streamed state
  // machine must land on the batch answer under any trigger slicing.
  private val stFunnelStreamSql =
    """WITH t1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN t1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
      |t3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN t2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1),
      |stages AS (
      |  SELECT '1_view' AS stage, count(*) AS n FROM t1
      |  UNION ALL SELECT '2_click', count(*) FROM t2
      |  UNION ALL SELECT '3_purchase', count(*) FROM t3),
      |top AS (SELECT count(*) AS n_top FROM t1)
      |SELECT stage, n AS n_users,
      |  round(n / CAST(n_top AS DOUBLE), 6) AS conv_rate
      |FROM stages CROSS JOIN top ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------------
  // The SAME profile on Spark 4's transformWithState — the successor
  // arbitrary-state API (typed ValueState handles, RocksDB-required,
  // TTL/timers available). Pinning both APIs to one oracle proves the
  // migration path: a user can move a mapGroupsWithState processor to a
  // StatefulProcessor without a semantic change.
  private def stTransformState(s: SparkSession, dir: String): DataFrame =
    transformProfiles(s, dir, new graft.streaming.ProfileProcessor,
      processingTime = false)

  // The SAME profile again with a per-state TTL (TTLConfig) — the
  // state-store-bounding tier of the new API: TTL far above the replay's
  // wall time means nothing expires here, so the ONE oracle pins all
  // three state APIs (mapGroupsWithState, transformWithState, TTL'd
  // transformWithState) to one result; the expiry behavior itself (state
  // reads absent after the TTL, profile restarts) is asserted with a
  // short TTL in StreamingSpec, where wall time is controlled.
  private def stTransformTtl(s: SparkSession, dir: String): DataFrame =
    transformProfiles(s, dir,
      new graft.streaming.TtlProfileProcessor(3600L * 1000L),
      processingTime = true) // TTL state requires ProcessingTime mode

  // ListState tier of the new API: per-user BOUNDED top-3 events by
  // (cents desc, sec asc) — the leaderboard/recent-items state shape.
  // The kept set is a pure function of the event multiset (arrival order
  // and batch slicing cannot change it), so a closed-form window oracle
  // pins the streamed result exactly; state is 3 items per key at any
  // input volume.
  private def stTransformList(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import org.apache.spark.sql.types._
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-twl-${java.util.UUID.randomUUID()}").getAbsolutePath
      val events = graft.Tables.eventsStream(s, dir,
          Map("maxFilesPerTrigger" -> "1"))
        .select(col("user_id"),
          unix_timestamp(col("ts")).as("sec"),
          round(col("value") * 100).cast("long").as("cents"))
        .as[(Long, Long, Long)]
      val tops = events.groupByKey(_._1)
        .transformWithState(new graft.streaming.TopEventsProcessor(3),
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_kept", "kept_cents", "best_sec")
      val q = tops.writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], batchId: Long) =>
          df.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(s"$work/out")
        }
        .option("checkpointLocation", s"$work/_chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.WorkDirs.materializeAndClean(
        s.read.parquet(s"$work/out")
          .groupBy(col("user_id"))
          .agg(max_by(
            struct(col("n_kept"), col("kept_cents"), col("best_sec")),
            col("batch_id")).as("p"))
          .select(col("user_id"), col("p.n_kept").as("n_kept"),
            col("p.kept_cents").as("kept_cents"),
            col("p.best_sec").as("best_sec"))
          .orderBy(col("user_id")), work)
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  private val stTransformListSql =
    """WITH ev AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events),
      |ranked AS (
      |  SELECT user_id, sec, cents,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY cents DESC, sec) AS rn
      |  FROM ev)
      |SELECT user_id, count(*) AS n_kept,
      |  CAST(sum(cents) AS BIGINT) AS kept_cents,
      |  CAST(min(CASE WHEN rn = 1 THEN sec END) AS BIGINT) AS best_sec
      |FROM ranked WHERE rn <= 3
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // MapState tier of the new API: per-user event_type → (count, cents)
  // accumulators — sub-keyed state where only touched entries are
  // read/written per batch. One oracled row per (user, type); the final
  // map content is a pure function of the event multiset.
  private def stTransformMap(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import org.apache.spark.sql.types._
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-twm-${java.util.UUID.randomUUID()}").getAbsolutePath
      val events = graft.Tables.eventsStream(s, dir,
          Map("maxFilesPerTrigger" -> "1"))
        .select(col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .as[(Long, String, Long)]
      val typed = events.groupByKey(_._1)
        .transformWithState(new graft.streaming.TypeCountsProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "event_type", "n_events", "cents_total")
      val q = typed.writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], batchId: Long) =>
          df.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(s"$work/out")
        }
        .option("checkpointLocation", s"$work/_chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.WorkDirs.materializeAndClean(
        s.read.parquet(s"$work/out")
          .groupBy(col("user_id"), col("event_type"))
          .agg(max_by(struct(col("n_events"), col("cents_total")),
            col("batch_id")).as("p"))
          .select(col("user_id"), col("event_type"),
            col("p.n_events").as("n_events"),
            col("p.cents_total").as("cents_total"))
          .orderBy(col("user_id"), col("event_type")), work)
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  private val stTransformMapSql =
    """SELECT user_id, event_type, count(*) AS n_events,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
      |    AS cents_total
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** Shared transformWithState profile replay; `processor` and the time
    * mode are the variant knobs.
    */
  def transformProfiles(s: SparkSession, dir: String,
      processor: graft.streaming.ProfileProcessor,
      processingTime: Boolean): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import org.apache.spark.sql.types._
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider") // transformWithState requires RocksDB
    try {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-tws-${java.util.UUID.randomUUID()}").getAbsolutePath
      val events = graft.Tables.eventsStream(s, dir,
          Map("maxFilesPerTrigger" -> "1")) // multi-batch state path
        .select(col("user_id"),
          unix_timestamp(col("ts")).as("sec"),
          round(col("value") * 100).cast("long").as("cents"))
        .as[(Long, Long, Long)]
      val profiles = events.groupByKey(_._1)
        .transformWithState(processor,
          if (processingTime) TimeMode.ProcessingTime() else TimeMode.None(),
          OutputMode.Update())
        .toDF("user_id", "n_events", "total_value", "first_sec", "last_sec")
      val writer = profiles.writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], batchId: Long) =>
          df.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(s"$work/out")
        }
        .option("checkpointLocation", s"$work/_chk")
      if (!processingTime) {
        val q = writer.trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } else {
        // ProcessingTime TimeMode re-triggers under AvailableNow forever
        // (same machinery as ProcessingTimeTimeout) — bounded runs need a
        // sink-side stop condition: poll until every input row is
        // reflected in the latest per-user emissions, then stop.
        val expected = graft.Tables.t(s, dir, "events").count()
        val q = writer
          .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
        def drained(): Boolean =
          try {
            val n = s.read.schema(
                "user_id long, n_events long, total_value double, " +
                  "first_sec long, last_sec long, batch_id long")
              .parquet(s"$work/out")
              .groupBy(col("user_id"))
              .agg(max_by(col("n_events"), col("batch_id")).as("n"))
              .agg(sum(col("n"))).first()
            !n.isNullAt(0) && n.getLong(0) == expected
          } catch { case _: org.apache.spark.sql.AnalysisException =>
            false // sink dir not created yet
          }
        val deadline = System.nanoTime() + 300L * 1000000000L
        while (!drained() && System.nanoTime() < deadline)
          Thread.sleep(100)
        q.stop(); q.awaitTermination()
        require(drained(),
          "TTL profile replay did not drain all input within 300 s")
      }
      // latest emission per user == the complete accumulated state
      graft.streaming.WorkDirs.materializeAndClean(
        s.read.parquet(s"$work/out")
          .groupBy(col("user_id"))
          .agg(max_by(
            struct(col("n_events"), col("total_value"),
              col("first_sec"), col("last_sec")),
            col("batch_id")).as("p"))
          .select(col("user_id"), col("p.n_events").as("n_events"),
            col("p.total_value").as("total_value"),
            col("p.first_sec").as("first_sec"),
            col("p.last_sec").as("last_sec"))
          .orderBy(col("user_id")), work)
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  // ---------------------------------------------------------------------
  // State EVICTION: mapGroupsWithState with ProcessingTimeTimeout — the
  // tier the NoTimeout profile query lacks. A group idle past its timeout
  // is evicted: the update function fires with hasTimedOut=true, emits the
  // group's final profile flagged expired=true, and removes the state —
  // exactly how an unbounded-key-space pipeline (per-user profiles over
  // months of traffic) keeps its state store finite.
  //
  // Deterministic by construction: events are split into TWO spool files
  // by user id (low half, then high half; full per-user history in exactly
  // one file), replayed with maxFilesPerTrigger=1. Batch 1 holds every
  // low user's complete history and arms a 1 ms timer per low user;
  // micro-batches are never sub-millisecond apart, so batch 2's timestamp
  // is past every low deadline and the timeout path fires INSIDE batch 2:
  // exactly the low half evicts, atomically with the last data batch.
  // High users keep state WITHOUT arming a timer (the pinned-state tier) —
  // also what makes the run deterministic: a trailing empty micro-batch
  // can then evict nobody.
  //
  // Termination: ProcessingTimeTimeout makes the stateful operator request
  // a follow-up batch unconditionally (timers might fire later), so
  // Trigger.AvailableNow re-triggers forever AND processAllAvailable never
  // sees a no-new-data trigger. The bounded-run pattern is therefore an
  // explicit sink-side condition: poll the output until every low user's
  // eviction row is committed (they all ride batch 2), then stop(). The
  // result is independent of how many empty batches ran before stop(),
  // because only low users ever hold an armed timer.
  // The read-back keeps the LATEST emission per user (max_by batch_id):
  // low users surface their eviction row, high users their final update
  // row — which the DuckDB oracle reproduces as a plain grouped aggregate
  // + a user_id<split flag.
  // build-once eviction fixture per source dir (same contract as the s2
  // replay fixture: commit-lock + _FIXTURE_READY marker written last, so
  // a second JVM reuses a finished tree and rebuilds only a crashed one).
  // The split point and idle-group count are stored alongside the spool —
  // reusing the fixture must not re-run its aggregation jobs.
  private val evictFixtures =
    scala.collection.mutable.Map[String, (String, Long, Long)]()

  def ensureEvictFixture(s: SparkSession, dir: String)
      : (String, Long, Long) =
    synchronized { evictFixtures.getOrElseUpdate(dir, {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-evict-fixture-${Integer.toHexString(dir.hashCode)}")
        .getAbsolutePath
      val meta = new java.io.File(work, "_META").toPath
      graft.operators.Maintenance.withCommitLock(work, timeoutMs = 600000L) {
        val ready = new java.io.File(work, "_FIXTURE_READY")
        if (!ready.exists()) {
          graft.streaming.WorkDirs.deleteRecursively(new java.io.File(work))
          val ev = t(s, dir, "events").select(col("user_id"),
            round(col("value") * 100).cast("long").as("cents"))
          val mm = ev.agg(min(col("user_id")), max(col("user_id"))).first()
          val split = Math.floorDiv(mm.getLong(0) + mm.getLong(1), 2L)
          // two spool files, low then high (name + mtime both order the
          // replay; second-floored base keeps the ordering robust to
          // mtime granularity)
          val mtimeBase = (System.currentTimeMillis() / 1000) * 1000
          graft.streaming.EventTimeOrderedSpool.spoolSingleFile(
            ev.filter(col("user_id") < split),
            s"$work/spool/aa-low.parquet", mtimeBase)
          graft.streaming.EventTimeOrderedSpool.spoolSingleFile(
            ev.filter(col("user_id") >= split),
            s"$work/spool/zz-high.parquet", mtimeBase + 2000L)
          val nLow = ev.filter(col("user_id") < split)
            .select(col("user_id")).distinct().count()
          java.nio.file.Files.writeString(meta, s"$split $nLow\n")
          java.nio.file.Files.writeString(ready.toPath, "ok\n")
        }
      }
      val Array(split, nLow) =
        java.nio.file.Files.readString(meta).trim.split(" ").map(_.toLong)
      (s"$work/spool", split, nLow)
    }) }

  // The SAME eviction semantics on transformWithState's EXPLICIT timers
  // (registerTimer / handleExpiredTimer) — the new API's replacement for
  // ProcessingTimeTimeout, pinned to the SAME oracle as the
  // mapGroupsWithState form: a user migrating the eviction pipeline to
  // timers gets identical results. Same fixture, same drain ledger.
  private def stTimerEvict(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import org.apache.spark.sql.types._
    import s.implicits._
    val stateKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = s.conf.getOption(stateKey)
    s.conf.set(stateKey, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-tmrevict-${java.util.UUID.randomUUID()}").getAbsolutePath
      val (spoolDir, split, nLow) = ensureEvictFixture(s, dir)
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("cents", LongType)))
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(spoolDir)
        .as[(Long, Long)]
      val profiles = stream.groupByKey(_._1)
        .transformWithState(
          new graft.streaming.TimerEvictProcessor(split),
          TimeMode.ProcessingTime(), OutputMode.Update())
        .toDF("user_id", "n_events", "total_value", "expired")
      // O(1) eviction latch (same contract as st_timeout_evict's): a
      // batchId-deduped running COUNT of committed eviction rows — each
      // idle group expires exactly once (state removed, no new events),
      // so the count equals the distinct evicted users without shipping
      // ids to the driver
      val evicted = new java.util.concurrent.atomic.AtomicLong()
      val counted = new java.util.concurrent.atomic.AtomicLong(-1L)
      val q = profiles.writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], batchId: Long) =>
          df.persist()
          try {
            if (!df.isEmpty) {
              df.withColumn("batch_id", lit(batchId))
                .write.mode("append").parquet(s"$work/out")
              if (batchId > counted.get()) {
                counted.set(batchId)
                evicted.addAndGet(df.filter(col("expired")).count())
                ()
              }
            }
          } finally df.unpersist()
        }
        .option("checkpointLocation", s"$work/_chk")
        .trigger(Trigger.ProcessingTime("50 milliseconds"))
        .start()
      val deadline = System.currentTimeMillis() + 120000L
      while (evicted.get() < nLow && q.exception.isEmpty
          && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      q.stop()
      q.awaitTermination()
      if (evicted.get() < nLow)
        throw new IllegalStateException(
          s"st_timer_evict: only ${evicted.get()} of $nLow idle " +
            "groups evicted before the deadline")
      graft.streaming.WorkDirs.materializeAndClean(
        s.read.parquet(s"$work/out")
          .groupBy(col("user_id"))
          .agg(max_by(
            struct(col("n_events"), col("total_value"), col("expired")),
            col("batch_id")).as("p"))
          .select(col("user_id"), col("p.n_events").as("n_events"),
            col("p.total_value").as("total_value"),
            col("p.expired").as("expired"))
          .orderBy(col("user_id")), work)
    } finally prevProv match {
      case Some(v) => s.conf.set(stateKey, v)
      case None => s.conf.unset(stateKey)
    }
  }

  private def stTimeoutEvict(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StateTuning.withStatePartitions(s,
        graft.streaming.StateTuning.globBytes(s"$dir/events*.parquet")) {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
    import org.apache.spark.sql.types._
    import s.implicits._
    // only the per-run streaming state (sink + checkpoint) is scratch;
    // the spool fixture is shared across invocations
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-evict-${java.util.UUID.randomUUID()}").getAbsolutePath
    val (spoolDir, split, nLow) = ensureEvictFixture(s, dir)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("cents", LongType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(spoolDir)
      .as[(Long, Long)]
    val update = (user: Long, it: Iterator[(Long, Long)],
        st: GroupState[(Long, Long)]) => {
      if (st.hasTimedOut) {
        val (n, tot) = st.get
        st.remove()
        (user, n, tot / 100.0, true)
      } else {
        val prev = st.getOption.getOrElse((0L, 0L))
        val next = it.foldLeft(prev) { case ((n, tot), (_, c)) =>
          (n + 1, tot + c)
        }
        st.update(next)
        // arm the eviction timer ONLY for the idle (low) half; an armed
        // but never-firing timer would keep AvailableNow spinning batches
        if (user < split) st.setTimeoutDuration(1L)
        (user, next._1, next._2 / 100.0, false)
      }
    }
    val profiles = stream.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Double, Boolean)](
        GroupStateTimeout.ProcessingTimeTimeout)(update)
      .toDF("user_id", "n_events", "total_value", "expired")
    // driver-side eviction latch: foreachBatch keeps a running COUNT of
    // the eviction rows it has COMMITTED, so the wait loop below is a
    // pure memory read — polling the sink with a
    // read-parquet→distinct→count job every 100 ms was itself a stream
    // of Spark jobs that dominated this query's wall time (the data is 5
    // groups; the harness was the cost). O(1) driver state at any
    // keyspace width: each idle group expires exactly once (state
    // removed, no new events), so the deduped count equals the distinct
    // evicted users; the batchId guard keeps a foreachBatch RETRY of the
    // same epoch from double-counting. The counter is only ever bumped
    // after the matching parquet append returns, so "counted" implies
    // "on disk".
    val evicted = new java.util.concurrent.atomic.AtomicLong()
    val counted = new java.util.concurrent.atomic.AtomicLong(-1L)
    val q = profiles.writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        // persist before the emptiness probe: each action on a
        // foreachBatch frame re-executes the stateful batch plan
        df.persist()
        try {
          // trailing empty batches (timer polling) write nothing
          if (!df.isEmpty) {
            df.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(s"$work/out")
            // rows are on disk — now (and only now) expose the evictions
            if (batchId > counted.get()) {
              counted.set(batchId)
              evicted.addAndGet(df.filter(col("expired")).count())
              ()
            }
          }
        } finally df.unpersist()
      }
      .option("checkpointLocation", s"$work/_chk")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    val deadline = System.currentTimeMillis() + 120000L
    // a dead query can never evict — break instead of spinning blind
    while (evicted.get() < nLow && q.exception.isEmpty
        && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    q.stop()
    q.awaitTermination() // surfaces the query's exception, if any
    // the deadline path must fail loudly, not return rows whose expired
    // flags silently disagree with the oracle
    if (evicted.get() < nLow)
      throw new IllegalStateException(
        s"st_timeout_evict: only ${evicted.get()} of $nLow idle " +
          "groups evicted before the deadline")
    graft.streaming.WorkDirs.materializeAndClean(
      s.read.parquet(s"$work/out")
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("n_events"), col("total_value"), col("expired")),
          col("batch_id")).as("p"))
        .select(col("user_id"), col("p.n_events").as("n_events"),
          col("p.total_value").as("total_value"),
          col("p.expired").as("expired"))
        .orderBy(col("user_id")), work)
  }

  private val stTimeoutEvictSql =
    """SELECT user_id, count(*) AS n_events,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS total_value,
      |  user_id < (SELECT (min(user_id)+max(user_id))//2 FROM events)
      |    AS expired
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  private val stMapgroupsStateSql =
    """SELECT user_id, count(*) AS n_events,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS total_value,
      |  min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_sec,
      |  max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_sec
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // W8: distribution window functions — percent_rank / cume_dist /
  // first_value / nth_value over per-customer order history (the
  // percentile-position analytics w6's rank family doesn't cover). All
  // four are exact integer-ratio or value-copy semantics, so the oracle
  // matches bit-for-bit; the window partitions by customer (many small
  // partitions — shards at any scale).
  private def w8Distribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .filter(pmod(col("o_custkey"), lit(50L)) === 0L)
      .withColumn("prnk", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("top_price", first_value(col("o_totalprice")).over(w))
      .withColumn("second_price",
        nth_value(col("o_totalprice"), 2).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("prnk"), col("cume"), col("top_price"), col("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val w8DistributionSql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  round(percent_rank() OVER w, 6) AS prnk,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  first_value(o_totalprice) OVER w AS top_price,
      |  nth_value(o_totalprice, 2) OVER w AS second_price
      |FROM orders WHERE o_custkey % 50 = 0
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // A11: GROUPING SETS — the explicit lattice (rollup and cube are its
  // special cases); issued through the SQL entry since the DataFrame API
  // exposes only the shorthands. One shuffle, planner-expanded.
  // NB: the divisor must be CAST AS DOUBLE — Spark SQL types the literal
  // 100.0 as DECIMAL(4,1), making sum(BIGINT)/100.0 a DECIMAL(27,6) column
  // where consumers (and the oracle) expect DOUBLE.
  private def a11GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val view = s"lineitem_gs_${java.lang.Long.toHexString(dir.hashCode & 0xffffffffL)}"
    t(s, dir, "lineitem").createOrReplaceTempView(view)
    s.sql(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  sum(CAST(round(l_quantity*100) AS BIGINT))/CAST(100 AS DOUBLE) AS sum_qty,
         |  count(*) AS n_lines
         |FROM $view
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         |ORDER BY returnflag, linestatus""".stripMargin)
  }

  private val a11GroupingSetsSql =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
      |  count(*) AS n_lines
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // A8: fixed-width histogram — the profiling aggregate every dataset
  // exploration starts with. Buckets computed in integer cents
  // (cents div 500000 = $5000-wide bins) so bucket boundaries are exact in
  // both engines — a double division could flip floor() at an exact
  // multiple. One hash aggregate, map-side partials; bucket count is
  // bounded by the value range, never the row count.
  private def a8Histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(expr("cast(round(l_extendedprice * 100) as long) div 500000")
        .as("bucket"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0)
          .as("sum_price"))
      .orderBy(col("bucket"))

  private val a8HistogramSql =
    """SELECT CAST(round(l_extendedprice*100) AS BIGINT) // 500000 AS bucket,
      |  count(*) AS n,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_price
      |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "w6_rank_suite" -> w6RankSuite _,
    "a5_rollup" -> a5Rollup _,
    "a9_cube" -> a9Cube _,
    "a8_histogram" -> a8Histogram _,
    "a11_grouping_sets" -> a11GroupingSets _,
    "w8_distribution" -> w8Distribution _,
    "k7_bucketed_join" -> k7BucketedJoin _,
    "ss_stream_stream_join" -> ssStreamStreamJoin _,
    "ss_stream_stream_left" -> ssStreamStreamLeft _,
    "ss_stream_stream_semi" -> ssStreamStreamSemi _,
    "ss_stream_stream_full" -> ssStreamStreamFull _,
    "st_dropdup_stream" -> stDropdupStream _,
    "st_rocksdb_dedup" -> stRocksdbDedup _,
    "st_expect_stream" -> stExpectStream _,
    "st_mapgroups_state" -> stMapgroupsState _,
    "st_funnel_stream" -> stFunnelStream _,
    "st_transform_state" -> stTransformState _,
    "st_transform_ttl" -> stTransformTtl _,
    "st_transform_list" -> stTransformList _,
    "st_transform_map" -> stTransformMap _,
    "st_timeout_evict" -> stTimeoutEvict _,
    "st_timer_evict" -> stTimerEvict _
  )

  val oracle: Map[String, String] = Map(
    "w6_rank_suite" -> w6RankSuiteSql,
    "a5_rollup" -> a5RollupSql,
    "a9_cube" -> a9CubeSql,
    "a8_histogram" -> a8HistogramSql,
    "a11_grouping_sets" -> a11GroupingSetsSql,
    "w8_distribution" -> w8DistributionSql,
    "k7_bucketed_join" -> k7BucketedJoinSql,
    "ss_stream_stream_join" -> ssStreamStreamJoinSql,
    "ss_stream_stream_left" -> ssStreamStreamLeftSql,
    "ss_stream_stream_semi" -> ssStreamStreamSemiSql,
    "ss_stream_stream_full" -> ssStreamStreamFullSql,
    "st_dropdup_stream" -> stDropdupStreamSql,
    "st_rocksdb_dedup" -> stRocksdbDedupSql,
    "st_expect_stream" -> stExpectStreamSql,
    "st_mapgroups_state" -> stMapgroupsStateSql,
    "st_funnel_stream" -> stFunnelStreamSql,
    "st_transform_state" -> stMapgroupsStateSql,
    "st_transform_ttl" -> stMapgroupsStateSql,
    "st_transform_list" -> stTransformListSql,
    "st_transform_map" -> stTransformMapSql,
    "st_timeout_evict" -> stTimeoutEvictSql,
    "st_timer_evict" -> stTimeoutEvictSql
  )
}
