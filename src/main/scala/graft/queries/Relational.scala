package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t

/** Batch relational operator inventory — SURVEY.md §2.3-2.8.
  *
  * Each entry is one named query in [[graft.SparkEntry.queries]] paired with
  * an ANSI-SQL DuckDB oracle. Conventions for oracle parity (SURVEY §5,
  * FIXTURES.md §3):
  *
  *  - Deterministic aggregates only: the reference's `last()` becomes
  *    `max_by(x, ts)` / DuckDB `arg_max` (reference: images/spark/Code/spark/
  *    etl.py:39-40).
  *  - Order-dependent floating sums are computed as exact integer cents
  *    (`sum(cast(round(x*100) as long))/100.0`): IEEE addition is not
  *    associative, so a shuffle-order double sum can differ between engines
  *    (and between Spark runs at different parallelism); integer sums are
  *    exact and reproducible at any scale/partitioning.
  *  - Single-row scalar expressions are IEEE-deterministic — left unrounded.
  *    Transcendental functions (log) round to 6 dp (libm vs java.lang.Math
  *    may differ in the last ulp).
  *  - Every query ends in a total `orderBy` so the written parquet is
  *    reproducible row-for-row.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum of a 2-decimal double column, in cents. */
  private def sumCents(c: Column): Column = sum(round(c * 100).cast("long"))

  // ---------------------------------------------------------------------
  // A5/A1-style grouped aggregation over the fact table (reference:
  // Superset datasets "Top trading volume" / "Total volume trading in day";
  // shape of TPC-H Q1 over lineitem).
  private def a5PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sumCents(col("l_quantity")) / 100.0).as("sum_qty"),
        (sumCents(col("l_extendedprice")) / 100.0).as("sum_base_price"),
        (sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) / 100.0)
          .as("sum_disc_price"),
        (sumCents(col("l_quantity")) / 100.0 / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val a5PricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      |  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0 AS sum_qty,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
      |  sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT))/100.0 AS sum_disc_price,
      |  sum(CAST(round(l_quantity*100) AS BIGINT))/100.0/count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // J3: multi-way star equi-join (reference: Superset "FACT" dataset SQL —
  // fact ⋈ dimdate ⋈ dimcoin ⋈ dimtime). nation/region are broadcast by
  // Catalyst (dim side ≪ 10 MB); the lineitem⋈orders spine shuffles on the
  // join key, which is the partition-parallel plan we'd want at 100 TB.
  private def j3StarRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        (sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) / 100.0)
          .as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val j3StarRevenueSql =
    """SELECT r_name, n_name,
      |  sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT))/100.0 AS revenue,
      |  count(DISTINCT o_orderkey) AS n_orders, count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------------
  // J1 + P5/P6: stream-static broadcast enrichment, batch shape (reference:
  // images/spark/Code/spark/etl.py:56-60 — tick ⋈ broadcast(dimcoin), smart
  // keys date_id/time_id, market_cap = price*supply). The dimension is tiny
  // and explicitly broadcast, so the fact side never shuffles.
  private[queries] def eventTypeDim(s: SparkSession, dir: String): DataFrame = {
    // row_number over a global window is fine here: input = distinct event
    // types (a handful of rows), mirroring the reference's coin-id
    // assignment (reference: populate_dim.py:91-93). Never used on fact-
    // sized input.
    t(s, dir, "events").select(col("event_type")).distinct()
      .withColumn("type_id", row_number().over(Window.orderBy(col("event_type"))))
      .withColumn("supply", col("type_id") * lit(1000.0))
  }

  private def j1BroadcastEnrich(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val dim = eventTypeDim(s, dir)
    e.join(broadcast(dim), Seq("event_type"), "left")
      .select(
        col("event_id"),
        col("type_id").cast("long").as("coin_id"),
        (year(col("ts")) * 10000 + month(col("ts")) * 100 + dayofmonth(col("ts")))
          .cast("long").as("date_id"),
        (hour(col("ts")) * 10000 + minute(col("ts")) * 100 + second(col("ts")))
          .cast("long").as("time_id"),
        col("value").as("price"),
        (col("value") * col("supply")).as("market_cap"))
      .orderBy(col("event_id"))
  }

  private val j1BroadcastEnrichSql =
    """WITH dim AS (
      |  SELECT event_type,
      |         row_number() OVER (ORDER BY event_type) AS type_id,
      |         row_number() OVER (ORDER BY event_type) * 1000.0 AS supply
      |  FROM (SELECT DISTINCT event_type FROM events)
      |)
      |SELECT e.event_id, d.type_id AS coin_id,
      |  year(e.ts)*10000 + month(e.ts)*100 + day(e.ts) AS date_id,
      |  hour(e.ts)*10000 + minute(e.ts)*100 + second(e.ts) AS time_id,
      |  e.value AS price, e.value * d.supply AS market_cap
      |FROM events e LEFT JOIN dim d USING (event_type)
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // J2: left-anti join — new-key detection (reference: populate_dim.py:84-88
  // anti-join on ['name','symbol'] for unseen coins).
  private def j2AntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  private val j2AntiJoinSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // J2b: left-semi join (EXISTS) — complement of the anti path, needed by a
  // user replacing the reference's NOT-EXISTS flows with EXISTS.
  private def j2SemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val j2SemiJoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // J11: Bloom-filter runtime pre-filter — the big-probe/small-build join
  // optimization a 100-TB star join lives on: build a Bloom filter over
  // the filtered build side's keys (urgent orders), broadcast it into the
  // probe scan (lineitem), and drop non-matching probe rows BEFORE the
  // shuffle — the hand-rolled form of Spark's own InjectRuntimeFilter,
  // exposed as an operator so a pipeline can apply it where the planner
  // doesn't (e.g. ahead of a UDF stage or a sink). `mightContain` has no
  // builtin Column function, so this is the one deliberate UDF in the
  // engine — it guards a shuffle, it is not the compute. The query emits
  // the audit a deployment checks: zero false negatives (Bloom never
  // drops a real match — the correctness contract) and an observed
  // false-positive rate within 3× the configured 1% (the efficiency
  // contract). Oracled like the HLL rows: exact counts + TRUE verdicts,
  // DuckDB recomputes the exact side and asserts the bounds hold.
  private def j11BloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // stat.bloomFilter is an aggregate ACTION over the build side only —
    // the same build-then-broadcast phase boundary as a broadcast join
    val bf = urgent.stat.bloomFilter(
      "o_orderkey", math.max(urgent.count(), 1L), 0.01)
    val might = udf((k: Long) => bf.mightContain(k))
    val exactKeys = urgent.distinct()
      .select(col("o_orderkey").as("l_orderkey"), lit(true).as("exact"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"))
      .withColumn("bloom_pass", might(col("l_orderkey")))
      .join(exactKeys, Seq("l_orderkey"), "left")
      .select(col("bloom_pass"), coalesce(col("exact"), lit(false)).as("e"))
      .agg(
        count(lit(1)).as("n_probe_rows"),
        sum(when(col("e"), lit(1L)).otherwise(lit(0L))).as("n_exact_match"),
        sum(when(col("e") && !col("bloom_pass"), lit(1L)).otherwise(lit(0L)))
          .as("n_false_neg"),
        sum(when(col("bloom_pass") && !col("e"), lit(1L)).otherwise(lit(0L)))
          .as("n_false_pos"))
      .select(col("n_probe_rows"), col("n_exact_match"),
        (col("n_false_neg") === 0L).as("no_false_negatives"),
        (col("n_false_pos").cast("double")
          / greatest(col("n_probe_rows") - col("n_exact_match"), lit(1L))
            .cast("double") <= 0.03).as("fp_rate_within_bound"))
  }

  private val j11BloomPrefilterSql =
    """SELECT count(*) AS n_probe_rows,
      |  CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_exact_match,
      |  TRUE AS no_false_negatives,
      |  TRUE AS fp_rate_within_bound
      |FROM lineitem l LEFT JOIN (
      |  SELECT DISTINCT o_orderkey FROM orders
      |  WHERE o_orderpriority = '1-URGENT') o
      |ON l.l_orderkey = o.o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // O3: top-k by aggregate (reference: Superset "Top trading volume" —
  // MAX(volume24h) GROUP BY symbol, row_limit 10). Spark plans
  // TakeOrderedAndProject: only k rows cross the final exchange.
  private def o3TopkCustomers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg((sumCents(col("o_totalprice")) / 100.0).as("total_spend"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(10)

  private val o3TopkCustomersSql =
    """SELECT o_custkey,
      |  sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS total_spend,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey
      |ORDER BY total_spend DESC, o_custkey LIMIT 10""".stripMargin

  // O2: multi-column descending report feed (reference: Superset "FACT"
  // dataset — ORDER BY CalendarDate DESC, Time DESC with row limit).
  private def o2ReportFeed(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .limit(100)

  private val o2ReportFeedSql =
    """SELECT o_orderkey, o_orderdate, o_totalprice, o_orderpriority
      |FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // W1: row_number partition-window — last tick per (key, day) (reference:
  // images/spark/Code/spark/udf.py:27-46, previous-day close extraction).
  private def w1LastTickPerDay(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), to_date(col("ts")))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        col("value").as("close"), col("event_id"))
      .orderBy(col("event_type"), col("d"))
  }

  private val w1LastTickPerDaySql =
    """SELECT event_type, CAST(ts AS DATE) AS d, value AS close, event_id
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY event_type, CAST(ts AS DATE)
      |        ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY event_type, d""".stripMargin

  // ---------------------------------------------------------------------
  // W5: lag / returns (reference: Garch_v1.ipynb cell 9 pct_change,
  // test5.ipynb cell 2 log-returns via Close.shift(1)).
  private def w5LogReturns(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(max_by(col("value"), col("ts")).as("close"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    daily
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), col("d"),
        round(log(col("close") / col("prev")), 6).as("log_return"),
        round((col("close") - col("prev")) / col("prev") * 100.0, 6).as("pct_change"))
      .orderBy(col("event_type"), col("d"))
  }

  private val w5LogReturnsSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, arg_max(value, ts) AS close
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT event_type, d, close,
      |         lag(close, 1) OVER (PARTITION BY event_type ORDER BY d) AS prev
      |  FROM daily)
      |SELECT event_type, d, round(ln(close/prev), 6) AS log_return,
      |       round((close-prev)/prev*100.0, 6) AS pct_change
      |FROM lagged WHERE prev IS NOT NULL ORDER BY event_type, d""".stripMargin

  // ---------------------------------------------------------------------
  // A4: grouped MAX at a time grain (reference: Superset "Change percent" —
  // MAX(change_percent_last_day) GROUP BY name, symbol, date_trunc('day',..)).
  private def a4GroupedMaxGrain(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("day"))

  private val a4GroupedMaxGrainSql =
    """SELECT event_type, date_trunc('day', ts) AS day,
      |  max(value) AS max_value, min(value) AS min_value, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------------
  // A3: COUNT(DISTINCT) (reference: Superset "Streaming coins number").
  private def a3DistinctUsers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  private val a3DistinctUsersSql =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // A2: global scalar MAX (reference: populate_dim.py:67,147 —
  // `agg(max(...)).collect()[0][0]`; kept as a 1-row frame, never collected).
  private def a2ScalarMax(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .agg(max(col("o_orderkey")).as("max_orderkey"),
        max(col("o_totalprice")).as("max_totalprice"),
        min(col("o_orderdate")).as("first_orderdate"))

  private val a2ScalarMaxSql =
    """SELECT max(o_orderkey) AS max_orderkey, max(o_totalprice) AS max_totalprice,
      |  min(o_orderdate) AS first_orderdate FROM orders""".stripMargin

  // A6: exact percentiles (reference: code.ipynb latency mean/median).
  private def a6Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(percentile(col("value"), lit(0.5)), 6).as("p50"),
        round(percentile(col("value"), lit(0.95)), 6).as("p95"),
        (sumCents(col("value")) / 100.0 / count(lit(1))).as("mean_value"))
      .orderBy(col("event_type"))

  private val a6PercentilesSql =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.95), 6) AS p95,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0/count(*) AS mean_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // A6 sketch tier: mergeable approximate quantiles — the percentile
  // companion to the HLL/CMS/Bloom sketch family, and the way 100-TB
  // percentile dashboards actually run (exact percentile sorts every
  // group; the quantile sketch partial-aggregates and merges). The
  // verdict pattern mirrors a3_approx_distinct: the query computes the
  // approximate quantile AND its exact RANK in the same pipeline, then
  // emits only engine-replayable facts — group sizes plus a
  // rank-within-tolerance boolean per (group, q) that the DuckDB oracle
  // asserts TRUE. Rank checking sidesteps quantile-definition mismatches
  // across engines (interpolation flavors) entirely: whatever value the
  // sketch returns, its rank must land within the GK guarantee
  // (accuracy 1000 → rank error ≤ n/1000, checked at 3× + 1 slack).
  private def a6ApproxQuantiles(s: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val apx = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_percentile(col("value"),
        typedlit(qs), lit(1000)).as("vs"))
      .select(col("event_type"), posexplode(col("vs")).as(Seq("qi", "v")))
      .withColumn("q", typedlit(qs).getItem(col("qi")))
      .select(col("event_type"), col("q"), col("v"))
    t(s, dir, "events")
      .join(broadcast(apx), Seq("event_type"))
      .groupBy(col("event_type"), col("q"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("value") <= col("v"), lit(1L)).otherwise(lit(0L)))
          .as("rank"))
      .select(col("event_type"), col("q"), col("n_rows"),
        (abs(col("rank") - col("q") * col("n_rows")) <=
          col("n_rows") / lit(1000.0) * 3.0 + 1.0).as("within_bound"))
      .orderBy(col("event_type"), col("q"))
  }

  private val a6ApproxQuantilesSql =
    """SELECT event_type, q, count(*) AS n_rows, TRUE AS within_bound
      |FROM events CROSS JOIN (VALUES (CAST(0.25 AS DOUBLE)), (0.5),
      |                               (0.75), (0.95)) t(q)
      |GROUP BY event_type, q ORDER BY event_type, q""".stripMargin

  // ---------------------------------------------------------------------
  // A12: robust statistics + winsorization audit — the numeric-feature
  // hygiene step of a curation pipeline: p1/p99 clip bounds, winsorized
  // mean, and the median/MAD outlier count (|x − med| > 3.5·1.4826·MAD,
  // the robust z-score rule that a spiky sensor or a fat-fingered price
  // can't drag the way a stddev rule can). Three passes over the table
  // (bounds → MAD → audit), each a partial-aggregated scan with the tiny
  // per-group stats broadcast back — the exact-tier audit complement of
  // a6_approx_quantiles (run THAT continuously; run this when the audit
  // matters enough to pay the per-group sorts). Cross-engine contract:
  // thresholds round to 6 dp before any comparison, the winsorized sum
  // runs in integer micro-units (2-dp inputs and 6-dp bounds are both
  // exact there), so every count and mean matches DuckDB bit-for-bit.
  private def a12RobustStats(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"), col("value"))
    val q = e.groupBy(col("event_type")).agg(
      round(percentile(col("value"), lit(0.01)), 6).as("p01"),
      round(percentile(col("value"), lit(0.99)), 6).as("p99"),
      round(percentile(col("value"), lit(0.5)), 6).as("med"))
    val e2 = e.join(broadcast(q), Seq("event_type"))
    val q2 = e2.groupBy(col("event_type")).agg(
      round(percentile(abs(col("value") - col("med")), lit(0.5)), 6)
        .as("mad"))
    e2.join(broadcast(q2), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        min(col("p01")).as("p01"), min(col("p99")).as("p99"),
        min(col("med")).as("median"), min(col("mad")).as("mad"),
        sum(when(col("value") < col("p01"), lit(1L)).otherwise(lit(0L)))
          .as("n_below"),
        sum(when(col("value") > col("p99"), lit(1L)).otherwise(lit(0L)))
          .as("n_above"),
        (sum(round(least(greatest(col("value"), col("p01")), col("p99"))
          * 1e6).cast("long")) / 1e6 / count(lit(1))).as("winsor_mean"),
        sum(when(abs(col("value") - col("med"))
          > col("mad") * 3.5 * 1.4826, lit(1L)).otherwise(lit(0L)))
          .as("n_outliers"))
      .orderBy(col("event_type"))
  }

  private val a12RobustStatsSql =
    """WITH q AS (
      |  SELECT event_type,
      |    round(quantile_cont(value, 0.01), 6) AS p01,
      |    round(quantile_cont(value, 0.99), 6) AS p99,
      |    round(quantile_cont(value, 0.5), 6) AS med
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT e.event_type,
      |    round(quantile_cont(abs(e.value - q.med), 0.5), 6) AS mad
      |  FROM events e JOIN q USING (event_type) GROUP BY 1)
      |SELECT e.event_type,
      |  min(q.p01) AS p01, min(q.p99) AS p99,
      |  min(q.med) AS median, min(m.mad) AS mad,
      |  CAST(sum(CASE WHEN e.value < q.p01 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_below,
      |  CAST(sum(CASE WHEN e.value > q.p99 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_above,
      |  CAST(sum(CAST(round(least(greatest(e.value, q.p01), q.p99)
      |    * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0 / count(*)
      |    AS winsor_mean,
      |  CAST(sum(CASE WHEN abs(e.value - q.med) > m.mad * 3.5 * 1.4826
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN q USING (event_type) JOIN m USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Ordered funnel analysis (view → click → purchase) — the product-
  // analytics staple: a user counts at stage k only if the stage-k event
  // happened STRICTLY AFTER their stage-(k−1) entry (first-touch
  // attribution, so a purchase before any click never inflates the
  // funnel). Three chained conditional aggregations, each keyed on
  // user_id — the same shuffle key throughout, so at scale the three
  // hops reuse one co-partitioning; no windows, no self-joins over the
  // raw event stream. Exact timestamps and integer counts → fully
  // DuckDB-oracled including the conversion ratios.
  private def anFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = e.join(t1, Seq("user_id"))
      .filter(col("event_type") === "click" && col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = e.join(t2, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val stages = t1.agg(count(lit(1)).as("n")).select(
        lit("1_view").as("stage"), col("n"))
      .unionByName(t2.agg(count(lit(1)).as("n")).select(
        lit("2_click").as("stage"), col("n")))
      .unionByName(t3.agg(count(lit(1)).as("n")).select(
        lit("3_purchase").as("stage"), col("n")))
    val top = t1.agg(count(lit(1)).as("n_top"))
    stages.crossJoin(broadcast(top))
      .select(col("stage"), col("n").as("n_users"),
        round(col("n") / col("n_top").cast("double"), 6).as("conv_rate"))
      .orderBy(col("stage"))
  }

  private val anFunnelSql =
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
  // Cohort retention — the other product-analytics staple: users grouped
  // by first-seen date, retention = the fraction of each cohort active
  // again exactly k days later (k = 0..7). First-seen is one aggregate;
  // activity joins back on user_id (same co-partitioning); the distinct
  // (cohort, offset, user) collapse is a partial-aggregated groupBy.
  // Integer counts and one division → fully DuckDB-oracled.
  private def anCohort(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val first = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
    val sizes = first.groupBy(col("cohort_d"))
      .agg(count(lit(1)).as("cohort_size"))
    val active = e.join(first, Seq("user_id"))
      .withColumn("day_offset",
        datediff(col("d"), col("cohort_d")).cast("long"))
      .filter(col("day_offset") >= 0 && col("day_offset") <= 7)
      .select(col("cohort_d"), col("day_offset"), col("user_id"))
      .distinct()
      .groupBy(col("cohort_d"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    active.join(sizes, Seq("cohort_d"))
      .select(col("cohort_d"), col("day_offset"), col("n_active"),
        round(col("n_active") / col("cohort_size").cast("double"), 6)
          .as("retention"))
      .orderBy(col("cohort_d"), col("day_offset"))
  }

  private val anCohortSql =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      |first AS (
      |  SELECT user_id, min(d) AS cohort_d FROM e GROUP BY 1),
      |sizes AS (
      |  SELECT cohort_d, count(*) AS cohort_size FROM first GROUP BY 1),
      |active AS (
      |  SELECT cohort_d, day_offset, count(*) AS n_active FROM (
      |    SELECT DISTINCT f.cohort_d, e.d - f.cohort_d AS day_offset,
      |      e.user_id
      |    FROM e JOIN first f USING (user_id)
      |    WHERE e.d - f.cohort_d BETWEEN 0 AND 7)
      |  GROUP BY 1, 2)
      |SELECT a.cohort_d, CAST(a.day_offset AS BIGINT) AS day_offset,
      |  a.n_active,
      |  round(a.n_active / CAST(s.cohort_size AS DOUBLE), 6) AS retention
      |FROM active a JOIN sizes s USING (cohort_d)
      |ORDER BY cohort_d, day_offset""".stripMargin

  // ---------------------------------------------------------------------
  // A14: two-sample A/B test report (Welch's t) — the experiment-readout
  // staple: per event_type, users split into arms by id parity and the
  // value distributions compared. The WHOLE statistic is derived from
  // exact integer aggregates (n, Σcents, Σcents² — all inside long
  // range), so the only floating arithmetic is the final closed-form
  // combination, rounded to 6 dp — one partial-aggregated pass over the
  // events, no windows, and the t statistic plus Welch's
  // degrees-of-freedom are value-identical in DuckDB.
  private def a14Abtest(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type"),
        (pmod(col("user_id"), lit(2L)) === 0L).as("arm_a"),
        round(col("value") * 100).cast("long").as("c"))
    val g = e.groupBy(col("event_type"))
      .agg(
        sum(when(col("arm_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm_a"), col("c")).otherwise(0L)).as("s_a"),
        sum(when(col("arm_a"), col("c") * col("c")).otherwise(0L)).as("q_a"),
        sum(when(!col("arm_a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("arm_a"), col("c")).otherwise(0L)).as("s_b"),
        sum(when(!col("arm_a"), col("c") * col("c")).otherwise(0L)).as("q_b"))
    g.select(col("event_type"), col("n_a"), col("n_b"),
        round(col("s_a") / col("n_a") / 100.0, 6).as("mean_a"),
        round(col("s_b") / col("n_b") / 100.0, 6).as("mean_b"),
        expr("(q_a - s_a*1.0*s_a/n_a) / (n_a - 1)").as("va"),
        expr("(q_b - s_b*1.0*s_b/n_b) / (n_b - 1)").as("vb"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"),
        round((col("mean_a") * 100 - col("mean_b") * 100) /
          sqrt(col("va") / col("n_a") + col("vb") / col("n_b")), 6)
          .as("welch_t"),
        round(
          pow(col("va") / col("n_a") + col("vb") / col("n_b"), 2) /
            (pow(col("va") / col("n_a"), 2) / (col("n_a") - 1) +
              pow(col("vb") / col("n_b"), 2) / (col("n_b") - 1)), 3)
          .as("welch_df"))
      .orderBy(col("event_type"))
  }

  private val a14AbtestSql =
    """WITH e AS (
      |  SELECT event_type, user_id % 2 = 0 AS arm_a,
      |    CAST(round(value*100) AS BIGINT) AS c
      |  FROM events),
      |g AS (
      |  SELECT event_type,
      |    CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN arm_a THEN c ELSE 0 END) AS BIGINT) AS s_a,
      |    CAST(sum(CASE WHEN arm_a THEN c*c ELSE 0 END) AS BIGINT) AS q_a,
      |    CAST(sum(CASE WHEN NOT arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN NOT arm_a THEN c ELSE 0 END) AS BIGINT) AS s_b,
      |    CAST(sum(CASE WHEN NOT arm_a THEN c*c ELSE 0 END) AS BIGINT) AS q_b
      |  FROM e GROUP BY 1),
      |v AS (
      |  SELECT event_type, n_a, n_b,
      |    round(s_a*1.0/n_a/100.0, 6) AS mean_a,
      |    round(s_b*1.0/n_b/100.0, 6) AS mean_b,
      |    (q_a - s_a*1.0*s_a/n_a) / (n_a - 1) AS va,
      |    (q_b - s_b*1.0*s_b/n_b) / (n_b - 1) AS vb
      |  FROM g)
      |SELECT event_type, n_a, n_b, mean_a, mean_b,
      |  round((mean_a*100 - mean_b*100)
      |    / sqrt(va/n_a + vb/n_b), 6) AS welch_t,
      |  round(pow(va/n_a + vb/n_b, 2)
      |    / (pow(va/n_a, 2)/(n_a - 1) + pow(vb/n_b, 2)/(n_b - 1)), 3)
      |    AS welch_df
      |FROM v ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Last-touch attribution — the revenue-assignment staple that closes
  // the product-analytics family: every purchase is attributed to the
  // user's LATEST preceding marketing touch (view or click, inclusive
  // ties), and revenue rolls up per touch type with an explicit 'none'
  // bucket for organic purchases. Built on operators.AsOfJoin (one
  // shuffle on user_id, per-key ordered fill — never an inequality
  // sort-merge explosion); touches deduped per (user, ts) first since
  // as-of semantics need a tie-free right side. Integer-cents revenue →
  // oracled against DuckDB's NATIVE ASOF LEFT JOIN, two engines agreeing
  // on the same attribution.
  private def anAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
    val touches = e.filter(col("event_type").isin("view", "click"))
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_type")).as("touch_type"))
    graft.operators.AsOfJoin
      .asOf(purchases, touches, Seq("user_id"), "ts")
      .groupBy(coalesce(col("touch_type"), lit("none")).as("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("attributed_cents"))
      .orderBy(col("touch"))
  }

  private val anAttributionSql =
    """WITH p AS (
      |  SELECT user_id, ts, CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |tch AS (
      |  SELECT user_id, ts, max(event_type) AS touch_type
      |  FROM events WHERE event_type IN ('view', 'click')
      |  GROUP BY 1, 2)
      |SELECT coalesce(t.touch_type, 'none') AS touch,
      |  count(*) AS n_purchases,
      |  CAST(sum(p.cents) AS BIGINT) AS attributed_cents
      |FROM p ASOF LEFT JOIN tch t
      |  ON p.user_id = t.user_id AND t.ts <= p.ts
      |GROUP BY 1 ORDER BY touch""".stripMargin

  // ---------------------------------------------------------------------
  // RFM segmentation — the third product-analytics staple next to funnel
  // and cohort: per customer, Recency (days since last order, against the
  // corpus max date — the A2 broadcast-scalar pattern), Frequency (order
  // count) and Monetary (integer-cents revenue), scored 1–5 by FIXED
  // business thresholds (production RFM's shape — threshold scoring is
  // one codegen'd CASE per row; quantile scoring would need a global
  // sort/window that dies at scale), rolled up per segment. One
  // customer-keyed aggregate + one segment-keyed aggregate, map-side
  // partials throughout; integer sums and one division keep every value
  // DuckDB-exact.
  private def anRfm(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val maxd = o.agg(max(to_date(col("o_orderdate"))).as("maxd"))
    val cust = o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        max(to_date(col("o_orderdate"))).as("last_d"))
      .crossJoin(broadcast(maxd))
      .withColumn("recency", datediff(col("maxd"), col("last_d")).cast("long"))
      .withColumn("r_score", expr(
        """CASE WHEN recency <= 90 THEN 5 WHEN recency <= 180 THEN 4
          |     WHEN recency <= 365 THEN 3 WHEN recency <= 730 THEN 2
          |     ELSE 1 END""".stripMargin))
      .withColumn("f_score", expr(
        """CASE WHEN n_orders >= 16 THEN 5 WHEN n_orders >= 12 THEN 4
          |     WHEN n_orders >= 8 THEN 3 WHEN n_orders >= 4 THEN 2
          |     ELSE 1 END""".stripMargin))
      .withColumn("m_score", expr(
        """CASE WHEN cents >= 400000000 THEN 5 WHEN cents >= 300000000 THEN 4
          |     WHEN cents >= 200000000 THEN 3 WHEN cents >= 100000000 THEN 2
          |     ELSE 1 END""".stripMargin))
      .withColumn("segment", expr(
        """CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
          |       THEN 'champion'
          |     WHEN f_score >= 4 THEN 'loyal'
          |     WHEN m_score >= 4 THEN 'big_spender'
          |     WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
          |     WHEN r_score <= 2 THEN 'hibernating'
          |     ELSE 'other' END""".stripMargin))
    cust.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("n_orders")).as("sum_orders"),
        sum(col("cents")).as("sum_cents"),
        round(sum(col("recency")) / count(lit(1)).cast("double"), 6)
          .as("avg_recency_days"))
      .orderBy(col("segment"))
  }

  private val anRfmSql =
    """WITH maxd AS (
      |  SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
      |cust AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(sum(round(o_totalprice*100)) AS BIGINT) AS cents,
      |    max(CAST(o_orderdate AS DATE)) AS last_d
      |  FROM orders GROUP BY 1),
      |scored AS (
      |  SELECT c.*, date_diff('day', last_d, maxd) AS recency,
      |    CASE WHEN date_diff('day', last_d, maxd) <= 90 THEN 5
      |         WHEN date_diff('day', last_d, maxd) <= 180 THEN 4
      |         WHEN date_diff('day', last_d, maxd) <= 365 THEN 3
      |         WHEN date_diff('day', last_d, maxd) <= 730 THEN 2
      |         ELSE 1 END AS r_score,
      |    CASE WHEN n_orders >= 16 THEN 5 WHEN n_orders >= 12 THEN 4
      |         WHEN n_orders >= 8 THEN 3 WHEN n_orders >= 4 THEN 2
      |         ELSE 1 END AS f_score,
      |    CASE WHEN cents >= 400000000 THEN 5 WHEN cents >= 300000000 THEN 4
      |         WHEN cents >= 200000000 THEN 3 WHEN cents >= 100000000 THEN 2
      |         ELSE 1 END AS m_score
      |  FROM cust c CROSS JOIN maxd),
      |seg AS (
      |  SELECT *,
      |    CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
      |           THEN 'champion'
      |         WHEN f_score >= 4 THEN 'loyal'
      |         WHEN m_score >= 4 THEN 'big_spender'
      |         WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      |         WHEN r_score <= 2 THEN 'hibernating'
      |         ELSE 'other' END AS segment
      |  FROM scored)
      |SELECT segment, count(*) AS n_customers,
      |  CAST(sum(n_orders) AS BIGINT) AS sum_orders,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  round(sum(recency) / CAST(count(*) AS DOUBLE), 6)
      |    AS avg_recency_days
      |FROM seg GROUP BY segment ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------------
  // Set op: UNION ALL by name (reference §2.8: pandas pd.concat splicing
  // history + forecast frames → unionByName).
  private def setUnionSegments(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def daily(et: String, tag: String) =
      e.filter(col("event_type") === et)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
        .withColumn("series", lit(tag))
        .select(col("series"), col("d"), col("n"))
    daily("purchase", "actual")
      .unionByName(daily("signup", "forecast"))
      .orderBy(col("series"), col("d"))
  }

  private val setUnionSegmentsSql =
    """SELECT 'actual' AS series, CAST(ts AS DATE) AS d, count(*) AS n
      |  FROM events WHERE event_type = 'purchase' GROUP BY 2
      |UNION ALL
      |SELECT 'forecast' AS series, CAST(ts AS DATE) AS d, count(*) AS n
      |  FROM events WHERE event_type = 'signup' GROUP BY 2
      |ORDER BY series, d""".stripMargin

  // ---------------------------------------------------------------------
  // Set ops beyond UNION (§2.8 completion): INTERSECT / EXCEPT over user
  // segments — the audience algebra (purchasers who also signed up;
  // purchasers who never did) every analytics surface needs. Spark plans
  // both as aggregates/anti-joins on the distinct key set, so they shard
  // by user hash at any scale.
  private def setIntersectExcept(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def seg(et: String) = e.filter(col("event_type") === et)
      .select(col("user_id")).distinct()
    val p = seg("purchase")
    val si = seg("signup")
    p.intersect(si).withColumn("op", lit("intersect"))
      .unionByName(p.except(si).withColumn("op", lit("except")))
      .select(col("op"), col("user_id"))
      .orderBy(col("op"), col("user_id"))
  }

  private val setIntersectExceptSql =
    """SELECT 'intersect' AS op, user_id FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      |  INTERSECT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
      |UNION ALL
      |SELECT 'except' AS op, user_id FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      |  EXCEPT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
      |ORDER BY op, user_id""".stripMargin

  // ---------------------------------------------------------------------
  // J9: full outer join — the reconciliation join (which orders have no
  // qualifying customer, which qualifying customers never ordered). The
  // modulo splits guarantee unmatched rows on BOTH sides at every scale
  // factor (matched: custkey ≡ 0 mod 6; order-only: even non-multiple of
  // 3; customer-only: odd multiples of 3, whose orders the left filter
  // excludes); output is the per-side row accounting a reconciliation
  // report starts from.
  private def j9FullOuter(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(pmod(col("o_custkey"), lit(2L)) === 0L)
      .select(col("o_custkey"), col("o_orderkey"))
    val c = t(s, dir, "customer")
      .filter(pmod(col("c_custkey"), lit(3L)) === 0L)
      .select(col("c_custkey"))
    o.join(c, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        when(col("o_orderkey").isNull, "customer_only")
          .when(col("c_custkey").isNull, "order_only")
          .otherwise("both").as("side"))
      .groupBy(col("side")).agg(count(lit(1)).as("n"))
      .orderBy(col("side"))
  }

  private val j9FullOuterSql =
    """SELECT CASE WHEN o_orderkey IS NULL THEN 'customer_only'
      |            WHEN c_custkey IS NULL THEN 'order_only'
      |            ELSE 'both' END AS side, count(*) AS n
      |FROM (SELECT o_custkey, o_orderkey FROM orders
      |      WHERE o_custkey % 2 = 0) o
      |FULL JOIN (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0) c
      |  ON o_custkey = c_custkey
      |GROUP BY side ORDER BY side""".stripMargin

  // ---------------------------------------------------------------------
  // J10: null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) — the join
  // dimension-key pipelines need when "unknown" is itself a key (a plain
  // equi-join silently drops every null pair). Both sides pre-aggregate
  // to one row per nullable bucket, so the join is dimension-sized.
  private def j10NullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .groupBy(nullif(pmod(col("o_custkey"), lit(10L)), lit(0L)).as("k"))
      .agg(count(lit(1)).as("n_orders"))
    val c = t(s, dir, "customer")
      .groupBy(nullif(pmod(col("c_custkey"), lit(10L)), lit(0L)).as("ck"))
      .agg(count(lit(1)).as("n_customers"))
    o.join(c, col("k") <=> col("ck"))
      .select(col("k"), col("n_orders"), col("n_customers"))
      .orderBy(col("k").asc_nulls_first)
  }

  private val j10NullSafeJoinSql =
    """SELECT k, n_orders, n_customers
      |FROM (SELECT nullif(o_custkey % 10, 0) AS k, count(*) AS n_orders
      |      FROM orders GROUP BY 1) o
      |JOIN (SELECT nullif(c_custkey % 10, 0) AS ck, count(*) AS n_customers
      |      FROM customer GROUP BY 1) c
      |  ON k IS NOT DISTINCT FROM ck
      |ORDER BY k NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // P4: timezone shift (reference: etl.py:25 —
  // from_utc_timestamp(ts, 'Asia/Ho_Chi_Minh'); fixed UTC+7, no DST).
  private def p4TzShift(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        from_utc_timestamp(col("ts"), "Asia/Ho_Chi_Minh").as("ts_local"))
      .groupBy(hour(col("ts_local")).cast("long").as("hour_local"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hour_local"))

  private val p4TzShiftSql =
    """SELECT hour(ts + INTERVAL 7 HOUR) AS hour_local, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY hour_local""".stripMargin

  // P12/P13: null defaulting + rename/reorder (reference: utils.py:27-30
  // maxSupply sentinel; populate_dim.py:83,94 drop/rename/toDF).
  private def p12NullDefault(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("bal_or_null",
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      .select(
        col("c_custkey").as("id"),
        col("c_name").as("name"),
        coalesce(col("bal_or_null"), lit(0.0)).as("balance"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER"))
          .as("segment"))
      .orderBy(col("id"))

  private val p12NullDefaultSql =
    """SELECT c_custkey AS id, c_name AS name,
      |  coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS balance,
      |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment
      |FROM customer ORDER BY id""".stripMargin

  // P14/P2: JSON field extraction (reference: etl.py:21-22 from_json on the
  // Kafka payload; TimeDelay.ipynb delta-log stats extraction).
  private def p14JsonProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  // DuckDB sum(BIGINT) yields HUGEINT — cast back to BIGINT so the driver
  // hash matches Spark's long; json_extract_string mirrors get_json_object.
  private val p14JsonPropsSql =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // P11/S3: filtered, projected scan — predicate + column pruning reach the
  // parquet reader (PushedFilters/ReadSchema in .explain; reference:
  // udf.py:37 date filter, populate_dim.py:141 is_current filter).
  private def p11FilterPushdown(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 45.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val p11FilterPushdownSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 45.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // P3/S5: cast chains (reference: etl.py:23-24 price string→double +
  // epoch→timestamp; udf.py:90-97 OHLCV casts).
  private def p3CastChain(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        col("value").cast("string").cast("double").as("price"),
        to_date(col("ts")).as("d"),
        col("user_id").cast("int").as("uid"),
        date_trunc("second", col("ts")).as("ts_sec"))
      .orderBy(col("event_id"))

  private val p3CastChainSql =
    """SELECT event_id, CAST(CAST(value AS VARCHAR) AS DOUBLE) AS price,
      |  CAST(ts AS DATE) AS d, CAST(user_id AS INT) AS uid,
      |  date_trunc('second', ts) AS ts_sec
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // A1 (batch shape): 1-minute tumbling bars with deterministic close
  // (reference: etl.py:34-41 — groupBy(window(ts,'1 minute')).agg(avg,last);
  // `last` replaced by max_by for oracle parity, SURVEY §5).
  private[queries] def a1MinuteBars(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"),
        date_trunc("minute", col("ts")).as("window_start"))
      .agg(
        (sumCents(col("value")) / 100.0 / count(lit(1))).as("average_1minute"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy(col("event_type"), col("window_start"))

  private[queries] val a1MinuteBarsSql =
    """SELECT event_type, date_trunc('minute', ts) AS window_start,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0/count(*) AS average_1minute,
      |  arg_max(value, ts) AS close, count(*) AS n_ticks
      |FROM events GROUP BY 1, 2 ORDER BY event_type, window_start""".stripMargin

  // ---------------------------------------------------------------------
  // A1b: SLIDING windows (2-minute window, 1-minute slide) — the hopping
  // aggregation the tumbling bars can't express (each event contributes
  // to exactly two windows). Spark's `window(ts, '2 minutes', '1 minute')`
  // plans this as a generate(expand)+hash-aggregate — still map-side
  // partial, no state, no sort; the oracle replays the same two-window
  // assignment by exploding each event to both its window starts.
  private def a1SlidingBars(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"),
        window(col("ts"), "2 minutes", "1 minute"))
      .agg(
        (sumCents(col("value")) / 100.0 / count(lit(1))).as("average_2minute"),
        count(lit(1)).as("n_ticks"))
      .select(col("event_type"), col("window.start").as("window_start"),
        col("average_2minute"), col("n_ticks"))
      .orderBy(col("event_type"), col("window_start"))

  private val a1SlidingBarsSql =
    """SELECT event_type, ws AS window_start,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0/count(*)
      |    AS average_2minute,
      |  count(*) AS n_ticks
      |FROM (
      |  SELECT event_type, value,
      |    unnest([date_trunc('minute', ts),
      |            date_trunc('minute', ts) - INTERVAL 1 MINUTE]) AS ws
      |  FROM events)
      |GROUP BY 1, 2 ORDER BY event_type, window_start""".stripMargin

  // ---------------------------------------------------------------------
  // J6: point-in-interval range join — lineitem ship dates landing inside a
  // sparse set of 30-day order windows. An inequality-only join would plan
  // as BroadcastNestedLoopJoin (quadratic once the interval side outgrows
  // broadcast); RangeJoin.pointInInterval rewrites it to a bucketed
  // EQUI-join (explode intervals to 30-day buckets, join on bucket,
  // re-check the exact bounds) — the plan that survives both sides being
  // huge. PlanSpec asserts no nested-loop/cartesian operator appears.
  private def j6RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val wins = t(s, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(701L)) === 0L)
      .select(col("o_orderkey"), col("o_orderdate").as("win_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("win_end"))
    val li = t(s, dir, "lineitem")
      .select(col("l_shipdate"), col("l_extendedprice"))
    graft.operators.RangeJoin
      .pointInInterval(li, "l_shipdate", wins, "win_start", "win_end",
        bucketWidthSec = 30L * 86400L)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped"),
        (sumCents(col("l_extendedprice")) / 100.0).as("shipped_value"))
      .orderBy(col("o_orderkey"))
  }

  private val j6RangeJoinSql =
    """SELECT o_orderkey, count(*) AS n_shipped,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS shipped_value
      |FROM orders o JOIN lineitem l
      |  ON l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
      |WHERE o.o_orderkey % 701 = 0
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // J12: interval × interval OVERLAP join — two sparse families of order
  // windows (disjoint modulo picks, per-key window lengths), paired
  // wherever their [start, end) ranges intersect. The naive form is an
  // inequality-only join (nested-loop disaster at scale);
  // RangeJoin.intervalOverlap rewrites it to a bucketed equi-join with
  // BOTH sides exploded, emitting each overlapping pair exactly once via
  // the overlap-start bucket — no dedup pass, no cartesian. Exact date
  // arithmetic → fully oracled against DuckDB's plain inequality join.
  private def j12IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.filter(pmod(col("o_orderkey"), lit(97L)) === 0L)
      .select(col("o_orderkey").as("id_a"),
        to_date(col("o_orderdate")).as("a_start"),
        date_add(to_date(col("o_orderdate")),
          (lit(1) + pmod(col("o_orderkey"), lit(14L))).cast("int"))
          .as("a_end"))
    val b = o.filter(pmod(col("o_orderkey"), lit(89L)) === 3L)
      .select(col("o_orderkey").as("id_b"),
        to_date(col("o_orderdate")).as("b_start"),
        date_add(to_date(col("o_orderdate")),
          (lit(1) + pmod(col("o_orderkey"), lit(7L))).cast("int"))
          .as("b_end"))
    graft.operators.RangeJoin
      .intervalOverlap(a, "a_start", "a_end", b, "b_start", "b_end",
        bucketWidthSec = 7L * 86400L)
      .select(col("id_a"), col("id_b"),
        datediff(least(col("a_end"), col("b_end")),
          greatest(col("a_start"), col("b_start"))).cast("long")
          .as("overlap_days"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val j12IntervalOverlapSql =
    """WITH a AS (
      |  SELECT o_orderkey AS id_a, CAST(o_orderdate AS DATE) AS a_start,
      |    CAST(o_orderdate AS DATE)
      |      + CAST(1 + o_orderkey % 14 AS INTEGER) AS a_end
      |  FROM orders WHERE o_orderkey % 97 = 0),
      |b AS (
      |  SELECT o_orderkey AS id_b, CAST(o_orderdate AS DATE) AS b_start,
      |    CAST(o_orderdate AS DATE)
      |      + CAST(1 + o_orderkey % 7 AS INTEGER) AS b_end
      |  FROM orders WHERE o_orderkey % 89 = 3)
      |SELECT id_a, id_b,
      |  CAST(date_diff('day', greatest(a_start, b_start),
      |    least(a_end, b_end)) AS BIGINT) AS overlap_days
      |FROM a JOIN b ON a_start < b_end AND b_start < a_end
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // J13: the NAIVE inequality range join, written the way a SQL user
  // writes it — no RangeJoin operator call, just `ship >= start AND
  // ship < end`. Left alone, Catalyst plans this as a
  // BroadcastNestedLoopJoin (quadratic once the interval side outgrows
  // broadcast); the engine's injected AutoRangeJoin optimizer rule
  // (plans/AutoRangeJoin, via spark.sql.extensions) detects the pure
  // range shape and rewrites it into the bucketed equi-join
  // automatically — same values, scalable plan, zero user code change.
  // PlanSpec asserts the executed plan is an equi-join. Oracle: DuckDB
  // runs the naive join directly.
  private def j13AutoRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val wins = t(s, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(613L)) === 0L)
      .select(col("o_orderkey"), col("o_orderdate").as("win_start"),
        (col("o_orderdate") + expr("INTERVAL 21 DAY")).as("win_end"))
    val li = t(s, dir, "lineitem")
      .select(col("l_shipdate"), col("l_extendedprice"))
    li.join(wins,
        col("l_shipdate") >= col("win_start") &&
          col("l_shipdate") < col("win_end"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped"),
        (sumCents(col("l_extendedprice")) / 100.0).as("shipped_value"))
      .orderBy(col("o_orderkey"))
  }

  private val j13AutoRangeJoinSql =
    """SELECT o_orderkey, count(*) AS n_shipped,
      |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS shipped_value
      |FROM orders o JOIN lineitem l
      |  ON l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate < o.o_orderdate + INTERVAL 21 DAY
      |WHERE o.o_orderkey % 613 = 0
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // J8: as-of (point-in-time) join — each purchase aligned to the user's
  // latest view at or before it (the trades→quotes alignment every
  // market-data store ships; reference behavior: the per-symbol
  // event-time alignment across images/spark/Code/streaming_pipeline.py's
  // bar builds). Quotes are deduped per (user, ts) first: as-of semantics
  // are only deterministic without right-side ties. Oracled against
  // DuckDB's native ASOF LEFT JOIN — two engines, two different as-of
  // implementations, one result.
  private def j8AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val trades = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val quotes = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("quote"))
      .withColumn("quote_ts", col("ts"))
    graft.operators.AsOfJoin
      .asOf(trades, quotes, Seq("user_id"), "ts")
      .orderBy(col("event_id"))
  }

  private val j8AsofJoinSql =
    """WITH trades AS (
      |  SELECT event_id, user_id, ts, value FROM events
      |  WHERE event_type = 'purchase'),
      |quotes AS (
      |  SELECT user_id, ts, max(value) AS quote, ts AS quote_ts
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
      |SELECT t.event_id, t.user_id, t.ts, t.value, q.quote, q.quote_ts
      |FROM trades t ASOF LEFT JOIN quotes q
      |  ON t.user_id = q.user_id AND t.ts >= q.ts
      |ORDER BY t.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // J7: salted skew join, driver-gated — events has only 5 distinct
  // event_type keys, so an unsalted SHUFFLE join puts ~20% of the fact
  // table on each of 5 reducers no matter how many executors exist;
  // saltedJoin spreads each hot key over 8 sub-keys (deterministic salt
  // from event_id, small side exploded). The oracle is the plain join:
  // salting must be invisible in the result. (At this fixture size
  // Catalyst broadcasts the exploded dim — the salt is inert but
  // harmless; the salted-SHUFFLE equality contract is what
  // SaltingCosineSpec asserts, and at 100 TB the dim side of a skewed
  // join is exactly what outgrows broadcast.)
  private def j7SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = e.groupBy(col("event_type"))
      .agg((sumCents(col("value")) / 100.0 / count(lit(1))).as("et_mean"))
    graft.operators.Salting
      .saltedJoin(e, dim, "event_type", "event_id", saltFactor = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("et_mean")).as("et_mean"),
        (sumCents(abs(col("value") - col("et_mean"))) / 100.0)
          .as("abs_dev_sum"))
      .orderBy(col("event_type"))
  }

  private val j7SaltedJoinSql =
    """WITH dim AS (
      |  SELECT event_type,
      |    sum(CAST(round(value*100) AS BIGINT))/100.0/count(*) AS et_mean
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type, count(*) AS n_events, max(d.et_mean) AS et_mean,
      |  sum(CAST(round(abs(e.value - d.et_mean)*100) AS BIGINT))/100.0
      |    AS abs_dev_sum
      |FROM events e JOIN dim d ON e.event_type = d.event_type
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // A7: pivot (long → wide) — yearly order value by status as columns.
  // Explicit pivot values keep the schema static (no distinct-values scan,
  // the form that works on a planner with no runtime schema discovery);
  // integer cents keep the per-cell sums order-independent.
  private def a7Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .groupBy(col("order_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg((sumCents(col("o_totalprice")) / 100.0))
      .withColumnRenamed("F", "status_f")
      .withColumnRenamed("O", "status_o")
      .withColumnRenamed("P", "status_p")
      .orderBy(col("order_year"))

  private val a7PivotSql =
    """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
      |  sum(CASE WHEN o_orderstatus='F'
      |    THEN CAST(round(o_totalprice*100) AS BIGINT) END)/100.0 AS status_f,
      |  sum(CASE WHEN o_orderstatus='O'
      |    THEN CAST(round(o_totalprice*100) AS BIGINT) END)/100.0 AS status_o,
      |  sum(CASE WHEN o_orderstatus='P'
      |    THEN CAST(round(o_totalprice*100) AS BIGINT) END)/100.0 AS status_p
      |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin

  // ---------------------------------------------------------------------
  // W7: batch sessionization (gaps-and-islands) — the batch complement of
  // the streaming session window (st_session_window): a new session starts
  // after a >30-min silence per user. One partitioned window pair (lag +
  // running sum), shuffles once on user_id — the canonical formulation,
  // embarrassingly parallel across users at any scale. Gap comparison uses
  // SECOND-truncated epochs in both engines (sub-second ticks would
  // otherwise split sessions differently between Spark and the oracle).
  private def w7Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_sec", lag(col("ts").cast("long"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_sec").isNull ||
          col("ts").cast("long") - col("prev_sec") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (max(col("ts").cast("long")) - min(col("ts").cast("long")))
          .as("duration_sec"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  private val w7SessionizeSql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      - lag(CAST(floor(epoch(ts)) AS BIGINT))
      |          OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_sec
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(CASE WHEN gap_sec IS NULL OR gap_sec > 1800
      |                  THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      |  FROM g)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
      |    AS duration_sec
      |FROM s GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  // ---------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "j7_salted_join" -> j7SaltedJoin _,
    "w7_sessionize" -> w7Sessionize _,
    "j6_range_join" -> j6RangeJoin _,
    "j12_interval_overlap" -> j12IntervalOverlap _,
    "j13_auto_range_join" -> j13AutoRangeJoin _,
    "j8_asof_join" -> j8AsofJoin _,
    "a7_pivot" -> a7Pivot _,
    "a5_pricing_summary" -> a5PricingSummary _,
    "j3_star_revenue" -> j3StarRevenue _,
    "j1_broadcast_enrich" -> j1BroadcastEnrich _,
    "j2_anti_join" -> j2AntiJoin _,
    "j2_semi_join" -> j2SemiJoin _,
    "j11_bloom_prefilter" -> j11BloomPrefilter _,
    "o3_topk_customers" -> o3TopkCustomers _,
    "o2_report_feed" -> o2ReportFeed _,
    "w1_last_tick_per_day" -> w1LastTickPerDay _,
    "w5_log_returns" -> w5LogReturns _,
    "a4_grouped_max_grain" -> a4GroupedMaxGrain _,
    "a3_distinct_users" -> a3DistinctUsers _,
    "a2_scalar_max" -> a2ScalarMax _,
    "a6_percentiles" -> a6Percentiles _,
    "a6_approx_quantiles" -> a6ApproxQuantiles _,
    "a12_robust_stats" -> a12RobustStats _,
    "a14_abtest" -> a14Abtest _,
    "an_funnel" -> anFunnel _,
    "an_cohort" -> anCohort _,
    "an_rfm" -> anRfm _,
    "an_attribution" -> anAttribution _,
    "set_union_segments" -> setUnionSegments _,
    "set_intersect_except" -> setIntersectExcept _,
    "j9_full_outer" -> j9FullOuter _,
    "j10_null_safe_join" -> j10NullSafeJoin _,
    "p4_tz_shift" -> p4TzShift _,
    "p12_null_default" -> p12NullDefault _,
    "p14_json_props" -> p14JsonProps _,
    "p11_filter_pushdown" -> p11FilterPushdown _,
    "p3_cast_chain" -> p3CastChain _,
    "a1_minute_bars" -> (a1MinuteBars _),
    "a1_sliding_bars" -> a1SlidingBars _
  )

  val oracle: Map[String, String] = Map(
    "j7_salted_join" -> j7SaltedJoinSql,
    "w7_sessionize" -> w7SessionizeSql,
    "j6_range_join" -> j6RangeJoinSql,
    "j12_interval_overlap" -> j12IntervalOverlapSql,
    "j13_auto_range_join" -> j13AutoRangeJoinSql,
    "j8_asof_join" -> j8AsofJoinSql,
    "a7_pivot" -> a7PivotSql,
    "a5_pricing_summary" -> a5PricingSummarySql,
    "j3_star_revenue" -> j3StarRevenueSql,
    "j1_broadcast_enrich" -> j1BroadcastEnrichSql,
    "j2_anti_join" -> j2AntiJoinSql,
    "j2_semi_join" -> j2SemiJoinSql,
    "j11_bloom_prefilter" -> j11BloomPrefilterSql,
    "o3_topk_customers" -> o3TopkCustomersSql,
    "o2_report_feed" -> o2ReportFeedSql,
    "w1_last_tick_per_day" -> w1LastTickPerDaySql,
    "w5_log_returns" -> w5LogReturnsSql,
    "a4_grouped_max_grain" -> a4GroupedMaxGrainSql,
    "a3_distinct_users" -> a3DistinctUsersSql,
    "a2_scalar_max" -> a2ScalarMaxSql,
    "a6_percentiles" -> a6PercentilesSql,
    "a6_approx_quantiles" -> a6ApproxQuantilesSql,
    "a12_robust_stats" -> a12RobustStatsSql,
    "a14_abtest" -> a14AbtestSql,
    "an_funnel" -> anFunnelSql,
    "an_cohort" -> anCohortSql,
    "an_rfm" -> anRfmSql,
    "an_attribution" -> anAttributionSql,
    "set_union_segments" -> setUnionSegmentsSql,
    "set_intersect_except" -> setIntersectExceptSql,
    "j9_full_outer" -> j9FullOuterSql,
    "j10_null_safe_join" -> j10NullSafeJoinSql,
    "p4_tz_shift" -> p4TzShiftSql,
    "p12_null_default" -> p12NullDefaultSql,
    "p14_json_props" -> p14JsonPropsSql,
    "p11_filter_pushdown" -> p11FilterPushdownSql,
    "p3_cast_chain" -> p3CastChainSql,
    "a1_minute_bars" -> a1MinuteBarsSql,
    "a1_sliding_bars" -> a1SlidingBarsSql
  )
}
