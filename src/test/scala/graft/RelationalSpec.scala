package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Relational

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfSmoke}

  test("every declared query runs and is non-empty on sf0.001 (except anti)") {
    for ((name, q) <- Relational.queries) {
      val df = q(spark, sfSmoke)
      val n = df.count()
      // j2_anti_join can legitimately be empty (every customer ordered)
      assert(n >= 0, s"$name failed")
      if (name != "j2_anti_join") assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has either an oracle or a documented exemption") {
    val noOracle = Relational.queries.keySet -- Relational.oracle.keySet
    assert(noOracle.isEmpty, s"queries missing oracle SQL: $noOracle")
  }

  test("a2_scalar_max returns exactly one row") {
    assert(Relational.queries("a2_scalar_max")(spark, sfSmoke).count() == 1)
  }

  test("o3_topk_customers is at most 10 rows, sorted desc by spend") {
    val rows = Relational.queries("o3_topk_customers")(spark, sfSmoke).collect()
    assert(rows.length <= 10)
    val spends = rows.map(_.getAs[Double]("total_spend"))
    assert(spends.sameElements(spends.sortBy(-_)))
  }

  test("a1_minute_bars close equals the max-ts tick of its window") {
    val bars = Relational.queries("a1_minute_bars")(spark, sfSmoke)
    val e = Tables.t(spark, sfSmoke, "events")
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("window_start"))
      .agg(max_by(col("value"), col("ts")).as("expect_close"))
    val joined = bars.join(e, Seq("event_type", "window_start"))
    assert(joined.filter(col("close") =!= col("expect_close")).count() == 0)
  }

  test("j1 enrich preserves row count (left join against complete dim)") {
    val n = Tables.t(spark, sfSmoke, "events").count()
    assert(Relational.queries("j1_broadcast_enrich")(spark, sfSmoke).count() == n)
  }

  test("range join: bucket expansion equals the naive inequality join") {
    // ground truth: the same point-in-interval predicate as a plain
    // (nested-loop) join condition — allowed on smoke data
    val wins = Tables.t(spark, sfSmoke, "orders")
      .filter(pmod(col("o_orderkey"), lit(97L)) === 0L)
      .select(col("o_orderkey"), col("o_orderdate").as("win_start"),
        (col("o_orderdate") + expr("INTERVAL 11 DAY")).as("win_end"))
    val li = Tables.t(spark, sfSmoke, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    val naive = li.join(wins,
      col("l_shipdate") >= col("win_start") &&
        col("l_shipdate") < col("win_end"))
      .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"))
    // width deliberately NOT dividing the 11-day interval: intervals span
    // 2-3 buckets, so the exactly-once guarantee is exercised across
    // boundaries, not just inside a single bucket
    val bucketed = graft.operators.RangeJoin
      .pointInInterval(li, "l_shipdate", wins, "win_start", "win_end",
        bucketWidthSec = 4L * 86400L)
      .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"))
    assert(naive.count() > 0, "fixture produced no matches")
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty,
      "bucketed range join differs from the naive join")
  }
  test("bloom prefilter: no false negatives and a bounded fp rate") {
    val r = graft.queries.Relational
      .queries("j11_bloom_prefilter")(spark, sfSmoke).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_exact_match") > 0)
    assert(row.getAs[Boolean]("no_false_negatives"))
    assert(row.getAs[Boolean]("fp_rate_within_bound"))
  }
  test("approx quantiles land within the GK rank guarantee") {
    val rows = Relational
      .queries("a6_approx_quantiles")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_bound")))
  }
  test("robust stats: winsorized mean sits inside the clip bounds") {
    val rows = Relational
      .queries("a12_robust_stats")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p01, p99) = (r.getAs[Double]("p01"), r.getAs[Double]("p99"))
      assert(p01 <= r.getAs[Double]("median") &&
        r.getAs[Double]("median") <= p99)
      val wm = r.getAs[Double]("winsor_mean")
      assert(wm >= p01 && wm <= p99, s"winsorized mean escaped bounds: $r")
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Long]("n_below") >= 0 && r.getAs[Long]("n_above") >= 0)
    }
  }
  test("interval overlap join equals the naive inequality join") {
    // ground truth: plain inequality join over the same interval families
    val o = Tables.t(spark, sfSmoke, "orders")
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
    val naive = a.join(b,
      col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select(col("id_a"), col("id_b"))
    // 3-day width deliberately smaller than most intervals so pairs span
    // several shared buckets and the exactly-once dedup rule is exercised
    val bucketed = graft.operators.RangeJoin
      .intervalOverlap(a, "a_start", "a_end", b, "b_start", "b_end",
        bucketWidthSec = 3L * 86400L)
      .select(col("id_a"), col("id_b"))
    assert(naive.count() > 0, "fixture produced no overlaps")
    assert(bucketed.exceptAll(naive).isEmpty &&
      naive.exceptAll(bucketed).isEmpty,
      "bucketed interval-overlap join differs from the naive join")
  }

  test("rfm: segments partition the customers; scores match definitions") {
    val o = Tables.t(spark, sfSmoke, "orders")
    val nCust = o.select(col("o_custkey")).distinct().count()
    val rows = Relational.queries("an_rfm")(spark, sfSmoke).collect()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust,
      "segment sizes must sum to the customer count")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_customers") > 0)
      assert(r.getAs[Long]("sum_orders") >= r.getAs[Long]("n_customers"))
      assert(r.getAs[Double]("avg_recency_days") >= 0.0)
    }
  }

  test("attribution buckets account for every purchase exactly once") {
    val e = Tables.t(spark, sfSmoke, "events")
    val nPurch = e.filter(col("event_type") === "purchase").count()
    val cents = e.filter(col("event_type") === "purchase")
      .select(sum(round(col("value") * 100).cast("long")).as("c"))
      .first().getLong(0)
    val rows = Relational.queries("an_attribution")(spark, sfSmoke).collect()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == nPurch)
    assert(rows.map(_.getAs[Long]("attributed_cents")).sum == cents,
      "attributed revenue must conserve total purchase revenue")
    val touches = rows.map(_.getAs[String]("touch")).toSet
    assert(touches.subsetOf(Set("view", "click", "none")))
  }

  test("funnel is monotone and cohort retention starts at 1.0") {
    val f = Relational.queries("an_funnel")(spark, sfSmoke).collect()
      .sortBy(_.getAs[String]("stage"))
    assert(f.length == 3)
    val ns = f.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), "funnel stages must shrink")
    assert(f.head.getAs[Double]("conv_rate") == 1.0)
    val c = Relational.queries("an_cohort")(spark, sfSmoke).collect()
    assert(c.nonEmpty)
    c.filter(_.getAs[Long]("day_offset") == 0).foreach { r =>
      assert(r.getAs[Double]("retention") == 1.0,
        s"day-0 retention must be 1.0: $r")
    }
    c.foreach { r =>
      val ret = r.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0)
    }
  }
}
