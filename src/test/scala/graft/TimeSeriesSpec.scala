package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TimeSeriesStats
import graft.queries.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfSmoke}

  // Deterministic synthetic GARCH(1,1) series (fixed LCG, no wall clock).
  private def synthGarch(n: Int, omega: Double, alpha: Double,
      beta: Double): Array[Double] = {
    var seed = 42L
    def nextGaussian(): Double = {
      // Box-Muller over two LCG draws
      def u(): Double = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        ((seed >>> 11).toDouble / (1L << 53).toDouble) + 1e-12
      }
      math.sqrt(-2 * math.log(u())) * math.cos(2 * math.Pi * u())
    }
    var s2 = omega / (1 - alpha - beta)
    Array.fill(n) {
      val e = math.sqrt(s2) * nextGaussian()
      s2 = omega + alpha * e * e + beta * s2
      e
    }
  }

  test("GARCH(1,1) MLE recovers persistence on synthetic data") {
    val r = synthGarch(3000, omega = 0.05, alpha = 0.10, beta = 0.85)
    val fit = TimeSeriesStats.fitGarch11(r)
    assert(fit.omega > 0 && fit.alpha >= 0 && fit.beta >= 0)
    assert(fit.alpha + fit.beta < 1.0)
    // persistence within a loose band of the true 0.95
    assert(fit.alpha + fit.beta > 0.80 && fit.alpha + fit.beta < 0.999,
      s"persistence ${fit.alpha + fit.beta}")
    // MLE must beat the constant-variance model's likelihood
    val v = TimeSeriesStats.variance(r)
    val constNll = TimeSeriesStats.garchNll(r, v * 0.0199, 0.01, 0.97)
    assert(-fit.loglik <= constNll)
  }

  test("GARCH fit is deterministic") {
    val r = synthGarch(500, 0.1, 0.15, 0.8)
    val a = TimeSeriesStats.fitGarch11(r)
    val b = TimeSeriesStats.fitGarch11(r)
    assert(a == b)
  }

  test("ADF separates random walk from white noise") {
    var seed = 7L
    def u(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val noise = Array.fill(500)(u())
    val walk = noise.scanLeft(0.0)(_ + _).tail
    val tNoise = TimeSeriesStats.adfTStat(noise)
    val tWalk = TimeSeriesStats.adfTStat(walk)
    assert(tNoise < -5.0, s"white noise should strongly reject unit root, got $tNoise")
    assert(tWalk > -3.0, s"random walk should not strongly reject, got $tWalk")
  }

  test("Ljung-Box flags autocorrelation") {
    val x = Array.tabulate(300)(i => math.sin(i / 3.0)) // strongly correlated
    var seed = 11L
    def u(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val iid = Array.fill(300)(u())
    assert(TimeSeriesStats.ljungBox(x, 10) > TimeSeriesStats.ljungBox(iid, 10) * 10)
  }

  test("ARCH-LM detects volatility clustering") {
    val garchy = synthGarch(2000, 0.05, 0.3, 0.6)
    var seed = 13L
    def u(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val iid = Array.fill(2000)(u())
    assert(TimeSeriesStats.archLmStat(garchy) > TimeSeriesStats.archLmStat(iid))
  }

  test("ts_garch_fit runs on the events table with sane params per key") {
    val df = TimeSeries.queries("ts_garch_fit")(spark, sfSmoke).collect()
    assert(df.length == 5)
    df.foreach { r =>
      val (omega, alpha, beta) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(omega > 0 && alpha >= 0 && beta >= 0 && alpha + beta < 1,
        s"bad params for ${r.getString(0)}: $omega $alpha $beta")
      assert(r.getDouble(5) > 0, "forecast variance must be positive")
    }
  }

  // Deterministic synthetic ARMA(1,1) series (fixed LCG).
  private def synthArma(n: Int, c: Double, phi: Double,
      theta: Double, sd: Double): Array[Double] = {
    var seed = 99L
    def nextGaussian(): Double = {
      def u(): Double = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        ((seed >>> 11).toDouble / (1L << 53).toDouble) + 1e-12
      }
      math.sqrt(-2 * math.log(u())) * math.cos(2 * math.Pi * u())
    }
    var y = c / (1 - phi)
    var e = 0.0
    Array.fill(n) {
      val eNew = sd * nextGaussian()
      y = c + phi * y + theta * e + eNew
      e = eNew
      y
    }
  }

  test("ARMA(1,1) CSS recovers phi on synthetic data") {
    val y = synthArma(3000, c = 0.2, phi = 0.7, theta = 0.3, sd = 1.0)
    val fit = TimeSeriesStats.fitArma11(y)
    assert(math.abs(fit.phi - 0.7) < 0.15, s"phi ${fit.phi}")
    assert(math.abs(fit.theta - 0.3) < 0.2, s"theta ${fit.theta}")
    assert(math.abs(fit.phi) < 1.0 && math.abs(fit.theta) < 1.0)
  }

  test("ARMA residuals are centered and whiter than the input") {
    val y = synthArma(2000, 0.1, 0.8, 0.2, 1.0)
    val fit = TimeSeriesStats.fitArma11(y)
    val resid = TimeSeriesStats.armaResiduals(y, fit.c, fit.phi, fit.theta)
    val rm = TimeSeriesStats.mean(resid)
    assert(math.abs(rm) < 0.05, s"residual mean $rm")
    // the model must absorb the serial correlation
    assert(TimeSeriesStats.ljungBox(resid, 10) <
      TimeSeriesStats.ljungBox(y, 10) / 10)
  }

  test("ARMA loglik beats the white-noise model") {
    val y = synthArma(1000, 0.0, 0.6, 0.25, 1.0)
    val fit = TimeSeriesStats.fitArma11(y)
    // white noise = ARMA with phi = theta = 0, c = mean
    val e0 = TimeSeriesStats.armaResiduals(y, TimeSeriesStats.mean(y), 0, 0)
    val m = e0.length
    val s2 = e0.map(v => v * v).sum / m
    val llWn = -0.5 * m * (math.log(2 * math.Pi * s2) + 1.0)
    assert(fit.loglik > llWn, s"${fit.loglik} vs white noise $llWn")
  }

  test("ARMA fit is deterministic and diff1 is exact") {
    val y = synthArma(400, 0.1, 0.5, 0.1, 1.0)
    assert(TimeSeriesStats.fitArma11(y) == TimeSeriesStats.fitArma11(y))
    val d = TimeSeriesStats.diff1(y)
    assert(d.length == y.length - 1 && d(0) == y(1) - y(0))
  }

  test("ARMA guards refuse degenerate inputs instead of emitting NaN") {
    intercept[IllegalArgumentException] {
      TimeSeriesStats.fitArma11(Array(1.0, 2.0))
    }
    intercept[IllegalArgumentException] {
      TimeSeriesStats.armaResiduals(Array.empty[Double], 0.0, 0.0, 0.0)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesStats.armaResiduals(Array(1.0), 0.0, 0.0, 0.0)
    }
  }

  test("ts_arma_residuals runs on the events table with sane output") {
    val df = TimeSeries.queries("ts_arma_residuals")(spark, sfSmoke).collect()
    assert(df.length == 5)
    df.foreach { r =>
      assert(math.abs(r.getDouble(2)) < 1.0, "phi inside unit circle")
      assert(math.abs(r.getDouble(3)) < 1.0, "theta inside unit circle")
      assert(r.getDouble(4) > 0, "sigma2 positive")
      // real series are short (~30 daily points at smoke SF): the CSS
      // residual mean is only near zero relative to the residual scale
      assert(math.abs(r.getDouble(6)) < math.sqrt(r.getDouble(4)),
        "residual mean within one residual sd of zero")
      assert(r.getDouble(8) >= 0 && r.getDouble(8) < 1.0,
        "garch persistence stationary")
    }
  }

  // Deterministic AR(2) series for the order-search planted fixture.
  // java.util.Random's algorithms are pinned by its Javadoc (stable across
  // JVMs); the LCG+cos-Box-Muller used elsewhere carries enough residual
  // autocorrelation that a spurious MA term genuinely improves the fit,
  // which defeats an order-recovery fixture.
  private def synthAr2(n: Int, phi1: Double, phi2: Double): Array[Double] = {
    val rng = new java.util.Random(1234L)
    var y1 = 0.0; var y2 = 0.0
    Array.fill(n) {
      val y = phi1 * y1 + phi2 * y2 + rng.nextGaussian()
      y2 = y1; y1 = y
      y
    }
  }

  test("general (p,q) fits agree with the fixed-order production fits") {
    val y = synthArma(800, 0.1, 0.6, 0.2, 1.0)
    val f11 = TimeSeriesStats.fitArma11(y)
    val g11 = TimeSeriesStats.fitArmaPQ(y, 1, 1)
    // same CSS objective, different start/parametrization: the general fit
    // must reach at least the fixed fit's likelihood neighborhood
    assert(g11.loglik >= f11.loglik - 1.0,
      s"fitArmaPQ(1,1) ll ${g11.loglik} vs fitArma11 ${f11.loglik}")
    val r = synthGarch(800, 0.05, 0.10, 0.85)
    val gg = TimeSeriesStats.fitGarchPQ(r, 1, 1)
    val gf = TimeSeriesStats.fitGarch11(r)
    assert(gg.loglik >= gf.loglik - 1.0,
      s"fitGarchPQ(1,1) ll ${gg.loglik} vs fitGarch11 ${gf.loglik}")
    // determinism (same fixture, same simplex path)
    assert(TimeSeriesStats.fitArmaPQ(y, 2, 1) ==
      TimeSeriesStats.fitArmaPQ(y, 2, 1))
    assert(TimeSeriesStats.fitGarchPQ(r, 2, 1) ==
      TimeSeriesStats.fitGarchPQ(r, 2, 1))
  }

  test("order search ranks the planted order first") {
    val ar2 = synthAr2(600, phi1 = 1.1, phi2 = -0.5)
    val rows = TimeSeries.orderSearchRows(ar2)
    // AIC is not consistent for nested orders (it overfits one extra
    // parameter with P ≈ 0.16, and did on this fixture, picking (2,1));
    // BIC is consistent — the planted order must head the BIC ranking,
    // and must survive to the AIC top-2
    val arma = rows.filter(_._1 == "arma")
    val bicTop = arma.minBy(_._7)
    assert((bicTop._2, bicTop._3) == ((2, 0)),
      s"planted AR(2) ranked behind (${bicTop._2},${bicTop._3}) by BIC")
    val aicTop2 = arma.sortBy(_._6).take(2).map(r => (r._2, r._3))
    assert(aicTop2.contains((2, 0)),
      s"planted AR(2) missing from AIC top-2 $aicTop2")
    val garchGrid = rows.filter(_._1 == "garch") // grid over the AR2 series
    assert(garchGrid.size == 9 &&
      garchGrid.map(r => (r._2, r._3)).toSet.size == 9)
    // GARCH(1,1) planted with the same clean RNG (see synthAr2 note)
    val rng = new java.util.Random(77L)
    var s2 = 0.05 / (1 - 0.15 - 0.75)
    val g11 = Array.fill(1500) {
      val e = math.sqrt(s2) * rng.nextGaussian()
      s2 = 0.05 + 0.15 * e * e + 0.75 * s2
      e
    }
    val gRows = TimeSeries.orderSearchRows(g11).filter(_._1 == "garch")
    val gBicTop = gRows.minBy(_._7)
    assert((gBicTop._2, gBicTop._3) == ((1, 1)),
      s"planted GARCH(1,1) ranked behind (${gBicTop._2},${gBicTop._3}) by BIC")
    val gAicTop2 = gRows.sortBy(_._6).take(2).map(r => (r._2, r._3))
    assert(gAicTop2.contains((1, 1)),
      s"planted GARCH(1,1) missing from AIC top-2 $gAicTop2")
  }

  test("ts_order_search emits a full ranked grid per key") {
    val df = TimeSeries.queries("ts_order_search")(spark, sfSmoke).collect()
    assert(df.length == 5 * 18, s"expected 5 keys x 18 orders, got ${df.length}")
    df.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case ((k, fam), rows) =>
        assert(rows.length == 9, s"$k/$fam grid size ${rows.length}")
        val byRank = rows.sortBy(_.getLong(9))
        assert(byRank.map(_.getLong(9)).toSeq == (1L to 9L),
          s"$k/$fam ranks not dense")
        // AIC must be non-decreasing in rank
        val aics = byRank.map(_.getDouble(6)).toSeq
        assert(aics == aics.sorted, s"$k/$fam AIC not sorted by rank")
        rows.foreach { r =>
          assert(!r.getDouble(6).isNaN && !r.getDouble(7).isNaN)
          // the notebook's second ranking signal: rolling-CV RMSE on the
          // GARCH grid only (finite, non-negative); NULL on the ARMA grid
          if (fam == "garch") assert(r.getDouble(8) >= 0
            && !r.getDouble(8).isNaN, s"$k garch cv_rmse")
          else assert(r.isNullAt(8), s"$k arma cv_rmse must be NULL")
        }
    }
  }

  test("ts_diagnostics runs with finite stats") {
    val df = TimeSeries.queries("ts_diagnostics")(spark, sfSmoke).collect()
    assert(df.length == 5)
    df.foreach { r =>
      (1 to 4).foreach(i => assert(!r.getDouble(i).isNaN, s"NaN stat at $i"))
    }
  }
  test("holt-winters: internally consistent state and finite forecasts") {
    val rows = TimeSeries.queries("ts_holt_winters")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (level, trend) = (r.getAs[Double]("level"), r.getAs[Double]("trend"))
      val sNext = r.getAs[Double]("season_next")
      assert(!level.isNaN && !trend.isNaN && !sNext.isNaN)
      // forecast_1 must equal level + trend + season_next (rounding aside)
      assert(math.abs(
        r.getAs[Double]("forecast_1") - (level + trend + sNext)) < 2e-6)
      // the week-ahead forecast is level + 7·trend plus a bounded
      // seasonal correction: the seasonal term corrects, never dominates
      assert(math.abs(
        r.getAs[Double]("forecast_7") - (level + 7.0 * trend))
        < math.abs(level) + 1.0)
    }
  }
  test("decomposition: components rebuild the series; seasonal sums ~0") {
    val rows = TimeSeries.queries("ts_decompose")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rebuilt = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(rebuilt - r.getAs[Double]("close")) < 1e-4,
        s"components do not rebuild the close: $r")
    }
    // weekday seasonal effects per key average out by construction
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (k, rs) =>
      val resids = rs.map(_.getAs[Double]("resid"))
      val meanResid = resids.sum / resids.length
      assert(math.abs(meanResid) < 1.0, s"$k residual mean drifted")
    }
  }

  test("fit verdicts: every contract boolean holds on the smoke corpus") {
    val rows = TimeSeries.queries("ts_fit_verdicts")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_obs") > 0)
      for (c <- Seq("garch_feasible", "garch_stationary",
          "garch_dominates_const_var", "arma_centered", "arma_whiter",
          "arma_beats_white_noise"))
        assert(r.getAs[Boolean](c), s"verdict $c false: $r")
    }
  }

  test("cusum: statistics are nonnegative and alarms imply a threshold hit") {
    val rows = TimeSeries.queries("ts_cusum")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 0)
      val (sp, sn) = (r.getAs[Long]("max_cusum_pos"),
        r.getAs[Long]("max_cusum_neg"))
      assert(sp >= 0 && sn >= 0, s"cusum stats must be nonnegative: $r")
      val alarms = r.getAs[Long]("n_alarm_days")
      assert(alarms >= 0 && alarms <= r.getAs[Long]("n_days"))
      // an alarm day exists iff a first-alarm date is reported
      assert((alarms > 0) ==
        (r.getAs[java.sql.Date]("first_alarm_d") != null),
        s"alarm count and first-alarm date disagree: $r")
    }
  }
}
