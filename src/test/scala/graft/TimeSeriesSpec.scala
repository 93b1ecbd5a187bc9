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

  test("ts_diagnostics runs with finite stats") {
    val df = TimeSeries.queries("ts_diagnostics")(spark, sfSmoke).collect()
    assert(df.length == 5)
    df.foreach { r =>
      (1 to 4).foreach(i => assert(!r.getDouble(i).isNaN, s"NaN stat at $i"))
    }
  }
}
