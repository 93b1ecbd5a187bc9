package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t
import graft.functions.TimeSeriesStats

/** Time-series analytics — SURVEY.md §2.6 W4/W5, §2.10 (the notebook
  * econometrics re-expressed in-engine): daily OHLCV roll-ups, rolling
  * moving statistics, naive-forecast rolling-origin backtest with
  * mae/rmse/smape, GARCH(1,1) MLE, and stationarity/autocorrelation
  * diagnostics.
  *
  * The OHLCV/rolling/backtest queries and the closed-form diagnostics
  * (`ts_diagnostics` — ADF/Ljung-Box/ARCH-LM are two-pass sums, replayed
  * in DuckDB) are DuckDB-oracled; the iterative model fits
  * (`ts_garch_fit`, ARMA CSS, order search) are not SQL-expressible, so
  * they are declared without oracle (driver rows-only check) and
  * unit-tested against numeric invariants in TimeSeriesSpec.
  */
object TimeSeries {
  type Q = (SparkSession, String) => DataFrame

  /** Quantize to 1/scale units — the PINNED-ORACLE contract for the
    * iterative fits (the sim_topics pattern applied to §2.10): the
    * Nelder-Mead/CSS optimizers run a fixed deterministic schedule over a
    * pinned fixture, so their estimates are constants of the corpus; the
    * oracle pins them as integer literals and replays only this division
    * (`BIGINT / scale` — the same long→double conversion and IEEE divide
    * on both engines, bit-identical). Quantization absorbs last-ulp
    * accumulation wobble without weakening the gate: a regressed
    * optimizer moves an estimate by far more than one micro-unit and
    * fails the hash.
    */
  private def quant(v: Double, scale: Double): Double = {
    // a non-finite estimate must fail LOUDLY here, not quantize to a
    // plausible-looking 0.0 (math.round(NaN)==0) or ±Long.MaxValue/scale:
    // NaN/Inf means the optimizer degenerated, and the pinned oracle
    // would otherwise mask it as a value mismatch with no cause attached
    require(!v.isNaN && !v.isInfinity,
      s"quant: non-finite estimate $v — optimizer degenerated")
    math.round(v * scale) / scale
  }

  /** Daily close series per event_type, the shared input (reference:
    * udf.py:85-99 daily OHLCV load; FIXTURES §2 daily roll-up mapping).
    */
  private def dailyClose(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(max_by(col("value"), col("ts")).as("close"))

  // ---------------------------------------------------------------------
  // OHLCV candles (reference: dailybitcoin/dailyethereum tables,
  // query.sql:10-11; udf.py:85-99).
  private def tsOhlcvDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("volume"),
        count(lit(1)).as("n_ticks"))
      .orderBy(col("event_type"), col("d"))

  private val tsOhlcvDailySql =
    """SELECT event_type, CAST(ts AS DATE) AS d,
      |  arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
      |  arg_max(value, ts) AS close,
      |  sum(CAST(round(value*100) AS BIGINT))/100.0 AS volume,
      |  count(*) AS n_ticks
      |FROM events GROUP BY 1, 2 ORDER BY event_type, d""".stripMargin

  // ---------------------------------------------------------------------
  // W4: rolling 12-row moving average / stddev over the daily close
  // (reference: garch_model_v4.ipynb cell 4 rolling(12) mean/std;
  // dashboard "BTC price with MA"). Mean uses the exact cents sum; stddev
  // rounds to 6 dp (engine accumulation orders differ at ~1e-15).
  private def w4MovingStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val frame = w.rowsBetween(-11, 0)
    dailyClose(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("ma_12",
        sum(round(col("close") * 100).cast("long")).over(frame) / 100.0 / 12.0)
      .withColumn("sd_12", round(stddev(col("close")).over(frame), 6))
      .filter(col("rn") >= 12)
      .select(col("event_type"), col("d"), col("close"), col("ma_12"),
        col("sd_12"))
      .orderBy(col("event_type"), col("d"))
  }

  private val w4MovingStatsSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, arg_max(value, ts) AS close
      |  FROM events GROUP BY 1, 2),
      |roll AS (
      |  SELECT event_type, d, close,
      |    row_number() OVER w AS rn,
      |    sum(CAST(round(close*100) AS BIGINT))
      |      OVER (w ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)/100.0/12.0 AS ma_12,
      |    round(stddev(close)
      |      OVER (w ROWS BETWEEN 11 PRECEDING AND CURRENT ROW), 6) AS sd_12
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d))
      |SELECT event_type, d, close, ma_12, sd_12 FROM roll
      |WHERE rn >= 12 ORDER BY event_type, d""".stripMargin

  // ---------------------------------------------------------------------
  // Rolling-origin backtest with the naive (last-value) forecast — the
  // SQL-expressible core of the reference's cross-validation loop
  // (reference: Garch_v1.ipynb cells 23-26,49: h-step CV + mae/mape/rmse/
  // smape). Forecast(d) = close(d-1); evaluation window = last 10 days.
  private def tsNaiveBacktest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    dailyClose(s, dir)
      .withColumn("forecast", lag(col("close"), 1).over(w))
      .filter(col("forecast").isNotNull && col("d") >= lit("2024-01-21"))
      .groupBy(col("event_type"))
      .agg(
        round(avg(abs(col("close") - col("forecast"))), 6).as("mae"),
        round(avg(abs(col("close") - col("forecast"))
          / col("close") * 100.0), 6).as("mape"),
        round(sqrt(avg(pow(col("close") - col("forecast"), 2))), 6).as("rmse"),
        round(avg(abs(col("close") - col("forecast"))
          / ((abs(col("close")) + abs(col("forecast"))) / 2.0) * 100.0), 6)
          .as("smape"),
        count(lit(1)).as("n_folds"))
      .orderBy(col("event_type"))
  }

  private val tsNaiveBacktestSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, arg_max(value, ts) AS close
      |  FROM events GROUP BY 1, 2),
      |folds AS (
      |  SELECT event_type, d, close,
      |         lag(close, 1) OVER (PARTITION BY event_type ORDER BY d) AS forecast
      |  FROM daily)
      |SELECT event_type,
      |  round(avg(abs(close - forecast)), 6) AS mae,
      |  round(avg(abs(close - forecast)/close*100.0), 6) AS mape,
      |  round(sqrt(avg(pow(close - forecast, 2))), 6) AS rmse,
      |  round(avg(abs(close - forecast)/((abs(close)+abs(forecast))/2.0)*100.0), 6) AS smape,
      |  count(*) AS n_folds
      |FROM folds WHERE forecast IS NOT NULL AND d >= DATE '2024-01-21'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // GARCH(1,1) volatility fit per key over daily log-returns (reference:
  // test5.ipynb cell 10, Garch_v1.ipynb cells 21-37). groupByKey.mapGroups
  // runs one in-memory MLE per key in parallel across executors — the
  // per-key series is small (days), the number of keys is what scales.
  // The MLE itself is not SQL-expressible, but its ESTIMATES are pinned
  // constants of the fixture (deterministic optimizer schedule) — outputs
  // are quantized via [[quant]] and the oracle pins the integer units
  // literally while recomputing n_obs from the events table.
  private def tsGarchFit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val rets = dailyClose(s, dir)
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        datediff(col("d"), to_date(lit("2024-01-01"))).as("td"),
        log(col("close") / col("prev")).as("r"))
      .as[(String, Int, Double)]
    rets.groupByKey(_._1)
      .mapGroups { (k, it) =>
        val series = it.map(x => (x._2, x._3)).toArray.sortBy(_._1).map(_._2)
        val fit = TimeSeriesStats.fitGarch11(series)
        val fvar = TimeSeriesStats.garchForecastVariance(fit, series, 1)
        (k, quant(fit.omega, 1e12), quant(fit.alpha, 1e12),
          quant(fit.beta, 1e12), quant(fit.loglik, 1e6),
          quant(fvar, 1e9), fit.n)
      }
      .toDF("event_type", "omega", "alpha", "beta", "loglik",
        "forecast_var_1d", "n_obs")
      .orderBy(col("event_type"))
  }

  // Stationarity & autocorrelation diagnostics per key (reference:
  // Garch_v1.ipynb cells 7,15 ADF + Ljung-Box; test5.ipynb cell 8 het_arch).
  // Unlike the iterative MLE fits, all three statistics are CLOSED FORMS
  // over the per-key series (two-pass OLS / ACF sums), so the query is
  // fully DuckDB-oracled: outputs round to 6 decimals on both engines and
  // the oracle replays the same two-pass centered-sum structure.
  private def tsDiagnostics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val rets = dailyClose(s, dir)
      .withColumn("prev", lag(col("close"), 1).over(w))
      .select(col("event_type"),
        datediff(col("d"), to_date(lit("2024-01-01"))).as("td"),
        col("close"),
        when(col("prev").isNotNull, log(col("close") / col("prev"))).as("r"))
      .as[(String, Int, Double, Option[Double])]
    rets.groupByKey(_._1)
      .mapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2)
        val closes = rows.map(_._3)
        val r = rows.flatMap(_._4)
        (k, TimeSeriesStats.adfTStat(closes), TimeSeriesStats.adfTStat(r),
          TimeSeriesStats.ljungBox(r, 10), TimeSeriesStats.archLmStat(r),
          closes.length.toLong)
      }
      .toDF("event_type", "adf_t_close", "adf_t_returns", "ljung_box_q10",
        "arch_lm", "n_obs")
      .select(col("event_type"),
        round(col("adf_t_close"), 6).as("adf_t_close"),
        round(col("adf_t_returns"), 6).as("adf_t_returns"),
        round(col("ljung_box_q10"), 6).as("ljung_box_q10"),
        round(col("arch_lm"), 6).as("arch_lm"),
        col("n_obs"))
      .orderBy(col("event_type"))
  }

  // Closed-form replay of tsDiagnostics. Each statistic is expressed with
  // the SAME two-pass structure as functions/TimeSeriesStats (means first,
  // then centered sums, then the ratio), so the only cross-engine drift is
  // group-sum association order — absorbed by the 6-decimal round.
  // ADF: Δy_t on y_{t−1} with intercept; t = γ̂ / se(γ̂).
  // Ljung-Box: Q = n(n+2) Σ_{k≤10} ρ_k²/(n−k), ρ_k biased ACF.
  // ARCH-LM: n·R² of e²_t on e²_{t−1}.
  private val tsDiagnosticsSql = {
    // one ADF chain, parameterized by the (event_type, x, dy) row source
    def adf(src: String, out: String): String =
      s"""${out}_m AS (
         |  SELECT event_type, count(*) AS n, avg(x) AS mx, avg(dy) AS md
         |  FROM $src GROUP BY 1),
         |${out}_s AS (
         |  SELECT s.event_type,
         |    sum((s.x - m.mx) * (s.x - m.mx)) AS sxx,
         |    sum((s.x - m.mx) * (s.dy - m.md)) AS sxd
         |  FROM $src s JOIN ${out}_m m USING (event_type) GROUP BY 1),
         |${out}_g AS (
         |  SELECT event_type, s.sxd / s.sxx AS gamma,
         |    m.md - s.sxd / s.sxx * m.mx AS c
         |  FROM ${out}_s s JOIN ${out}_m m USING (event_type)),
         |$out AS (
         |  SELECT s.event_type,
         |    g.gamma / sqrt(sum((s.dy - g.c - g.gamma * s.x)
         |      * (s.dy - g.c - g.gamma * s.x)) / (m.n - 2) / t.sxx) AS t
         |  FROM $src s
         |  JOIN ${out}_g g USING (event_type)
         |  JOIN ${out}_m m USING (event_type)
         |  JOIN ${out}_s t USING (event_type)
         |  GROUP BY s.event_type, g.gamma, m.n, t.sxx)""".stripMargin
    val lbTerms = (1 to 10).map { k =>
      s"(s$k / c0) * (s$k / c0) / (n - $k)"
    }.mkString("\n      |      + ")
    val lbLeads = (1 to 10).map { k =>
      s"lead(r, $k) OVER (PARTITION BY event_type ORDER BY d) AS l$k"
    }.mkString(", ")
    val lbSums = (1 to 10).map { k =>
      s"sum(CASE WHEN x.l$k IS NOT NULL THEN (x.r - m.m) * (x.l$k - m.m) END) AS s$k"
    }.mkString(",\n      |    ")
    s"""WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, arg_max(value, ts) AS close
      |  FROM events GROUP BY 1, 2),
      |ser AS (
      |  SELECT event_type, d, close,
      |    lag(close) OVER (PARTITION BY event_type ORDER BY d) AS prev
      |  FROM daily),
      |adfc_src AS (
      |  SELECT event_type, prev AS x, close - prev AS dy
      |  FROM ser WHERE prev IS NOT NULL),
      |rets AS (
      |  SELECT event_type, d, ln(close / prev) AS r,
      |    lag(ln(close / prev))
      |      OVER (PARTITION BY event_type ORDER BY d) AS rprev
      |  FROM ser WHERE prev IS NOT NULL),
      |adfr_src AS (
      |  SELECT event_type, rprev AS x, r - rprev AS dy
      |  FROM rets WHERE rprev IS NOT NULL),
      |${adf("adfc_src", "adfc")},
      |${adf("adfr_src", "adfr")},
      |lb_m AS (
      |  SELECT event_type, count(*) AS n, avg(r) AS m FROM rets GROUP BY 1),
      |lb_lead AS (
      |  SELECT event_type, r, $lbLeads FROM rets),
      |lb_s AS (
      |  SELECT x.event_type,
      |    sum((x.r - m.m) * (x.r - m.m)) AS c0,
      |    $lbSums
      |  FROM lb_lead x JOIN lb_m m USING (event_type) GROUP BY 1),
      |lb AS (
      |  SELECT s.event_type,
      |    m.n * (m.n + 2.0) * (
      |      $lbTerms) AS q
      |  FROM lb_s s JOIN lb_m m USING (event_type)),
      |arch_src AS (
      |  SELECT event_type, r * r AS y,
      |    lag(r * r) OVER (PARTITION BY event_type ORDER BY d) AS x
      |  FROM rets),
      |arch_m AS (
      |  SELECT event_type, count(*) AS n, avg(x) AS mx, avg(y) AS my
      |  FROM arch_src WHERE x IS NOT NULL GROUP BY 1),
      |arch AS (
      |  SELECT s.event_type,
      |    m.n * (sum((s.x - m.mx) * (s.y - m.my))
      |           * sum((s.x - m.mx) * (s.y - m.my))
      |      / (sum((s.x - m.mx) * (s.x - m.mx))
      |         * sum((s.y - m.my) * (s.y - m.my)))) AS lm
      |  FROM arch_src s JOIN arch_m m USING (event_type)
      |  WHERE s.x IS NOT NULL GROUP BY s.event_type, m.n),
      |nobs AS (
      |  SELECT event_type, count(*) AS n_obs FROM daily GROUP BY 1)
      |SELECT n.event_type,
      |  round(adfc.t, 6) AS adf_t_close,
      |  round(adfr.t, 6) AS adf_t_returns,
      |  round(lb.q, 6) AS ljung_box_q10,
      |  round(arch.lm, 6) AS arch_lm,
      |  n.n_obs
      |FROM nobs n
      |JOIN adfc USING (event_type)
      |JOIN adfr USING (event_type)
      |JOIN lb USING (event_type)
      |JOIN arch USING (event_type)
      |ORDER BY n.event_type""".stripMargin
  }

  // ARIMA/ARMA residual stage (reference: test5.ipynb cell 6 and
  // garch_model_v4.ipynb cell 6 — ARIMA fit whose residuals feed GARCH).
  // ARMA(1,1) by CSS on daily log-returns ≡ ARIMA(1,1,1) on the log-price
  // level, the notebooks' fixed order. Emits the fitted parameters, the
  // residual diagnostics the notebooks inspect (mean, Ljung-Box), and the
  // GARCH(1,1) fit on the ARMA residuals — the full two-stage chain.
  // Same groupByKey.mapGroups parallelism as tsGarchFit: one small in-memory
  // series per key, keys scale out. Estimates quantized and pinned in the
  // oracle (the [[quant]] contract); invariants in TimeSeriesSpec.
  private def tsArmaResiduals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val rets = dailyClose(s, dir)
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        datediff(col("d"), to_date(lit("2024-01-01"))).as("td"),
        log(col("close") / col("prev")).as("r"))
      .as[(String, Int, Double)]
    rets.groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val series = it.map(x => (x._2, x._3)).toArray.sortBy(_._1).map(_._2)
        // groups too short to fit (ARMA CSS + GARCH on its residuals +
        // Ljung-Box at lag 10) are skipped, not emitted as NaN rows
        if (series.length < 12) Iterator.empty
        else {
          val fit = TimeSeriesStats.fitArma11(series)
          val resid = TimeSeriesStats.armaResiduals(
            series, fit.c, fit.phi, fit.theta)
          val g = TimeSeriesStats.fitGarch11(resid)
          // quantized per the pinned-oracle contract (see [[quant]])
          Iterator.single(
            (k, quant(fit.c, 1e9), quant(fit.phi, 1e9),
              quant(fit.theta, 1e9), quant(fit.sigma2, 1e9),
              quant(fit.loglik, 1e6), quant(TimeSeriesStats.mean(resid), 1e9),
              quant(TimeSeriesStats.ljungBox(resid, 10), 1e6),
              quant(g.alpha + g.beta, 1e9), fit.n))
        }
      }
      .toDF("event_type", "c", "phi", "theta", "sigma2", "loglik",
        "resid_mean", "resid_lb_q10", "garch_persistence", "n_obs")
      .orderBy(col("event_type"))
  }

  // GARCH rolling-origin cross-validation (reference: Garch_v1.ipynb cell
  // 23 — h=1, step_size=1, n_windows=5): for each of the last 5 days, fit
  // GARCH(1,1) on the returns strictly before the cutoff, forecast the
  // 1-day-ahead variance, score against the realized squared return.
  // Reported per key: mae / rmse on variance, plus the QLIKE loss
  // (the standard variance-forecast loss, robust to noise in r²).
  // Losses quantized and pinned in the oracle (the [[quant]] contract);
  // n_folds recomputed by the oracle; invariants in TimeSeriesSpec.
  private def tsGarchBacktest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val rets = dailyClose(s, dir)
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        datediff(col("d"), to_date(lit("2024-01-01"))).as("td"),
        log(col("close") / col("prev")).as("r"))
      .as[(String, Int, Double)]
    rets.groupByKey(_._1)
      .mapGroups { (k, it) =>
        val series = it.map(x => (x._2, x._3)).toArray.sortBy(_._1).map(_._2)
        val folds = 5.min(series.length - 10).max(1)
        val scores = (0 until folds).map { f =>
          val cut = series.length - folds + f
          val train = series.take(cut)
          val fit = TimeSeriesStats.fitGarch11(train)
          val fvar = TimeSeriesStats.garchForecastVariance(fit, train, 1)
          val realized = series(cut) * series(cut)
          (math.abs(realized - fvar), math.pow(realized - fvar, 2),
            realized / fvar - math.log((realized / fvar).max(1e-12)) - 1)
        }
        val n = scores.length
        // quantized per the pinned-oracle contract (see [[quant]])
        (k, quant(scores.map(_._1).sum / n, 1e9),
          quant(math.sqrt(scores.map(_._2).sum / n), 1e9),
          quant(scores.map(_._3).sum / n, 1e9), n.toLong)
      }
      .toDF("event_type", "var_mae", "var_rmse", "qlike", "n_folds")
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------------
  // Model-selection report (reference: test5.ipynb cell 10 grid-searches
  // ARIMA p,q by AIC/BIC; Garch_v1.ipynb cells 21-29 rank 9 GARCH orders):
  // per key, fit a 3×3 ARMA grid (p,q ∈ 0..2, CSS) and a 3×3 GARCH grid
  // (p ∈ 1..3, q ∈ 0..2, MLE) on daily log-returns; rank each family by
  // AIC. Same scale shape as tsGarchFit — one bounded in-memory grid per
  // key (18 small simplex fits over a days-long series), keys scale out.
  // Criteria quantized and pinned in the oracle (the [[quant]] contract,
  // 90 pinned grid rows); planted-order recovery in TimeSeriesSpec.
  /** The per-series grid, exposed so specs can feed planted-order data.
    * GARCH rows additionally carry the reference's second ranking signal
    * (Garch_v1.ipynb cells 21-29 rank orders by rolling-CV RMSE): a
    * 5-fold rolling-origin 1-step variance-forecast RMSE per (p,q); ARMA
    * rows carry NaN there (the notebook CV-ranks only the GARCH stage).
    */
  def orderSearchRows(series: Array[Double])
      : Seq[(String, Int, Int, Int, Double, Double, Double, Double, Long)] = {
    val arma = for (p <- 0 to 2; q <- 0 to 2)
      yield ("arma", TimeSeriesStats.fitArmaPQ(series, p, q), Double.NaN)
    val garch = for (p <- 1 to 3; q <- 0 to 2) yield {
      val folds = 5.min(series.length - 10).max(1)
      val sqErrs = (0 until folds).map { f =>
        val cut = series.length - folds + f
        val train = series.take(cut)
        val fit = TimeSeriesStats.fitGarchParamsPQ(train, p, q)
        val fvar = TimeSeriesStats.garchForecastVariancePQ(fit, train)
        val realized = series(cut) * series(cut)
        math.pow(realized - fvar, 2)
      }
      ("garch", TimeSeriesStats.fitGarchPQ(series, p, q),
        math.sqrt(sqErrs.sum / sqErrs.length))
    }
    (arma ++ garch).map { case (fam, f, cv) =>
      (fam, f.p, f.q, f.kParams, f.loglik, f.aic, f.bic, cv, f.n)
    }
  }

  private def tsOrderSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val rets = dailyClose(s, dir)
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        datediff(col("d"), to_date(lit("2024-01-01"))).as("td"),
        log(col("close") / col("prev")).as("r"))
      .as[(String, Int, Double)]
    rets.groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val series = it.map(x => (x._2, x._3)).toArray.sortBy(_._1).map(_._2)
        // the deepest grid point needs p+q+3 = 8 observations
        if (series.length < 12) Iterator.empty
        else {
          val rows = orderSearchRows(series)
          // rank within family by AIC, ties broken by the smaller order.
          // Outputs quantized per the pinned-oracle contract ([[quant]]);
          // the not-applicable ARMA cv_rmse is NULL, not NaN — a pinned
          // literal oracle (and the driver's typed hash) compares nulls
          // exactly, while NaN equality is representation-dependent
          rows.groupBy(_._1).iterator.flatMap { case (_, fam) =>
            fam.sortBy(r => (r._6, r._2, r._3)).zipWithIndex.map {
              case ((f, p, q, kp, ll, aic, bic, cv, n), i) =>
                (k, f, p, q, kp, quant(ll, 1e6), quant(aic, 1e6),
                  quant(bic, 1e6),
                  if (cv.isNaN) None else Some(quant(cv, 1e9)),
                  i + 1L, n)
            }
          }
        }
      }
      .toDF("event_type", "family", "p", "q", "k_params", "loglik", "aic",
        "bic", "cv_rmse", "aic_rank", "n_obs")
      .orderBy(col("event_type"), col("family"), col("aic_rank"))
  }

  // ---------------------------------------------------------------------
  // Holt's linear-trend exponential smoothing over the daily close
  // (ETS(A,A,N); the notebook forecasting family's smoother sibling —
  // reference Garch_v1.ipynb forecasts the same daily series with ARIMA).
  // l_t = α·y_t + (1−α)(l+b);  b_t = β(l_t − l) + (1−β)b;  init l=y_1,
  // b=0, folding from y_2. α=0.3, β=0.1.
  //
  // The whole recursion runs as ONE `aggregate` higher-order function
  // over the per-key ordered close array — no UDF, no driver loop, and
  // per-key state is a 2-element DOUBLE array [l, b]. An ARRAY, not a
  // struct: DuckDB's `list_reduce` evaluates a struct-typed result field
  // by field against the accumulator mutated IN PLACE, so a `b` lambda
  // reading `a.l` sees the already-updated level and the recursion is
  // not Holt's (r07 red row). Array state folds correctly in both
  // engines. DuckDB's `list_reduce` has no separate init parameter, so
  // the oracle prepends the init pair and wraps each y_t as [y_t, 0];
  // the fold ORDER and the lambda arithmetic (l' spelled out twice —
  // HOF lambdas bind no locals) are textually mirrored so both engines
  // produce bit-identical doubles.
  // Scale shape: series live one-per-key (5 event types here, one row
  // group per symbol at 100 TB) — collect_list is per-GROUP state inside
  // a hash aggregate, bounded by one key's history, never a global
  // collect.
  private def tsHoltForecast(s: SparkSession, dir: String): DataFrame =
    dailyClose(s, dir)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("d"), col("close"))))
        .as("pairs"))
      .select(col("event_type"),
        expr("transform(pairs, x -> x.close)").as("cl"))
      .select(col("event_type"),
        size(col("cl")).cast("long").as("n"),
        expr(
          """aggregate(
            |  slice(cl, 2, size(cl) - 1),
            |  array(element_at(cl, 1), CAST(0.0 AS DOUBLE)),
            |  (a, x) -> array(
            |    0.3D * x + 0.7D * (a[0] + a[1]),
            |    0.1D * ((0.3D * x + 0.7D * (a[0] + a[1])) - a[0])
            |         + 0.9D * a[1]))""".stripMargin).as("fit"))
      .select(col("event_type"), col("n"),
        round(element_at(col("fit"), 1), 6).as("level"),
        round(element_at(col("fit"), 2), 6).as("trend"),
        round(element_at(col("fit"), 1) + element_at(col("fit"), 2), 6)
          .as("forecast_1"),
        round(element_at(col("fit"), 1)
          + lit(3.0) * element_at(col("fit"), 2), 6).as("forecast_3"))
      .orderBy(col("event_type"))

  private val tsHoltForecastSql =
    """WITH s AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    arg_max(value, ts) AS close
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, list(close ORDER BY d) AS cl
      |  FROM s GROUP BY 1),
      |f AS (
      |  SELECT event_type, len(cl) AS n,
      |    list_reduce(
      |      list_concat(
      |        [[cl[1], CAST(0.0 AS DOUBLE)]],
      |        list_transform(cl[2:], y -> [y, CAST(0.0 AS DOUBLE)])),
      |      (a, x) -> [0.3::DOUBLE * x[1] + 0.7::DOUBLE * (a[1] + a[2]),
      |                 0.1::DOUBLE * ((0.3::DOUBLE * x[1]
      |                                 + 0.7::DOUBLE * (a[1] + a[2])) - a[1])
      |                      + 0.9::DOUBLE * a[2]]) AS fit
      |  FROM l)
      |SELECT event_type, n, round(fit[1], 6) AS level,
      |  round(fit[2], 6) AS trend,
      |  round(fit[1] + fit[2], 6) AS forecast_1,
      |  round(fit[1] + 3.0 * fit[2], 6) AS forecast_3
      |FROM f ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Holt-Winters additive-seasonal smoothing (ETS(A,A,A), weekly period
  // m=7) over the daily close — the seasonal sibling of ts_holt_forecast
  // for series with a weekly cycle. α=0.3, β=0.1, γ=0.2; init l₀ = mean
  // of week 1, b₀ = (mean of week 2 − mean of week 1)/7, s_j = y_{j+1} −
  // l₀; fold from t=7 (0-based). State is ONE 9-double array
  // [l, b, s₀..s₆] folded by `aggregate`; each input carries its own
  // position ([y_t, t]) so the seasonal slot needs no counter in the
  // accumulator. l′ is spelled out in full in every branch that uses it
  // (HOF lambdas bind no locals — the ts_holt_forecast contract), and
  // the DuckDB replay mirrors the fold order and arithmetic textually,
  // so the doubles match bit-for-bit and round(…,6) is cosmetic. Same
  // scale shape as the Holt query: collect_list is per-KEY state inside
  // a hash aggregate, keys scale out.
  private def tsHoltWinters(s: SparkSession, dir: String): DataFrame =
    dailyClose(s, dir)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("d"), col("close"))))
        .as("pairs"))
      .select(col("event_type"),
        expr("transform(pairs, x -> x.close)").as("cl"))
      .filter(size(col("cl")) >= 15)
      .withColumn("l0",
        (element_at(col("cl"), 1) + element_at(col("cl"), 2)
          + element_at(col("cl"), 3) + element_at(col("cl"), 4)
          + element_at(col("cl"), 5) + element_at(col("cl"), 6)
          + element_at(col("cl"), 7)) / 7.0)
      .withColumn("b0",
        ((element_at(col("cl"), 8) + element_at(col("cl"), 9)
          + element_at(col("cl"), 10) + element_at(col("cl"), 11)
          + element_at(col("cl"), 12) + element_at(col("cl"), 13)
          + element_at(col("cl"), 14)) / 7.0 - col("l0")) / 7.0)
      .withColumn("init", array(
        col("l0"), col("b0"),
        element_at(col("cl"), 1) - col("l0"),
        element_at(col("cl"), 2) - col("l0"),
        element_at(col("cl"), 3) - col("l0"),
        element_at(col("cl"), 4) - col("l0"),
        element_at(col("cl"), 5) - col("l0"),
        element_at(col("cl"), 6) - col("l0"),
        element_at(col("cl"), 7) - col("l0")))
      .withColumn("fit", expr(
        """aggregate(
          |  transform(sequence(7, size(cl) - 1),
          |    t -> array(element_at(cl, t + 1), CAST(t AS DOUBLE))),
          |  init,
          |  (a, x) -> transform(sequence(0, 8), k ->
          |    CASE WHEN k = 0 THEN
          |      0.3D * (x[0] - a[CAST(x[1] AS INT) % 7 + 2])
          |        + 0.7D * (a[0] + a[1])
          |    WHEN k = 1 THEN
          |      0.1D * ((0.3D * (x[0] - a[CAST(x[1] AS INT) % 7 + 2])
          |               + 0.7D * (a[0] + a[1])) - a[0]) + 0.9D * a[1]
          |    WHEN k = CAST(x[1] AS INT) % 7 + 2 THEN
          |      0.2D * (x[0] - (0.3D * (x[0] - a[CAST(x[1] AS INT) % 7 + 2])
          |                      + 0.7D * (a[0] + a[1]))) + 0.8D * a[k]
          |    ELSE a[k] END))""".stripMargin))
      .withColumn("n", size(col("cl")).cast("long"))
      .select(col("event_type"), col("n").as("n_obs"),
        round(expr("fit[0]"), 6).as("level"),
        round(expr("fit[1]"), 6).as("trend"),
        round(expr("fit[CAST(n % 7 AS INT) + 2]"), 6).as("season_next"),
        round(expr("fit[0] + fit[1] + fit[CAST(n % 7 AS INT) + 2]"), 6)
          .as("forecast_1"),
        round(expr(
          "fit[0] + 7.0D * fit[1] + fit[CAST((n + 6) % 7 AS INT) + 2]"), 6)
          .as("forecast_7"))
      .orderBy(col("event_type"))

  private val tsHoltWintersSql =
    """WITH s AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    arg_max(value, ts) AS close
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, list(close ORDER BY d) AS cl, count(*) AS n
      |  FROM s GROUP BY 1),
      |i0 AS (
      |  SELECT event_type, cl, n,
      |    (cl[1] + cl[2] + cl[3] + cl[4] + cl[5] + cl[6] + cl[7])
      |      / 7.0::DOUBLE AS l0
      |  FROM l WHERE n >= 15),
      |i1 AS (
      |  SELECT *,
      |    ((cl[8] + cl[9] + cl[10] + cl[11] + cl[12] + cl[13] + cl[14])
      |      / 7.0::DOUBLE - l0) / 7.0::DOUBLE AS b0
      |  FROM i0),
      |f AS (
      |  SELECT event_type, n,
      |    list_reduce(
      |      list_concat(
      |        [[l0, b0, cl[1] - l0, cl[2] - l0, cl[3] - l0, cl[4] - l0,
      |          cl[5] - l0, cl[6] - l0, cl[7] - l0]],
      |        list_transform(range(7, n), t -> [cl[t + 1],
      |                                          CAST(t AS DOUBLE)])),
      |      (a, x) -> list_transform(range(0, 9), k ->
      |        CASE WHEN k = 0 THEN
      |          0.3::DOUBLE * (x[1] - a[CAST(x[2] AS INT) % 7 + 3])
      |            + 0.7::DOUBLE * (a[1] + a[2])
      |        WHEN k = 1 THEN
      |          0.1::DOUBLE * ((0.3::DOUBLE
      |              * (x[1] - a[CAST(x[2] AS INT) % 7 + 3])
      |              + 0.7::DOUBLE * (a[1] + a[2])) - a[1])
      |            + 0.9::DOUBLE * a[2]
      |        WHEN k = CAST(x[2] AS INT) % 7 + 2 THEN
      |          0.2::DOUBLE * (x[1] - (0.3::DOUBLE
      |              * (x[1] - a[CAST(x[2] AS INT) % 7 + 3])
      |              + 0.7::DOUBLE * (a[1] + a[2])))
      |            + 0.8::DOUBLE * a[k + 1]
      |        ELSE a[k + 1] END)) AS fit
      |  FROM i1)
      |SELECT event_type, n AS n_obs,
      |  round(fit[1], 6) AS level,
      |  round(fit[2], 6) AS trend,
      |  round(fit[CAST(n % 7 AS INT) + 3], 6) AS season_next,
      |  round(fit[1] + fit[2] + fit[CAST(n % 7 AS INT) + 3], 6)
      |    AS forecast_1,
      |  round(fit[1] + 7.0::DOUBLE * fit[2]
      |    + fit[CAST((n + 6) % 7 AS INT) + 3], 6) AS forecast_7
      |FROM f ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Classical seasonal decomposition (STL-lite: moving-average trend →
  // weekday-mean seasonal → residual) over the daily close — the
  // decomposition every seasonality inspection starts with, and the
  // additive counterpart of ts_holt_winters' fitted state. Determinism
  // contract: the trend is an exact integer cents-sum over the centered
  // 7-day window divided once (no running float sum), the weekday
  // seasonal means sum in integer micro-units (order-free across
  // partials), and weekday indexing uses days-since-epoch mod 7 (Spark's
  // dayofweek and DuckDB's disagree on Sunday). Rows without a full
  // centered window are dropped identically on both engines. Per-key
  // windows shard by event_type — no global sort.
  private def tsDecompose(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val centered = w.rowsBetween(-3, 3)
    val base = dailyClose(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("nk", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("trend",
        sum(round(col("close") * 100).cast("long")).over(centered)
          / 100.0 / 7.0)
      .filter(col("rn") >= 4 && col("rn") <= col("nk") - 3)
      .withColumn("wd",
        pmod(datediff(col("d"), to_date(lit("1970-01-01"))), lit(7)))
      .withColumn("det_micro",
        round((col("close") - col("trend")) * 1e6).cast("long"))
    val seasonal = base.groupBy(col("event_type"), col("wd"))
      .agg((sum(col("det_micro")) / 1e6 / count(lit(1))).as("seasonal_raw"))
      .withColumn("seasonal", round(col("seasonal_raw"), 6))
    base.join(seasonal, Seq("event_type", "wd"))
      .select(col("event_type"), col("d"), col("close"),
        round(col("trend"), 6).as("trend"), col("seasonal"),
        round(col("close") - col("trend") - col("seasonal"), 6)
          .as("resid"))
      .orderBy(col("event_type"), col("d"))
  }

  private val tsDecomposeSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, arg_max(value, ts) AS close
      |  FROM events GROUP BY 1, 2),
      |tr AS (
      |  SELECT event_type, d, close,
      |    row_number() OVER w AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS nk,
      |    sum(CAST(round(close*100) AS BIGINT))
      |      OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      |      / 100.0 / 7.0 AS trend
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)),
      |base AS (
      |  SELECT event_type, d, close, trend,
      |    (d - DATE '1970-01-01') % 7 AS wd,
      |    CAST(round((close - trend) * 1000000) AS BIGINT) AS det_micro
      |  FROM tr WHERE rn >= 4 AND rn <= nk - 3),
      |seas AS (
      |  SELECT event_type, wd,
      |    round(CAST(sum(det_micro) AS BIGINT) / 1000000.0 / count(*), 6)
      |      AS seasonal
      |  FROM base GROUP BY 1, 2)
      |SELECT b.event_type, b.d, b.close,
      |  round(b.trend, 6) AS trend, s.seasonal,
      |  round(b.close - b.trend - s.seasonal, 6) AS resid
      |FROM base b JOIN seas s USING (event_type, wd)
      |ORDER BY b.event_type, b.d""".stripMargin

  // ---------------------------------------------------------------------
  // CUSUM change-point detection over the daily close — the classic
  // level-shift monitor (Page 1954) next to the decomposition tier. The
  // tabular recursion S⁺_t = max(0, S⁺_{t-1} + dev_t) is not a window
  // function, but its closed form IS: S⁺_t = P_t − min_{i≤t} P_i with
  // P the cumulative deviation sum (and S⁻_t = max_{i≤t} P_i − P_t), so
  // the whole detector is two running extrema over one cumulative sum —
  // per-key sharded windows, no recursion, no global sort. Everything
  // runs in INTEGER CENTS (target = per-key mean floored to a cent,
  // threshold = a tenth of the per-key range), so both engines agree to
  // the bit and the alarm set is exactly oracle-checkable.
  private def tsCusum(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = dailyClose(s, dir)
      .withColumn("cents", round(col("close") * 100).cast("long"))
    val stats = base.groupBy(col("event_type"))
      .agg(expr("sum(cents) div count(*)").as("mu"),
        expr("(max(cents) - min(cents)) div 10").as("h"))
    val cs = base.join(broadcast(stats), Seq("event_type"))
      .withColumn("p", sum(col("cents") - col("mu")).over(wOrd))
      .withColumn("s_pos", col("p") - min(col("p")).over(wOrd))
      .withColumn("s_neg", max(col("p")).over(wOrd) - col("p"))
      .withColumn("alarm",
        (col("s_pos") > col("h")) || (col("s_neg") > col("h")))
    cs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("s_pos")).as("max_cusum_pos"),
        max(col("s_neg")).as("max_cusum_neg"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarm_days"),
        min(when(col("alarm"), col("d"))).as("first_alarm_d"))
      .orderBy(col("event_type"))
  }

  private val tsCusumSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(round(arg_max(value, ts)*100) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, sum(cents) // count(*) AS mu,
      |    (max(cents) - min(cents)) // 10 AS h
      |  FROM daily GROUP BY 1),
      |ps AS (
      |  SELECT d.event_type, d.d, st.h,
      |    sum(d.cents - st.mu) OVER (PARTITION BY d.event_type ORDER BY d.d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      |  FROM daily d JOIN st USING (event_type)),
      |cs AS (
      |  SELECT event_type, d, h,
      |    p - min(p) OVER w AS s_pos,
      |    max(p) OVER w - p AS s_neg
      |  FROM ps
      |  WINDOW w AS (PARTITION BY event_type ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, count(*) AS n_days,
      |  CAST(max(s_pos) AS BIGINT) AS max_cusum_pos,
      |  CAST(max(s_neg) AS BIGINT) AS max_cusum_neg,
      |  CAST(sum(CASE WHEN s_pos > h OR s_neg > h THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_alarm_days,
      |  min(CASE WHEN s_pos > h OR s_neg > h THEN d END) AS first_alarm_d
      |FROM cs GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Hash-checkable CONTRACT for the iterative fits — the HLL-verdict
  // pattern (a3_approx_distinct) applied to the econometric tier: the
  // GARCH/ARMA estimates themselves are not SQL-expressible, but their
  // CORRECTNESS CONTRACT is — per key, the query emits the exact
  // observation count (DuckDB recomputes it) plus the boolean verdicts a
  // sound fit must satisfy: GARCH feasibility (ω>0, α≥0, β≥0),
  // covariance stationarity (α+β<1), likelihood beating the constant-
  // variance Gaussian; ARMA residual centering, residuals whiter than
  // the input (|acf₁| shrinks), likelihood beating white noise. The
  // oracle pins every verdict TRUE — a regressed optimizer flips a
  // boolean and fails the hash, so the fits' quality is now inside the
  // driver's correctness gate instead of only in ScalaTest.
  private def tsFitVerdicts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val rets = dailyClose(s, dir)
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        datediff(col("d"), to_date(lit("2024-01-01"))).as("td"),
        log(col("close") / col("prev")).as("r"))
      .as[(String, Int, Double)]
    rets.groupByKey(_._1)
      .mapGroups { (k, it) =>
        val y = it.map(x => (x._2, x._3)).toArray.sortBy(_._1).map(_._2)
        val n = y.length
        // ARMA white-noise baseline: same CSS convention (n−1 residuals)
        def wnLoglik(series: Array[Double]): Double = {
          val e0 = TimeSeriesStats.armaResiduals(
            series, TimeSeriesStats.mean(series), 0, 0)
          val s2 = e0.map(v => v * v).sum / e0.length
          -0.5 * e0.length * (math.log(2 * math.Pi * s2) + 1.0)
        }
        val g = TimeSeriesStats.fitGarch11(y)
        val a = TimeSeriesStats.fitArma11(y)
        // GARCH constant-variance baseline through the SAME nll code path
        // (ω = sample variance, α = β = 0 is the constant model inside
        // the feasible set), so the optimizer must weakly dominate it
        val rDemeaned = { val m = TimeSeriesStats.mean(y); y.map(_ - m) }
        val constLl = -TimeSeriesStats.garchNll(rDemeaned,
          TimeSeriesStats.variance(rDemeaned).max(1e-12), 0.0, 0.0)
        val resid = TimeSeriesStats.armaResiduals(y, a.c, a.phi, a.theta)
        val residMean = TimeSeriesStats.mean(resid)
        val residSd = math.sqrt(TimeSeriesStats.variance(resid))
        (k, n.toLong,
          g.omega > 0 && g.alpha >= 0 && g.beta >= 0,
          g.alpha + g.beta < 1.0,
          g.loglik >= constLl - 1e-9,
          // centered within 3 standard errors of zero
          math.abs(residMean) <=
            3.0 * residSd / math.sqrt(resid.length.toDouble),
          math.abs(TimeSeriesStats.acf(resid, 1)) <=
            math.abs(TimeSeriesStats.acf(y, 1)) + 1e-9,
          a.loglik > wnLoglik(y))
      }
      .toDF("event_type", "n_obs", "garch_feasible", "garch_stationary",
        "garch_dominates_const_var", "arma_centered", "arma_whiter",
        "arma_beats_white_noise")
      .orderBy(col("event_type"))
  }

  private val tsFitVerdictsSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d FROM events
      |  GROUP BY 1, 2)
      |SELECT event_type, count(*) - 1 AS n_obs,
      |  TRUE AS garch_feasible, TRUE AS garch_stationary,
      |  TRUE AS garch_dominates_const_var, TRUE AS arma_centered,
      |  TRUE AS arma_whiter, TRUE AS arma_beats_white_noise
      |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Longest gain streak — the gaps-and-islands pattern in its most-asked
  // form (dashboards: "longest run of consecutive up-days"): flag up
  // days (close > previous close, exact cents compare), label islands by
  // the row_number difference trick, then per-key max by (length, end
  // date). Per-key sharded windows only; every value integer/date exact.
  private def tsStreaks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val wUp = Window.partitionBy(col("event_type"), col("up"))
      .orderBy(col("d"))
    val flagged = dailyClose(s, dir)
      .withColumn("cents", round(col("close") * 100).cast("long"))
      .withColumn("up",
        (col("cents") > lag(col("cents"), 1).over(w)).cast("boolean"))
      .filter(col("up").isNotNull)
      .withColumn("grp",
        row_number().over(w) - row_number().over(wUp))
    val islands = flagged.filter(col("up"))
      .groupBy(col("event_type"), col("grp"))
      .agg(count(lit(1)).as("len"), max(col("d")).as("end_d"))
    islands.groupBy(col("event_type"))
      .agg(max(col("len")).as("longest_up_streak"),
        max_by(col("end_d"), struct(col("len"), col("end_d")))
          .as("streak_end_d"))
      .join(flagged.groupBy(col("event_type"))
        .agg(sum(when(col("up"), 1L).otherwise(0L)).as("n_up_days")),
        Seq("event_type"))
      .orderBy(col("event_type"))
  }

  private val tsStreaksSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(round(arg_max(value, ts)*100) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |f AS (
      |  SELECT event_type, d,
      |    cents > lag(cents) OVER (PARTITION BY event_type ORDER BY d)
      |      AS up
      |  FROM daily),
      |flagged AS (
      |  SELECT event_type, d, up,
      |    row_number() OVER (PARTITION BY event_type ORDER BY d)
      |      - row_number() OVER (PARTITION BY event_type, up ORDER BY d)
      |      AS grp
      |  FROM f WHERE up IS NOT NULL),
      |islands AS (
      |  SELECT event_type, grp, count(*) AS len, max(d) AS end_d
      |  FROM flagged WHERE up GROUP BY 1, 2),
      |best AS (
      |  SELECT event_type, len AS longest_up_streak,
      |    end_d AS streak_end_d
      |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
      |          ORDER BY len DESC, end_d DESC) AS rn FROM islands)
      |  WHERE rn = 1),
      |ups AS (
      |  SELECT event_type,
      |    CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n_up_days
      |  FROM flagged GROUP BY 1)
      |SELECT b.event_type, b.longest_up_streak, b.streak_end_d, u.n_up_days
      |FROM best b JOIN ups u USING (event_type)
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Pinned oracles for the four iterative fits (the [[quant]] contract):
  // the optimizers run a fixed deterministic schedule over the pinned
  // sf0.01 fixture, so every quantized estimate is a constant of the
  // corpus. Each oracle pins those integer units as literals and replays
  // only `BIGINT / scale` (the same long->double conversion and IEEE
  // divide on both engines, bit-identical), while recomputing every
  // corpus-derived column (n_obs, n_folds, the rank key joins) from the
  // events table the same way ts_fit_verdicts does. A regressed optimizer
  // moves an estimate by far more than one micro-unit and fails the hash
  // with the offending column named in the diff.
  //
  // Each pin CTE additionally FILTERS on an analytically-derivable
  // invariant of the pinned literals (AIC = 2k - 2·loglik within the
  // ±2-unit slack of independent quantization; RMSE ≥ MAE; stationarity
  // bounds), so a literal-transcription error — the failure mode a
  // self-pinned oracle cannot otherwise catch — deletes the torn row and
  // fails the row-count compare loudly instead of being confirmed by its
  // own pin. The SQL also carries a `-- PINNED-FIT ORACLE` marker so the
  // verify output records which oracles are regression pins rather than
  // independent recomputations.
  private val tsGarchFitSql =
    """-- PINNED-FIT ORACLE: estimate columns are regression pins (VALUES),
      |-- corpus columns (n_obs) recomputed; pin rows self-check the
      |-- GARCH constraint set (positivity + stationarity) below.
      |WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d FROM events GROUP BY 1, 2),
      |n AS (SELECT event_type, count(*) - 1 AS n_obs FROM daily GROUP BY 1),
      |pin AS (SELECT * FROM (VALUES
      |    ('click', 1469765312, 1, 997999999998, -56287778, 2816681941),
      |    ('error', 2958137806187, 372637119076, 38, -61733601, 7956350271),
      |    ('purchase', 1985804040740, 303138306693, 80, -56603871, 3392692468),
      |    ('signup', 2705049887844, 313757099651, 3, -60988195, 3036185201),
      |    ('view', 47, 0, 980228838655, -52278301, 1306775761)
      |  ) v(event_type, omega_u, alpha_u, beta_u, loglik_u, fvar_u)
      |  -- invariants of any valid GARCH(1,1) MLE: omega>0, alpha,beta>=0,
      |  -- alpha+beta<1 (unit=1e12), one-step variance forecast > 0 —
      |  -- a mistranscribed literal deletes its row and reddens the board
      |  WHERE omega_u > 0 AND alpha_u >= 0 AND beta_u >= 0
      |    AND alpha_u + beta_u < 1000000000000 AND fvar_u > 0
      |    AND loglik_u < 0)
      |SELECT z.event_type,
      |  CAST(z.omega_u AS BIGINT) / 1e12 AS omega,
      |  CAST(z.alpha_u AS BIGINT) / 1e12 AS alpha,
      |  CAST(z.beta_u AS BIGINT) / 1e12 AS beta,
      |  CAST(z.loglik_u AS BIGINT) / 1e6 AS loglik,
      |  CAST(z.fvar_u AS BIGINT) / 1e9 AS forecast_var_1d,
      |  n.n_obs
      |FROM pin z JOIN n USING (event_type)
      |ORDER BY event_type""".stripMargin

  private val tsArmaResidualsSql =
    """-- PINNED-FIT ORACLE: estimate columns are regression pins (VALUES),
      |-- corpus columns (n_obs) recomputed; pin rows self-check the
      |-- ARMA/GARCH constraint set below.
      |WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d FROM events GROUP BY 1, 2),
      |n AS (SELECT event_type, count(*) - 2 AS n_obs FROM daily GROUP BY 1),
      |pin AS (SELECT * FROM (VALUES
      |    ('click', 46360301, -274298055, -558608977, 1725300732, -47365898, -43326729, 13282234, 998000000),
      |    ('error', -2715029, 133815495, -998000000, 2232447586, -50973659, 276416498, 7662428, 260403521),
      |    ('purchase', 377672482, -531534571, 579057106, 2548056308, -52824911, -32509119, 9982196, 662783995),
      |    ('signup', 2699043, -67750806, -998000000, 1874923309, -48530228, 43512816, 14341671, 998000000),
      |    ('view', 1779458, -180843112, -809448418, 1199977372, -42282517, 98984880, 3483929, 257405234)
      |  ) v(event_type, c_u, phi_u, theta_u, sigma2_u, loglik_u, rm_u,
      |      lb_u, pers_u)
      |  -- invariants of the constrained ARMA(1,1)+GARCH fit (unit=1e9,
      |  -- optimizer clamps |phi|,|theta|,persistence to 0.998): a
      |  -- mistranscribed literal deletes its row
      |  WHERE abs(phi_u) <= 998000000 AND abs(theta_u) <= 998000000
      |    AND sigma2_u > 0 AND lb_u > 0 AND loglik_u < 0
      |    AND pers_u BETWEEN 0 AND 998000000)
      |SELECT z.event_type,
      |  CAST(z.c_u AS BIGINT) / 1e9 AS c,
      |  CAST(z.phi_u AS BIGINT) / 1e9 AS phi,
      |  CAST(z.theta_u AS BIGINT) / 1e9 AS theta,
      |  CAST(z.sigma2_u AS BIGINT) / 1e9 AS sigma2,
      |  CAST(z.loglik_u AS BIGINT) / 1e6 AS loglik,
      |  CAST(z.rm_u AS BIGINT) / 1e9 AS resid_mean,
      |  CAST(z.lb_u AS BIGINT) / 1e6 AS resid_lb_q10,
      |  CAST(z.pers_u AS BIGINT) / 1e9 AS garch_persistence,
      |  n.n_obs
      |FROM pin z JOIN n USING (event_type)
      |ORDER BY event_type""".stripMargin

  private val tsGarchBacktestSql =
    """-- PINNED-FIT ORACLE: loss columns are regression pins (VALUES),
      |-- corpus columns (n_folds) recomputed; pin rows self-check
      |-- RMSE >= MAE > 0 below.
      |WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d FROM events GROUP BY 1, 2),
      |n AS (SELECT event_type,
      |    greatest(least(5, count(*) - 11), 1) AS n_folds
      |  FROM daily GROUP BY 1),
      |pin AS (SELECT * FROM (VALUES
      |    ('click', 2220949627, 2779239110, 465992630),
      |    ('error', 4567791463, 5852453027, 2406452147),
      |    ('purchase', 3142339632, 3376199148, 2142017904),
      |    ('signup', 4960711159, 6710498682, 946590503),
      |    ('view', 1499254470, 1587905060, 1132741223)
      |  ) v(event_type, mae_u, rmse_u, qlike_u)
      |  -- invariants of any backtest loss set: RMSE >= MAE (Jensen),
      |  -- all losses positive — a mistranscribed literal deletes its row
      |  WHERE rmse_u >= mae_u AND mae_u > 0 AND qlike_u > 0)
      |SELECT z.event_type,
      |  CAST(z.mae_u AS BIGINT) / 1e9 AS var_mae,
      |  CAST(z.rmse_u AS BIGINT) / 1e9 AS var_rmse,
      |  CAST(z.qlike_u AS BIGINT) / 1e9 AS qlike,
      |  CAST(n.n_folds AS BIGINT) AS n_folds
      |FROM pin z JOIN n USING (event_type)
      |ORDER BY event_type""".stripMargin

  private val tsOrderSearchSql =
    """-- PINNED-FIT ORACLE: information-criterion columns are regression
      |-- pins (VALUES), corpus columns (n_obs) recomputed; pin rows
      |-- self-check AIC = 2k - 2*loglik below.
      |WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d FROM events GROUP BY 1, 2),
      |n AS (SELECT event_type, count(*) - 1 AS base FROM daily GROUP BY 1),
      |pin AS (SELECT * FROM (VALUES
      |    ('click', 'arma', 2, 2, 6, -37462175, 86924349, 94699371, NULL, 1),
      |    ('click', 'arma', 1, 2, 5, -41554447, 93108894, 99769916, NULL, 2),
      |    ('click', 'arma', 0, 2, 4, -43002998, 94005995, 99475179, NULL, 3),
      |    ('click', 'arma', 2, 1, 5, -43496133, 96992267, 103471451, NULL, 4),
      |    ('click', 'arma', 0, 1, 3, -46100107, 98200213, 102302101, NULL, 5),
      |    ('click', 'arma', 2, 0, 4, -46184183, 100368365, 105551712, NULL, 6),
      |    ('click', 'arma', 1, 1, 4, -47365898, 102731796, 108060614, NULL, 7),
      |    ('click', 'arma', 1, 0, 3, -48978640, 103957280, 107953894, NULL, 8),
      |    ('click', 'arma', 0, 0, 2, -56282878, 116565756, 119300348, NULL, 9),
      |    ('click', 'garch', 1, 0, 2, -56282878, 116565756, 119300348, 2722533587, 1),
      |    ('click', 'garch', 1, 1, 3, -56282878, 118565756, 122667644, 2722531640, 2),
      |    ('click', 'garch', 2, 0, 3, -56282878, 118565756, 122667644, 2722527919, 3),
      |    ('click', 'garch', 2, 1, 4, -56282878, 120565756, 126034940, 2722535055, 4),
      |    ('click', 'garch', 3, 0, 4, -56282878, 120565756, 126034940, 2722532889, 5),
      |    ('click', 'garch', 1, 2, 4, -56287266, 120574531, 126043715, 2789364508, 6),
      |    ('click', 'garch', 2, 2, 5, -56282878, 122565756, 129402236, 2794627813, 7),
      |    ('click', 'garch', 3, 1, 5, -56288073, 122576146, 129412625, 2790973891, 8),
      |    ('click', 'garch', 3, 2, 6, -56282878, 124565756, 132769531, 2777309031, 9),
      |    ('error', 'arma', 2, 2, 6, -40643161, 93286321, 101061342, NULL, 1),
      |    ('error', 'arma', 2, 1, 5, -41812842, 93625684, 100104868, NULL, 2),
      |    ('error', 'arma', 1, 1, 4, -50973659, 109947317, 115276135, NULL, 3),
      |    ('error', 'arma', 2, 0, 4, -51075144, 110150288, 115333635, NULL, 4),
      |    ('error', 'arma', 1, 2, 5, -50318760, 110637519, 117298542, NULL, 5),
      |    ('error', 'arma', 1, 0, 3, -57085803, 120171606, 124168220, NULL, 6),
      |    ('error', 'arma', 0, 1, 3, -57160612, 120321223, 124423111, NULL, 7),
      |    ('error', 'arma', 0, 2, 4, -56957644, 121915288, 127384471, NULL, 8),
      |    ('error', 'arma', 0, 0, 2, -63435746, 130871492, 133606084, NULL, 9),
      |    ('error', 'garch', 1, 0, 2, -61732299, 127464599, 130199190, 5835575168, 1),
      |    ('error', 'garch', 2, 0, 3, -61732299, 129464599, 133566486, 5835582608, 2),
      |    ('error', 'garch', 1, 1, 3, -61732299, 129464599, 133566486, 5835577197, 3),
      |    ('error', 'garch', 2, 1, 4, -61732299, 131464599, 136933782, 5835581293, 4),
      |    ('error', 'garch', 3, 0, 4, -61732299, 131464599, 136933782, 5835580135, 5),
      |    ('error', 'garch', 1, 2, 4, -61732299, 131464599, 136933782, 5835580267, 6),
      |    ('error', 'garch', 2, 2, 5, -61732299, 133464599, 140301078, 5835577211, 7),
      |    ('error', 'garch', 3, 1, 5, -61732299, 133464599, 140301078, 5835578117, 8),
      |    ('error', 'garch', 3, 2, 6, -61732299, 135464599, 143668374, 5835580738, 9),
      |    ('purchase', 'arma', 2, 2, 6, -35202319, 82404638, 90179659, NULL, 1),
      |    ('purchase', 'arma', 2, 1, 5, -39094754, 88189509, 94668693, NULL, 2),
      |    ('purchase', 'arma', 1, 2, 5, -42304555, 94609110, 101270132, NULL, 3),
      |    ('purchase', 'arma', 2, 0, 4, -44923743, 97847486, 103030834, NULL, 4),
      |    ('purchase', 'arma', 1, 0, 3, -53291030, 112582060, 116578673, NULL, 5),
      |    ('purchase', 'arma', 1, 1, 4, -52824911, 113649821, 118978639, NULL, 6),
      |    ('purchase', 'arma', 0, 1, 3, -54470452, 114940905, 119042792, NULL, 7),
      |    ('purchase', 'arma', 0, 2, 4, -53696457, 115392915, 120862098, NULL, 8),
      |    ('purchase', 'arma', 0, 0, 2, -58061609, 120123218, 122857810, NULL, 9),
      |    ('purchase', 'garch', 1, 0, 2, -56663921, 117327843, 120062435, 3524661026, 1),
      |    ('purchase', 'garch', 2, 0, 3, -56663921, 119327843, 123429730, 3524655965, 2),
      |    ('purchase', 'garch', 1, 1, 3, -57406280, 120812559, 124914447, 3524653021, 3),
      |    ('purchase', 'garch', 1, 2, 4, -56663921, 121327843, 126797026, 3524651843, 4),
      |    ('purchase', 'garch', 3, 0, 4, -56663921, 121327843, 126797026, 3524656152, 5),
      |    ('purchase', 'garch', 2, 1, 4, -56663921, 121327843, 126797026, 3524655048, 6),
      |    ('purchase', 'garch', 2, 2, 5, -56663921, 123327843, 130164322, 3524651957, 7),
      |    ('purchase', 'garch', 3, 1, 5, -56663921, 123327843, 130164322, 3524650799, 8),
      |    ('purchase', 'garch', 3, 2, 6, -56663921, 125327843, 133531618, 3524649780, 9),
      |    ('signup', 'arma', 2, 2, 6, -42952305, 97904610, 105679631, NULL, 1),
      |    ('signup', 'arma', 1, 2, 5, -46700914, 103401829, 110062852, NULL, 2),
      |    ('signup', 'arma', 1, 1, 4, -48530228, 105060455, 110389273, NULL, 3),
      |    ('signup', 'arma', 2, 1, 5, -48884097, 107768195, 114247379, NULL, 4),
      |    ('signup', 'arma', 2, 0, 4, -51099090, 110198180, 115381528, NULL, 5),
      |    ('signup', 'arma', 1, 0, 3, -55140524, 116281047, 120277661, NULL, 6),
      |    ('signup', 'arma', 0, 1, 3, -56947049, 119894099, 123995986, NULL, 7),
      |    ('signup', 'arma', 0, 2, 4, -56918529, 121837058, 127306241, NULL, 8),
      |    ('signup', 'arma', 0, 0, 2, -62602252, 129204504, 131939096, NULL, 9),
      |    ('signup', 'garch', 1, 0, 2, -61019837, 126039674, 128774266, 6810811081, 1),
      |    ('signup', 'garch', 1, 1, 3, -61019837, 128039674, 132141562, 6810808049, 2),
      |    ('signup', 'garch', 2, 0, 3, -61019837, 128039674, 132141562, 6810807250, 3),
      |    ('signup', 'garch', 3, 0, 4, -60435025, 128870050, 134339233, 6683748077, 4),
      |    ('signup', 'garch', 1, 2, 4, -60743327, 129486654, 134955837, 6795377553, 5),
      |    ('signup', 'garch', 2, 1, 4, -61019837, 130039674, 135508858, 6810798404, 6),
      |    ('signup', 'garch', 3, 1, 5, -60435025, 130870050, 137706529, 6683749931, 7),
      |    ('signup', 'garch', 2, 2, 5, -60743327, 131486654, 138323133, 6864889845, 8),
      |    ('signup', 'garch', 3, 2, 6, -60435025, 132870050, 141073825, 6779176008, 9),
      |    ('view', 'arma', 2, 2, 6, -28797569, 69595137, 77370158, NULL, 1),
      |    ('view', 'arma', 2, 0, 4, -39811308, 87622616, 92805964, NULL, 2),
      |    ('view', 'arma', 2, 1, 5, -38989796, 87979591, 94458776, NULL, 3),
      |    ('view', 'arma', 1, 1, 4, -42282517, 92565033, 97893851, NULL, 4),
      |    ('view', 'arma', 0, 1, 3, -43827218, 93654437, 97756324, NULL, 5),
      |    ('view', 'arma', 1, 2, 5, -42156205, 94312409, 100973432, NULL, 6),
      |    ('view', 'arma', 1, 0, 3, -44286921, 94573843, 98570456, NULL, 7),
      |    ('view', 'arma', 0, 2, 4, -43618244, 95236488, 100705671, NULL, 8),
      |    ('view', 'arma', 0, 0, 2, -52917114, 109834228, 112568820, NULL, 9),
      |    ('view', 'garch', 1, 0, 2, -52244497, 108488994, 111223586, 1724764548, 1),
      |    ('view', 'garch', 2, 0, 3, -52244497, 110488994, 114590881, 1724764439, 2),
      |    ('view', 'garch', 1, 1, 3, -52333354, 110666709, 114768596, 1615953966, 3),
      |    ('view', 'garch', 2, 1, 4, -52244497, 112488994, 117958177, 1724763812, 4),
      |    ('view', 'garch', 3, 0, 4, -52244497, 112488994, 117958177, 1724759215, 5),
      |    ('view', 'garch', 1, 2, 4, -52333354, 112666709, 118135892, 1628438316, 6),
      |    ('view', 'garch', 3, 1, 5, -52244497, 114488994, 121325473, 1724762720, 7),
      |    ('view', 'garch', 2, 2, 5, -52244497, 114488994, 121325473, 1743940261, 8),
      |    ('view', 'garch', 3, 2, 6, -52244497, 116488994, 124692769, 1724763282, 9)
      |  ) v(event_type, family, p, q, k_params, loglik_u, aic_u, bic_u,
      |      cv_u, aic_rank)
      |  -- analytic invariant: AIC = 2k - 2*loglik, recomputed from the
      |  -- pinned loglik within the ±2-unit slack of independent
      |  -- quantization; BIC >= AIC for ln(n) > 2; positive CV loss.
      |  -- A literal-transcription error deletes its row and fails the
      |  -- row-count compare instead of being confirmed by its own pin.
      |  WHERE abs(aic_u - (2 * k_params * 1000000 - 2 * loglik_u)) <= 2
      |    AND bic_u >= aic_u AND (cv_u IS NULL OR cv_u > 0)
      |    AND aic_rank BETWEEN 1 AND 9)
      |SELECT z.event_type, z.family, z.p, z.q, z.k_params,
      |  CAST(z.loglik_u AS BIGINT) / 1e6 AS loglik,
      |  CAST(z.aic_u AS BIGINT) / 1e6 AS aic,
      |  CAST(z.bic_u AS BIGINT) / 1e6 AS bic,
      |  CAST(z.cv_u AS BIGINT) / 1e9 AS cv_rmse,
      |  CAST(z.aic_rank AS BIGINT) AS aic_rank,
      |  n.base - CASE WHEN z.family = 'arma' THEN z.p ELSE 0 END AS n_obs
      |FROM pin z JOIN n USING (event_type)
      |ORDER BY event_type, family, aic_rank""".stripMargin

  val queries: Map[String, Q] = Map(
    "ts_streaks" -> tsStreaks _,
    "ts_fit_verdicts" -> tsFitVerdicts _,
    "ts_ohlcv_daily" -> tsOhlcvDaily _,
    "w4_moving_stats" -> w4MovingStats _,
    "ts_naive_backtest" -> tsNaiveBacktest _,
    "ts_garch_fit" -> tsGarchFit _,
    "ts_arma_residuals" -> tsArmaResiduals _,
    "ts_garch_backtest" -> tsGarchBacktest _,
    "ts_diagnostics" -> tsDiagnostics _,
    "ts_order_search" -> tsOrderSearch _,
    "ts_holt_forecast" -> tsHoltForecast _,
    "ts_holt_winters" -> tsHoltWinters _,
    "ts_decompose" -> tsDecompose _,
    "ts_cusum" -> tsCusum _
  )

  val oracle: Map[String, String] = Map(
    "ts_garch_fit" -> tsGarchFitSql,
    "ts_arma_residuals" -> tsArmaResidualsSql,
    "ts_garch_backtest" -> tsGarchBacktestSql,
    "ts_order_search" -> tsOrderSearchSql,
    "ts_streaks" -> tsStreaksSql,
    "ts_fit_verdicts" -> tsFitVerdictsSql,
    "ts_ohlcv_daily" -> tsOhlcvDailySql,
    "w4_moving_stats" -> w4MovingStatsSql,
    "ts_naive_backtest" -> tsNaiveBacktestSql,
    "ts_diagnostics" -> tsDiagnosticsSql,
    "ts_holt_forecast" -> tsHoltForecastSql,
    "ts_holt_winters" -> tsHoltWintersSql,
    "ts_decompose" -> tsDecomposeSql,
    "ts_cusum" -> tsCusumSql
  )
}
