package graft.functions

/** Deterministic time-series econometrics, written from the standard
  * published formulas (Bollerslev 1986 GARCH; Dickey-Fuller; Ljung-Box 1978;
  * Engle 1982 ARCH-LM) — the numeric core behind the reference's notebook
  * layer (reference: data/notebooks/Jupiter Notebook/test5.ipynb cells
  * 2,6,8,10; Garch_v1.ipynb cells 7,15,21-37). Pure Scala, no external
  * deps; runs inside executors via groupByKey.mapGroups (SURVEY §2.10).
  *
  * Numeric parity with `arch`/`statsmodels` is not bit-for-bit achievable
  * (SURVEY §7 risk 4); success criterion is parameter sanity + likelihood
  * improvement on fixtures, enforced in TimeSeriesSpec.
  */
object TimeSeriesStats {

  final case class GarchFit(
      omega: Double, alpha: Double, beta: Double, loglik: Double, n: Long)

  def mean(x: Array[Double]): Double = x.sum / x.length

  /** Sample variance (n-1 denominator). */
  def variance(x: Array[Double]): Double = {
    val m = mean(x)
    x.map(v => (v - m) * (v - m)).sum / (x.length - 1)
  }

  /** Autocorrelation at lag k (biased denominator, standard for ACF). */
  def acf(x: Array[Double], k: Int): Double = {
    val m = mean(x)
    val c0 = x.map(v => (v - m) * (v - m)).sum
    if (c0 == 0.0) 0.0
    else {
      var s = 0.0
      var i = 0
      while (i < x.length - k) { s += (x(i) - m) * (x(i + k) - m); i += 1 }
      s / c0
    }
  }

  /** Negative log-likelihood of a GARCH(1,1) with Gaussian innovations on a
    * demeaned return series. sigma^2_0 = sample variance.
    */
  def garchNll(r: Array[Double], omega: Double, alpha: Double,
      beta: Double): Double = {
    if (omega <= 0 || alpha < 0 || beta < 0 || alpha + beta >= 0.9999)
      return Double.MaxValue
    var s2 = variance(r).max(1e-12)
    var nll = 0.0
    var i = 0
    val log2pi = math.log(2 * math.Pi)
    while (i < r.length) {
      nll += 0.5 * (log2pi + math.log(s2) + r(i) * r(i) / s2)
      s2 = omega + alpha * r(i) * r(i) + beta * s2
      i += 1
    }
    if (nll.isNaN) Double.MaxValue else nll
  }

  /** Nelder-Mead simplex minimization (standard reflection/expansion/
    * contraction/shrink with the usual 1, 2, 0.5, 0.5 coefficients).
    */
  def nelderMead(f: Array[Double] => Double, x0: Array[Double],
      step: Double = 0.1, maxIter: Int = 600): Array[Double] = {
    val n = x0.length
    var simplex = Array.tabulate(n + 1) { i =>
      val p = x0.clone()
      if (i > 0) p(i - 1) += step
      (p, f(p))
    }
    var iter = 0
    while (iter < maxIter) {
      simplex = simplex.sortBy(_._2)
      if (math.abs(simplex(n)._2 - simplex(0)._2) < 1e-10) iter = maxIter
      else {
        val centroid = Array.tabulate(n)(j =>
          simplex.take(n).map(_._1(j)).sum / n)
        def at(coef: Double) = {
          val p = Array.tabulate(n)(j =>
            centroid(j) + coef * (centroid(j) - simplex(n)._1(j)))
          (p, f(p))
        }
        val refl = at(1.0)
        if (refl._2 < simplex(0)._2) {
          val exp = at(2.0)
          simplex(n) = if (exp._2 < refl._2) exp else refl
        } else if (refl._2 < simplex(n - 1)._2) {
          simplex(n) = refl
        } else {
          val con = at(-0.5)
          if (con._2 < simplex(n)._2) simplex(n) = con
          else {
            // shrink toward the best vertex
            val best = simplex(0)._1
            simplex = simplex.zipWithIndex.map { case ((p, v), i) =>
              if (i == 0) (p, v)
              else {
                val q = Array.tabulate(n)(j => best(j) + 0.5 * (p(j) - best(j)))
                (q, f(q))
              }
            }
          }
        }
        iter += 1
      }
    }
    simplex.minBy(_._2)._1
  }

  /** Fit GARCH(1,1) by MLE. Parameters are optimized in an unconstrained
    * transform (log omega; logit of alpha and beta scaled into the
    * stationarity region) so the simplex never leaves the feasible set.
    */
  def fitGarch11(returns: Array[Double]): GarchFit = {
    val r = {
      val m = mean(returns)
      returns.map(_ - m)
    }
    val v = variance(r).max(1e-12)
    def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))
    // theta = (log omega, a, b); alpha = 0.998*s(a)*(1-beta share)… keep it
    // simple: alpha = 0.998*s(a)*s(b)', with alphaShare/total parametrized:
    def decode(t: Array[Double]): (Double, Double, Double) = {
      val total = 0.998 * sigmoid(t(1)) // alpha+beta in (0, 0.998)
      val share = sigmoid(t(2)) // alpha share of total
      (math.exp(t(0)), total * share, total * (1 - share))
    }
    def obj(t: Array[Double]): Double = {
      val (o, a, b) = decode(t)
      garchNll(r, o, a, b)
    }
    val x0 = Array(math.log(0.1 * v), 2.0, -1.5) // alpha≈0.1, beta≈0.78
    val best = nelderMead(obj, x0, step = 0.5)
    val (o, a, b) = decode(best)
    GarchFit(o, a, b, -garchNll(r, o, a, b), r.length.toLong)
  }

  final case class ArmaFit(
      c: Double, phi: Double, theta: Double, sigma2: Double, loglik: Double,
      n: Long)

  /** ARMA(1,1) innovation recursion, conditioned on the first observation
    * with e_0 = 0 (the standard CSS initialization):
    * e_t = y_t − c − φ·y_{t−1} − θ·e_{t−1}. Returns e_1..e_{n−1}.
    */
  def armaResiduals(y: Array[Double], c: Double, phi: Double,
      theta: Double): Array[Double] = {
    require(y.length >= 2,
      s"armaResiduals needs >= 2 observations, got ${y.length}")
    val out = new Array[Double](y.length - 1)
    var ePrev = 0.0
    var i = 1
    while (i < y.length) {
      val e = y(i) - c - phi * y(i - 1) - theta * ePrev
      out(i - 1) = e
      ePrev = e
      i += 1
    }
    out
  }

  /** Fit ARMA(1,1) by conditional sum of squares (CSS) — the notebook's
    * ARIMA stage whose residuals feed GARCH (reference: data/notebooks/
    * Jupiter Notebook/test5.ipynb cell 6; garch_model_v4.ipynb cell 6).
    * φ and θ are optimized through tanh so the simplex stays inside the
    * stationary/invertible region. Gaussian log-likelihood from the CSS
    * residual variance: −m/2·(log(2π·σ̂²) + 1).
    */
  def fitArma11(y: Array[Double]): ArmaFit = {
    // below 3 points CSS is degenerate (sse == 0 for many params; NaNs
    // survive the .max guards since NaN.max(x) == NaN) — refuse instead
    // of emitting NaN rows downstream
    require(y.length >= 3,
      s"fitArma11 needs >= 3 observations, got ${y.length}")
    def decode(t: Array[Double]): (Double, Double, Double) =
      (t(0), 0.998 * math.tanh(t(1)), 0.998 * math.tanh(t(2)))
    def obj(t: Array[Double]): Double = {
      val (c, phi, theta) = decode(t)
      val e = armaResiduals(y, c, phi, theta)
      val sse = e.map(v => v * v).sum
      if (sse.isNaN) Double.MaxValue else sse
    }
    val r1 = acf(y, 1)
    val x0 = Array(mean(y) * (1 - r1),
      0.5 * math.log((1 + r1.max(-0.95).min(0.95)) /
        (1 - r1.max(-0.95).min(0.95))), 0.0)
    val best = nelderMead(obj, x0, step = 0.3)
    val (c, phi, theta) = decode(best)
    val e = armaResiduals(y, c, phi, theta)
    val m = e.length
    val s2 = (e.map(v => v * v).sum / m).max(1e-300)
    val ll = -0.5 * m * (math.log(2 * math.Pi * s2) + 1.0)
    ArmaFit(c, phi, theta, s2, ll, m.toLong)
  }

  /** First difference — ARIMA(1,1,1) = ARMA(1,1) on diff(y). */
  def diff1(y: Array[Double]): Array[Double] =
    Array.tabulate(y.length - 1)(i => y(i + 1) - y(i))

  // ---------------------------------------------------------------------
  // Order search (reference behavior: test5.ipynb cell 10 grid-searches
  // ARIMA orders by AIC/BIC; Garch_v1.ipynb cells 21-29 rank GARCH orders).
  // The general-(p,q) fits below exist for the model-selection REPORT; the
  // production fit stages keep the notebooks' fixed (1,1)/(1,0,1) orders.

  final case class OrderFit(p: Int, q: Int, kParams: Int, loglik: Double,
      aic: Double, bic: Double, n: Long)

  /** ARMA(p,q) CSS residuals conditioned on the first p observations with
    * pre-sample innovations at 0 — the [[armaResiduals]] recursion at
    * general order. Returns e_p..e_{n−1}.
    */
  def armaResidualsPQ(y: Array[Double], c: Double, phi: Array[Double],
      theta: Array[Double]): Array[Double] = {
    val p = phi.length; val q = theta.length
    require(y.length >= p + 2,
      s"armaResidualsPQ needs >= ${p + 2} observations, got ${y.length}")
    val e = new Array[Double](y.length) // e(t) = 0 for t < p (pre-sample)
    var t = p
    while (t < y.length) {
      var v = y(t) - c
      var i = 0
      while (i < p) { v -= phi(i) * y(t - 1 - i); i += 1 }
      var j = 0
      while (j < q) { if (t - 1 - j >= p) v -= theta(j) * e(t - 1 - j); j += 1 }
      e(t) = v
      t += 1
    }
    e.drop(p)
  }

  /** Fit ARMA(p,q) by CSS (Nelder-Mead over c plus tanh-bounded AR/MA
    * coefficients, the [[fitArma11]] parametrization at general order).
    * k counts c + p + q + the residual variance, the statsmodels AIC
    * convention, so orders are penalized comparably across the grid.
    */
  def fitArmaPQ(y: Array[Double], p: Int, q: Int): OrderFit = {
    require(y.length >= p + q + 3,
      s"fitArmaPQ($p,$q) needs >= ${p + q + 3} observations, got ${y.length}")
    def decode(t: Array[Double]): (Double, Array[Double], Array[Double]) =
      (t(0), Array.tabulate(p)(i => 0.998 * math.tanh(t(1 + i))),
        Array.tabulate(q)(j => 0.998 * math.tanh(t(1 + p + j))))
    def obj(t: Array[Double]): Double = {
      val (c, phi, theta) = decode(t)
      val e = armaResidualsPQ(y, c, phi, theta)
      val sse = e.map(v => v * v).sum
      if (sse.isNaN) Double.MaxValue else sse
    }
    val x0 = Array.fill(1 + p + q)(0.0); x0(0) = mean(y)
    val best = nelderMead(obj, x0, step = 0.3, maxIter = 900)
    val (c, phi, theta) = decode(best)
    val e = armaResidualsPQ(y, c, phi, theta)
    val m = e.length
    val s2 = (e.map(v => v * v).sum / m).max(1e-300)
    val ll = -0.5 * m * (math.log(2 * math.Pi * s2) + 1.0)
    val k = p + q + 2
    OrderFit(p, q, k, ll, 2.0 * k - 2.0 * ll,
      k * math.log(m.toDouble) - 2.0 * ll, m.toLong)
  }

  /** GARCH(p,q) negative log-likelihood: p ARCH lags (squared returns),
    * q GARCH lags (past variances); pre-sample r² and σ² at the sample
    * variance — [[garchNll]] at general order.
    */
  def garchNllPQ(r: Array[Double], omega: Double, alpha: Array[Double],
      beta: Array[Double]): Double = {
    val p = alpha.length; val q = beta.length
    if (omega <= 0 || alpha.exists(_ < 0) || beta.exists(_ < 0) ||
        alpha.sum + beta.sum >= 0.9999) return Double.MaxValue
    val v = variance(r).max(1e-12)
    val r2hist = Array.fill(p.max(1))(v) // ring of last p squared returns
    val s2hist = Array.fill(q.max(1))(v) // ring of last q variances
    var nll = 0.0
    var t = 0
    val log2pi = math.log(2 * math.Pi)
    while (t < r.length) {
      var s2 = omega
      var i = 0
      while (i < p) { s2 += alpha(i) * r2hist((t - 1 - i + 2 * p) % p); i += 1 }
      var j = 0
      while (j < q) { s2 += beta(j) * s2hist((t - 1 - j + 2 * q) % q); j += 1 }
      s2 = s2.max(1e-300)
      nll += 0.5 * (log2pi + math.log(s2) + r(t) * r(t) / s2)
      if (p > 0) r2hist(t % p) = r(t) * r(t)
      if (q > 0) s2hist(t % q) = s2
      t += 1
    }
    if (nll.isNaN) Double.MaxValue else nll
  }

  final case class GarchParamsPQ(omega: Double, alpha: Array[Double],
      beta: Array[Double], fit: OrderFit)

  /** Fit GARCH(p,q) by MLE — the [[fitGarch11]] unconstrained transform at
    * general order: ω = exp(t₀), total persistence in (0, 0.998) via a
    * sigmoid, and the p+q coefficient shares via a softmax with the last
    * logit pinned to 0 (removes the shift redundancy). k = 1 + p + q.
    */
  def fitGarchParamsPQ(returns: Array[Double], p: Int,
      q: Int): GarchParamsPQ = {
    require(p >= 1, s"GARCH needs at least one ARCH lag, got p=$p")
    val r = { val m = mean(returns); returns.map(_ - m) }
    val v = variance(r).max(1e-12)
    def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))
    val nShare = p + q
    def decode(t: Array[Double]): (Double, Array[Double], Array[Double]) = {
      val total = 0.998 * sigmoid(t(1))
      val logits = Array.tabulate(nShare)(i =>
        if (i < nShare - 1) t(2 + i) else 0.0)
      val mx = logits.max
      val exps = logits.map(l => math.exp(l - mx))
      val z = exps.sum
      val coefs = exps.map(e => total * e / z)
      (math.exp(t(0)), coefs.take(p), coefs.drop(p))
    }
    def obj(t: Array[Double]): Double = {
      val (o, a, b) = decode(t)
      garchNllPQ(r, o, a, b)
    }
    val x0 = Array.fill(1 + nShare)(0.0)
    x0(0) = math.log(0.1 * v); x0(1) = 2.0
    val best = nelderMead(obj, x0, step = 0.5, maxIter = 900)
    val (o, a, b) = decode(best)
    val ll = -garchNllPQ(r, o, a, b)
    val k = 1 + p + q
    val n = r.length
    GarchParamsPQ(o, a, b, OrderFit(p, q, k, ll, 2.0 * k - 2.0 * ll,
      k * math.log(n.toDouble) - 2.0 * ll, n.toLong))
  }

  def fitGarchPQ(returns: Array[Double], p: Int, q: Int): OrderFit =
    fitGarchParamsPQ(returns, p, q).fit

  /** 1-step-ahead variance forecast at general (p,q): run the NLL's
    * variance recursion through the demeaned series (same pre-sample
    * initialization), then one more step.
    */
  def garchForecastVariancePQ(params: GarchParamsPQ,
      returns: Array[Double]): Double = {
    val p = params.alpha.length; val q = params.beta.length
    val r = { val m = mean(returns); returns.map(_ - m) }
    val v = variance(r).max(1e-12)
    val r2hist = Array.fill(p.max(1))(v)
    val s2hist = Array.fill(q.max(1))(v)
    var t = 0
    while (t <= r.length) { // final pass (t == length) IS the forecast
      var s2 = params.omega
      var i = 0
      while (i < p) {
        s2 += params.alpha(i) * r2hist((t - 1 - i + 2 * p) % p); i += 1
      }
      var j = 0
      while (j < q) {
        s2 += params.beta(j) * s2hist((t - 1 - j + 2 * q) % q); j += 1
      }
      s2 = s2.max(1e-300)
      if (t == r.length) return s2
      if (p > 0) r2hist(t % p) = r(t) * r(t)
      if (q > 0) s2hist(t % q) = s2
      t += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** h-step-ahead variance forecast from the fitted model state. */
  def garchForecastVariance(fit: GarchFit, r: Array[Double], h: Int): Double = {
    val rd = { val m = mean(r); r.map(_ - m) }
    var s2 = variance(rd).max(1e-12)
    var i = 0
    while (i < rd.length) {
      s2 = fit.omega + fit.alpha * rd(i) * rd(i) + fit.beta * s2
      i += 1
    }
    // iterate forward: E[s2_{t+k}] = omega + (alpha+beta) E[s2_{t+k-1}]
    var k = 1
    var f = s2
    while (k < h) { f = fit.omega + (fit.alpha + fit.beta) * f; k += 1 }
    f
  }

  /** Dickey-Fuller t-statistic (no augmentation, with constant):
    * Δy_t = c + γ y_{t-1} + ε; returns t(γ). Strongly negative ⇒ reject
    * unit root (stationary).
    */
  def adfTStat(y: Array[Double]): Double = {
    val n = y.length - 1
    val x = y.take(n) // y_{t-1}
    val d = Array.tabulate(n)(i => y(i + 1) - y(i)) // Δy_t
    val mx = mean(x)
    val md = mean(d)
    var sxx = 0.0
    var sxd = 0.0
    var i = 0
    while (i < n) {
      sxx += (x(i) - mx) * (x(i) - mx)
      sxd += (x(i) - mx) * (d(i) - md)
      i += 1
    }
    val gamma = sxd / sxx
    val c = md - gamma * mx
    var sse = 0.0
    i = 0
    while (i < n) {
      val e = d(i) - c - gamma * x(i)
      sse += e * e
      i += 1
    }
    val se = math.sqrt(sse / (n - 2) / sxx)
    gamma / se
  }

  /** Ljung-Box Q statistic over `lags` autocorrelations:
    * Q = n(n+2) Σ ρ_k² / (n−k). Large ⇒ serial correlation present.
    */
  def ljungBox(x: Array[Double], lags: Int): Double = {
    val n = x.length
    var q = 0.0
    var k = 1
    while (k <= lags) {
      val rho = acf(x, k)
      q += rho * rho / (n - k)
      k += 1
    }
    n.toDouble * (n + 2) * q
  }

  /** Engle's ARCH-LM with one lag: regress e²_t on e²_{t-1}; LM = n·R².
    * Large ⇒ conditional heteroskedasticity (ARCH effects).
    */
  def archLmStat(resid: Array[Double]): Double = {
    val e2 = resid.map(v => v * v)
    val n = e2.length - 1
    val x = e2.take(n)
    val yv = e2.drop(1)
    val mx = mean(x)
    val my = mean(yv)
    var sxx = 0.0
    var sxy = 0.0
    var syy = 0.0
    var i = 0
    while (i < n) {
      sxx += (x(i) - mx) * (x(i) - mx)
      sxy += (x(i) - mx) * (yv(i) - my)
      syy += (yv(i) - my) * (yv(i) - my)
      i += 1
    }
    if (sxx == 0 || syy == 0) 0.0
    else {
      val r2 = sxy * sxy / (sxx * syy)
      n * r2
    }
  }
}
