package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the codebook compression tier of
  * large-scale ANN (the "PQ" in IVF-PQ): each vector is split into `m`
  * subvectors and every subvector is replaced by the 4-bit id of its
  * nearest codeword from a per-subvector codebook, so a 64-dim float
  * vector becomes m=8 nibbles (64× smaller) and query scoring never
  * touches the raw vectors — an asymmetric-distance (ADC) lookup table of
  * the query against the m×k codewords replaces every dot product.
  *
  * Scale design (the 100-TB shape, mirroring [[Ivf]]):
  *   - seeding: ONE hash-ordered TakeOrdered sample of k vectors (no
  *     window, no full sort); sample vector j's i-th slice seeds code j
  *     of codebook i, so all m codebooks train from one bounded sample;
  *   - Lloyd refinement: assignment is a broadcast join of (id, sub, sv)
  *     against the m×k codebook + `min_by` per (id, sub) — a single
  *     partial-aggregated shuffle, never a per-vector window; centroid
  *     re-estimation is a (sub, code, pos) average;
  *   - the codebook (m×k×(dim/m) doubles) is the ONLY broadcast; encoded
  *     vectors are (id, array&lt;code&gt;) — the compressed corpus a real
  *     deployment persists instead of the floats;
  *   - ADC scoring explodes codes to (id, sub, code) skinny rows, joins
  *     the broadcast per-query lookup table on (sub, code), and sums
  *     partial dots per (query, id) in one partial-aggregated shuffle;
  *     top-candidates per query come from the bounded-heap
  *     [[graft.functions.TopKByScore]], not a corpus-wide window.
  *
  * Cosine comes from the inner-product decomposition: dot(q, x) ≈
  * Σ_sub dot(q_sub, c[sub, code_x(sub)]) and ‖x‖² ≈ Σ_sub ‖c‖², both pure
  * codebook lookups. ADC ranks candidates; callers re-rank the top-R with
  * exact cosine for high recall (the standard PQ + re-rank pipeline).
  *
  * PORTABILITY (same contracts as [[Ivf]]): seeds order by the md5-derived
  * [[Dedup.portableHash60]]; Lloyd means snap to the 1e-6 grid; and the
  * two float comparisons that drive selection — the assignment's L2
  * distance and the caller-side ADC score — are rounded to the same grid
  * with deterministic code/id tie-breaks, so neither Spark's own partition
  * order nor a replaying engine's summation order can flip an argmin.
  * That makes the whole PQ query surface (sim_knn_pq, sim_knn_ivfpq)
  * replayable closed-form in DuckDB.
  */
object Pq {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)

  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** (idCol, sub, sv): each vector split into m equal slices — a narrow
    * projection + explode of an m-element literal array, no shuffle.
    */
  def subvectors(e: DataFrame, idCol: String, vecCol: String, m: Int,
      dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subvectors")
    val d = dim / m
    val subs = array((0 until m).map(i =>
      struct(lit(i).as("sub"), slice(col(vecCol), i * d + 1, d).as("sv"))): _*)
    e.select(col(idCol), explode(subs).as("s"))
      .select(col(idCol), col("s.sub").as("sub"), col("s.sv").as("sv"))
  }

  /** Train the m per-subvector codebooks: (sub, code 0..k-1, cv).
    * Deterministic: seeds from a hash-ordered k-sample (collected — k
    * codewords are metadata-scale, like Ivf's probe sets), then `iters`
    * distributed Lloyd rounds. Empty codes keep their previous codeword
    * (never vanish), so codes stay dense in [0, k).
    */
  def codebooks(spark: SparkSession, e: DataFrame, idCol: String,
      vecCol: String, m: Int, dim: Int, k: Int,
      iters: Int = 2): DataFrame = {
    import spark.implicits._
    val d = dim / m
    val seedRows = e
      .orderBy(Dedup.portableHash60(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .select(col(vecCol)).as[Seq[Double]].collect() // k rows, bounded
    require(seedRows.nonEmpty, "empty corpus")
    val seed = (0 until m).flatMap { sub =>
      seedRows.zipWithIndex.map { case (v, j) =>
        (sub, j.toLong, v.slice(sub * d, (sub + 1) * d))
      }
    }.toDF("sub", "code", "cv").localCheckpoint()
    val subv = subvectors(e, idCol, vecCol, m, dim).localCheckpoint()
    (0 until iters).foldLeft(seed) { (cb, _) =>
      val assigned = assign(subv, cb, idCol)
      val means = assigned
        .select(col("sub"), col("code"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg((floor(avg(col("x")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("mu"))
        .groupBy(col("sub"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mu"))))
          .as("pm"))
        .select(col("sub"), col("code"),
          expr("transform(pm, p -> p.mu)").as("cv"))
      // an empty code has no rows to average — keep its old codeword
      cb.as("old").join(means.as("new"), Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("new.cv"), col("old.cv")).as("cv"))
        .localCheckpoint() // m×k rows per round; truncate lineage
    }
  }

  /** Nearest-codeword assignment per (id, sub): broadcast join on `sub` +
    * one `min_by` aggregate keyed by (id, sub) — ties toward the smaller
    * code. Input columns (idCol, sub, sv); output adds `code`.
    */
  def assign(subv: DataFrame, codebook: DataFrame,
      idCol: String): DataFrame =
    subv.join(broadcast(codebook), Seq("sub"))
      // grid-snapped distance + code tie-break: the argmin is identical
      // under any summation order (here and in a replaying engine)
      .withColumn("d2", round(l2sq(col("sv"), col("cv")), 6))
      .groupBy(col(idCol), col("sub"))
      .agg(min_by(struct(col("code"), col("sv")),
        struct(col("d2"), col("code"))).as("best"))
      .select(col(idCol), col("sub"), col("best.sv").as("sv"),
        col("best.code").as("code"))

  /** Encode the corpus: (idCol, codes array&lt;long&gt;[m]) — the
    * persisted compressed form.
    */
  def encode(e: DataFrame, codebook: DataFrame, idCol: String,
      vecCol: String, m: Int, dim: Int): DataFrame =
    assign(subvectors(e, idCol, vecCol, m, dim), codebook, idCol)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("sub"), col("code"))))
        .as("sc"))
      .select(col(idCol), expr("transform(sc, x -> x.code)").as("codes"))

  /** ADC candidate scoring: approximate cosine of every (query, corpus
    * id) pair from codebook lookups alone. `queries` is (qidCol, qvecCol)
    * — a bounded query set; `encoded` is [[encode]]'s output. Returns
    * (qidCol, idCol, adc_cos).
    */
  def adcScores(queries: DataFrame, encoded: DataFrame,
      codebook: DataFrame, qidCol: String, qvecCol: String, idCol: String,
      m: Int, dim: Int): DataFrame = {
    // all (query, id) pairs: the lut join on (sub, code) crosses every
    // encoded row with every query's lookup rows
    val exploded = encoded
      .select(col(idCol), posexplode(col("codes")).as(Seq("sub", "code")))
    scoreExploded(exploded, queries, codebook, qidCol, qvecCol, idCol,
      m, dim, joinKeys = Seq("sub", "code"))
  }

  /** ADC over a PRE-SELECTED candidate set — the IVF-PQ shape: `pairs`
    * is (qidCol, idCol, codes) holding only the corpus vectors whose
    * coarse cell the query probes, so ADC work is ~nprobe/numCells of
    * the corpus instead of all of it.
    */
  def adcScoresFor(pairs: DataFrame, queries: DataFrame,
      codebook: DataFrame, qidCol: String, qvecCol: String, idCol: String,
      m: Int, dim: Int): DataFrame = {
    val exploded = pairs
      .select(col(qidCol), col(idCol),
        posexplode(col("codes")).as(Seq("sub", "code")))
    scoreExploded(exploded, queries, codebook, qidCol, qvecCol, idCol,
      m, dim, joinKeys = Seq(qidCol, "sub", "code"))
  }

  /** Shared ADC core: join exploded (…, sub, code) rows with the
    * broadcast per-query lookup table, sum partial dots per (query, id),
    * normalize. `joinKeys` controls whether the lut join crosses queries
    * (all-pairs) or respects a pre-paired candidate set.
    */
  private def scoreExploded(exploded: DataFrame, queries: DataFrame,
      codebook: DataFrame, qidCol: String, qvecCol: String, idCol: String,
      m: Int, dim: Int, joinKeys: Seq[String]): DataFrame = {
    // per-(query, sub, code) partial dot + per-(sub, code) norm — the
    // ADC lookup table, |Q|·m·k rows, broadcast
    val lut = subvectors(queries, qidCol, qvecCol, m, dim)
      .join(broadcast(codebook), Seq("sub"))
      .select(col(qidCol), col("sub"), col("code"),
        dot(col("sv"), col("cv")).as("pdot"),
        dot(col("cv"), col("cv")).as("cnorm2"))
    val qnorm = queries.select(col(qidCol),
      sqrt(dot(col(qvecCol), col(qvecCol))).as("qn"))
    exploded
      .join(broadcast(lut), joinKeys)
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("pdot")).as("adot"), sum(col("cnorm2")).as("xn2"))
      .join(broadcast(qnorm), Seq(qidCol))
      .select(col(qidCol), col(idCol),
        (col("adot") / (col("qn") * sqrt(col("xn2")))).as("adc_cos"))
  }
}
