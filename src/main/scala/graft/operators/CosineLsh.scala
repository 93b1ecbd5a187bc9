package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane (cosine) LSH for embedding near-duplicate detection —
  * the scale path next to the exact label-blocked baseline in
  * [[graft.queries.SimilarityOps]], completing the dedup family (exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine).
  *
  * Charikar's sketch: bit j of a vector's 64-bit signature is the sign of
  * its dot product with a pseudo-random hyperplane h_j. For two vectors,
  * P[bit differs] = angle/π, so hamming distance on signatures estimates
  * the angle — near-duplicate pairs (cos → 1) agree on almost every bit
  * and land in shared 16-bit band buckets, where [[Dedup.simHashPairs]]'s
  * banding + per-bucket caps generate candidates. Only candidates get an
  * exact cosine — the quadratic step never touches the full corpus.
  *
  * Hyperplanes are generated driver-side from a fixed seed (deterministic
  * across runs/partitionings) and folded into the expression tree as
  * literals: the signature is one codegen'd projection per vector — a
  * narrow map over the corpus, embarrassingly parallel at any scale.
  */
object CosineLsh {

  /** Deterministic standard-normal via Box-Muller over a splitmix-style
    * counter hash — stable across JVMs (no java.util.Random contract
    * drift).
    */
  private def gaussian(seed: Long, i: Long): Double = {
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = mix(seed ^ mix(2 * i))
    val b = mix(seed ^ mix(2 * i + 1))
    val u1 = ((a >>> 11).toDouble / (1L << 53).toDouble).max(1e-12)
    val u2 = (b >>> 11).toDouble / (1L << 53).toDouble
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** 64-bit hyperplane signature per vector: (idCol, simhash). The column
    * is named `simhash` so [[Dedup.simHashPairs]] / [[Dedup.simHashOverflow]]
    * band it unchanged.
    */
  def signatures(e: DataFrame, idCol: String, vecCol: String, dim: Int,
      seed: Long = 0x5eedL): DataFrame = {
    val bits: Seq[Column] = (0 until 64).map { j =>
      // one ArrayType Literal per hyperplane (not 64 per-element expression
      // nodes) — keeps the 64-bit projection cheap to analyze/optimize
      val h = lit(Array.tabulate(dim)(d => gaussian(seed, j.toLong * dim + d)))
      val dot = aggregate(zip_with(col(vecCol), h, (p, q) => p * q),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    e.select(col(idCol), bits.reduce((x, y) => x.bitwiseOR(y)).as("simhash"))
  }

  /** Near-duplicate pairs above `minCos`: signature → banded candidates
    * (hamming ≤ maxHamming prefilter) → exact cosine on candidates only.
    * Returns (id_a, id_b, cos).
    *
    * maxHamming trades recall for candidate volume, but the BANDING is the
    * real recall gate: candidates come from 4×16-bit bands, so a pair is
    * guaranteed a shared bucket only when its hamming distance ≤ 3 (pigeonhole
    * — 4+ differing bits can touch all four bands). Above that, candidacy is
    * probabilistic: a pair at hamming h survives iff some band has zero of
    * the h flipped bits. Near-duplicates (cos ≥ 0.99 ⇒ E[h] ≈ 64·angle/π ≈
    * 1.8) sit inside the guarantee; mid-similarity pairs (cos ≈ 0.83, E[h] ≈
    * 12) are found only opportunistically — do not rely on recall there.
    * `maxHamming` is the post-bucket verify filter, not a recall floor.
    */
  def nearDupPairs(e: DataFrame, idCol: String, vecCol: String, dim: Int,
      minCos: Double, maxHamming: Int = 12,
      cos: (Column, Column) => Column, seed: Long = 0x5eedL,
      maxBucketSize: Int = 1 << 16): DataFrame = {
    val sig = signatures(e, idCol, vecCol, dim, seed)
    val cand = Dedup.simHashPairs(sig, idCol, maxHamming, maxBucketSize)
      .select(col("id_a"), col("id_b"))
    cand
      .join(e.select(col(idCol).as("id_a"), col(vecCol).as("va")), Seq("id_a"))
      .join(e.select(col(idCol).as("id_b"), col(vecCol).as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cos(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
