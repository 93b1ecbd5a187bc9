package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Heavy hitters over an unbounded key domain: a Count-Min sketch fused
  * with a bounded candidate set, as one typed Aggregator (Cormode &
  * Muthukrishnan 2005 — the sketch every streaming-frequency system uses).
  *
  * Why not `groupBy(key).count().orderBy(desc).limit(k)`? That is the
  * right plan while the key cardinality fits a shuffle — and the wrong one
  * when keys are URLs or n-grams at 100 TB, where the exchange itself is
  * corpus-sized. The sketch is O(d×w) per partition REGARDLESS of key
  * cardinality, merges associatively cell-by-cell (map-side partial
  * aggregation does the heavy lifting where the data lives), and the
  * shuffle carries one fixed-size buffer per partition instead of one row
  * per distinct key.
  *
  * Guarantees (the CMS contract, asserted in ScaleOpsSpec):
  *   - estimates are ONE-SIDED: est(x) ≥ true(x) always; est(x) ≤
  *     true(x) + εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉;
  *   - merge is exact: sketch(A ⊎ B) = sketch(A) + sketch(B) cell-wise,
  *     so the result is independent of partitioning.
  *
  * The candidate set keeps up to `maxCand` keys by current estimate
  * (deterministic prune: estimate desc, key asc). A key can only miss the
  * final top-k if it was pruned everywhere it appeared while keys with
  * HIGHER estimates filled every buffer — i.e. only keys far outside the
  * top-k are at risk when maxCand ≫ k.
  *
  * Hash family: xxhash-free splitmix64 salted per row `d` — deterministic
  * across runs, partitions, and JVMs.
  */
final class CountMinTopK(k: Int, d: Int = 4, w: Int = 1024,
    maxCand: Int = 256)
    extends Aggregator[String, CountMinTopK.Buf, Seq[(String, Long)]] {
  import CountMinTopK.{Buf, mix64}

  require(k <= maxCand, s"top-$k needs a candidate set of at least $k")

  private def cell(row: Int, key: String): Int = {
    val h = mix64(key.hashCode.toLong ^ (row.toLong * 0x9e3779b97f4a7c15L))
    ((h % w + w) % w).toInt
  }

  private def estimate(cells: Array[Long], key: String): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < d) {
      val v = cells(r * w + cell(r, key))
      if (v < m) m = v
      r += 1
    }
    m
  }

  /** Deterministic candidate prune: keep the `n` largest by
    * (estimate desc, key asc) so merge order can never change the kept set.
    */
  private def prune(cells: Array[Long], cand: Set[String], n: Int)
      : Set[String] =
    if (cand.size <= n) cand
    else cand.toSeq.map(t => (t, estimate(cells, t)))
      .sortBy { case (t, e) => (-e, t) }.take(n).map(_._1).toSet

  override def zero: Buf = Buf(Array.fill(d * w)(0L), Set.empty)

  override def reduce(b: Buf, key: String): Buf = {
    var r = 0
    while (r < d) {
      b.cells(r * w + cell(r, key)) += 1L
      r += 1
    }
    val cand = b.cand + key
    Buf(b.cells, if (cand.size > maxCand) prune(b.cells, cand, maxCand / 2)
      else cand)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val cells = new Array[Long](d * w)
    var i = 0
    while (i < cells.length) { cells(i) = a.cells(i) + b.cells(i); i += 1 }
    val cand = a.cand ++ b.cand
    Buf(cells, if (cand.size > maxCand) prune(cells, cand, maxCand)
      else cand)
  }

  override def finish(b: Buf): Seq[(String, Long)] =
    b.cand.toSeq.map(t => (t, estimate(b.cells, t)))
      .sortBy { case (t, e) => (-e, t) }.take(k)

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object CountMinTopK {
  /** Aggregation buffer: the d×w counter matrix (flattened) plus the
    * bounded candidate key set. A case class so the buffer round-trips
    * through a product ExpressionEncoder (no kryo blobs).
    */
  case class Buf(cells: Array[Long], cand: Set[String])

  /** splitmix64 finalizer — a full-avalanche 64-bit mixer. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
