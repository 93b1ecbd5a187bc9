package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate candidate pairs — the cluster
  * resolution step every dedup pipeline needs between "these pairs are
  * near-dups" and "keep one document per cluster".
  *
  * Iterative min-label propagation: every vertex starts as its own
  * component; each round a vertex adopts the smallest component id among
  * itself and its neighbors, until a fixpoint. Each round is one
  * edge-to-label equi-join plus a groupBy(min) — shuffles keyed on vertex
  * id, fully distributed, with only the per-round convergence COUNT on the
  * driver (never the data). Rounds needed = the component diameter, which
  * for near-dup clusters is tiny (dup clusters are dense, near-cliques);
  * `maxIters` bounds pathological chains. (The O(log n) alternative for
  * adversarial graph shapes is large-star/small-star; dedup clusters don't
  * need it.)
  */
object Components {

  /** (id, comp) for every vertex appearing in `pairs`; comp = the smallest
    * vertex id reachable. Vertices not in any pair are absent — callers
    * treat them as singleton components (see the dedup-keep query).
    *
    * @param requireConvergence when true, throws IllegalStateException if a
    *        fixpoint is not reached within `maxIters` — a silently split
    *        cluster is worse than a failed job for dedup. When false, an
    *        unconverged result is returned after a logged warning.
    */
  def resolve(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIters: Int = 20, requireConvergence: Boolean = false): DataFrame = {
    // localCheckpoint (eager) after every round: iterative self-referencing
    // DataFrames double their logical plan per iteration, and analysis cost
    // goes super-linear without lineage truncation — the standard pattern
    // for iterative algorithms on DataFrames
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var done = false
    var i = 0
    while (!done && i < maxIters) {
      val prop = edges
        .join(labels.select(col("id").as("dst"), col("comp")), Seq("dst"))
        .select(col("src").as("id"), col("comp"))
      val next = labels.unionByName(prop)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val changed = next.select(col("id"), col("comp").as("nc"))
        .join(labels, Seq("id"))
        .filter(col("nc") =!= col("comp")).count()
      labels = next
      done = changed == 0
      i += 1
    }
    if (!done) {
      val msg = s"Components.resolve did not converge within $maxIters " +
        "rounds — a component's diameter exceeds the iteration bound and " +
        "its labels are still split"
      if (requireConvergence) throw new IllegalStateException(msg)
      else System.err.println(s"[graft] WARN: $msg")
    }
    labels
  }
}
