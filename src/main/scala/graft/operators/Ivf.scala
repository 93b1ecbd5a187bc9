package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) coarse quantizer for approximate nearest-neighbor
  * search — the scale path next to the brute-force baseline in
  * [[graft.queries.SimilarityOps]].
  *
  * Scale design (the 100-TB shape):
  *   - centroids are seeded from a deterministic hash-ordered sample
  *     (TakeOrdered over the portable md5-derived hash — no full sort, no
  *     window) and refined with Lloyd iterations whose assignment step is a
  *     `groupBy(id).agg(max_by(cent, score))` — a single partial-aggregated
  *     shuffle on the vector id, never a per-vector window;
  *   - `numCells` defaults to ≈√N so a query probing `nprobe` cells touches
  *     ~nprobe/√N of the corpus (2/√N by default);
  *   - query-side cell selection collects the numCells centroid scores per
  *     query (bounded by numCells ≈ √N structs, not by corpus size) and
  *     slices the top `nprobe` — again no window.
  *
  * Everything is Catalyst array/aggregate expressions; the only broadcast is
  * the centroid table (numCells × dim doubles).
  *
  * PORTABILITY: both the seed order (md5-derived [[Dedup.portableHash60]]
  * over the id's decimal rendering) and each Lloyd mean (snapped to the
  * 1e-6 grid with the `floor(x·1e6 + 0.5)/1e6` contract) are reproducible
  * in any engine with md5 — which is what turns the IVF-backed query
  * surfaces (sim_topics, sim_knn_ivf, sim_knn_join) from rows-only into
  * fully hash-oracled: DuckDB replays seeding, every refinement step, and
  * the final assignment bit-for-bit. The grid snap absorbs cross-engine /
  * cross-partitioning float-sum reorder noise (~1e-14 absolute) at 1e-6
  * resolution — 8 orders of magnitude of slack — while perturbing the
  * centroids far less than one quantization step of the data itself.
  */
object Ivf {

  /** Elementwise mean snapped to the portable 1e-6 grid. */
  private def portableMean(c: Column): Column =
    floor(avg(c) * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Deterministic seeded centroids refined by `iters` Lloyd steps.
    *
    * @param e      corpus: (idCol long, vecCol array&lt;double&gt;)
    * @param cos    similarity measure (higher = closer)
    * @return (cent_id long, cv array&lt;double&gt;) — cent_id is the seed
    *         vector's id (unique without any global ordering step)
    */
  def centroids(e: DataFrame, idCol: String, vecCol: String, numCells: Int,
      iters: Int = 2)(cos: (Column, Column) => Column): DataFrame = {
    // hash-ordered sample → TakeOrderedAndProject, no full sort; id
    // tie-break keeps the order total even on a 60-bit hash collision
    val seeds = e
      .orderBy(Dedup.portableHash60(col(idCol).cast("string")), col(idCol))
      .limit(numCells)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cv"))
      .localCheckpoint() // numCells rows; truncate so refinement rounds
                         // don't re-run the sample inside one plan tree
    (0 until iters).foldLeft(seeds) { (cents, _) =>
      val assigned = assign(e, cents, idCol, vecCol)(cos)
      // elementwise grid-snapped mean per cell (empty cells drop out)
      assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(portableMean(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cent_id"), expr("transform(pm, p -> p.m)").as("cv"))
        .localCheckpoint() // ditto per Lloyd round (centroids stay tiny)
    }
  }

  /** Nearest-centroid assignment: (idCol, vecCol, cell). One broadcast
    * crossJoin + partial-aggregated groupBy on the id — no window, no
    * per-vector sort. Ties break toward the smallest cent_id.
    */
  def assign(e: DataFrame, cents: DataFrame, idCol: String, vecCol: String)(
      cos: (Column, Column) => Column): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("cos_c", cos(col(vecCol), col("cv")))
      .groupBy(col(idCol))
      .agg(
        max_by(col("cent_id"), struct(col("cos_c"), -col("cent_id"))).as("cell"),
        first(col(vecCol)).as(vecCol)) // constant per id — kept to avoid a join back

  /** Top-`nprobe` cells per query without a window: per query, collect the
    * numCells (score, cent_id) pairs — bounded by numCells, not corpus
    * size — sort descending (ties toward smaller cent_id) and slice.
    * Returns (queryIdCol, vecCol, cell) with `nprobe` rows per query.
    */
  def probeCells(q: DataFrame, cents: DataFrame, queryIdCol: String,
      vecCol: String, nprobe: Int)(
      cos: (Column, Column) => Column): DataFrame =
    q.crossJoin(broadcast(cents))
      .withColumn("cos_c", cos(col(vecCol), col("cv")))
      .groupBy(col(queryIdCol))
      .agg(
        first(col(vecCol)).as(vecCol),
        slice(
          reverse(array_sort(collect_list(
            struct(col("cos_c").as("c"), (-col("cent_id")).as("nc"),
              col("cent_id").as("cent_id"))))),
          1, nprobe).as("top"))
      .select(col(queryIdCol), col(vecCol),
        explode(col("top.cent_id")).as("cell"))
}
