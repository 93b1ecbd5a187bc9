package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t

/** Similarity search over the `embeddings` table (Array[Float], 64-dim) —
  * beyond-reference operators (BASELINE.json): brute-force cosine top-k as
  * the exact baseline and the IVF / PQ / IVF-PQ approximate tiers as the
  * scale path. EVERY query here is DuckDB-hash-oracled: the portable-hash
  * seeding + grid-snap contracts in operators.Ivf / operators.Pq make the
  * approximate tiers exactly replayable, and recall is additionally
  * asserted against brute force in ScaleOpsSpec.
  *
  * The dot product is `aggregate(zip_with(...))` — pure Catalyst array
  * expressions, no UDF, identical left-to-right summation order to the
  * oracle's list_inner_product.
  */
object SimilarityOps {
  type Q = (SparkSession, String) => DataFrame

  /** cos(a, b) via the native codegen'd Catalyst expression — one fused
    * loop inside whole-stage codegen (see functions.CosineSimilarity).
    * Same forward summation order as [[cosineComposed]] and the oracle.
    */
  private var registeredIn: SparkSession = null
  private def cosine(s: SparkSession)(a: Column, b: Column): Column = {
    if (registeredIn ne s) {
      graft.functions.CosineSimilarity.register(s)
      registeredIn = s
    }
    call_function(graft.functions.CosineSimilarity.FnName, a, b)
  }

  /** Built-ins-only composed form, kept as the reference implementation
    * (SimilaritySpec asserts bit-equality against the native expression).
    */
  def cosineComposed(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  private def embDouble(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))

  // ---------------------------------------------------------------------
  // Brute-force cosine top-k: 5 fixed query vectors (vec_id < 5) against
  // the whole corpus. Scale shape: broadcast of the query set, then a
  // bounded-heap typed Aggregator per query — map-side partial top-k on
  // every input partition, an exchange of only O(queries × k) rows, and no
  // window anywhere (a per-query row_number window would sort a full
  // corpus copy per query; asserted window-free in PlanSpec). Exact, and
  // identical ranking to the oracle: both rank on the ROUNDED cosine with
  // vec_id tie-break.
  private def simKnnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(s)(col("qv"), col("v")), 6).as("cos"))
      .as[(Long, Long, Double)]
    val top = scored.groupByKey(_._1)
      .agg(new graft.functions.TopKByScore(10).toColumn.name("top"))
    top.toDF("query_id", "top")
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("neighbor_id"), col("col._1").as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val simKnnBruteSql =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |    round(list_inner_product(q.qv, e.v)
      |      / sqrt(list_inner_product(q.qv, q.qv))
      |      / sqrt(list_inner_product(e.v, e.v)), 6) AS cos
      |  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id AS neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, neighbor_id, cos FROM ranked
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // IVF-style approximate search via operators.Ivf: hash-seeded centroids
  // refined by 2 Lloyd steps, numCells ≈ √N so a query probing nprobe=2
  // cells touches ~2/√N of the corpus. All assignment/probing steps are
  // max_by / collect-top aggregations — no per-vector window anywhere
  // (asserted in PlanSpec). Fully hash-oracled: Ivf's portable seeding and
  // grid-snapped Lloyd means let DuckDB replay every refinement round and
  // the probe/rank steps exactly (simKnnIvfSql); recall vs brute force is
  // additionally asserted in ScaleOpsSpec (real data + a tight-cluster
  // fixture at ≥0.9).
  /** Session-cached IVF index (centroids + checkpointed cell assignment)
    * per (corpus, cell count, refinement rounds): the index is BUILT ONCE
    * and queried by every IVF-backed query — the billion-scale contract,
    * where construction amortizes across the query stream and each search
    * pays only probe + candidate cost. Deterministic (portable seeds,
    * grid-snapped means), so caching cannot change any result; same
    * fixture-cache pattern as [[doubledCorpus]].
    */
  private val ivfIndexes = scala.collection.mutable
    .Map[(SparkSession, String, Int, Int), (DataFrame, DataFrame)]()

  private def ivfIndex(s: SparkSession, dir: String, numCells: Int,
      iters: Int = 2): (DataFrame, DataFrame) = synchronized {
    ivfIndexes.getOrElseUpdate((s, dir, numCells, iters), {
      val e = embDouble(s, dir)
      val cents = graft.operators.Ivf.centroids(
        e, "vec_id", "v", numCells, iters)(cosine(s) _)
      val withCell = graft.operators.Ivf.assign(
        e, cents, "vec_id", "v")(cosine(s) _).localCheckpoint()
      (cents, withCell)
    })
  }

  /** √N default cell count shared by the IVF-backed queries. */
  private def defaultCells(s: SparkSession, dir: String): Int =
    math.max(2, math.sqrt(
      embDouble(s, dir).count().toDouble).toInt)

  /** Session-cached PQ index (codebooks + checkpointed encoded corpus) —
    * the same build-once contract as [[ivfIndex]]: the compressed corpus
    * is what a deployment persists, and both PQ-backed queries read it.
    */
  private val pqIndexes = scala.collection.mutable
    .Map[(SparkSession, String), (DataFrame, DataFrame)]()

  private def pqIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    synchronized {
      pqIndexes.getOrElseUpdate((s, dir), {
        val e = embDouble(s, dir).localCheckpoint() // feeds train + encode
        val (dim, m, k) = (64, 8, 16)
        val cb = graft.operators.Pq.codebooks(s, e, "vec_id", "v", m, dim, k)
        val enc = graft.operators.Pq.encode(e, cb, "vec_id", "v", m, dim)
          .localCheckpoint()
        (cb, enc)
      })
    }

  /** Exposed with explicit knobs so specs can vary cell count / probes. */
  def knnIvf(s: SparkSession, dir: String, numCellsOpt: Option[Int] = None,
      nprobe: Int = 2, topK: Int = 10): DataFrame = {
    val e = embDouble(s, dir)
    val cos = cosine(s) _
    val numCells = numCellsOpt.getOrElse(defaultCells(s, dir))
    val (cents, withCell) = ivfIndex(s, dir, numCells)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = graft.operators.Ivf.probeCells(
      q, cents, "query_id", "qv", nprobe)(cos)
    // final ranking: per-query window over the probed candidates only
    // (bounded by ~nprobe/numCells of the corpus, never the full corpus)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    withCell.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cos(col("qv"), col("v")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private def simKnnIvf(s: SparkSession, dir: String): DataFrame =
    knnIvf(s, dir)

  // ---------------------------------------------------------------------
  // DuckDB replay of the IVF machinery (operators.Ivf). Everything the
  // Spark side does is portable: seeds order by the md5-derived 60-bit
  // hash of the id's decimal rendering, Lloyd means snap to the 1e-6 grid
  // (floor(x·1e6+0.5)/1e6), and the full-precision cosines agree
  // BIT-FOR-BIT across engines (verified empirically: 2500/2500 pairs
  // identical — both engines run the same forward-order dot, division and
  // sqrt are IEEE-correctly-rounded), so argmax assignment needs no
  // rounding contract at all. These helpers emit the shared CTE skeleton.
  private def duckCos(a: String, b: String): String =
    s"list_inner_product($a, $b) / sqrt(list_inner_product($a, $a))" +
      s" / sqrt(list_inner_product($b, $b))"

  private val duckHashId =
    "CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** CTE: nearest-centroid assignment of `src` to `cents` → (vec_id, v,
    * cell), ties toward the smaller cent_id (Ivf.assign's max_by contract).
    */
  private def duckAssign(name: String, cents: String,
      src: String = "e"): String =
    s"""$name AS (
       |  SELECT vec_id, v, cent_id AS cell FROM (
       |    SELECT e.vec_id, e.v, c.cent_id,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${duckCos("e.v", "c.cv")} DESC, c.cent_id) AS rn
       |    FROM $src e CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin

  /** CTE: one Lloyd step — grid-snapped elementwise mean per cell. */
  private def duckLloyd(name: String, assigned: String): String =
    s"""$name AS (
       |  SELECT cell AS cent_id, list(m ORDER BY pos) AS cv FROM (
       |    SELECT a.cell, t.pos,
       |      floor(avg(a.v[t.pos + 1]) * 1000000 + 0.5) / 1000000 AS m
       |    FROM $assigned a CROSS JOIN range(0, 64) AS t(pos)
       |    GROUP BY a.cell, t.pos) GROUP BY cell)""".stripMargin

  /** Seeds + `iters` unrolled refinement rounds; the final centroid CTE is
    * named s`iters`.
    */
  private def duckCentroids(seedLimit: String, iters: Int): String = {
    val seeds =
      s"""s0 AS (
         |  SELECT vec_id AS cent_id, v AS cv FROM (
         |    SELECT vec_id, v,
         |      row_number() OVER (ORDER BY $duckHashId, vec_id) AS rn
         |    FROM e) WHERE rn <= $seedLimit)""".stripMargin
    val rounds = (0 until iters).flatMap { i =>
      Seq(duckAssign(s"a$i", s"s$i"), duckLloyd(s"s${i + 1}", s"a$i"))
    }
    (seeds +: rounds).mkString(",\n")
  }

  private val simKnnIvfSql = {
    val k = "(SELECT greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM e)"
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${duckCentroids(k, iters = 2)},
       |${duckAssign("wc", "s2")},
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |pr AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT q.query_id, q.qv, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        ${duckCos("q.qv", "c.cv")} DESC, c.cent_id) AS rn
       |    FROM q CROSS JOIN s2 c) WHERE rn <= 2),
       |sc AS (
       |  SELECT p.query_id, w.vec_id, round(${duckCos("p.qv", "w.v")}, 6) AS cos
       |  FROM wc w JOIN pr p ON w.cell = p.cell WHERE w.vec_id <> p.query_id)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT query_id, vec_id AS neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, vec_id) AS rank
       |  FROM sc) WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // PQ (product quantization) + exact re-rank via operators.Pq: the
  // codebook-compression ANN tier — each 64-dim vector becomes m=8
  // 4-bit codes (64× smaller), ADC scores every candidate from codebook
  // lookups alone (no raw-vector dot products), and only the bounded
  // top-R survivors per query are re-ranked with exact cosine. The heap
  // aggregator keeps candidate selection window-free; the re-rank window
  // runs over R·|Q| rows, never the corpus. Fully hash-oracled
  // (simKnnPqSql replays codebook training, encoding, ADC, and the
  // re-rank via Pq's portable contracts); recall vs brute force
  // additionally asserted in ScaleOpsSpec.
  /** Exposed with knobs so specs can vary the re-rank width. */
  def knnPq(s: SparkSession, dir: String, rerank: Int = 64,
      topK: Int = 10): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val (dim, m) = (64, 8)
    val (cb, enc) = pqIndex(s, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cand = graft.operators.Pq
      .adcScores(q, enc, cb, "query_id", "qv", "vec_id", m, dim)
      .filter(col("vec_id") =!= col("query_id"))
      // rank candidates on the 1e-6-rounded ADC score (vec_id tie-break):
      // the m partial dots sum in no particular order, and the re-rank
      // boundary must not move with it — here or in the DuckDB replay
      .select(col("query_id"), col("vec_id"),
        round(col("adc_cos"), 6).as("adc_cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.functions.TopKByScore(rerank).toColumn.name("top"))
      .toDF("query_id", "top")
      .select(col("query_id"), explode(col("top")).as("c"))
      .select(col("query_id"), col("c._2").as("vec_id"))
    val cos = cosine(s) _
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.join(e, Seq("vec_id")).join(q, Seq("query_id"))
      .withColumn("cos", round(cos(col("qv"), col("v")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private def simKnnPq(s: SparkSession, dir: String): DataFrame =
    knnPq(s, dir)

  // ---------------------------------------------------------------------
  // DuckDB replay of the PQ tier (operators.Pq): portable-hash seeds,
  // grid-snapped Lloyd means, and 1e-6-rounded L2/ADC comparisons with
  // code/id tie-breaks make codebook training, encoding, ADC scoring,
  // and the re-rank boundary all order-independent — replayable exactly.
  /** Rounded squared L2 between two DuckDB lists (summation-order-proof
    * via the 1e-6 grid, matching Pq.assign's rounded distance).
    */
  private def duckL2(a: String, b: String): String =
    s"round(list_sum(list_transform(list_zip($a, $b)," +
      s" z -> (z[1]-z[2])*(z[1]-z[2]))), 6)"

  /** CTEs replaying Pq.codebooks/encode: `subv`, seeds `cb0`, `iters`
    * refinement rounds (assignment paN → means with empty-code fallback
    * → cbN+1), and the final `enc` (vec_id, sub, code).
    */
  private def duckPqEncode(m: Int, d: Int, k: Int, iters: Int): String = {
    val subv =
      s"""subv AS (
         |  SELECT vec_id, t.sub, v[t.sub*$d+1 : t.sub*$d+$d] AS sv
         |  FROM e CROSS JOIN range(0, $m) AS t(sub))""".stripMargin
    val seeds =
      s"""cb0 AS (
         |  SELECT t.sub, s.code, s.v[t.sub*$d+1 : t.sub*$d+$d] AS cv
         |  FROM (SELECT vec_id, v,
         |          row_number() OVER (ORDER BY $duckHashId, vec_id) - 1
         |            AS code
         |        FROM e) s CROSS JOIN range(0, $m) AS t(sub)
         |  WHERE s.code < $k)""".stripMargin
    def assignCte(name: String, cb: String, keepSv: Boolean): String =
      s"""$name AS (
         |  SELECT vec_id, sub, code${if (keepSv) ", sv" else ""} FROM (
         |    SELECT sv.vec_id, sv.sub, c.code, sv.sv,
         |      row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
         |        ${duckL2("sv.sv", "c.cv")}, c.code) AS rn
         |    FROM subv sv JOIN $cb c ON c.sub = sv.sub) WHERE rn = 1)"""
        .stripMargin
    val rounds = (0 until iters).flatMap { i =>
      Seq(
        assignCte(s"pa$i", s"cb$i", keepSv = true),
        s"""cb${i + 1} AS (
           |  SELECT c.sub, c.code, coalesce(mu.cv, c.cv) AS cv
           |  FROM cb$i c LEFT JOIN (
           |    SELECT sub, code, list(m ORDER BY pos) AS cv FROM (
           |      SELECT a.sub, a.code, t.pos,
           |        floor(avg(a.sv[t.pos+1]) * 1000000.0 + 0.5) / 1000000.0
           |          AS m
           |      FROM pa$i a CROSS JOIN range(0, $d) AS t(pos)
           |      GROUP BY a.sub, a.code, t.pos) GROUP BY sub, code) mu
           |  ON mu.sub = c.sub AND mu.code = c.code)""".stripMargin)
    }
    val enc = assignCte("enc", s"cb$iters", keepSv = false)
    (Seq(subv, seeds) ++ rounds :+ enc).mkString(",\n")
  }

  /** CTEs for the per-query ADC machinery over `enc` + `cb{iters}`:
    * lookup table `lut` and query norms `qnorm`. `q` must exist as
    * (query_id, qv).
    */
  private def duckAdcLut(m: Int, d: Int, cb: String): String =
    s"""lut AS (
       |  SELECT q.query_id, c.sub, c.code,
       |    list_inner_product(q.qv[c.sub*$d+1 : c.sub*$d+$d], c.cv)
       |      AS pdot,
       |    list_inner_product(c.cv, c.cv) AS cnorm2
       |  FROM q CROSS JOIN $cb c),
       |qnorm AS (
       |  SELECT query_id, sqrt(list_inner_product(qv, qv)) AS qn FROM q)"""
      .stripMargin

  /** Final rounded-ADC top-`rerank` + exact-cosine top-`topK` SELECT over
    * an `adc` CTE (query_id, vec_id, adc).
    */
  private def duckRerankSelect(rerank: Int, topK: Int): String =
    s"""cand AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY adc DESC, vec_id) AS arn
       |    FROM adc) WHERE arn <= $rerank),
       |scored AS (
       |  SELECT c.query_id, c.vec_id,
       |    round(${duckCos("q.qv", "e.v")}, 6) AS cos
       |  FROM cand c JOIN e ON e.vec_id = c.vec_id
       |  JOIN q ON q.query_id = c.query_id)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT query_id, vec_id AS neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored) WHERE rank <= $topK ORDER BY query_id, rank"""
      .stripMargin

  private val simKnnPqSql =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |${duckPqEncode(m = 8, d = 8, k = 16, iters = 2)},
       |${duckAdcLut(m = 8, d = 8, cb = "cb2")},
       |adc AS (
       |  SELECT l.query_id, n.vec_id,
       |    round(sum(l.pdot) / (any_value(qn.qn) * sqrt(sum(l.cnorm2))), 6)
       |      AS adc
       |  FROM enc n
       |  JOIN lut l ON l.sub = n.sub AND l.code = n.code
       |  JOIN qnorm qn ON qn.query_id = l.query_id
       |  WHERE n.vec_id <> l.query_id
       |  GROUP BY l.query_id, n.vec_id),
       |${duckRerankSelect(rerank = 64, topK = 10)}""".stripMargin

  private val simKnnIvfPqSql = {
    val kCells =
      "(SELECT greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM e)"
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |${duckCentroids(kCells, iters = 2)},
       |${duckAssign("wc", "s2")},
       |pr AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        ${duckCos("q.qv", "c.cv")} DESC, c.cent_id) AS rn
       |    FROM q CROSS JOIN s2 c) WHERE rn <= 2),
       |${duckPqEncode(m = 8, d = 8, k = 16, iters = 2)},
       |${duckAdcLut(m = 8, d = 8, cb = "cb2")},
       |adc AS (
       |  SELECT p.query_id, n.vec_id,
       |    round(sum(l.pdot) / (any_value(qn.qn) * sqrt(sum(l.cnorm2))), 6)
       |      AS adc
       |  FROM enc n
       |  JOIN wc ON wc.vec_id = n.vec_id
       |  JOIN pr p ON p.cell = wc.cell AND p.query_id <> n.vec_id
       |  JOIN lut l ON l.query_id = p.query_id AND l.sub = n.sub
       |    AND l.code = n.code
       |  JOIN qnorm qn ON qn.query_id = p.query_id
       |  GROUP BY p.query_id, n.vec_id),
       |${duckRerankSelect(rerank = 64, topK = 10)}""".stripMargin
  }

  // ---------------------------------------------------------------------
  // IVF-PQ — the two tiers composed, the canonical billion-scale ANN
  // architecture: the coarse quantizer (IVF cells) prunes the candidate
  // set to the query's nprobe cells (~nprobe/√N of the corpus), then PQ's
  // ADC lookup table scores ONLY those candidates from codebook entries —
  // no raw-vector arithmetic until the bounded exact re-rank. At 100 TB
  // the corpus stores 8-byte codes + a cell id per vector; a query
  // touches nprobe cell partitions and one broadcast lookup table.
  /** Exposed with knobs so specs can vary probes / re-rank width. */
  def knnIvfPq(s: SparkSession, dir: String, nprobe: Int = 2,
      rerank: Int = 64, topK: Int = 10): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val cos = cosine(s) _
    val (dim, m) = (64, 8)
    val numCells = defaultCells(s, dir)
    val (cents, withCell) = ivfIndex(s, dir, numCells)
    val (cb, encoded) = pqIndex(s, dir)
    val enc = encoded
      .join(withCell.select(col("vec_id"), col("cell")), Seq("vec_id"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = graft.operators.Ivf.probeCells(
      q, cents, "query_id", "qv", nprobe)(cos)
    // candidate pairs = encoded vectors in probed cells only
    val pairs = enc.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("codes"))
    val cand = graft.operators.Pq
      .adcScoresFor(pairs, q, cb, "query_id", "qv", "vec_id", m, dim)
      // same rounded-ADC ranking contract as knnPq
      .select(col("query_id"), col("vec_id"),
        round(col("adc_cos"), 6).as("adc_cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.functions.TopKByScore(rerank).toColumn.name("top"))
      .toDF("query_id", "top")
      .select(col("query_id"), explode(col("top")).as("c"))
      .select(col("query_id"), col("c._2").as("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.join(e, Seq("vec_id")).join(q, Seq("query_id"))
      .withColumn("cos", round(cos(col("qv"), col("v")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private def simKnnIvfPq(s: SparkSession, dir: String): DataFrame =
    knnIvfPq(s, dir)

  // ---------------------------------------------------------------------
  // kNN-JOIN: every corpus vector's top-k neighbors — the kNN-graph
  // primitive embedding dedup/clustering pipelines build (the all-vectors
  // generalization of the 5-query searches above). Scale shape: block by
  // IVF cell (candidate pairs share a cell), exact cosine inside the
  // block, bounded-heap top-k per vector — O(N × cell size) work with
  // map-side partial top-k, no window, never the N² cross join.
  // Approximate only at cell boundaries, like any 1-probe IVF graph;
  // recall vs per-vector brute force asserted in ScaleOpsSpec. Fully
  // hash-oracled (simKnnJoinSql replays the portable centroids and the
  // per-cell self-join).
  /** Exposed with knobs so specs can vary k and the cell count. */
  def knnJoin(s: SparkSession, dir: String, k: Int = 5,
      numCellsOpt: Option[Int] = None): DataFrame = {
    import s.implicits._
    val e = embDouble(s, dir)
    val cos = cosine(s) _
    val numCells = numCellsOpt.getOrElse(defaultCells(s, dir))
    // the cached index's checkpointed assignment feeds both sides of the
    // per-cell self-join
    val (_, withCell) = ivfIndex(s, dir, numCells)
    val a = withCell.select(col("cell"), col("vec_id").as("id_a"),
      col("v").as("va"))
    val b = withCell.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"))
    val scored = a.join(b, Seq("cell"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cos(col("va"), col("vb")), 6).as("cos"))
      .as[(Long, Long, Double)]
    scored.groupByKey(_._1)
      .agg(new graft.functions.TopKByScore(k).toColumn.name("top"))
      .toDF("vec_id", "top")
      .select(col("vec_id"), posexplode(col("top")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("neighbor_id"), col("col._1").as("cos"))
      .orderBy(col("vec_id"), col("rank"))
  }

  private def simKnnJoin(s: SparkSession, dir: String): DataFrame =
    knnJoin(s, dir)

  private val simKnnJoinSql = {
    val k = "(SELECT greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM e)"
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${duckCentroids(k, iters = 2)},
       |${duckAssign("wc", "s2")},
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    round(${duckCos("a.v", "b.v")}, 6) AS cos
       |  FROM wc a JOIN wc b ON a.cell = b.cell AND a.vec_id <> b.vec_id)
       |SELECT id_a AS vec_id, rank, id_b AS neighbor_id, cos FROM (
       |  SELECT id_a, id_b, cos,
       |    row_number() OVER (PARTITION BY id_a
       |                       ORDER BY cos DESC, id_b) AS rank
       |  FROM pairs) WHERE rank <= 5 ORDER BY vec_id, rank""".stripMargin
  }

  // Embedding near-duplicate pairs: exact top-50 most-similar pairs within
  // the same label cell (the blocked form of all-pairs cosine). Oracled.
  private def simNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val e = embDouble(s, dir)
    val a = e.select(col("label"), col("vec_id").as("id_a"), col("v").as("va"))
    val b = e.select(col("label"), col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
        round(cosine(s)(col("va"), col("vb")), 6).as("cos"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  private val simNearDupPairsSql =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_inner_product(a.v, b.v)
      |    / sqrt(list_inner_product(a.v, a.v))
      |    / sqrt(list_inner_product(b.v, b.v)), 6) AS cos
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |ORDER BY cos DESC, id_a, id_b LIMIT 50""".stripMargin

  // ---------------------------------------------------------------------
  // Embedding near-dup detection at scale: random-hyperplane (cosine) LSH
  // via operators.CosineLsh — signature map + banded buckets + exact
  // cosine on candidates only, never an all-pairs join. The source
  // embeddings contain no true near-duplicates (max pairwise cos ≈ 0.48),
  // so the query doubles the corpus with hash-perturbed copies
  // (deterministic ±0.1% coordinate noise, cos ≈ 0.9999 to the original)
  // and must recover exactly those injected pairs — a self-fixturing
  // demonstration with a deterministic result, hash-oracled by its closed
  // form (simNearDupLshSql recomputes each injected pair's exact cosine
  // from the portable noise); recall + candidate-volume bounds in
  // ScaleOpsSpec.
  /** Exposed with knobs so specs can vary the threshold and band cap.
    * Returns pairs where id_b == id_a + (max vec_id + 1): the copy offset
    * is derived from the data, so injected ids can never collide with real
    * ones at any corpus size (a 1-row scalar fetch, the engine's A2
    * pattern).
    */
  /** The self-fixturing doubled corpus: originals plus hash-perturbed
    * copies at id+offset. Returns (corpus, offset); the corpus is
    * localCheckpointed because its consumers scan it several times, and
    * cached per (session, dir) — it is a deterministic FIXTURE shared by
    * the near-dup pair query and the dedup-keep manifest, so building it
    * once per session is the same contract as the other cached fixtures
    * (checkpointed blocks live in the session's block manager).
    */
  private val doubledCorpora =
    scala.collection.mutable.Map[(SparkSession, String), (DataFrame, Long)]()

  private def doubledCorpus(s: SparkSession, dir: String): (DataFrame, Long) =
    synchronized { doubledCorpora.getOrElseUpdate((s, dir), {
      val e = embDouble(s, dir).select(col("vec_id"), col("v"))
      val offset = e.agg(max(col("vec_id"))).first().getLong(0) + 1L
      // the ±0.1% coordinate noise comes from the PORTABLE md5-derived
      // h1 + i·h2 family (one digest per vector, like Dedup.minHash —
      // not one per coordinate), so the copies — and therefore the
      // injected near-dup pairs' exact cosines — are bit-reproducible in
      // the DuckDB oracle. h1 < 2^60 and 63·h2 < 2^62 keep every value
      // inside a signed long under ANSI arithmetic.
      val dup = e
        .withColumn("_d", md5(col("vec_id").cast("string")))
        .withColumn("h1",
          conv(substring(col("_d"), 1, 15), 16, 10).cast("long"))
        .withColumn("h2",
          conv(substring(col("_d"), 17, 14), 16, 10).cast("long"))
        .select((col("vec_id") + offset).as("vec_id"),
          expr("transform(v, (x, i) -> x * (1.0 + " +
            "pmod(h1 + i * h2, 1000) / 1000000.0))").as("v"))
      // the doubled corpus feeds the signature scan AND both candidate-
      // join probes — localCheckpoint so those are reads of materialized
      // partitions, not re-evaluations of a corpus-sized plan
      (e.unionByName(dup).localCheckpoint(), offset)
    }) }

  def nearDupLsh(s: SparkSession, dir: String, minCos: Double = 0.99,
      maxHamming: Int = 8): DataFrame = {
    val (all, _) = doubledCorpus(s, dir)
    graft.operators.CosineLsh.nearDupPairs(
      all, "vec_id", "v", dim = 64, minCos = minCos,
      maxHamming = maxHamming, cos = cosine(s) _)
      .orderBy(col("id_a"), col("id_b"))
  }

  private def simNearDupLsh(s: SparkSession, dir: String): DataFrame =
    nearDupLsh(s, dir)

  // Closed-form oracle: the only pairs at cos >= 0.99 are the injected
  // (vec_id, vec_id + offset) copies — originals top out at cos ≈ 0.48
  // pairwise, and the hyperplane banding recalls every injected pair on
  // this corpus (E[hamming] ≈ 0.3 at cos ≈ 0.9999, inside the 4×16-bit
  // pigeonhole guarantee; the green sim_dedup_keep oracle rests on the
  // same recall). The perturbed copies use the portable md5 noise, so
  // DuckDB recomputes each injected pair's exact cosine bit-for-bit.
  private val simNearDupLshSql =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |off AS (SELECT max(vec_id) + 1 AS o FROM e),
      |hh AS (
      |  SELECT vec_id,
      |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS h1,
      |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 17, 14))
      |      AS BIGINT) AS h2
      |  FROM e),
      |p AS (
      |  SELECT e.vec_id, i,
      |    v[i + 1] * (1.0 + (hh.h1 + i * hh.h2) % 1000 / 1000000.0) AS x
      |  FROM e JOIN hh USING (vec_id) CROSS JOIN range(0, 64) AS t(i)),
      |vp AS (SELECT vec_id, list(x ORDER BY i) AS v2 FROM p GROUP BY vec_id)
      |SELECT e.vec_id AS id_a, e.vec_id + (SELECT o FROM off) AS id_b,
      |  round(list_inner_product(e.v, vp.v2)
      |    / sqrt(list_inner_product(e.v, e.v))
      |    / sqrt(list_inner_product(vp.v2, vp.v2)), 6) AS cos
      |FROM e JOIN vp USING (vec_id)
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // End-to-end EMBEDDING dedup manifest — the cosine-LSH mirror of the
  // text pipeline's dd_dedup_keep: LSH near-dup pairs → connected
  // components → keep the min-id member of every cluster, one row per
  // kept vector with its cluster size. Runs on the doubled corpus (the
  // deterministic near-dup fixture), so every original heads a 2-cluster
  // containing its injected copy — which IS the closed-form oracle: one
  // row per original vec_id with n_members = 2 (the source corpus has no
  // true near-dups at 0.99, max pairwise cos ≈ 0.48). A hash mismatch
  // means the LSH either missed an injected pair or fused unrelated
  // vectors. Cluster-shape invariants also in ScaleOpsSpec.
  /** Exposed so specs can inspect the manifest with knobs. */
  def dedupKeepEmbeddings(s: SparkSession, dir: String,
      minCos: Double = 0.99): DataFrame = {
    val (all, _) = doubledCorpus(s, dir)
    val pairs = graft.operators.CosineLsh.nearDupPairs(
      all, "vec_id", "v", dim = 64, minCos = minCos,
      maxHamming = 8, cos = cosine(s) _)
      .select(col("id_a"), col("id_b"))
    val comp = graft.operators.Components.resolve(pairs)
    all.select(col("vec_id"))
      .join(comp.select(col("id").as("vec_id"), col("comp")),
        Seq("vec_id"), "left")
      .withColumn("canonical", coalesce(col("comp"), col("vec_id")))
      .groupBy(col("canonical").as("vec_id_kept"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("vec_id_kept"))
  }

  private def simDedupKeep(s: SparkSession, dir: String): DataFrame =
    dedupKeepEmbeddings(s, dir)

  private val simDedupKeepSql =
    """SELECT vec_id AS vec_id_kept, CAST(2 AS BIGINT) AS n_members
      |FROM embeddings ORDER BY vec_id_kept""".stripMargin

  // ---------------------------------------------------------------------
  // Topic clustering — the corpus-organization step of an embedding
  // pipeline (bucket documents by semantic neighborhood before sampling /
  // balancing): k-means over the embedding column via the IVF machinery
  // (hash-seeded centroids, Lloyd refinement, max_by assignment — no
  // windows, centroid table broadcast), reported as one row per topic
  // with member count and mean member-to-centroid cosine (the cluster
  // cohesion metric). Fully hash-oracled: simTopicsSql replays seeding,
  // all three Lloyd rounds, and the final assignment in DuckDB via Ivf's
  // portable contracts; sum-of-sizes / cohesion-range / nearest-centroid
  // invariants additionally in ScaleOpsSpec.
  /** Exposed with k so specs can vary the topic count. */
  def topics(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val (cents, assigned) = ivfIndex(s, dir, numCells = k, iters = 3)
    assigned
      .join(broadcast(cents), col("cell") === col("cent_id"))
      .withColumn("cos_c", cosine(s)(col("v"), col("cv")))
      .groupBy(col("cell").as("topic_id"))
      .agg(count(lit(1)).as("n_members"),
        round(avg(col("cos_c")), 4).as("mean_cos"))
      .orderBy(col("topic_id"))
  }

  private def simTopics(s: SparkSession, dir: String): DataFrame =
    topics(s, dir)

  private val simTopicsSql =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${duckCentroids("8", iters = 3)},
       |af AS (
       |  SELECT vec_id, cell, cosv FROM (
       |    SELECT vec_id, cent_id AS cell, cosv,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY cosv DESC, cent_id) AS rn
       |    FROM (SELECT e.vec_id, c.cent_id,
       |            ${duckCos("e.v", "c.cv")} AS cosv
       |          FROM e CROSS JOIN s3 c)) WHERE rn = 1)
       |SELECT cell AS topic_id, count(*) AS n_members,
       |  round(avg(cosv), 4) AS mean_cos
       |FROM af GROUP BY cell ORDER BY topic_id""".stripMargin

  // ---------------------------------------------------------------------
  // Topic-balanced subsample — the curation step BETWEEN clustering and
  // training-set assembly: cap each semantic topic at `cap` members so one
  // over-represented neighborhood (boilerplate, template spam, a crawler
  // loop) cannot dominate the mixture. Membership comes from the same
  // k-means assignment as sim_topics; WITHIN a topic the kept set is the
  // `cap` members with the smallest portable md5 hash of their id — a
  // deterministic, engine-reproducible "random" draw (fresh seed = fresh
  // permutation), selected by the bounded-heap BottomKByLongKey Aggregator
  // (map-side partials; a per-topic window would sort a corpus-sized
  // partition per topic). The integer hash key is ordered EXACTLY —
  // a Double score would round away the low bits of the 60-bit hash and
  // could diverge from the oracle's BIGINT ordering.
  /** Exposed with k/cap so specs can vary the shape. */
  def topicSample(s: SparkSession, dir: String, k: Int = 8,
      cap: Int = 10): DataFrame = {
    import s.implicits._
    val (_, assigned) = ivfIndex(s, dir, numCells = k, iters = 3)
    val keyed = assigned
      .select(col("cell"), col("vec_id"),
        graft.operators.Dedup.portableHash60(
          col("vec_id").cast("string")).as("h"))
      .as[(Long, Long, Long)]
    keyed.groupByKey(_._1)
      .agg(new graft.functions.BottomKByLongKey(cap).toColumn.name("keep"))
      .toDF("topic_id", "keep")
      .select(col("topic_id"), explode(col("keep")).as("e"))
      .select(col("topic_id"), col("e._2").as("vec_id"))
      .orderBy(col("topic_id"), col("vec_id"))
  }

  private def simTopicSample(s: SparkSession, dir: String): DataFrame =
    topicSample(s, dir)

  private val simTopicSampleSql =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${duckCentroids("8", iters = 3)},
       |${duckAssign("af", "s3")},
       |ranked AS (
       |  SELECT cell AS topic_id, vec_id,
       |    row_number() OVER (PARTITION BY cell
       |                       ORDER BY $duckHashId, vec_id) AS rn
       |  FROM af)
       |SELECT topic_id, vec_id FROM ranked WHERE rn <= 10
       |ORDER BY topic_id, vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // Random-projection (Johnson–Lindenstrauss) dimensionality reduction,
  // 64 → 16 dims — the embedding-compression step that precedes coarse
  // clustering or visualization at corpus scale: a ±1 sign matrix
  // (Achlioptas's database-friendly projection) scaled by 1/√16 preserves
  // pairwise distances in expectation, and a sign matrix needs no
  // training pass at all. The matrix is a pure function of the PORTABLE
  // md5 hash of each (row, col) index — data-independent, engine-
  // reproducible, broadcast as a literal (never a shuffle) — and the
  // whole projection is one per-row array expression inside codegen: at
  // 100 TB this is a map-only scan, no exchange anywhere. Fully
  // DuckDB-oracled: both engines run the same forward-order inner
  // product (the bit-equality precedent the cosine oracle established),
  // so the 6-dp-rounded projections match exactly. JL distance
  // preservation is additionally asserted in ScaleOpsSpec.
  /** The pinned 16×64 ±1 sign matrix, derived from the portable 60-bit
    * md5 hash of "rp:row:col" (even → +1). Exposed for the spec.
    */
  def rpSignMatrix(rows: Int = 16, cols: Int = 64): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until rows).map { i =>
      (0 until cols).map { j =>
        val hex = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.substring(0, 15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  private def simRpProject(s: SparkSession, dir: String): DataFrame = {
    val proj = expr(
      "transform(sequence(0, 15), i -> round(" +
        "aggregate(zip_with(v, signs[i], (x, s) -> x * s), " +
        "cast(0.0 as double), (a, b) -> a + b) / 4.0, 6))")
    embDouble(s, dir)
      .withColumn("signs", typedlit(rpSignMatrix()))
      .select(col("vec_id"), posexplode(proj).as(Seq("dim", "p")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("p"))
      .orderBy(col("vec_id"), col("dim"))
  }

  private val simRpProjectSql =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |rp AS (
      |  SELECT i, list(CASE WHEN CAST(concat('0x',
      |      substr(md5('rp:' || i || ':' || j), 1, 15)) AS BIGINT) % 2 = 0
      |    THEN 1.0 ELSE -1.0 END ORDER BY j) AS sv
      |  FROM range(0, 16) AS t(i) CROSS JOIN range(0, 64) AS u(j)
      |  GROUP BY i)
      |SELECT e.vec_id, rp.i AS dim,
      |  round(list_inner_product(e.v, rp.sv) / 4.0, 6) AS p
      |FROM e CROSS JOIN rp ORDER BY vec_id, dim""".stripMargin

  // ---------------------------------------------------------------------
  // Symmetric int8 quantization of the embedding column — the storage
  // compression step of an embedding pipeline (4 bytes/dim → 1). Per
  // vector: scale = max |x| (clamped), code_i = floor(x/scale*127 + 0.5),
  // reported max reconstruction error = max |x − code·scale/127|. Pure
  // array-lambda expressions with arithmetic written identically in the
  // DuckDB oracle, so the doubles match bit-for-bit (floor-based rounding
  // avoids engine-specific round-half semantics). QuantizeSpec-style error
  // bound asserted in ScaleOpsSpec: max_err ≤ scale/254.
  private def simQuantizeStats(s: SparkSession, dir: String): DataFrame =
    embDouble(s, dir)
      .withColumn("scale",
        greatest(array_max(expr("transform(v, x -> abs(x))")), lit(1e-12)))
      .withColumn("max_err", expr(
        "array_max(transform(v, x -> " +
          "abs(x - floor(x / scale * 127.0 + 0.5) * scale / 127.0)))"))
      .select(col("vec_id"), col("scale"), col("max_err"))
      .orderBy(col("vec_id"))

  private val simQuantizeStatsSql =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (
      |  SELECT vec_id, v,
      |    greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS scale
      |  FROM e)
      |SELECT vec_id, scale,
      |  list_max(list_transform(v, x ->
      |    abs(x - floor(x / scale * 127.0 + 0.5) * scale / 127.0))) AS max_err
      |FROM s ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // Semantic (embedding-level) contamination report — the ANN complement
  // of TextOps.tx_contamination and the decontamination step of a training
  // pipeline: for EVERY held-out benchmark vector (vec_id % 10 = 7, the
  // same split rule as the n-gram hop), find its nearest TRAINING-set
  // example and the cosine — the ranked audit list a curator reviews
  // before declaring a training corpus clean. Scale shape: the shared IVF
  // index blocks candidates to the bench vector's nprobe=2 cells
  // (~2/√N of the corpus per probe), exact cosine only inside the block,
  // and the per-bench top-1 is the bounded-heap Aggregator — map-side
  // partials, no window over the corpus. Fully hash-oracled via the
  // portable IVF replay. A bench vector whose probed cells hold no
  // training vectors drops out identically on both engines.
  private def simContamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cos = cosine(s) _
    val (cents, withCell) = ivfIndex(s, dir, defaultCells(s, dir))
    val bench = embDouble(s, dir).filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("bench_id"), col("v").as("qv"))
    val probes = graft.operators.Ivf.probeCells(
      bench, cents, "bench_id", "qv", nprobe = 2)(cos)
    val scored = withCell.filter(col("vec_id") % 10 =!= 7)
      .join(probes, Seq("cell"))
      .select(col("bench_id"), col("vec_id"),
        round(cos(col("qv"), col("v")), 6).as("cos"))
      .as[(Long, Long, Double)]
    scored.groupByKey(_._1)
      .agg(new graft.functions.TopKByScore(1).toColumn.name("top"))
      .toDF("bench_id", "top")
      .select(col("bench_id"),
        col("top")(0).getField("_2").as("nearest_train_id"),
        col("top")(0).getField("_1").as("cos"))
      .orderBy(col("bench_id"))
  }

  private val simContaminationSql = {
    val k = "(SELECT greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM e)"
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${duckCentroids(k, iters = 2)},
       |${duckAssign("wc", "s2")},
       |q AS (SELECT vec_id AS bench_id, v AS qv FROM e WHERE vec_id % 10 = 7),
       |pr AS (
       |  SELECT bench_id, qv, cell FROM (
       |    SELECT q.bench_id, q.qv, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY q.bench_id ORDER BY
       |        ${duckCos("q.qv", "c.cv")} DESC, c.cent_id) AS rn
       |    FROM q CROSS JOIN s2 c) WHERE rn <= 2),
       |sc AS (
       |  SELECT p.bench_id, w.vec_id,
       |    round(${duckCos("p.qv", "w.v")}, 6) AS cos
       |  FROM wc w JOIN pr p ON w.cell = p.cell WHERE w.vec_id % 10 <> 7)
       |SELECT bench_id, nearest_train_id, cos FROM (
       |  SELECT bench_id, vec_id AS nearest_train_id, cos,
       |    row_number() OVER (PARTITION BY bench_id
       |                       ORDER BY cos DESC, vec_id) AS rn
       |  FROM sc) WHERE rn = 1 ORDER BY bench_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Semantic dedup (SemDeDup, Abbas et al. 2023) — the cluster-then-prune
  // curation pass between near-dup LSH and topic sampling: k-means first
  // BOUNDS the quadratic (exact cosines only inside a cluster, never
  // across the corpus), then within each cluster a vector is DROPPED when
  // an earlier (smaller-id) cluster member sits above the similarity
  // threshold — the deterministic keep-first variant of SemDeDup's
  // per-cluster pruning, a pure function of the corpus. Runs on the
  // doubled corpus (the injected-near-dup fixture), so the drops are
  // genuine. Fully hash-oracled: DuckDB rebuilds the doubled corpus from
  // the portable md5 noise, replays seeding + all three Lloyd rounds +
  // assignment via the Ivf contracts, and re-runs the within-cluster
  // self-join with the same round-6 cosine.
  /** Exposed with knobs so specs can vary k and the threshold. k ≤ 0
    * (the declared query's setting) derives k = max(8, ⌊√N⌋) from the
    * corpus — real SemDeDup scales cluster count with corpus size so the
    * within-cluster quadratic stays bounded (expected cluster size √N,
    * pair work O(N) per cluster → O(N^1.5) total instead of O(N²/k) with
    * a frozen k); same √N shape as `defaultCells` for IVF.
    */
  def semDedup(s: SparkSession, dir: String, k: Int = 0,
      minCos: Double = 0.99): DataFrame =
    semDedupCorpus(s, doubledCorpus(s, dir)._1, k, minCos)

  /** The SemDeDup core over an explicit `(vec_id, v)` corpus — exposed so
    * specs can feed SCALED synthetic corpora and observe the derived-k
    * behavior (cluster count growing with N, within-cluster pair work
    * staying O(N^1.5)) without being limited to the fixture tables. The
    * declared query routes the doubled fixture corpus through here.
    */
  def semDedupCorpus(s: SparkSession, all: DataFrame, k: Int = 0,
      minCos: Double = 0.99): DataFrame = {
    val cos = cosine(s) _
    val kEff =
      if (k > 0) k
      else math.max(8, math.sqrt(all.count().toDouble).toInt)
    val cents = graft.operators.Ivf.centroids(
      all, "vec_id", "v", kEff, iters = 3)(cos)
    val assigned = graft.operators.Ivf.assign(
      all, cents, "vec_id", "v")(cos).localCheckpoint()
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("v").as("va"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(cos(col("va"), col("vb")), 6) >= minCos)
      .select(col("cell"), col("id_b")).distinct()
      .groupBy(col("cell")).agg(count(lit(1)).as("n_dropped"))
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"))
      .join(dropped, Seq("cell"), "left")
      .select(col("cell").as("cluster_id"), col("n_vectors"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_vectors") - coalesce(col("n_dropped"), lit(0L)))
          .as("n_kept"))
      .orderBy(col("cluster_id"))
  }

  private def simSemDedup(s: SparkSession, dir: String): DataFrame =
    semDedup(s, dir)

  private val simSemDedupSql =
    s"""WITH eb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |off AS (SELECT max(vec_id) + 1 AS o FROM eb),
       |hh AS (
       |  SELECT vec_id,
       |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
       |      AS BIGINT) AS h1,
       |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 17, 14))
       |      AS BIGINT) AS h2
       |  FROM eb),
       |p AS (
       |  SELECT eb.vec_id, i,
       |    v[i + 1] * (1.0 + (hh.h1 + i * hh.h2) % 1000 / 1000000.0) AS x
       |  FROM eb JOIN hh USING (vec_id) CROSS JOIN range(0, 64) AS t(i)),
       |vp AS (SELECT vec_id, list(x ORDER BY i) AS v2 FROM p GROUP BY vec_id),
       |e AS (
       |  SELECT vec_id, v FROM eb
       |  UNION ALL
       |  SELECT vec_id + (SELECT o FROM off), v2 FROM vp),
       |${duckCentroids(
            "(SELECT greatest(8, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM e)",
            iters = 3)},
       |${duckAssign("af", "s3")},
       |drops AS (
       |  SELECT cell, count(DISTINCT id_b) AS n_dropped FROM (
       |    SELECT a.cell, b.vec_id AS id_b
       |    FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |    WHERE round(${duckCos("a.v", "b.v")}, 6) >= 0.99)
       |  GROUP BY cell),
       |sizes AS (SELECT cell, count(*) AS n_vectors FROM af GROUP BY cell)
       |SELECT s.cell AS cluster_id, s.n_vectors,
       |  coalesce(d.n_dropped, 0) AS n_dropped,
       |  s.n_vectors - coalesce(d.n_dropped, 0) AS n_kept
       |FROM sizes s LEFT JOIN drops d USING (cell)
       |ORDER BY cluster_id""".stripMargin

  // ---------------------------------------------------------------------
  // Distributed PCA (top principal component) via power iteration — the
  // linear-dimensionality complement of the random projection tier: RP
  // is data-independent, PCA is the data-ADAPTED projection a pipeline
  // fits once per corpus. The production shape at 100 TB: the Gram/
  // covariance accumulation is the distributed pass (one map-side
  // partial-aggregated sweep over a fixed 64×64 = 4096-cell key space —
  // each row explodes its own outer product, no self-join), and the
  // 64×64 eigenproblem is solved on the driver (the same tiny-problem
  // contract as Components' union-find guard). Every step is INTEGER:
  // coordinates quantize to micro-units, the centered matrix is the
  // exact integer N·G − S·Sᵀ (eigenvectors unchanged by the N scaling),
  // a fixed down-shift bounds products in long range, and each of the 6
  // power iterations renormalizes by max-|component| through a 128-bit
  // truncating division — so partial-aggregation order cannot move a
  // bit and the DuckDB oracle replays all iterations exactly (HUGEINT
  // `//` truncates toward zero, matching Scala's BigInt `/`). Sign is
  // fixed deterministically (first max-magnitude component positive).
  // Like sim_topics' three pinned Lloyd rounds, the contract is the
  // deterministic SCHEDULE (6 rounds from the all-ones start), not full
  // convergence — on a spectrally flat corpus the two differ, on a
  // corpus with a genuine dominant direction they coincide; the integer
  // iteration tracking its real-valued replica to |cos| > 0.999 is
  // asserted in ScaleOpsSpec.
  private def simPcaPower(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val e = embDouble(s, dir)
      .select(col("vec_id"),
        expr("transform(v, x -> CAST(round(x * 1000000) AS BIGINT))")
          .as("q"))
    val n = e.count()
    val sums = e.select(explode(expr(
        "transform(sequence(0, 63), j -> struct(j AS j, q[j] AS qv))"))
        .as("s"))
      .groupBy(col("s.j").as("j")).agg(sum(col("s.qv")).as("sj"))
      .collect().map(r => r.getAs[Int]("j") -> r.getAs[Long]("sj")).toMap
    // symmetric matrix: accumulate the upper triangle only (2080 cells
    // instead of 4096) and mirror on the driver
    val upper = e.select(explode(expr(
        "flatten(transform(sequence(0, 63), j -> transform(" +
          "sequence(j, 63), k -> struct(j AS j, k AS k, " +
          "q[j] * q[k] AS p))))")).as("g"))
      .groupBy(col("g.j").as("j"), col("g.k").as("k"))
      .agg(sum(col("g.p")).as("gjk"))
      .collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Int]("k")) ->
        r.getAs[Long]("gjk")).toMap
    val gram = (jk: (Int, Int)) =>
      upper.getOrElse(jk, upper((jk._2, jk._1)))
    // exact integer centered matrix N·G − S·Sᵀ through 128-bit arithmetic
    // (the raw products outgrow long once N is large), down-shifted into
    // product-safe long range for the iteration
    val ms = Array.tabulate(dim, dim)((j, k) =>
      ((BigInt(n) * gram((j, k)) - BigInt(sums(j)) * sums(k)) /
        1000000000L).toLong)
    var v = Array.fill(dim)(1000000L)
    for (_ <- 0 until 6) {
      val mv = Array.tabulate(dim) { j =>
        var acc = 0L
        var k = 0
        while (k < dim) { acc += ms(j)(k) * v(k); k += 1 }
        acc
      }
      val m = mv.map(math.abs).max
      v = mv.map(x => ((BigInt(x) * 1000000L) / m).toLong)
    }
    // deterministic sign: first max-|.| component positive
    val kStar = v.indices.minBy(i => (-math.abs(v(i)), i))
    if (v(kStar) < 0) v = v.map(-_)
    import s.implicits._
    v.zipWithIndex.map { case (x, i) => (i.toLong, x / 1e6) }.toSeq
      .toDF("dim", "loading")
      .orderBy(col("dim"))
  }

  private val simPcaPowerSql = {
    val pre =
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(round(x * 1000000) AS BIGINT)) AS q
        |  FROM embeddings),
        |nn AS (SELECT count(*) AS n FROM e),
        |rows_jk AS (
        |  SELECT j.j, k.k, e.q[j.j + 1] * e.q[k.k + 1] AS p,
        |    e.q[j.j + 1] AS qj, e.vec_id
        |  FROM e, range(0, 64) j(j), range(0, 64) k(k)),
        |g AS (SELECT j, k, CAST(sum(p) AS BIGINT) AS gjk
        |      FROM rows_jk GROUP BY 1, 2),
        |sv AS (SELECT j, CAST(sum(qj) AS BIGINT) AS sj
        |       FROM rows_jk WHERE k = 0 GROUP BY 1),
        |ms AS (
        |  SELECT g.j, g.k,
        |    CAST((CAST(nn.n AS HUGEINT) * g.gjk
        |      - CAST(s1.sj AS HUGEINT) * s2.sj) // 1000000000 AS BIGINT)
        |      AS val
        |  FROM g JOIN sv s1 ON s1.j = g.j JOIN sv s2 ON s2.j = g.k
        |  CROSS JOIN nn),
        |v0 AS (SELECT j, CAST(1000000 AS BIGINT) AS x
        |       FROM range(0, 64) t(j))""".stripMargin
    val rounds = (1 to 6).map { i =>
      s"""mv$i AS (
         |  SELECT ms.j, CAST(sum(ms.val * v.x) AS BIGINT) AS mv
         |  FROM ms JOIN v${i - 1} v ON ms.k = v.j GROUP BY 1),
         |mx$i AS (SELECT max(abs(mv)) AS m FROM mv$i),
         |v$i AS (
         |  SELECT j, CAST(CAST(mv AS HUGEINT) * 1000000 // m AS BIGINT)
         |    AS x
         |  FROM mv$i CROSS JOIN mx$i)""".stripMargin
    }.mkString(",\n")
    s"""$pre,
       |$rounds,
       |sgn AS (
       |  SELECT CASE WHEN (SELECT x FROM v6
       |                    ORDER BY abs(x) DESC, j LIMIT 1) < 0
       |         THEN -1 ELSE 1 END AS sg)
       |SELECT CAST(j AS BIGINT) AS dim, sg * x / 1000000.0 AS loading
       |FROM v6 CROSS JOIN sgn ORDER BY dim""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Incremental IVF index maintenance on ingest — the ANN complement of
  // DedupOps.st_incremental_neardup, and the shape a continuously-growing
  // embedding corpus needs at 100 TB: the coarse quantizer is trained ONCE
  // on a bootstrap prefix and FROZEN (the offline-codebook / online-assign
  // contract every production IVF deployment uses — retraining per batch
  // would reshuffle the whole index), then each micro-batch assigns only
  // its own vectors against the broadcast frozen centroids and appends
  // (vec_id, cell) to the committed index table. Cost per trigger is
  // O(batch × numCells) with no corpus recompute, and the final index is a
  // pure function of the corpus (assignment is per-row deterministic), so
  // trigger slicing cannot change it — that closed form IS the oracle:
  // DuckDB replays bootstrap seeding, both Lloyd rounds, and the full
  // assignment via Ivf's portable contracts.
  private val embIngestFixtures = scala.collection.mutable.Map[String, String]()

  /** 3-file id-ordered spool of the embeddings corpus, split at id-range
    * thirds (same deterministic cut rule as DedupOps.ensureIngestFixture —
    * the oracle re-derives the cut from min/max, no side channel).
    */
  def ensureEmbIngestFixture(s: SparkSession, dir: String): String =
    synchronized { embIngestFixtures.getOrElseUpdate(dir, {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-embspool-${graft.Tables.fingerprint(dir, "embeddings")}")
        .getAbsolutePath
      graft.operators.Maintenance.withCommitLock(work, timeoutMs = 600000L) {
        val ready = new java.io.File(work, "_FIXTURE_READY")
        if (!ready.exists()) {
          graft.streaming.WorkDirs.deleteRecursively(new java.io.File(work))
          val e = embDouble(s, dir).select(col("vec_id"), col("v"))
          val mm = e.agg(min(col("vec_id")), max(col("vec_id"))).first()
          val (lo, hi) = (mm.getLong(0), mm.getLong(1))
          val third = (hi - lo + 1) / 3
          val (cut1, cut2) = (lo + third, lo + 2 * third)
          val mtimeBase = (System.currentTimeMillis() / 1000) * 1000
          graft.streaming.EventTimeOrderedSpool.spoolSingleFile(
            e.filter(col("vec_id") < cut1),
            s"$work/spool/aa-0.parquet", mtimeBase)
          graft.streaming.EventTimeOrderedSpool.spoolSingleFile(
            e.filter(col("vec_id") >= cut1 && col("vec_id") < cut2),
            s"$work/spool/bb-1.parquet", mtimeBase + 2000L)
          graft.streaming.EventTimeOrderedSpool.spoolSingleFile(
            e.filter(col("vec_id") >= cut2),
            s"$work/spool/cc-2.parquet", mtimeBase + 4000L)
          java.nio.file.Files.writeString(ready.toPath, "ok\n")
        }
      }
      s"$work/spool"
    }) }

  /** Drain the spool through the incremental-index hop: per micro-batch,
    * train-once (bootstrap rows only, `vec_id < bootstrapMax`) then
    * assign-and-append. Exposed so specs can replay the spool against a
    * finished index (idempotence) and restart from a checkpoint. The
    * training set is defined by the ID FILTER, not by trigger boundaries,
    * so any prefix-respecting slicing yields the identical frozen
    * quantizer.
    */
  def incrementalIvfRun(s: SparkSession, spoolDir: String, centsPath: String,
      indexPath: String, checkpoint: String, bootstrapMax: Long,
      filesPerTrigger: Int = 1): Unit = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType,
      StructField, StructType}
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .option("latestFirst", "false")
      .parquet(spoolDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        incrementalIvfBatch(s, batch, centsPath, indexPath, bootstrapMax)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()
    q.awaitTermination()
  }

  private def incrementalIvfBatch(s: SparkSession, batch: DataFrame,
      centsPath: String, indexPath: String, bootstrapMax: Long): Unit = {
    val cents =
      if (new java.io.File(s"$centsPath/_graft_log").exists())
        graft.operators.Maintenance.readTable(s, centsPath)
      else {
        val boot = batch.filter(col("vec_id") < bootstrapMax)
          .localCheckpoint()
        val n = boot.count()
        require(n > 0, s"incremental IVF: first micro-batch holds no " +
          s"bootstrap rows (vec_id < $bootstrapMax) — spool not id-ordered?")
        val k = math.max(2, math.sqrt(n.toDouble).toInt)
        val trained = graft.operators.Ivf.centroids(
          boot, "vec_id", "v", k, iters = 2)(cosine(s) _)
        graft.operators.Maintenance.commitAppend(s, centsPath, trained)
        graft.operators.Maintenance.readTable(s, centsPath)
      }
    // replay safety: ids already indexed are dropped, so a restarted or
    // re-driven spool cannot double-insert (the dedup hops' exactly-once
    // pattern)
    val fresh =
      if (new java.io.File(s"$indexPath/_graft_log").exists())
        batch.join(graft.operators.Maintenance.readTable(s, indexPath)
          .select(col("vec_id")), Seq("vec_id"), "left_anti")
      else batch
    val assigned = graft.operators.Ivf.assign(
        fresh, cents, "vec_id", "v")(cosine(s) _)
      .select(col("vec_id"), col("cell"))
    graft.operators.Maintenance.commitAppend(s, indexPath, assigned)
    ()
  }

  private def stIncrementalIvf(s: SparkSession, dir: String): DataFrame = {
    val spool = ensureEmbIngestFixture(s, dir)
    val e = embDouble(s, dir)
    val mm = e.agg(min(col("vec_id")), max(col("vec_id"))).first()
    val cut1 = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0) + 1) / 3
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-incivf-${java.util.UUID.randomUUID()}").getAbsolutePath
    incrementalIvfRun(s, spool, s"$work/cents", s"$work/index",
      s"$work/_chk", bootstrapMax = cut1)
    graft.streaming.WorkDirs.materializeAndClean(
      graft.operators.Maintenance.readTable(s, s"$work/index")
        .orderBy(col("vec_id")), work)
  }

  private val stIncrementalIvfSql = {
    val k = "(SELECT greatest(2, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM e)"
    s"""WITH e_all AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |e AS (
       |  SELECT vec_id, v FROM e_all
       |  WHERE vec_id < (SELECT min(vec_id) + (max(vec_id) - min(vec_id) + 1)
       |                  // 3 FROM e_all)),
       |${duckCentroids(k, iters = 2)},
       |${duckAssign("wc", "s2", "e_all")}
       |SELECT vec_id, cell FROM wc ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "sim_knn_brute" -> simKnnBrute _,
    "sim_knn_ivf" -> simKnnIvf _,
    "sim_knn_pq" -> simKnnPq _,
    "sim_knn_ivfpq" -> simKnnIvfPq _,
    "sim_knn_join" -> simKnnJoin _,
    "sim_neardup_pairs" -> simNearDupPairs _,
    "sim_neardup_lsh" -> simNearDupLsh _,
    "sim_dedup_keep" -> simDedupKeep _,
    "sim_topics" -> simTopics _,
    "sim_rp_project" -> simRpProject _,
    "sim_quantize_stats" -> simQuantizeStats _,
    "sim_contamination" -> simContamination _,
    "sim_topic_sample" -> simTopicSample _,
    "sim_semdedup" -> simSemDedup _,
    "sim_pca_power" -> simPcaPower _,
    "st_incremental_ivf" -> stIncrementalIvf _
  )

  val oracle: Map[String, String] = Map(
    "sim_knn_brute" -> simKnnBruteSql,
    "sim_knn_ivf" -> simKnnIvfSql,
    "sim_knn_pq" -> simKnnPqSql,
    "sim_knn_ivfpq" -> simKnnIvfPqSql,
    "sim_knn_join" -> simKnnJoinSql,
    "sim_neardup_pairs" -> simNearDupPairsSql,
    "sim_neardup_lsh" -> simNearDupLshSql,
    "sim_dedup_keep" -> simDedupKeepSql,
    "sim_topics" -> simTopicsSql,
    "sim_rp_project" -> simRpProjectSql,
    "sim_quantize_stats" -> simQuantizeStatsSql,
    "sim_contamination" -> simContaminationSql,
    "sim_topic_sample" -> simTopicSampleSql,
    "sim_semdedup" -> simSemDedupSql,
    "sim_pca_power" -> simPcaPowerSql,
    "st_incremental_ivf" -> stIncrementalIvfSql
  )
}
