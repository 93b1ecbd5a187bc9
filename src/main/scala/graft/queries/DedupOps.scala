package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Dedup

/** Deduplication inventory over `documents` — beyond-reference operators
  * (BASELINE.json): exact, n-gram Jaccard, MinHash+LSH, SimHash. Every
  * form is DuckDB-oracled: the LSH pipelines run on the portable
  * md5-derived hash family ([[Dedup.portableHash60]]), so the oracles
  * replay signatures, banding, and candidate generation bit-for-bit with
  * no recall assumption; invariants are additionally pinned in
  * ScaleOpsSpec.
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // Exact dedup: hash-groupBy on raw text; keep the smallest doc_id.
  private def ddExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("doc_id_kept"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("doc_id_kept"))

  private val ddExactSql =
    """SELECT md5(text) AS text_hash, min(doc_id) AS doc_id_kept,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY doc_id_kept""".stripMargin

  // ---------------------------------------------------------------------
  // Full n-gram Jaccard: word-3-gram shingles, pairs sharing shingles,
  // top-20 by similarity. The exact ground truth the LSH paths approximate.
  // Skew guard (same contract as TextOps.winnowPairs): a shingle present
  // in more than `maxDf` documents is boilerplate — joining on it yields
  // O(df²) pair rows, so one stop-word 3-gram shared by every doc makes
  // the join quadratic in the corpus. Such shingles are dropped from BOTH
  // the join and both Jaccard denominators (the similarity is computed
  // over the rare-shingle universe, consistently on the Spark and oracle
  // sides). Consequence: a duplicate cluster wider than maxDf reports no
  // pairs — mass duplication is dd_exact / dd_dedup_keep's job.
  /** Exposed with the df knob so specs can exercise the cap directly. */
  def ngramJaccardPairs(docsRaw: DataFrame, maxDf: Int = 50): DataFrame = {
    val sh = Dedup.shingles(docsRaw, "doc_id", "text", 3)
    val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("shingle"))
    // kept is consumed three times (per-doc sizes + both pair-join sides)
    // and already contains the df aggregate — materialize once, unlike the
    // plain shingle explode in ddMinhashLsh which is cheaper to recompute
    val kept = sh.join(rare, Seq("shingle")).localCheckpoint()
    val counts = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = kept.select(col("doc_id").as("id_a"), col("shingle"))
      .join(kept.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    pairs
      .join(counts.select(col("doc_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(counts.select(col("doc_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(20)
  }

  private def ddNgramJaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(t(s, dir, "documents"))

  private val ddNgramJaccardSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
      |  FROM docs WHERE len(w) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM idx),
      |rare AS (
      |  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50),
      |kept AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
      |cnt AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(inter*1.0/(ca.n + cb.n - inter), 6) AS jaccard
      |FROM pairs
      |JOIN cnt ca ON ca.doc_id = id_a
      |JOIN cnt cb ON cb.doc_id = id_b
      |ORDER BY jaccard DESC, id_a, id_b LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // Exact duplicated-SPAN detection — substring-level dedup (the
  // "Deduplicating Training Data Makes Language Models Better" exact-
  // substring pass, reduced to Spark relational form). Doc-level near-dup
  // (MinHash/SimHash above) misses the common corpus pathology of a
  // boilerplate paragraph embedded in otherwise-distinct pages; this
  // finds it: every 8-token window whose exact text appears in MORE THAN
  // ONE document marks its token range duplicated, and overlapping or
  // adjacent marked ranges merge into maximal spans per document.
  //
  // Scale shape (the part that matters at 100 TB):
  //   * cross-doc test per window is min(doc_id) != max(doc_id) — TWO
  //     longs of aggregation state per distinct shingle, map-side
  //     combinable; never a distinct-set or a count(distinct). The Zipf
  //     head costs the same two longs as a singleton shingle.
  //   * positions rejoin the duplicated-shingle set with LEFT SEMI on the
  //     aggregated (hence already-distinct) side — output is bounded by
  //     the window count, O(corpus tokens), never pairwise like a
  //     shingle self-join.
  //   * span merge is lag/running-sum windows partitioned BY DOCUMENT —
  //     state bounded by one doc's window count, embarrassingly parallel
  //     across docs. Fixed window width k makes interval ends monotone in
  //     the start, so one lag suffices (no running-max-of-end needed).
  /** Exposed with the window-size knob so specs can plant exact spans. */
  def dupSpans(docsRaw: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = split(col("text"), "\\s+")
    val win = docsRaw
      .select(col("doc_id"), words.as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
        explode(expr(s"sequence(1, size(w) - ${k - 1})")).as("i"), col("w"))
      .select(col("doc_id"), col("n_tokens"), col("i"),
        concat_ws(" ", (0 until k).map(j =>
          element_at(col("w"), col("i") + lit(j))): _*).as("shingle"))
    val dup = win.groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("shingle"))
    val hits = win.join(dup, Seq("shingle"), "left_semi")
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val runs = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = hits
      // a gap strictly wider than k tokens between consecutive window
      // starts leaves at least one uncovered token between their ranges
      .withColumn("brk",
        when(col("i") - lag(col("i"), 1).over(byPos) > k, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(runs))
    islands.groupBy(col("doc_id"), col("island"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        min(col("i")).as("s"), (max(col("i")) + lit(k - 1)).as("e"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"),
        first(col("n_tokens")).as("n_tokens"))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"),
        col("n_tokens"),
        round(col("dup_tokens") / col("n_tokens"), 6).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  private def ddDupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpans(t(s, dir, "documents"))

  private val ddDupSpansSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |win AS (
      |  SELECT doc_id, len(w) AS n_tokens,
      |    unnest(generate_series(1, len(w)-7)) AS i, w
      |  FROM docs WHERE len(w) >= 8),
      |sh AS (
      |  SELECT doc_id, n_tokens, i,
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
      |    w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS shingle
      |  FROM win),
      |dup AS (
      |  SELECT shingle FROM sh GROUP BY shingle
      |  HAVING min(doc_id) <> max(doc_id)),
      |hits AS (SELECT sh.doc_id, sh.n_tokens, sh.i FROM sh
      |         JOIN dup USING (shingle)),
      |gaps AS (
      |  SELECT doc_id, n_tokens, i,
      |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 8
      |         THEN 1 ELSE 0 END AS brk
      |  FROM hits),
      |isl AS (
      |  SELECT doc_id, n_tokens, i,
      |    sum(brk) OVER (PARTITION BY doc_id ORDER BY i
      |                   ROWS UNBOUNDED PRECEDING) AS island
      |  FROM gaps),
      |spans AS (
      |  SELECT doc_id, any_value(n_tokens) AS n_tokens, island,
      |    min(i) AS s, max(i)+7 AS e
      |  FROM isl GROUP BY doc_id, island)
      |SELECT doc_id, count(*) AS n_spans,
      |  CAST(sum(e-s+1) AS BIGINT) AS dup_tokens,
      |  any_value(n_tokens) AS n_tokens,
      |  round(sum(e-s+1)*1.0/any_value(n_tokens), 6) AS dup_frac
      |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // MinHash + LSH near-dup detection: 32 permutations, 8 bands × 4 rows;
  // candidates verified with exact Jaccard over shingles; report verified
  // pairs ≥ 0.5. Fully oracled: the md5-derived portable hash family
  // (Dedup.portableHash60/56) makes shingle hashes, signatures, band
  // buckets, and therefore the candidate SET itself bit-identical in
  // DuckDB — the oracle replays the whole LSH pipeline with no recall
  // assumption.
  private def ddMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // sh re-evaluates for the signature chain, the per-doc counts, and
    // both verify-join sides — deliberately NOT checkpointed: the shingle
    // explosion multiplies rows by ~word-count, so materializing it costs
    // more than recomputing the narrow scan+explode inside codegen
    // (measured: checkpointing made this query 20% slower at sf0.1)
    val sh = Dedup.shingles(t(s, dir, "documents"), "doc_id", "text", 3)
    val sig = Dedup.minHash(sh, "doc_id", numPerm = 32)
    val buckets = Dedup.lshBuckets(sig, "doc_id", numPerm = 32, bands = 8)
    val cand = Dedup.candidatePairs(buckets, "doc_id")
    Dedup.verifyJaccard(cand, sh, "doc_id")
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
  }

  // SimHash near-dup detection: 60-bit signatures, 15-bit band candidates,
  // hamming ≤ 8 verification. Fully oracled via the portable 60-bit hash
  // family: token hashes, bit-sums, signatures, and band buckets are
  // bit-identical in DuckDB, so the oracle replays the identical pipeline.
  private def ddSimhash(s: SparkSession, dir: String): DataFrame = {
    // checkpointed: the signature scan feeds both the overflow assertion
    // and the pair join — one tokenize+60-bit-sum pass, not two
    val sig = Dedup.simHash(t(s, dir, "documents"), "doc_id", "text")
      .localCheckpoint()
    // ORACLE CONTRACT, asserted loudly: ddSimhashSql replays the plain
    // within-bucket self-join, which matches simHashPairs only while no
    // (band,bucket) exceeds the cap (past it the operator switches to the
    // star+chain fallback, a deliberate recall trade the SQL cannot
    // mirror). An overflowing fixture must fail HERE with a named cause,
    // not downstream as an opaque hash mismatch.
    val overflow = Dedup.simHashOverflow(sig, "doc_id").count()
    require(overflow == 0L,
      s"dd_simhash: $overflow (band,bucket) buckets exceed maxBucketSize " +
        "— the plain self-join oracle no longer mirrors the capped " +
        "operator; raise the cap for this corpus or re-derive the oracle")
    Dedup.simHashPairs(sig, "doc_id", maxHamming = 8)
      .orderBy(col("hamming"), col("id_a"), col("id_b"))
  }

  private val ddMinhashLshSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
      |  FROM docs WHERE len(w) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM idx),
      |h AS (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT) AS h1,
      |    CAST(concat('0x', substr(md5(shingle), 17, 14)) AS BIGINT) AS h2
      |  FROM sh),
      |sig AS (
      |  SELECT doc_id, i, min(h1 + i * h2) AS mh
      |  FROM h CROSS JOIN range(0, 32) AS t(i)
      |  GROUP BY doc_id, i),
      |band AS (
      |  SELECT doc_id, i // 4 AS band,
      |    CAST(concat('0x', substr(
      |      md5(string_agg(mh::VARCHAR, ',' ORDER BY i)), 1, 15)) AS BIGINT)
      |      AS bucket
      |  FROM sig GROUP BY doc_id, i // 4),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM band a JOIN band b
      |    ON a.band = b.band AND a.bucket = b.bucket
      |   AND a.doc_id < b.doc_id),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |ix AS (
      |  SELECT id_a, id_b, count(*) AS inter
      |  FROM cand c
      |  JOIN sh sa ON sa.doc_id = c.id_a
      |  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(inter*1.0/(ca.n + cb.n - inter), 6) AS jaccard
      |FROM ix
      |JOIN cnt ca ON ca.doc_id = id_a
      |JOIN cnt cb ON cb.doc_id = id_b
      |WHERE inter*1.0/(ca.n + cb.n - inter) >= 0.5
      |ORDER BY jaccard DESC, id_a, id_b""".stripMargin

  // NOTE: this oracle replays the PLAIN within-bucket self-join; the Spark
  // side switches oversized (band,bucket) groups (> 2^16 members) to the
  // O(n) star+chain fallback, which would silently diverge from the oracle.
  // ScaleOpsSpec therefore asserts simHashOverflow is EMPTY at the oracle
  // scales, so a cap-triggering corpus fails loudly as an overflow
  // assertion, not as an opaque hash mismatch.
  private val ddSimhashSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
      |  FROM documents),
      |h AS (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS h
      |  FROM tok WHERE len(token) > 0),
      |bits AS (
      |  SELECT doc_id, j,
      |    sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM h CROSS JOIN range(0, 60) AS t(j)
      |  GROUP BY doc_id, j),
      |sig AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
      |      AS simhash
      |  FROM bits GROUP BY doc_id),
      |bb AS (
      |  SELECT doc_id, simhash, k, (simhash >> (15*k)) & 32767 AS bucket
      |  FROM sig CROSS JOIN range(0, 4) AS t(k)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sig_a,
      |                  b.doc_id AS id_b, b.simhash AS sig_b
      |  FROM bb a JOIN bb b
      |    ON a.k = b.k AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b,
      |  CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 8
      |ORDER BY hamming, id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // End-to-end near-dup removal: MinHash-LSH candidates → exact-Jaccard
  // verify (≥ 0.9) → connected components → keep the min-id doc of every
  // cluster. The full pipeline a training-data run executes: the output
  // IS the deduplicated corpus manifest (one row per kept doc with its
  // cluster size). Oracled by the CLOSED FORM: because every candidate is
  // verified with exact Jaccard, the output equals min-label connected
  // components over the exact ≥ 0.9 pair graph — computable in DuckDB via
  // a recursive transitive closure — PROVIDED the LSH bands recall every
  // qualifying pair (32 perms / 8×4 bands: per-pair miss ≈ 2e-4 at 0.9;
  // a hash-mismatch here would mean recall actually dropped a pair).
  // Cluster invariants also in ScaleOpsSpec.
  /** Threshold exposed so specs can vary the near-dup bar. */
  def dedupKeep(s: SparkSession, dir: String,
      minJaccard: Double = 0.9): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"))
    // recomputed per consumer on purpose — see ddMinhashLsh: the exploded
    // shingle set is bigger than the work to rebuild it
    val sh = Dedup.shingles(t(s, dir, "documents"), "doc_id", "text", 3)
    val sig = Dedup.minHash(sh, "doc_id", numPerm = 32)
    val buckets = Dedup.lshBuckets(sig, "doc_id", numPerm = 32, bands = 8)
    val cand = Dedup.candidatePairs(buckets, "doc_id")
    val dupPairs = Dedup.verifyJaccard(cand, sh, "doc_id")
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"))
    // dup clusters are near-cliques (tiny diameter) — converge or fail
    // loudly rather than silently splitting a cluster
    val comp = graft.operators.Components.resolve(dupPairs,
      requireConvergence = true)
    // docs outside every pair are their own cluster
    val assigned = docs
      .join(comp.select(col("id").as("doc_id"), col("comp")), Seq("doc_id"),
        "left")
      .withColumn("canonical", coalesce(col("comp"), col("doc_id")))
    assigned.groupBy(col("canonical").as("doc_id_kept"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("doc_id_kept"))
  }

  private def ddDedupKeep(s: SparkSession, dir: String): DataFrame =
    dedupKeep(s, dir)

  private val ddDedupKeepSql =
    """WITH RECURSIVE docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
      |  FROM docs WHERE len(w) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM idx),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b
      |  FROM inter JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
      |  WHERE ix*1.0/(ca.n + cb.n - ix) >= 0.9),
      |edges AS (
      |  SELECT id_a AS u, id_b AS v FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT u AS src, v AS dst FROM edges
      |  UNION
      |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
      |canon AS (
      |  SELECT d.doc_id,
      |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS canonical
      |  FROM (SELECT doc_id FROM documents) d
      |  LEFT JOIN reach r ON r.src = d.doc_id
      |  GROUP BY d.doc_id)
      |SELECT canonical AS doc_id_kept, count(*) AS n_members
      |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Incremental dedup on ingest — the streaming complement of dd_exact,
  // and the shape a 100 TB corpus actually ingests in: document batches
  // arrive continuously; each batch is deduplicated IN-BATCH, then
  // anti-joined against the accumulated fingerprint index (a table on the
  // engine's versioned commit protocol), and only novel documents are
  // committed. Cost per batch is O(batch + matching index partitions) —
  // never a recompute over the full corpus, which is what makes exact
  // dedup sustainable under continuous ingestion.
  //
  // The anti-join against the index makes every batch IDEMPOTENT: a
  // foreachBatch replay after a crash (classic at-least-once hazard)
  // re-reads an index that already contains the batch's rows, finds
  // nothing novel, and commits nothing — exactly-once lands on the table
  // without a transactional sink (asserted by replaying the whole spool
  // against the finished table in StreamingSpec).

  private val ingestFixtures = scala.collection.mutable.Map[String, String]()

  /** Build-once 3-file ingest spool of `documents` split by doc_id range,
    * replayed in ascending order (names + stamped mtimes both order it) —
    * so keep-first semantics equal keep-min-doc_id and the result is
    * DuckDB-oracle-able.
    */
  def ensureIngestFixture(s: SparkSession, dir: String): String =
    synchronized { ingestFixtures.getOrElseUpdate(dir, {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-ingest-fixture-${graft.Tables.fingerprint(dir, "documents")}")
        .getAbsolutePath
      graft.operators.Maintenance.withCommitLock(work, timeoutMs = 600000L) {
        val ready = new java.io.File(work, "_FIXTURE_READY")
        if (!ready.exists()) {
          graft.streaming.WorkDirs.deleteRecursively(new java.io.File(work))
          val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
          val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).first()
          val (lo, hi) = (mm.getLong(0), mm.getLong(1))
          val third = (hi - lo + 1) / 3
          val (cut1, cut2) = (lo + third, lo + 2 * third)
          val mtimeBase = (System.currentTimeMillis() / 1000) * 1000
          graft.streaming.EventTimeOrderedSpool.spoolSingleFile(
            docs.filter(col("doc_id") < cut1),
            s"$work/spool/aa-0.parquet", mtimeBase)
          graft.streaming.EventTimeOrderedSpool.spoolSingleFile(
            docs.filter(col("doc_id") >= cut1 && col("doc_id") < cut2),
            s"$work/spool/bb-1.parquet", mtimeBase + 2000L)
          graft.streaming.EventTimeOrderedSpool.spoolSingleFile(
            docs.filter(col("doc_id") >= cut2),
            s"$work/spool/cc-2.parquet", mtimeBase + 4000L)
          java.nio.file.Files.writeString(ready.toPath, "ok\n")
        }
      }
      s"$work/spool"
    }) }

  /** Drain the spool through the incremental-dedup hop once: one
    * micro-batch per spool file, each committing only its novel documents
    * to `curated`. Exposed so specs can re-drive the same spool against a
    * finished table (replay-idempotence) and restart from a checkpoint.
    */
  def incrementalDedupRun(s: SparkSession, spoolDir: String,
      curated: String, checkpoint: String): Unit = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(spoolDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fp = batch
          .select(col("doc_id"), md5(col("text").cast("binary")).as("text_hash"))
          .groupBy(col("text_hash"))
          .agg(min(col("doc_id")).as("doc_id_kept"))
        val novel =
          if (new java.io.File(s"$curated/_graft_log").exists())
            fp.join(graft.operators.Maintenance.readTable(s, curated)
              .select(col("text_hash")), Seq("text_hash"), "left_anti")
          else fp
        graft.operators.Maintenance.commitAppend(s, curated,
          novel.select(col("doc_id_kept"), col("text_hash")))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()
    q.awaitTermination()
  }

  // ---------------------------------------------------------------------
  // Incremental NEAR-dup on ingest — the LSH complement of
  // st_incremental_dedup, and the shape continuous corpus ingestion needs
  // for fuzzy duplicates: each micro-batch (1) collapses its own near-dup
  // clusters via verified in-batch LSH pairs + connected components
  // (batch semantics inside the batch), then (2) probes the surviving
  // representatives against the ACCUMULATED BAND INDEX (a committed
  // table of every kept doc's LSH band buckets), exact-Jaccard-verifies
  // only the bucket-collision candidates against the kept docs' stored
  // text, and (3) commits the still-novel docs plus their bands. Cost per
  // batch is O(batch + matching band buckets) — never a corpus
  // recompute — and the band index is an equi-join probe at any scale.
  // Greedy-by-arrival semantics: with the spool ordered by doc_id, kept =
  // min-id per near-dup cluster, which on a chain-free corpus equals the
  // batch dd_dedup_keep manifest — that closed form IS the oracle, so a
  // recall miss or index bug fails the hash compare.
  /** Exposed so specs can replay the spool (idempotence) and vary the
    * threshold.
    */
  def incrementalNearDupRun(s: SparkSession, spoolDir: String,
      curated: String, bandsPath: String, checkpoint: String,
      minJaccard: Double = 0.9, filesPerTrigger: Int = 1): Unit = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .option("latestFirst", "false")
      .parquet(spoolDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        incrementalNearDupBatch(s, batch, curated, bandsPath, minJaccard)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()
    q.awaitTermination()
  }

  private def incrementalNearDupBatch(s: SparkSession, batch: DataFrame,
      curated: String, bandsPath: String, minJaccard: Double): Unit = {
    val docs = batch.select(col("doc_id"), col("text"))
    val sh = Dedup.shingles(docs, "doc_id", "text", 3).localCheckpoint()
    val sig = Dedup.minHash(sh, "doc_id", numPerm = 32)
    val bands = Dedup.lshBuckets(sig, "doc_id", numPerm = 32, bands = 8)
      .localCheckpoint()
    // (1) in-batch collapse: verified pairs → CC → min-id reps
    val inPairs = Dedup.verifyJaccard(
        Dedup.candidatePairs(bands, "doc_id"), sh, "doc_id")
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"))
    val comp = graft.operators.Components.resolve(inPairs)
    val reps = docs
      .join(comp.select(col("id").as("doc_id"), col("comp")),
        Seq("doc_id"), "left")
      .filter(col("comp").isNull || col("comp") === col("doc_id"))
      .select(col("doc_id"), col("text"))
    // (2) probe the band index; verify collisions against kept text.
    // Replay safety first: an id already in the curated table is
    // dropped by the id anti-join (the exact-dedup hop's exactly-once
    // pattern), so the verify universe below never holds the same
    // doc_id on both sides — identity pairs would double its shingle
    // rows and zero the Jaccard denominator
    val novel =
      if (!new java.io.File(s"$bandsPath/_graft_log").exists()) reps
      else {
        val keptTable = graft.operators.Maintenance.readTable(s, curated)
        val repsNew = reps.join(keptTable.select(col("doc_id")),
          Seq("doc_id"), "left_anti")
        val idx = graft.operators.Maintenance.readTable(s, bandsPath)
        val cand = bands
          .join(repsNew.select(col("doc_id")), Seq("doc_id"))
          .join(idx.select(col("band"), col("bucket"),
            col("doc_id").as("id_a")), Seq("band", "bucket"))
          .select(col("id_a"), col("doc_id").as("id_b"))
          .distinct()
        val shNew = sh.join(repsNew.select(col("doc_id")), Seq("doc_id"))
        val keptSh = Dedup.shingles(
          keptTable
            .join(cand.select(col("id_a").as("doc_id")).distinct(),
              Seq("doc_id")),
          "doc_id", "text", 3)
        val matched = Dedup.verifyJaccard(
            cand, shNew.unionByName(keptSh), "doc_id")
          .filter(col("jaccard") >= minJaccard)
          .select(col("id_b").as("doc_id")).distinct()
        repsNew.join(matched, Seq("doc_id"), "left_anti")
      }
    val novelCk = novel.localCheckpoint()
    graft.operators.Maintenance.commitAppend(s, curated, novelCk)
    graft.operators.Maintenance.commitAppend(s, bandsPath,
      bands.join(novelCk.select(col("doc_id")), Seq("doc_id")))
    ()
  }

  private def stIncrementalNearDup(s: SparkSession, dir: String): DataFrame = {
    val spool = ensureIngestFixture(s, dir)
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-neardup-${java.util.UUID.randomUUID()}").getAbsolutePath
    // two files per trigger: the 3-file spool drains in TWO micro-batches
    // — trigger 1 exercises the in-batch collapse, trigger 2 the
    // cross-batch index probe — so both code paths stay on the measured
    // query while one whole trigger's fixed stage-latency chain (~4 s of
    // sequential small stages at sf0.1; the phases were profiled, not
    // guessed) drops out. The closed-form oracle is trigger-count
    // invariant (greedy min-id over an id-ordered spool), and
    // StreamingSpec drives the same pipeline 1-file-per-trigger for the
    // strict-incremental replay/restart contracts.
    //
    // FLOOR NOTE (r13 audit, clean in-sweep records after the bench
    // state-store fix): 5.7 s at sf0.1. No stateful operators are
    // involved (pure foreachBatch), so there is no state-store snapshot
    // cadence to tune; checkpoint writes are AvailableNow offset/commit
    // files (milliseconds). The cost decomposes as 2 contract-mandated
    // triggers x one full LSH pipeline each (shingle -> minhash -> band
    // -> candidate -> verify -> iterative components, the same chain
    // the batch twin dd_minhash_lsh records 3.7 s for ONCE) plus two
    // protocol commits per trigger. Going faster means fewer triggers
    // (violates the cross-batch-probe contract) or a cheaper commit
    // protocol (shared with 20+ green queries) — the floor is
    // trigger-count x irreducible pipeline cost, not harness overhead.
    incrementalNearDupRun(s, spool, s"$work/curated", s"$work/bands",
      s"$work/_chk", filesPerTrigger = 2)
    graft.streaming.WorkDirs.materializeAndClean(
      graft.operators.Maintenance.readTable(s, s"$work/curated")
        .select(col("doc_id").as("doc_id_kept"))
        .orderBy(col("doc_id_kept")), work)
  }

  private val stIncrementalNearDupSql =
    """WITH RECURSIVE docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
      |  FROM docs WHERE len(w) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM idx),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b
      |  FROM inter JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
      |  WHERE ix*1.0/(ca.n + cb.n - ix) >= 0.9),
      |edges AS (
      |  SELECT id_a AS u, id_b AS v FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT u AS src, v AS dst FROM edges
      |  UNION
      |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
      |canon AS (
      |  SELECT d.doc_id,
      |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS canonical
      |  FROM (SELECT doc_id FROM documents) d
      |  LEFT JOIN reach r ON r.src = d.doc_id
      |  GROUP BY d.doc_id)
      |SELECT DISTINCT canonical AS doc_id_kept
      |FROM canon ORDER BY doc_id_kept""".stripMargin

  private def stIncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val spool = ensureIngestFixture(s, dir)
    // per-run scratch: the curated table + checkpoint; the spool is shared
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-ingest-${java.util.UUID.randomUUID()}").getAbsolutePath
    incrementalDedupRun(s, spool, s"$work/curated", s"$work/_chk")
    graft.streaming.WorkDirs.materializeAndClean(
      graft.operators.Maintenance.readTable(s, s"$work/curated")
        .select(col("doc_id_kept"), col("text_hash"))
        .orderBy(col("doc_id_kept")), work)
  }

  private val stIncrementalDedupSql =
    """SELECT min(doc_id) AS doc_id_kept, md5(text) AS text_hash
      |FROM documents GROUP BY md5(text) ORDER BY doc_id_kept""".stripMargin

  // ---------------------------------------------------------------------
  // URL canonicalization dedup — the cheapest, highest-yield dedup pass a
  // crawl pipeline runs BEFORE any content hashing: the same page is
  // fetched under scheme/case/port/dot-segment/query-order/tracking-param
  // variants, and canonicalizing the URL collapses them without reading a
  // byte of content. The corpus carries no URL column, so each doc_id
  // deterministically takes one of four raw variants (mixed case +
  // explicit default port + /../ segment + utm params; trailing slash +
  // utm; plain http; fragment) of a shared target URL; variants 0 and 1
  // canonicalize identically — the injected duplicates the pass must
  // find. All pure string expressions (regexp + split/sort/join — no
  // UDF); the oracle is the CLOSED FORM of the fixture (the s12/s13
  // pattern): it derives each id's canonical URL and keeper arithmetic
  // directly, so any normalization slip fails the value compare. Scale
  // shape: per-row canonicalization inside codegen, one groupBy(canon).
  private def ddUrlDedup(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 4).as("v"),
        (col("doc_id") / 4).cast("long").as("k"))
      .withColumn("url", expr(
        """CASE CAST(v AS INT)
          |  WHEN 0 THEN concat('HTTPS://WWW.Example.COM:443/a/b/../c/doc-',
          |                     k, '?utm_source=feed&x=1')
          |  WHEN 1 THEN concat('https://www.example.com/a/c/doc-', k,
          |                     '?x=1')
          |  WHEN 2 THEN concat('http://Example.com:80/a/c/doc-', k,
          |                     '/?x=1&utm_campaign=q')
          |  ELSE concat('https://example.com/a/c/doc-', k, '#section')
          |END""".stripMargin))
    val canon = raw
      .withColumn("scheme",
        lower(regexp_extract(col("url"), "^([a-zA-Z]+)://", 1)))
      .withColumn("hostport",
        lower(regexp_extract(col("url"), "^[a-zA-Z]+://([^/?#]+)", 1)))
      .withColumn("host", regexp_replace(
        when(col("scheme") === "https",
          regexp_replace(col("hostport"), ":443$", ""))
          .otherwise(regexp_replace(col("hostport"), ":80$", "")),
        "^www\\.", ""))
      .withColumn("path", regexp_replace(
        regexp_replace(
          regexp_extract(col("url"), "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1),
          "[^/]+/\\.\\./", ""),
        "(.)/$", "$1"))
      .withColumn("q", regexp_extract(col("url"), "\\?([^#]*)", 1))
      .withColumn("q2", array_join(array_sort(
        filter(split(col("q"), "&"),
          p => !p.startsWith("utm_") && p =!= lit(""))), "&"))
      .withColumn("canonical", concat(
        col("scheme"), lit("://"), col("host"), col("path"),
        when(col("q2") =!= "", concat(lit("?"), col("q2")))
          .otherwise(lit(""))))
    canon.groupBy(col("canonical"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_variants"))
      .orderBy(col("keeper_id"))
  }

  // Closed form of the fixture: variants 0/1 of each k collapse to the
  // same canonical (https, stripped www/port/../utm, sorted residual
  // query), variants 2/3 stay singletons. Keeper = min doc_id.
  private val ddUrlDedupSql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 4 AS v, doc_id // 4 AS k FROM documents),
      |canon AS (
      |  SELECT doc_id,
      |    CASE v
      |      WHEN 2 THEN 'http://example.com/a/c/doc-' || k || '?x=1'
      |      WHEN 3 THEN 'https://example.com/a/c/doc-' || k
      |      ELSE 'https://example.com/a/c/doc-' || k || '?x=1'
      |    END AS canonical
      |  FROM d)
      |SELECT canonical, min(doc_id) AS keeper_id, count(*) AS n_variants
      |FROM canon GROUP BY canonical ORDER BY keeper_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "dd_exact" -> ddExact _,
    "dd_ngram_jaccard" -> ddNgramJaccard _,
    "dd_dup_spans" -> ddDupSpans _,
    "dd_minhash_lsh" -> ddMinhashLsh _,
    "dd_simhash" -> ddSimhash _,
    "dd_dedup_keep" -> ddDedupKeep _,
    "dd_url_dedup" -> ddUrlDedup _,
    "st_incremental_dedup" -> stIncrementalDedup _,
    "st_incremental_neardup" -> stIncrementalNearDup _
  )

  val oracle: Map[String, String] = Map(
    "dd_exact" -> ddExactSql,
    "dd_ngram_jaccard" -> ddNgramJaccardSql,
    "dd_dup_spans" -> ddDupSpansSql,
    "dd_minhash_lsh" -> ddMinhashLshSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_dedup_keep" -> ddDedupKeepSql,
    "dd_url_dedup" -> ddUrlDedupSql,
    "st_incremental_dedup" -> stIncrementalDedupSql,
    "st_incremental_neardup" -> stIncrementalNearDupSql
  )
}
