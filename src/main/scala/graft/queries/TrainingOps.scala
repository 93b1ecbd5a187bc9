package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t

/** Training-data curation over `documents` — the three manifest-producing
  * steps a pretraining pipeline runs after cleaning/dedup (beyond-reference,
  * same family as [[TextOps]]): sequence packing, deterministic stratified
  * sampling, and text normalization. All pure column expressions plus one
  * shard-partitioned window — no UDFs, no global sort — and all three are
  * DuckDB-oracled.
  */
object TrainingOps {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // Sequence packing (concat-and-cut): documents are concatenated in a
  // deterministic order and cut into fixed token-capacity training
  // sequences — each doc's bin is floor(tokens-before-it / capacity).
  // Sharding first (doc_id mod nShards) bounds every cumulative-sum window
  // to one shard, so the plan is embarrassingly parallel: at 100 TB each
  // shard's running sum is an independent partition of the window, and
  // nShards scales with the corpus. Token counts use the BPE-ish lexer
  // (letter runs, digit runs, single punctuation) from tx_tokens.
  private val packCapacity = 2048L
  private val packShards = 16L

  private def txPack(s: SparkSession, dir: String): DataFrame = {
    val tokens = regexp_count(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")
    val shardW = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), pmod(col("doc_id"), lit(packShards)).as("shard"),
        tokens.as("n_tok"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tok")).over(shardW.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        // integral floor-div, not double division: exact at any corpus size
        expr(s"cum_before div $packCapacity").as("bin_id"),
        pmod(col("cum_before"), lit(packCapacity)).as("bin_offset"))
      .orderBy(col("doc_id"))
  }

  private val txPackSql =
    s"""WITH toks AS (
       |  SELECT doc_id, doc_id % $packShards AS shard,
       |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
       |      AS n_tok
       |  FROM documents),
       |packed AS (
       |  SELECT doc_id, shard, n_tok,
       |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum_before
       |  FROM toks)
       |SELECT doc_id, shard, n_tok, cum_before // $packCapacity AS bin_id,
       |  cum_before % $packCapacity AS bin_offset
       |FROM packed ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Deterministic stratified sampling: per-language keep rates rebalance a
  // skewed corpus (downsample the dominant language, keep the rest), with
  // the keep decision a pure function of doc_id — md5's first 8 hex digits
  // mod 100 — so the sample is reproducible on any engine and any run,
  // needs no RNG state, and composes with incremental ingestion (a re-run
  // over old+new docs keeps exactly the old sample plus new picks). A
  // narrow scan + filter: pushes down, scales linearly.
  private def txSample(s: SparkSession, dir: String): DataFrame = {
    val bucket =
      pmod(conv(substring(md5(col("doc_id").cast("string").cast("binary")),
        1, 8), 16, 10).cast("long"), lit(100L))
    val rate = when(col("lang") === "en", 25L).otherwise(80L)
    t(s, dir, "documents")
      .withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  private val txSampleSql =
    """SELECT doc_id, lang, source,
      |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |    AS BIGINT) % 100 AS bucket
      |FROM documents
      |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |    AS BIGINT) % 100 < CASE WHEN lang = 'en' THEN 25 ELSE 80 END
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Text normalization — the canonical form fed to tokenizers: unify curly
  // quotes and long dashes, strip control characters, collapse whitespace,
  // trim, lowercase. Order matters (control strip before whitespace
  // collapse) and is identical in both engines. Emits the normalized text
  // itself (the deliverable), so the oracle hash checks it byte-for-byte.
  /** The normalization column expression; a FIXPOINT (applying it to its
    * own output is the identity) — asserted in ScaleOpsSpec.
    */
  def normalizeText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c,
      "[\\x{2018}\\x{2019}]", "'"),
      "[\\x{201C}\\x{201D}]", "\""),
      "[\\x{2013}\\x{2014}]|[\\p{Cntrl}]", " "),
      "\\s+", " ")))

  private def txNormalize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), normalizeText(col("text")).as("norm_text"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))
      .orderBy(col("doc_id"))

  private val txNormalizeSql =
    """SELECT doc_id,
      |  lower(trim(regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(text,
      |      '[\x{2018}\x{2019}]', '''', 'g'),
      |      '[\x{201C}\x{201D}]', '"', 'g'),
      |      '[\x{2013}\x{2014}]|[\x{00}-\x{1F}\x{7F}]', ' ', 'g'),
      |    '\s+', ' ', 'g'))) AS norm_text,
      |  length(lower(trim(regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(text,
      |      '[\x{2018}\x{2019}]', '''', 'g'),
      |      '[\x{201C}\x{201D}]', '"', 'g'),
      |      '[\x{2013}\x{2014}]|[\x{00}-\x{1F}\x{7F}]', ' ', 'g'),
      |    '\s+', ' ', 'g')))) AS n_chars_norm
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Document chunking with overlap — the retrieval/context-window step
  // that splits each doc into fixed-width character chunks whose starts
  // advance by a smaller stride (here 128/96: 25 % overlap, so no span is
  // ever cut without also appearing whole in a neighbor). Pure
  // sequence+explode+substring column work: embarrassingly parallel per
  // doc, no windows, no shuffle beyond the final presentation sort. An
  // empty/short doc still yields exactly one chunk (start 0), never zero
  // rows — downstream joins on doc_id must not silently lose docs.
  private val chunkSize = 128
  private val chunkStride = 96

  private def txChunk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(0),
          greatest(length(col("text")) - 1, lit(0)),
          lit(chunkStride))).as("chunk_start"),
        col("text"))
      .select(col("doc_id"),
        expr(s"chunk_start div $chunkStride").cast("long").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        expr(s"substring(text, chunk_start + 1, $chunkSize)")
          .as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
      .orderBy(col("doc_id"), col("chunk_id"))

  private val txChunkSql =
    s"""WITH starts AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, greatest(length(text) - 1, 0),
       |      $chunkStride)) AS gs
       |  FROM documents)
       |SELECT doc_id, gs // $chunkStride AS chunk_id,
       |  gs AS chunk_start,
       |  substring(text, gs + 1, $chunkSize) AS chunk_text,
       |  length(substring(text, gs + 1, $chunkSize)) AS chunk_len
       |FROM starts ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------------
  // Domain-mixture sampling rates — temperature-based source rebalancing
  // (the Pile/mT5-style α-scaling a pretraining mix uses so head domains
  // don't drown the tail). α = 1/2 keeps the math EXACTLY reproducible
  // across engines: keep_rate = min(1, sqrt(cap / n_tokens)) uses only
  // IEEE-exact operations (integer-exact counts, one correctly-rounded
  // division and sqrt) — no pow(), whose libm rounding varies. One
  // hash aggregate over (source), map-side partials, no windows.
  private val mixtureCapTokens = 1000.0

  private def txMixture(s: SparkSession, dir: String): DataFrame = {
    val tokens = regexp_count(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")
    t(s, dir, "documents")
      .select(col("source"), tokens.as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        least(lit(1.0), sqrt(lit(mixtureCapTokens) /
          col("n_tokens").cast("double"))).as("keep_rate"))
      .withColumn("expected_tokens",
        col("n_tokens").cast("double") * col("keep_rate"))
      .orderBy(col("source"))
  }

  private val txMixtureSql =
    s"""WITH toks AS (
       |  SELECT source,
       |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
       |      AS n_tok
       |  FROM documents),
       |agg AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |  FROM toks GROUP BY source)
       |SELECT source, n_docs, n_tokens,
       |  least(1.0, sqrt($mixtureCapTokens / CAST(n_tokens AS DOUBLE)))
       |    AS keep_rate,
       |  CAST(n_tokens AS DOUBLE)
       |    * least(1.0, sqrt($mixtureCapTokens / CAST(n_tokens AS DOUBLE)))
       |    AS expected_tokens
       |FROM agg ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // Deterministic epoch shuffle — the "shuffle the corpus before
  // training" step: every document gets a pseudorandom position that is a
  // pure FUNCTION of (seed, doc_id) — md5, like tx_sample — so the epoch
  // order is reproducible on any engine with no RNG state, a different
  // seed is a fresh permutation, and a re-run over old+new docs inserts
  // the new docs without reordering work already done. Docs are hashed
  // into shards (the training job's file-level read unit) and ordered
  // within each shard by the hash key; the only window is per shard,
  // whose count scales with the corpus — at 100 TB you raise nShards so
  // each shard stays executor-sized, and the plan is one narrow scan +
  // hash shuffle + per-shard sort, no global order anywhere.
  private val shuffleSeed = "42"
  private val shuffleShards = 16L

  private def txShuffle(s: SparkSession, dir: String): DataFrame = {
    val key = conv(substring(md5(concat(lit(shuffleSeed + ":"),
      col("doc_id").cast("string")).cast("binary")), 1, 12), 16, 10)
      .cast("long")
    val shardW = Window.partitionBy(col("shard"))
      .orderBy(col("k"), col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), key.as("k"))
      .withColumn("shard", pmod(col("k"), lit(shuffleShards)))
      .withColumn("pos", row_number().over(shardW).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))
  }

  private val txShuffleSql =
    s"""WITH keyed AS (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(md5('$shuffleSeed:' ||
      |      CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS k
      |  FROM documents)
      |SELECT doc_id, k % $shuffleShards AS shard,
      |  row_number() OVER (PARTITION BY k % $shuffleShards
      |                     ORDER BY k, doc_id) AS pos
      |FROM keyed ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Deterministic train/validation/test split — the holdout assignment a
  // training run records once and must never change afterwards: the split
  // is a pure md5 function of doc_id (engine-independent, incremental-
  // ingest-stable — new docs get assigned without moving old ones), with
  // cut points 95 / 2.5 / 2.5 on a 0..999 bucket. A narrow scan + one
  // case expression; the per-(split, lang) counts make drift visible.
  private def txSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket =
      pmod(conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long"), lit(1000L))
    val split = when(bucket < 950L, "train")
      .when(bucket < 975L, "validation").otherwise("test")
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), split.as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .orderBy(col("split"), col("lang"))
  }

  private val txSplitSql =
    """WITH assigned AS (
      |  SELECT doc_id, lang,
      |    CASE
      |      WHEN CAST(concat('0x', substr(md5('split:' ||
      |        CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < 950
      |        THEN 'train'
      |      WHEN CAST(concat('0x', substr(md5('split:' ||
      |        CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < 975
      |        THEN 'validation'
      |      ELSE 'test' END AS split
      |  FROM documents)
      |SELECT split, lang, count(*) AS n_docs, min(doc_id) AS min_doc
      |FROM assigned GROUP BY split, lang ORDER BY split, lang""".stripMargin

  val queries: Map[String, Q] = Map(
    "tx_split" -> txSplit _,
    "tx_pack" -> txPack _,
    "tx_sample" -> txSample _,
    "tx_normalize" -> txNormalize _,
    "tx_chunk" -> txChunk _,
    "tx_mixture" -> txMixture _,
    "tx_shuffle" -> txShuffle _
  )

  val oracle: Map[String, String] = Map(
    "tx_split" -> txSplitSql,
    "tx_pack" -> txPackSql,
    "tx_sample" -> txSampleSql,
    "tx_normalize" -> txNormalizeSql,
    "tx_chunk" -> txChunkSql,
    "tx_mixture" -> txMixtureSql,
    "tx_shuffle" -> txShuffleSql
  )
}
