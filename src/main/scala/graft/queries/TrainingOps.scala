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
  val queries: Map[String, Q] = Map(
    "tx_pack" -> txPack _,
    "tx_sample" -> txSample _,
    "tx_normalize" -> txNormalize _
  )

  val oracle: Map[String, String] = Map(
    "tx_pack" -> txPackSql,
    "tx_sample" -> txSampleSql,
    "tx_normalize" -> txNormalizeSql
  )
}
