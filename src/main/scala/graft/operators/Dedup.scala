package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication building blocks for training-data pipelines —
  * beyond the reference's own surface (BASELINE.json north star): exact
  * dedup, word-shingling, MinHash signatures + LSH banding, SimHash.
  *
  * Scale design: everything is expressed as narrow column expressions plus
  * shuffles keyed on content hashes — band buckets and shingle hashes
  * distribute uniformly, so the candidate-pair join shards evenly across
  * a cluster. The only quadratic step (pair verification) runs on LSH
  * candidates, never on the full corpus.
  */
object Dedup {

  /** Distinct word n-gram shingles per document. */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val words = split(col(textCol), "\\s+")
    docs.select(col(idCol), words.as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol),
        explode(expr(s"sequence(1, size(w) - ${n - 1})")).as("i"),
        col("w"))
      .select(col(idCol),
        concat_ws(" ", (0 until n).map(k => element_at(col("w"),
          col("i") + lit(k))): _*).as("shingle"))
      .distinct()
  }

  /** Portable 60-bit content hash: the integer value of md5's first 15 hex
    * chars — bit-identical in ANY engine with md5 (DuckDB:
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`), which is what makes
    * the MinHash / SimHash / winnowing query surfaces fully oracle-able
    * cross-engine. 60 bits (not 64) keeps every derived value of the
    * `h1 + i*h2` family below inside a signed 64-bit long under ANSI
    * arithmetic — no overflow, no unsigned-wrap divergence.
    */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Independent 56-bit increment from hex chars 17..30 of the SAME md5
    * (the codegen CSE reuses the digest): the step of the
    * `perm_i = h1 + i*h2` universal family. 56 bits bounds
    * `31 * h2 + h1 < 2^62`.
    */
  def portableHash56(c: Column): Column =
    conv(substring(md5(c), 17, 14), 16, 10).cast("long")

  /** MinHash signature per doc: "permutation" i is the universal family
    * `h1(shingle) + i * h2(shingle)` over the portable md5-derived hashes —
    * ONE digest per shingle plus fused multiply-adds (cheaper than one
    * full-string hash per permutation), deterministic across runs,
    * partitionings, AND engines, so the LSH pipeline has a closed-form
    * DuckDB oracle with no recall assumption.
    */
  def minHash(sh: DataFrame, idCol: String, numPerm: Int = 32): DataFrame = {
    val withH = sh
      // one digest column, two integer views — independent of whether
      // codegen CSE dedups the md5 call
      .withColumn("_d", md5(col("shingle")))
      .withColumn("h1", conv(substring(col("_d"), 1, 15), 16, 10)
        .cast("long"))
      .withColumn("h2", conv(substring(col("_d"), 17, 14), 16, 10)
        .cast("long"))
    val perms: Seq[Column] = (0 until numPerm).map { i =>
      min(col("h1") + lit(i.toLong) * col("h2")).as(s"mh_$i")
    }
    withH.groupBy(col(idCol)).agg(perms.head, perms.tail: _*)
  }

  /** LSH banding: split the signature into `bands` bands of
    * numPerm/bands rows each; bucket key = hash of the band slice.
    * Returns (id, band, bucket).
    */
  def lshBuckets(sig: DataFrame, idCol: String, numPerm: Int = 32,
      bands: Int = 8): DataFrame = {
    val rows = numPerm / bands
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => col(s"mh_${b * rows + r}"))
      // fixed-width portable bucket key: the 60-bit hash of the
      // comma-joined slice (decimal renderings agree across engines) —
      // an 8-byte shuffle/join key at any scale, reproducible in the
      // oracle
      struct(lit(b).as("band"),
        portableHash60(concat_ws(",", slice: _*)).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate pairs = distinct doc pairs sharing any band bucket. */
  def candidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact Jaccard for a given pair set, computed only over candidates
    * (shingle inner join + per-doc counts; the anti-quadratic path).
    */
  def verifyJaccard(pairs: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    val counts = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col(idCol).as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(counts.select(col(idCol).as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter") / (col("n_a") + col("n_b") - col("inter")))
  }

  /** 60-bit SimHash over word hashes (unit weights): bit j of the signature
    * is the sign of Σ_tokens (bit_j(portableHash60(token)) ? +1 : -1).
    * Expressed as 60 conditional sums — wide but fully codegen'd, no UDF.
    * 60 bits (md5-derived) rather than 64 keeps the whole pipeline
    * reproducible in the DuckDB oracle.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(col(textCol), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("h", portableHash60(col("token")))
    val bitSums = (0 until 60).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b_$j")
    }
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 60).map { j =>
      when(col(s"b_$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup candidates: band the 60-bit signature into four
    * 15-bit chunks (any chunk equal → candidate; catches all pairs with
    * hamming distance ≤ 3 exactly, more probabilistically), verify with
    * bit_count(xor) ≤ maxHamming.
    *
    * Scale hardening: 15-bit bands give at most 32,768 buckets per band,
    * so at billions of docs the within-bucket self-join goes quadratic.
    * Buckets above `maxBucketSize` switch to O(size) pairing instead of
    * O(size²): a STAR graph (every member vs the bucket's min-id
    * representative) UNION a CHAIN over members sorted by signature
    * (each member vs its successor). The chain is what keeps groups of
    * mutually-similar members connected even when they are far from the
    * representative — identical signatures sort adjacent, so an
    * identical-sig run always survives the hamming filter as a connected
    * path. (Similar-but-not-identical members in a capped bucket can still
    * lose pairs — the inherent cap trade.) Oversized buckets are
    * observable via [[simHashOverflow]]; log it before a big run.
    */
  def simHashPairs(sig: DataFrame, idCol: String, maxHamming: Int = 8,
      maxBucketSize: Int = 1 << 16): DataFrame = {
    val buckets = simHashBuckets(sig, idCol)
    val sized = buckets.join(
      buckets.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("bsz")),
      Seq("band", "bucket"))
    val small = sized.filter(col("bsz") <= maxBucketSize)
    val allPairs = small
      .select(col("band"), col("bucket"),
        col(idCol).as("id_a"), col("simhash").as("sig_a"))
      .join(small.select(col("band"), col("bucket"),
        col(idCol).as("id_b"), col("simhash").as("sig_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("sig_a"), col("id_b"), col("sig_b"))
    val big = sized.filter(col("bsz") > maxBucketSize)
    val reps = big.groupBy(col("band"), col("bucket"))
      .agg(min(col(idCol)).as("id_a"),
        min_by(col("simhash"), col(idCol)).as("sig_a"))
    val starPairs = big.join(reps, Seq("band", "bucket"))
      .filter(col(idCol) > col("id_a"))
      .select(col("id_a"), col("sig_a"),
        col(idCol).as("id_b"), col("simhash").as("sig_b"))
    val bucketOrder = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket"))
      .orderBy(col("simhash"), col(idCol))
    val chainPairs = big
      .withColumn("nid", lead(col(idCol), 1).over(bucketOrder))
      .withColumn("nsig", lead(col("simhash"), 1).over(bucketOrder))
      .filter(col("nid").isNotNull)
      .select(
        least(col(idCol), col("nid")).as("id_a"),
        when(col(idCol) < col("nid"), col("simhash")).otherwise(col("nsig"))
          .as("sig_a"),
        greatest(col(idCol), col("nid")).as("id_b"),
        when(col(idCol) < col("nid"), col("nsig")).otherwise(col("simhash"))
          .as("sig_b"))
    allPairs.unionByName(starPairs).unionByName(chainPairs)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** (band, bucket, size) of buckets past the cap — the logged-overflow
    * companion to [[simHashPairs]]'s star fallback.
    */
  def simHashOverflow(sig: DataFrame, idCol: String,
      maxBucketSize: Int = 1 << 16): DataFrame =
    simHashBuckets(sig, idCol)
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucketSize)

  private def simHashBuckets(sig: DataFrame, idCol: String): DataFrame = {
    // 4 bands x 15 bits over the 60-bit signature: pigeonhole guarantees
    // every pair at hamming <= 3 shares a band; the oracle replicates the
    // banding bit-for-bit, so recall needs no probabilistic argument
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("band"),
        shiftright(col("simhash"), c * 15).bitwiseAND(0x7FFFL).as("bucket")))
    sig.select(col(idCol), col("simhash"),
      explode(array(chunks: _*)).as("bb"))
      .select(col(idCol), col("simhash"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }
}
