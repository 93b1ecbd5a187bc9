package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Text analysis for training-data pipelines over the `documents` table —
  * beyond-reference operators (BASELINE.json north star): language ID
  * (marker-word heuristic), quality scoring, token counting, document
  * fingerprinting. All pure column expressions (codegen'd, no UDFs), all
  * DuckDB-oracled.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private def reCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern))

  // ---------------------------------------------------------------------
  // Document fingerprint: md5 of the whitespace-normalized lowercased text
  // — the cheap exact-near-exact key (collapses case/whitespace variants).
  private def txFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
          .cast("binary")).as("fingerprint"),
        length(col("text")).cast("long").as("n_chars_text"))
      .orderBy(col("doc_id"))

  private val txFingerprintSql =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  length(text) AS n_chars_text
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Quality scoring: length / word / punctuation / stopword features and a
  // deterministic composite score (no transcendentals → exact both sides).
  private def txQuality(s: SparkSession, dir: String): DataFrame = {
    val words = reCount(col("text"), "\\S+")
    val stops = reCount(col("text"),
      "\\b(the|a|and|of|to|in|is|der|die|und|le|la|et|el|los)\\b")
    val punct = reCount(col("text"), "[.,;:!?]")
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        words.cast("long").as("n_words"),
        punct.cast("long").as("n_punct"),
        stops.cast("long").as("n_stopwords"),
        (stops.cast("double") / words).as("stopword_ratio"),
        (punct.cast("double") / length(col("text"))).as("punct_ratio"),
        (least(words.cast("double") / 100.0, lit(1.0)) * 0.5
          + least(stops.cast("double") / words * 5.0, lit(1.0)) * 0.5)
          .as("quality_score"))
      .orderBy(col("doc_id"))
  }

  private val txQualitySql =
    """SELECT doc_id, length(text) AS n_chars,
      |  len(regexp_extract_all(text, '\S+')) AS n_words,
      |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
      |  len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is|der|die|und|le|la|et|el|los)\b')) AS n_stopwords,
      |  len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is|der|die|und|le|la|et|el|los)\b'))*1.0
      |    / len(regexp_extract_all(text, '\S+')) AS stopword_ratio,
      |  len(regexp_extract_all(text, '[.,;:!?]'))*1.0 / length(text) AS punct_ratio,
      |  least(len(regexp_extract_all(text, '\S+'))/100.0, 1.0)*0.5
      |    + least(len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is|der|die|und|le|la|et|el|los)\b'))*1.0
      |            / len(regexp_extract_all(text, '\S+'))*5.0, 1.0)*0.5 AS quality_score
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Language ID: count marker words per language + CJK codepoints; argmax
  // with a fixed tie-break order. Reported as a (lang, pred) confusion
  // matrix against the labeled column.
  private def txLangId(s: SparkSession, dir: String): DataFrame = {
    val en = reCount(col("text"), "\\b(the|and|of|is|to)\\b")
    val de = reCount(col("text"), "\\b(der|die|und|ist|nicht)\\b")
    val fr = reCount(col("text"), "\\b(le|la|et|est|les)\\b")
    val es = reCount(col("text"), "\\b(el|los|es|y|las)\\b")
    val zh = reCount(col("text"), "[\\x{4E00}-\\x{9FFF}]")
    val pred = when(col("s_zh") > col("s_en") && col("s_zh") > col("s_de")
        && col("s_zh") > col("s_fr") && col("s_zh") > col("s_es"), "zh")
      .when(col("s_de") > col("s_en") && col("s_de") > col("s_fr")
        && col("s_de") > col("s_es"), "de")
      .when(col("s_fr") > col("s_en") && col("s_fr") > col("s_es"), "fr")
      .when(col("s_es") > col("s_en"), "es")
      .otherwise("en")
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        en.as("s_en"), de.as("s_de"), fr.as("s_fr"), es.as("s_es"), zh.as("s_zh"))
      .withColumn("pred", pred)
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred"))
  }

  private val txLangIdSql =
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |    len(regexp_extract_all(text, '\b(the|and|of|is|to)\b')) AS s_en,
      |    len(regexp_extract_all(text, '\b(der|die|und|ist|nicht)\b')) AS s_de,
      |    len(regexp_extract_all(text, '\b(le|la|et|est|les)\b')) AS s_fr,
      |    len(regexp_extract_all(text, '\b(el|los|es|y|las)\b')) AS s_es,
      |    len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}]')) AS s_zh
      |  FROM documents),
      |pred AS (
      |  SELECT lang,
      |    CASE
      |      WHEN s_zh > s_en AND s_zh > s_de AND s_zh > s_fr AND s_zh > s_es THEN 'zh'
      |      WHEN s_de > s_en AND s_de > s_fr AND s_de > s_es THEN 'de'
      |      WHEN s_fr > s_en AND s_fr > s_es THEN 'fr'
      |      WHEN s_es > s_en THEN 'es'
      |      ELSE 'en' END AS pred
      |  FROM scored)
      |SELECT lang, pred, count(*) AS n FROM pred
      |GROUP BY lang, pred ORDER BY lang, pred""".stripMargin

  // ---------------------------------------------------------------------
  // Token counting: whitespace tokens + a BPE-ish lexer count (letter runs,
  // digit runs, single punctuation marks), aggregated per source.
  private def txTokens(s: SparkSession, dir: String): DataFrame = {
    val ws = reCount(col("text"), "\\S+")
    val bpe = reCount(col("text"), "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
    t(s, dir, "documents")
      .select(col("source"), ws.cast("long").as("ws_tokens"),
        bpe.cast("long").as("bpe_tokens"), col("n_chars"))
      .groupBy(col("source"))
      .agg(sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_tokens")).as("total_bpe_tokens"),
        sum(col("n_chars")).as("total_chars"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source"))
  }

  // DuckDB sum(BIGINT) yields HUGEINT — cast back to BIGINT to match Spark.
  private val txTokensSql =
    """SELECT source,
      |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_ws_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Winnowing fingerprints — rolling-hash document fingerprinting
  // (Schleimer/Wilkerson/Aiken's MOSS sketch): hash every word 3-gram in
  // document order, slide a window of 4 consecutive gram hashes, keep each
  // window's minimum. Guarantee: documents sharing a long-enough token run
  // share a fingerprint, so plagiarized/near-dup passages are detectable
  // from the sketch alone. The window partitions by doc_id (never crosses
  // documents), so it shards cleanly at any corpus size. Fully oracled:
  // the md5-derived portable k-gram hash (Dedup.portableHash60) is
  // bit-identical in DuckDB, so the window-min fingerprint SET is the
  // oracle's own; overlap invariants additionally in ScaleOpsSpec.
  /** (doc_id, fp): the distinct winnowed fingerprint set — spec surface. */
  def winnowFingerprints(s: SparkSession, dir: String): DataFrame = {
    val grams = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(w) - 3), " +
          "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
        .as(Seq("pos", "gram")))
      .withColumn("h", graft.operators.Dedup.portableHash60(col("gram")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, 3)
    grams.withColumn("fp", min(col("h")).over(win))
      .select(col("doc_id"), col("fp")).distinct()
  }

  private def txWinnow(s: SparkSession, dir: String): DataFrame =
    winnowFingerprints(s, dir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fingerprints"), min(col("fp")).as("min_fp"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------------
  // Winnowing plagiarism pairs — the consumable end of the sketch: two
  // documents sharing a ≥ tau fraction of their winnowed fingerprints
  // contain substantial copied passages (the MOSS report surface). The
  // fingerprint IS the LSH band: candidates come from an equi-join on fp,
  // so the quadratic step only ever touches documents that share a
  // fingerprint. Skew guard: fingerprints present in more than `maxDf`
  // documents are boilerplate (stopword-run shingles) — they would create
  // O(df²) candidate blowup while carrying no plagiarism signal, so they
  // are dropped from BOTH the join and the per-doc denominators (the
  // overlap coefficient is computed over the filtered universe,
  // consistently). Consequence worth knowing: a duplicate CLUSTER wider
  // than maxDf shares only above-cap fingerprints and reports no pairs —
  // by design, since mass duplication is the dedup family's job
  // (dd_exact / dd_dedup_keep), not a plagiarism report. Oracled through
  // the same portable fingerprints as tx_winnow; recall vs the exact
  // n-gram Jaccard pairs asserted in ScaleOpsSpec.
  /** Exposed with knobs so specs can vary the threshold and df cap. */
  def winnowPairs(s: SparkSession, dir: String, tau: Double = 0.5,
      maxDf: Int = 50): DataFrame = {
    val fps = winnowFingerprints(s, dir).localCheckpoint()
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("fp"))
    val kept = fps.join(rare, Seq("fp")).localCheckpoint()
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val shared = kept.select(col("fp"), col("doc_id").as("id_a"))
      .join(kept.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("id_a"), col("n_fp").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n_fp").as("n_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        round(col("n_shared") / least(col("n_a"), col("n_b")), 6)
          .as("overlap"))
      .filter(col("overlap") >= tau)
      .orderBy(col("id_a"), col("id_b"))
  }

  private def txWinnowPairs(s: SparkSession, dir: String): DataFrame =
    winnowPairs(s, dir)

  private val txWinnowSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
      |  FROM docs WHERE len(w) >= 3),
      |grams AS (
      |  SELECT doc_id, i AS pos,
      |    CAST(concat('0x', substr(md5(
      |      w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15)) AS BIGINT) AS h
      |  FROM idx),
      |fps AS (
      |  SELECT DISTINCT doc_id,
      |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM grams)
      |SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fp
      |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val txWinnowPairsSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
      |  FROM docs WHERE len(w) >= 3),
      |grams AS (
      |  SELECT doc_id, i AS pos,
      |    CAST(concat('0x', substr(md5(
      |      w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15)) AS BIGINT) AS h
      |  FROM idx),
      |fps AS (
      |  SELECT DISTINCT doc_id,
      |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM grams),
      |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
      |kept AS (SELECT fps.* FROM fps JOIN rare USING (fp)),
      |sizes AS (SELECT doc_id, count(*) AS n_fp FROM kept GROUP BY 1),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT id_a, id_b, n_shared,
      |    round(n_shared*1.0/least(sa.n_fp, sb.n_fp), 6) AS overlap
      |  FROM shared
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b)
      |SELECT id_a, id_b, n_shared, overlap FROM scored
      |WHERE overlap >= 0.5 ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // Repetition filter (the Gopher/MassiveText repetition rules adapted to
  // word n-grams): a document dominated by one repeated 2-gram, or whose
  // 3-grams are mostly duplicates, is boilerplate/spam — flag it. Both
  // metrics are per-document aggregates over exploded n-gram INSTANCES
  // (not the distinct shingle set dedup uses):
  //   top2_frac = occurrences of the most frequent 2-gram / all 2-grams
  //   dup3_frac = 3-gram instances whose gram occurs >1 time / all 3-grams
  // Scale shape: explode → two-level groupBy keyed (doc_id, gram) then
  // doc_id — partial aggregation map-side, shards by doc hash, no windows,
  // no skew (gram counts are bounded by document length).
  /** (doc_id, top2_frac, dup3_frac, flagged) over any (doc_id, text)
    * frame — exposed so specs can feed injected degenerate documents. */
  def repetitionMetrics(docsRaw: DataFrame): DataFrame = {
    val docs = docsRaw
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
    def gramCounts(n: Int): DataFrame = {
      val terms = (0 until n).map(k => s"w[i+$k]").mkString(", ")
      docs.select(col("doc_id"), explode(expr(
          s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', $terms))"))
          .as("gram"))
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
    }
    val m2 = gramCounts(2).groupBy(col("doc_id"))
      .agg(round(max(col("c")) / sum(col("c")), 6).as("top2_frac"))
    val m3 = gramCounts(3).groupBy(col("doc_id"))
      .agg(round(
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))) / sum(col("c")),
        6).as("dup3_frac"))
    m2.join(m3, Seq("doc_id"))
      .select(col("doc_id"), col("top2_frac"), col("dup3_frac"),
        (col("top2_frac") > 0.08 || col("dup3_frac") > 0.02)
          .cast("long").as("flagged"))
      .orderBy(col("doc_id"))
  }

  private def txRepetition(s: SparkSession, dir: String): DataFrame =
    repetitionMetrics(t(s, dir, "documents"))

  private val txRepetitionSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
      |  WHERE len(string_split_regex(text, '\s+')) >= 3),
      |g2 AS (
      |  SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
      |        FROM docs)),
      |c2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
      |m2 AS (SELECT doc_id, round(max(c)*1.0/sum(c), 6) AS top2_frac
      |       FROM c2 GROUP BY 1),
      |g3 AS (
      |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
      |        FROM docs)),
      |c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2),
      |m3 AS (SELECT doc_id,
      |         round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)*1.0/sum(c), 6)
      |           AS dup3_frac
      |       FROM c3 GROUP BY 1)
      |SELECT doc_id, top2_frac, dup3_frac,
      |  CAST(top2_frac > 0.08 OR dup3_frac > 0.02 AS BIGINT) AS flagged
      |FROM m2 JOIN m3 USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Benchmark-contamination scan (the GPT-3/FLAN n-gram decontamination
  // check): a training document sharing a long word n-gram with any
  // benchmark/eval document is contaminated and must be dropped before
  // training. The benchmark set here is the deterministic doc_id%10==7
  // slice (a fixture stand-in for the real eval suite). Candidates come
  // from an equi-join on the 8-word gram — and because a benchmark suite
  // is tiny next to a 100 TB corpus, the benchmark side is broadcast: the
  // corpus-sized side is never shuffled.
  private def txContamination(s: SparkSession, dir: String): DataFrame = {
    val sh = graft.operators.Dedup.shingles(
      t(s, dir, "documents"), "doc_id", "text", n = 8)
    val bench = sh.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    val train = sh.filter(col("doc_id") % 10 =!= 7)
    train.join(broadcast(bench), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .orderBy(col("doc_id"))
  }

  private val txContaminationSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |idx AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w)-7)) AS i
      |  FROM docs WHERE len(w) >= 8),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
      |    w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS shingle
      |  FROM idx),
      |bench AS (SELECT doc_id AS bench_id, shingle FROM sh
      |          WHERE doc_id % 10 = 7),
      |train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 7)
      |SELECT doc_id, count(DISTINCT shingle) AS n_shared_grams,
      |  count(DISTINCT bench_id) AS n_bench_docs
      |FROM train JOIN bench USING (shingle)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Corpus-frequency rarity score (the CCNet-style LM-quality proxy with
  // integer-exact arithmetic): per document, the token-frequency-weighted
  // mean and the min corpus document-frequency of its tokens. Documents of
  // common well-formed words score high; gibberish/OCR noise scores low
  // (its tokens appear nowhere else). Scale shape: the explode collapses
  // immediately to (doc, token, tf) with map-side combine, the df table is
  // one more groupBy of THAT, and the join back is keyed on token at
  // (doc, token) grain — never token instances, so the Zipf head ("the"
  // in every doc) contributes one row per document, not one per
  // occurrence, and AQE's skew-join split handles the remaining head.
  // Integer sums with one final division, so both engines agree exactly.
  private def txRarity(s: SparkSession, dir: String): DataFrame = {
    val tf = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val tokenDf = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(tokenDf, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("df") * col("tf")) / sum(col("tf")), 6).as("mean_df"),
        min(col("df")).as("min_df"))
      .orderBy(col("doc_id"))
  }

  private val txRaritySql =
    """WITH tf AS (
      |  SELECT doc_id, token, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
      |        FROM documents)
      |  GROUP BY doc_id, token),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token)
      |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
      |  round(sum(df*tf)*1.0/sum(tf), 6) AS mean_df,
      |  min(df) AS min_df
      |FROM tf JOIN df USING (token)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Unigram surprisal — the perplexity-filter stage of a quality pipeline
  // (score each document by how surprising its tokens are under the
  // corpus's own unigram distribution; gibberish and boilerplate sit at
  // the two extremes). Same scale shape as tx_rarity: (doc, token, tf)
  // grain with map-side combine, vocabulary-sized side tables, the Zipf
  // head contributing one row per doc. Float determinism: per-token
  // surprisal ln(total/c) is QUANTIZED to integer micro-nats once per
  // DISTINCT token, then per-doc sums run on integers — order-independent
  // and engine-exact, where a naive avg(ln(...)) would depend on Spark's
  // partition order. The one-row corpus total joins in via broadcast
  // (the A2 scalar pattern, never a collect).
  private def txSurprisal(s: SparkSession, dir: String): DataFrame = {
    val tf = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy(col("token")).agg(sum(col("tf")).as("c"))
    val tot = cnt.agg(sum(col("c")).as("total"))
    val micro = cnt.crossJoin(broadcast(tot))
      .select(col("token"),
        round(log(col("total") / col("c")) * 1e6).cast("long").as("micro"))
    tf.join(micro, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("tf") * col("micro")) /
          (lit(1e6) * sum(col("tf"))), 6).as("mean_surprisal"),
        round(max(col("micro")) / lit(1e6), 6).as("max_surprisal"))
      .orderBy(col("doc_id"))
  }

  private val txSurprisalSql =
    """WITH tf AS (
      |  SELECT doc_id, token, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
      |        FROM documents)
      |  GROUP BY doc_id, token),
      |cnt AS (SELECT token, sum(tf) AS c FROM tf GROUP BY token),
      |tot AS (SELECT sum(c) AS total FROM cnt),
      |micro AS (
      |  SELECT token, CAST(round(ln(total*1.0/c) * 1000000) AS BIGINT)
      |    AS micro
      |  FROM cnt, tot)
      |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
      |  round(sum(tf*micro)*1.0/(1000000.0*sum(tf)), 6) AS mean_surprisal,
      |  round(max(micro)/1000000.0, 6) AS max_surprisal
      |FROM tf JOIN micro USING (token)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Bigram language-model surprisal — the ORDER-2 perplexity filter next
  // to tx_surprisal's unigram pass (real perplexity filters are n-gram
  // LMs: a doc of common words in nonsense ORDER looks fine to a unigram
  // model and lights up under bigram conditionals). Model: add-one
  // smoothed conditionals P(w2|w1) = (c12+1)/(c1+V) trained on the
  // corpus itself, V = distinct unigram vocabulary (one broadcast
  // scalar). Same determinism contract as tx_surprisal: the conditional
  // surprisal is quantized to integer micro-nats ONCE per distinct
  // bigram, per-doc sums run on integers (order-free across partials),
  // corpus scalars broadcast, never collected.
  private def txBigramLm(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
    val vocab = docs.select(explode(col("w")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val bg = docs.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-2), i -> struct(w[i] AS w1, w[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tf = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val c12 = tf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val micro = c12.join(c1, Seq("w1")).crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        round(log((col("c1") + col("v")) / (col("c12") + 1)) * 1e6)
          .cast("long").as("micro"))
    tf.join(micro, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf") * col("micro")) /
          (lit(1e6) * sum(col("tf"))), 6).as("mean_surprisal"),
        round(max(col("micro")) / lit(1e6), 6).as("max_surprisal"))
      .orderBy(col("doc_id"))
  }

  private val txBigramLmSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |vocab AS (
      |  SELECT count(DISTINCT tok) AS v FROM (
      |    SELECT unnest(w) AS tok FROM docs)),
      |bg AS (
      |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
      |        FROM docs WHERE len(w) >= 2)),
      |tf AS (
      |  SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
      |c12 AS (SELECT w1, w2, sum(tf) AS c12 FROM tf GROUP BY 1, 2),
      |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
      |micro AS (
      |  SELECT c12.w1, c12.w2,
      |    CAST(round(ln((c1 + v)*1.0/(c12 + 1)) * 1000000) AS BIGINT)
      |      AS micro
      |  FROM c12 JOIN c1 USING (w1) CROSS JOIN vocab)
      |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
      |  round(sum(tf*micro)*1.0/(1000000.0*sum(tf)), 6) AS mean_surprisal,
      |  round(max(micro)/1000000.0, 6) AS max_surprisal
      |FROM tf JOIN micro USING (w1, w2)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Per-source curation report — the consumable dashboard dataset of the
  // curation family (every analytical surface should end in one, the way
  // the reference's Superset datasets do): per ingestion source, document
  // count, token mass, repetition-flag rate, and benchmark-contamination
  // count, all joined at doc grain and rolled up. Integer sums with single
  // divisions only, so the report is exactly oracle-able (a mean of the
  // double quality_score would be summation-order-dependent and is left
  // to the per-doc query).
  private def txSourceReport(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        reCount(col("text"), "\\S+").cast("long").as("n_words"))
    val rep = repetitionMetrics(
      t(s, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("flagged"))
    val cont = txContamination(s, dir).select(col("doc_id"), lit(1L).as("c"))
    docs
      .join(rep, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(coalesce(col("flagged"), lit(0L))).as("flagged_n"),
        round(sum(coalesce(col("flagged"), lit(0L))) / count(lit(1)), 6)
          .as("flagged_frac"),
        sum(coalesce(col("c"), lit(0L))).as("contaminated_n"))
      .orderBy(col("source"))
  }

  private val txSourceReportSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
      |  WHERE len(string_split_regex(text, '\s+')) >= 3),
      |g2 AS (
      |  SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
      |        FROM docs)),
      |c2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
      |m2 AS (SELECT doc_id, round(max(c)*1.0/sum(c), 6) AS top2_frac
      |       FROM c2 GROUP BY 1),
      |g3 AS (
      |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
      |        FROM docs)),
      |c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2),
      |m3 AS (SELECT doc_id,
      |         round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)*1.0/sum(c), 6)
      |           AS dup3_frac
      |       FROM c3 GROUP BY 1),
      |rep AS (
      |  SELECT doc_id,
      |    CAST(top2_frac > 0.08 OR dup3_frac > 0.02 AS BIGINT) AS flagged
      |  FROM m2 JOIN m3 USING (doc_id)),
      |idx8 AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w)-7)) AS i
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w
      |        FROM documents) WHERE len(w) >= 8),
      |sh8 AS (
      |  SELECT DISTINCT doc_id,
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
      |    w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS shingle
      |  FROM idx8),
      |cont AS (
      |  SELECT DISTINCT t.doc_id, 1 AS is_cont
      |  FROM (SELECT doc_id, shingle FROM sh8 WHERE doc_id % 10 <> 7) t
      |  JOIN (SELECT shingle FROM sh8 WHERE doc_id % 10 = 7) b
      |    USING (shingle))
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
      |    AS total_words,
      |  CAST(sum(coalesce(flagged, 0)) AS BIGINT) AS flagged_n,
      |  round(sum(coalesce(flagged, 0))*1.0/count(*), 6) AS flagged_frac,
      |  CAST(sum(coalesce(is_cont, 0)) AS BIGINT) AS contaminated_n
      |FROM documents
      |LEFT JOIN rep USING (doc_id)
      |LEFT JOIN cont USING (doc_id)
      |GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Heavy hitters — the most frequent tokens via a Count-Min sketch
  // Aggregator ([[graft.functions.CountMinTopK]]) instead of a full
  // groupBy: the sketch buffer is O(d×w) per partition REGARDLESS of key
  // cardinality, so the shuffle carries one fixed-size buffer per
  // partition where a groupBy over 100 TB of n-grams/URLs would exchange
  // one row per distinct key. The report joins the exact counts back for
  // the reported tokens only (a k-row semi-join) — the output shows the
  // one-sided CMS error directly. Oracled by the closed form: at this
  // corpus/width the sketch is collision-free on the reported tokens
  // (est == exact, verified) and the top-20 boundary is untied, so the
  // deterministic output equals the exact top-20 token counts — a hash
  // mismatch means the sketch started over-estimating or dropped a true
  // heavy hitter. CMS contract (one-sidedness, partition independence)
  // asserted in ScaleOpsSpec.
  private def txHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = t(s, dir, "documents")
      .select(explode(split(col("text"), "\\s+")).as("token"))
    val top = tok.as[String]
      .select(new graft.functions.CountMinTopK(20).toColumn)
      .toDF("top")
      .select(explode(col("top")).as("e"))
      .select(col("e._1").as("token"), col("e._2").as("est_count"))
    val exact = tok.groupBy(col("token")).agg(count(lit(1)).as("exact_count"))
    top.join(exact, Seq("token"))
      .orderBy(col("est_count").desc, col("token"))
  }

  private val txHeavyHittersSql =
    """WITH tok AS (
      |  SELECT unnest(string_split_regex(text, '\s+')) AS token
      |  FROM documents),
      |cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY 1)
      |SELECT token, c AS est_count, c AS exact_count
      |FROM cnt ORDER BY est_count DESC, token LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // PII redaction — the compliance pass every training corpus runs before
  // anything else: emails, IPv4 addresses, and phone-shaped numbers are
  // replaced with typed placeholders, with per-doc match counts kept for
  // the audit trail. Patterns are deliberately conservative (word-bounded,
  // no catastrophic backtracking) and expressed in the regex subset Java
  // and RE2 agree on, so the oracle runs the identical patterns. Pure
  // regexp_replace/regexp_count column expressions — codegen'd, no UDFs,
  // embarrassingly parallel at any corpus size.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** (doc_id, red_text, n_emails, n_ips, n_phones) over any
    * (doc_id, text) frame — exposed so specs can inject synthetic PII
    * (the fixture corpus is PII-free by construction). Order matters:
    * emails go first so their host part cannot be re-matched as a bare
    * IP/phone fragment afterwards.
    */
  def redactPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("red_text"),
      reCount(col("text"), EmailRe).cast("long").as("n_emails"),
      reCount(col("text"), Ipv4Re).cast("long").as("n_ips"),
      reCount(col("text"), PhoneRe).cast("long").as("n_phones"))
      .orderBy(col("doc_id"))

  private def txRedact(s: SparkSession, dir: String): DataFrame =
    redactPii(t(s, dir, "documents").select(col("doc_id"), col("text")))

  private val txRedactSql =
    """SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS red_text,
      |  len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |  len(regexp_extract_all(text,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
      |  len(regexp_extract_all(text,
      |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // End-to-end curation manifest — the one artifact a training run
  // actually consumes: per document, a keep/drop verdict with the FIRST
  // failing rule as the reason, rules ordered by severity the way
  // production pipelines order them (exact duplicate ≻ benchmark
  // contamination ≻ repetition spam ≻ too short). Every rule reuses an
  // already-oracled building block, so the composition stays exactly
  // oracle-able end to end. Scale shape: three left joins against
  // doc-keyed aggregates (dup keep-set, contamination hits, repetition
  // flags), each itself shuffle-partitioned on doc/content hashes — no
  // windows, no skew.
  private def txCurationManifest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        reCount(col("text"), "\\S+").cast("long").as("n_words"),
        md5(col("text").cast("binary")).as("text_hash"))
    // keep-one-per-hash: the doc is a duplicate unless it IS the keeper
    val keepers = docs.groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("keeper_id"))
    val cont = txContamination(s, dir)
      .select(col("doc_id"), lit(1L).as("is_cont"))
    val rep = repetitionMetrics(
      t(s, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("flagged"))
    docs
      .join(keepers, Seq("text_hash"))
      .join(cont, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("doc_id") =!= col("keeper_id"), "duplicate")
          .when(col("is_cont") === 1L, "contaminated")
          .when(coalesce(col("flagged"), lit(0L)) === 1L, "repetitive")
          .when(col("n_words") < 20L, "too_short")
          .otherwise("kept").as("verdict"))
      .orderBy(col("doc_id"))
  }

  private val txCurationManifestSql =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    len(regexp_extract_all(text, '\S+')) AS n_words,
      |    md5(text) AS text_hash
      |  FROM documents),
      |keepers AS (
      |  SELECT text_hash, min(doc_id) AS keeper_id FROM base GROUP BY 1),
      |docs AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
      |  WHERE len(string_split_regex(text, '\s+')) >= 3),
      |g2 AS (
      |  SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
      |        FROM docs)),
      |c2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
      |m2 AS (SELECT doc_id, round(max(c)*1.0/sum(c), 6) AS top2_frac
      |       FROM c2 GROUP BY 1),
      |g3 AS (
      |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
      |        FROM docs)),
      |c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY 1, 2),
      |m3 AS (SELECT doc_id,
      |         round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)*1.0/sum(c), 6)
      |           AS dup3_frac
      |       FROM c3 GROUP BY 1),
      |rep AS (
      |  SELECT doc_id,
      |    CAST(top2_frac > 0.08 OR dup3_frac > 0.02 AS BIGINT) AS flagged
      |  FROM m2 JOIN m3 USING (doc_id)),
      |idx8 AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w)-7)) AS i
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w
      |        FROM documents) WHERE len(w) >= 8),
      |sh8 AS (
      |  SELECT DISTINCT doc_id,
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
      |    w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS shingle
      |  FROM idx8),
      |cont AS (
      |  SELECT DISTINCT t.doc_id, 1 AS is_cont
      |  FROM (SELECT doc_id, shingle FROM sh8 WHERE doc_id % 10 <> 7) t
      |  JOIN (SELECT shingle FROM sh8 WHERE doc_id % 10 = 7) b
      |    USING (shingle))
      |SELECT base.doc_id, source,
      |  CASE
      |    WHEN base.doc_id <> keeper_id THEN 'duplicate'
      |    WHEN is_cont = 1 THEN 'contaminated'
      |    WHEN coalesce(flagged, 0) = 1 THEN 'repetitive'
      |    WHEN n_words < 20 THEN 'too_short'
      |    ELSE 'kept' END AS verdict
      |FROM base
      |JOIN keepers USING (text_hash)
      |LEFT JOIN cont ON cont.doc_id = base.doc_id
      |LEFT JOIN rep ON rep.doc_id = base.doc_id
      |ORDER BY base.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // TF-IDF keyword extraction: each document's top-3 most characteristic
  // terms — the per-document "what is this about" signal a curation
  // pipeline uses for topic tagging and mixture construction. idf is the
  // smoothed form ln((N+1)/(df+1)) + 1 (never negative, OOV-safe); the
  // score is snapped to integer micro-units (floor(x·1e6 + 0.5)) BEFORE
  // ranking so the rank boundary cannot move with engine-side ulp drift —
  // the same grid contract as the ANN tiers. Scale shape: explode → two
  // partial-aggregated groupBys (doc-term tf, term df) → a term-keyed join
  // (vocabulary-sized, shuffles only the tf table, never raw text) → a
  // per-doc window over that doc's OWN distinct terms (bounded by doc
  // length, not corpus size). Fully DuckDB-oracled.
  private def docTerms(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("term"))

  private def txTfidfTerms(s: SparkSession, dir: String): DataFrame = {
    val tf = docTerms(s, dir)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term"))
    tf.join(dft, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score_micro",
        floor((log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))
          + lit(1.0)) * col("tf") * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"),
        (col("score_micro") / 1e6).as("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  private val txTfidfTermsSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, term,
      |    CAST(floor((ln((n_docs + 1.0) / (df + 1.0)) + 1.0) * tf
      |      * 1000000.0 + 0.5) AS BIGINT) AS sm
      |  FROM tf JOIN dft USING (term) CROSS JOIN n)
      |SELECT doc_id, rank, term, sm / 1000000.0 AS score FROM (
      |  SELECT doc_id, term, sm,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY sm DESC, term) AS rank
      |  FROM scored) WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // BM25 retrieval scoring (Robertson/Spärck Jones, k1=1.2 b=0.75) — the
  // quality-targeted retrieval step of a curation pipeline ("pull the docs
  // most about X"): three fixed term queries ranked against the corpus,
  // top-10 docs each. One query carries an out-of-vocabulary term to pin
  // the OOV behavior (it simply contributes nothing — no NaN, no crash).
  // Determinism contract: each term's contribution snaps to integer
  // micro-units, the per-doc score is the LONG sum of those units
  // (order-free — double summation order across partials could move the
  // rank boundary), and ranking ties break on doc_id. Scale shape: the
  // tiny query table broadcasts into the doc-term tf table (pruning the
  // corpus to query-term postings before anything else), df/avgdl are
  // partial-aggregated scalars, and per-query top-10 is the bounded-heap
  // Aggregator — map-side partials, no window over the corpus, the
  // exchange carries O(queries × 10) rows. Fully DuckDB-oracled.
  /** The fixed query set (query_id, term) — spec surface. */
  val bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "dup", 1L -> "join",
    2L -> "window", 2L -> "stream", 2L -> "batch",
    3L -> "hash", 3L -> "merge", 3L -> "shuffle")

  private def txBm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docTerms(s, dir)
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val q = bm25Queries.toDF("query_id", "term")
    val qtf = tf.join(broadcast(q), Seq("term"))
    val dft = qtf.select(col("term"), col("doc_id")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = qtf.join(broadcast(dft), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0)
        + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("cm", floor(col("idf") * col("tf") * lit(2.2)
        / (col("tf") + lit(1.2) * (lit(0.25)
          + lit(0.75) * col("dl") / col("avgdl")))
        * lit(1e6) + lit(0.5)).cast("long"))
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("cm")).as("sm"))
      .select(col("query_id"), col("doc_id"), col("sm").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.functions.TopKByScore(10).toColumn.name("top"))
      .toDF("query_id", "top")
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("doc_id"), (col("col._1") / 1e6).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val txBm25Sql = {
    val values = bm25Queries
      .map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }.mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |q(query_id, term) AS (VALUES $values),
       |qtf AS (
       |  SELECT q.query_id, tf.doc_id, tf.term, tf.tf
       |  FROM tf JOIN q USING (term)),
       |dft AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM qtf GROUP BY 1),
       |contrib AS (
       |  SELECT qtf.query_id, qtf.doc_id,
       |    CAST(floor(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
       |      * qtf.tf * 2.2
       |      / (qtf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
       |      * 1000000.0 + 0.5) AS BIGINT) AS cm
       |  FROM qtf JOIN dft d USING (term) JOIN dl USING (doc_id)
       |  CROSS JOIN stats s),
       |summed AS (
       |  SELECT query_id, doc_id, CAST(sum(cm) AS BIGINT) AS sm
       |  FROM contrib GROUP BY 1, 2)
       |SELECT query_id, rank, doc_id, sm / 1000000.0 AS score FROM (
       |  SELECT query_id, doc_id, sm,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY sm DESC, doc_id) AS rank
       |  FROM summed) WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Corpus drift report — the between-crawls diff a pipeline runs before
  // mixing a new snapshot into training data: split the corpus into two
  // epochs (even/odd doc_id stands in for old/new crawl), count every
  // term per epoch, and report the add-half smoothed rate ratio
  // ((n_new+1)/(tokens_new+V)) / ((n_old+1)/(tokens_old+V)) — a
  // vocabulary item whose ratio drifts far from 1 flags template churn,
  // a new spam pattern, or a scraper change. All integer-derived
  // arithmetic (counts and totals), so the doubles match cross-engine
  // with the expression order mirrored; fully DuckDB-oracled. Scale
  // shape: one explode + one (term, epoch) groupBy with map-side
  // partials; the three corpus scalars broadcast.
  private def txDriftReport(s: SparkSession, dir: String): DataFrame = {
    val toks = docTerms(s, dir)
      .withColumn("epoch", (col("doc_id") % 2).cast("int"))
    val counts = toks.groupBy(col("term"))
      .agg(
        sum(when(col("epoch") === 0, lit(1L)).otherwise(lit(0L)))
          .as("n_old"),
        sum(when(col("epoch") === 1, lit(1L)).otherwise(lit(0L)))
          .as("n_new"))
    val totals = toks.agg(
      sum(when(col("epoch") === 0, lit(1L)).otherwise(lit(0L))).as("t_old"),
      sum(when(col("epoch") === 1, lit(1L)).otherwise(lit(0L))).as("t_new"),
      countDistinct(col("term")).as("v"))
    counts.crossJoin(broadcast(totals))
      .select(col("term"), col("n_old"), col("n_new"),
        round(((col("n_new") + lit(1.0)) / (col("t_new") + col("v")))
          / ((col("n_old") + lit(1.0)) / (col("t_old") + col("v"))), 6)
          .as("rate_ratio"))
      .orderBy(col("term"))
  }

  private val txDriftReportSql =
    """WITH tok AS (
      |  SELECT doc_id, CAST(doc_id % 2 AS INT) AS epoch,
      |    unnest(string_split_regex(text, '\s+')) AS term
      |  FROM documents),
      |counts AS (
      |  SELECT term,
      |    CAST(sum(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_old,
      |    CAST(sum(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_new
      |  FROM tok GROUP BY 1),
      |totals AS (
      |  SELECT
      |    CAST(sum(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS t_old,
      |    CAST(sum(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS t_new,
      |    count(DISTINCT term) AS v
      |  FROM tok)
      |SELECT term, n_old, n_new,
      |  round(((n_new + 1.0) / (t_new + v)) / ((n_old + 1.0) / (t_old + v)),
      |    6) AS rate_ratio
      |FROM counts CROSS JOIN totals ORDER BY term""".stripMargin

  // ---------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "tx_fingerprint" -> txFingerprint _,
    "tx_quality" -> txQuality _,
    "tx_langid" -> txLangId _,
    "tx_tokens" -> txTokens _,
    "tx_winnow" -> txWinnow _,
    "tx_winnow_pairs" -> txWinnowPairs _,
    "tx_repetition" -> txRepetition _,
    "tx_contamination" -> txContamination _,
    "tx_rarity" -> txRarity _,
    "tx_surprisal" -> txSurprisal _,
    "tx_bigram_lm" -> txBigramLm _,
    "tx_source_report" -> txSourceReport _,
    "tx_curation_manifest" -> txCurationManifest _,
    "tx_redact" -> txRedact _,
    "tx_heavy_hitters" -> txHeavyHitters _,
    "tx_tfidf_terms" -> txTfidfTerms _,
    "tx_bm25" -> txBm25 _,
    "tx_drift_report" -> txDriftReport _
  )

  val oracle: Map[String, String] = Map(
    "tx_fingerprint" -> txFingerprintSql,
    "tx_quality" -> txQualitySql,
    "tx_langid" -> txLangIdSql,
    "tx_tokens" -> txTokensSql,
    "tx_repetition" -> txRepetitionSql,
    "tx_contamination" -> txContaminationSql,
    "tx_rarity" -> txRaritySql,
    "tx_source_report" -> txSourceReportSql,
    "tx_curation_manifest" -> txCurationManifestSql,
    "tx_redact" -> txRedactSql,
    "tx_surprisal" -> txSurprisalSql,
    "tx_bigram_lm" -> txBigramLmSql,
    "tx_heavy_hitters" -> txHeavyHittersSql,
    "tx_winnow" -> txWinnowSql,
    "tx_winnow_pairs" -> txWinnowPairsSql,
    "tx_tfidf_terms" -> txTfidfTermsSql,
    "tx_bm25" -> txBm25Sql,
    "tx_drift_report" -> txDriftReportSql
  )
}
