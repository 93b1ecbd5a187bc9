package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.queries.{Relational, SimilarityOps, TrainingOps}

/** Physical-plan assertions — the 100-TB design contract (SURVEY §4):
  * filters and projections must reach the parquet scan, small dimensions
  * must broadcast, and hot paths must stay inside whole-stage codegen.
  * These lock in the plan shape so a future refactor can't silently
  * regress scan pruning or join strategy.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfSmoke}

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("p11: predicate and column pruning reach the parquet reader") {
    val plan = planOf(Relational.queries("p11_filter_pushdown")(spark, sfSmoke))
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    assert(plan.contains("l_returnflag"), "filter column missing from scan")
    // pruned read schema: only the 4 projected columns + filter columns
    assert(!plan.contains("l_extendedprice"),
      "unprojected column leaked into the scan")
  }

  test("j1: dimension side broadcasts (no shuffle on the fact side)") {
    val plan = planOf(Relational.queries("j1_broadcast_enrich")(spark, sfSmoke))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("j3: small dims broadcast in the star join") {
    val plan = planOf(Relational.queries("j3_star_revenue")(spark, sfSmoke))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("a1: aggregation runs inside whole-stage codegen with partial agg") {
    val df = Relational.queries("a1_minute_bars")(spark, sfSmoke)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val plan = planOf(df)
    // formatted mode marks whole-stage-codegen nodes with [codegen id : N]
    assert(plan.contains("codegen id"), plan.take(2000))
    assert(plan.contains("HashAggregate"))
    // partial + final pair → map-side combine before the shuffle
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("j6: the range join plans as an equi-join, never a nested loop") {
    val df = Relational.queries("j6_range_join")(spark, sfSmoke)
    df.collect() // finalize the adaptive plan
    val plan = planOf(df)
    // the bucket key turns the inequality join into a hash/merge equi-join;
    // a NestedLoop/Cartesian here would be the quadratic plan the operator
    // exists to avoid
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "range join fell back to a nested loop:\n" + plan.take(2000))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan.take(2000))
  }

  test("j13: AutoRangeJoin rewrites the naive inequality join to equi") {
    val df = Relational.queries("j13_auto_range_join")(spark, sfSmoke)
    df.collect()
    val plan = planOf(df)
    // the query is written as a plain inequality join; WITHOUT the
    // injected rule Catalyst plans BroadcastNestedLoopJoin — the
    // rewrite's bucket equality must turn it into a hash/merge join
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "AutoRangeJoin did not fire:\n" + plan.take(2000))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan.take(2000))
    assert(plan.contains("__graft_range_bucket"),
      "expected the rewrite's bucket column in the plan:\n" +
        plan.take(2000))
  }

  test("j12: the interval-overlap join is an equi-join, never a cartesian") {
    val df = Relational.queries("j12_interval_overlap")(spark, sfSmoke)
    df.collect()
    val plan = planOf(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "interval overlap fell back to a nested loop:\n" + plan.take(2000))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan.take(2000))
  }

  test("o3: top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf(Relational.queries("o3_topk_customers")(spark, sfSmoke))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("knn: query side broadcasts; corpus side never shuffles") {
    val plan = planOf(SimilarityOps.queries("sim_knn_brute")(spark, sfSmoke))
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(2000))
    // exact top-k via the bounded-heap Aggregator: partial ObjectHashAgg on
    // the map side, NO per-query window (a window would sort a corpus-sized
    // partition per query vector)
    assert(!plan.contains("Window"),
      "sim_knn_brute must not plan a window:\n" + plan.take(2000))
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
  }

  test("sim_contamination: probed-cell blocking, no corpus window, " +
      "bounded-heap top-1") {
    val plan = planOf(
      SimilarityOps.queries("sim_contamination")(spark, sfSmoke))
    // candidates come from an equi-join on the probed cell, never a
    // bench × train cartesian; per-bench top-1 is the Aggregator
    assert(!plan.contains("CartesianProduct"),
      "bench×train must stay cell-blocked:\n" + plan.take(2000))
    assert(!plan.contains("Window"),
      "top-1 must not plan a corpus window:\n" + plan.take(2000))
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
  }

  test("sim_topic_sample: bounded-heap selection, no per-topic window") {
    val plan = planOf(
      SimilarityOps.queries("sim_topic_sample")(spark, sfSmoke))
    assert(!plan.contains("Window"),
      "per-topic selection must not plan a window:\n" + plan.take(2000))
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
  }

  test("extensions: composed cosine fuses into the native codegen expression") {
    import org.apache.spark.sql.functions.{abs => fabs, col => c}
    val e = Tables.t(spark, sfSmoke, "embeddings")
      .select(c("vec_id"), c("embedding").cast("array<double>").as("v"))
    // the three-aggregate composed form must optimize to one fused
    // CosineSimilarity via the injected FuseCosineSimilarity rule
    val q = e.select(SimilarityOps.cosineComposed(c("v"), c("v")).as("cos"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_cosine_sim"),
      "fuse rule did not fire:\n" + opt.take(2000))
    // and the injected session function resolves from plain SQL with no
    // imperative register call
    e.createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_cosine_sim(v, v) AS cos FROM emb_ext")
    assert(viaSql.filter(fabs(c("cos") - 1.0) > 1e-9).count() == 0)
  }

  test("injected function: wrong arity fails analysis, not with an IOOBE") {
    import org.apache.spark.sql.functions.{col => c}
    Tables.t(spark, sfSmoke, "embeddings")
      .select(c("vec_id"), c("embedding").cast("array<double>").as("v"))
      .createOrReplaceTempView("emb_arity")
    for (call <- Seq("graft_cosine_sim(v)", "graft_cosine_sim(v, v, v)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $call FROM emb_arity").collect()
      }
      assert(e.getMessage.contains("graft_cosine_sim"),
        s"$call: analysis error must name the function, got ${e.getMessage}")
    }
  }

  test("tx_surprisal: corpus total broadcasts; no window in the plan") {
    val q = graft.queries.TextOps.queries("tx_surprisal")(spark, sfSmoke)
    val plan = q.queryExecution.executedPlan.toString
    // the 1-row corpus total must join in as a broadcast (nested-loop on
    // a single row), and the per-doc aggregation must stay a hash
    // aggregate — a Window here would mean a global sort crept in
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "1-row total should broadcast:\n" + plan.take(1500))
    assert(!plan.contains("Window"), "surprisal must not use windows")
  }

  test("fuse rule: non-dot lambdas stay unrewritten; ragged arrays stay null") {
    import org.apache.spark.sql.functions._
    val e = Tables.t(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // (p, q) -> p * p is NOT a dot product — must not become a cosine
    def fakeDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * p), lit(0.0), (acc, w) => acc + w)
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, w) => acc + w)
    val fake = e.select((fakeDot(col("v"), col("v"))
      / sqrt(dot(col("v"), col("v"))) / sqrt(dot(col("v"), col("v")))).as("x"))
    assert(!fake.queryExecution.optimizedPlan.toString
      .contains("graft_cosine_sim"), "p*p lambda must not fuse")
    // unequal lengths: composed form is NULL; the fused expression must
    // agree (the rewrite fires and still yields NULL)
    val ragged = e.select(SimilarityOps.cosineComposed(
      slice(col("v"), 1, 32), col("v")).as("cos"))
    assert(ragged.queryExecution.optimizedPlan.toString
      .contains("graft_cosine_sim"), "ragged-but-real cosine should fuse")
    assert(ragged.filter(col("cos").isNotNull).count() == 0,
      "fused cosine over unequal lengths must stay NULL like the composed form")
  }

  test("ivf: cell assignment is a max_by aggregate, not a per-vector window") {
    import org.apache.spark.sql.functions.{col => c}
    val e = Tables.t(spark, sfSmoke, "embeddings")
      .select(c("vec_id"), c("embedding").cast("array<double>").as("v"))
    val cents = graft.operators.Ivf.centroids(e, "vec_id", "v", 8)(
      SimilarityOps.cosineComposed)
    val assigned = graft.operators.Ivf.assign(e, cents, "vec_id", "v")(
      SimilarityOps.cosineComposed)
    val plan = planOf(assigned)
    assert(!plan.contains("Window"), "assignment must not plan a window:\n"
      + plan.take(2000))
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      plan.take(2000))
    // centroid side broadcasts into the crossJoin
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // probe-side cell selection is also window-free
    val q = e.filter(c("vec_id") < 5)
      .select(c("vec_id").as("query_id"), c("v").as("qv"))
    val probes = graft.operators.Ivf.probeCells(q, cents, "query_id", "qv", 2)(
      SimilarityOps.cosineComposed)
    assert(!planOf(probes).contains("Window"))
  }

  test("pq: ADC scoring broadcasts the lookup table; the encoded corpus " +
      "is never re-joined to raw vectors") {
    import org.apache.spark.sql.functions.{col => c}
    val e = Tables.t(spark, sfSmoke, "embeddings")
      .select(c("vec_id"), c("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    val cb = graft.operators.Pq.codebooks(spark, e, "vec_id", "v",
      m = 8, dim = 64, k = 16)
    val enc = graft.operators.Pq.encode(e, cb, "vec_id", "v", 8, 64)
    val q = e.filter(c("vec_id") < 5)
      .select(c("vec_id").as("query_id"), c("v").as("qv"))
    val scores = graft.operators.Pq.adcScores(
      q, enc, cb, "query_id", "qv", "vec_id", 8, 64)
    val plan = planOf(scores)
    // the per-query lookup table (|Q|·m·k rows) broadcasts; scoring the
    // corpus is one partial-aggregated shuffle on (query, id) — a sort,
    // window, or shuffle-join here would touch corpus-scale data twice
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("Window"),
      "ADC scoring must not plan a window:\n" + plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      "ADC lut join must broadcast, not shuffle:\n" + plan.take(2000))
  }

  test("tx_pack: the packing window partitions by shard (never global)") {
    val plan = planOf(TrainingOps.queries("tx_pack")(spark, sfSmoke))
    // the cumulative sum must run under a hash exchange on the shard key —
    // a global (unpartitioned) window would serialize the whole corpus
    // through one task at scale
    assert(plan.contains("hashpartitioning(shard"), plan.take(3000))
  }

  test("tx_sample: scan reads only the manifest columns, never the text") {
    val plan = planOf(TrainingOps.queries("tx_sample")(spark, sfSmoke))
    assert(plan.contains("struct<doc_id:bigint,lang:string,source:string>"),
      plan.take(3000))
  }

  test("selective shuffle join injects a runtime bloom filter (big side)") {
    import spark.implicits._
    // when the dim side is too big to broadcast but carries a selective
    // filter, Spark's InjectRuntimeFilter should plant a bloom filter on
    // the fact scan — at 100 TB that prunes shuffle input by the dim
    // selectivity before any exchange. Thresholds are tuned down because
    // the fixture is small; the assertion is that the engine's sessions
    // leave the feature ON and the plan shape admits it.
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-bloom-fixture").getAbsolutePath
    if (!new java.io.File(s"$dir/fact/_SUCCESS").exists()
        || !new java.io.File(s"$dir/dim/_SUCCESS").exists()) {
      (0L until 100000L).map(i => (i, i % 1000)).toDF("v", "pk")
        .write.mode("overwrite").parquet(s"$dir/fact")
      (0L until 1000L).map(i => (i, if (i < 10) "keep" else "drop"))
        .toDF("pk", "tag").write.mode("overwrite").parquet(s"$dir/dim")
    }
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"tag" === "keep")
      val joined = fact.join(dim, "pk")
      val plan = planOf(joined)
      assert(plan.toLowerCase.contains("bloomfilter")
          || plan.contains("might_contain"),
        "runtime bloom filter missing from the fact side:\n" + plan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("tx_contamination: the benchmark side broadcasts (corpus unshuffled)") {
    // the eval suite is tiny next to a 100 TB corpus: the gram join must
    // broadcast the benchmark grams, never shuffle the corpus-sized side
    val plan = planOf(
      graft.queries.TextOps.queries("tx_contamination")(spark, sfSmoke))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("dd_dup_spans: semi-join on aggregated shingles, no distinct agg") {
    // the duplicated-window test is min!=max (two longs of state per
    // shingle) and the rejoin is LEFT SEMI against that aggregated set —
    // a count(distinct doc_id) or an inner-join fanout here would carry
    // per-shingle doc sets through the shuffle at corpus scale
    val plan = planOf(
      graft.queries.DedupOps.queries("dd_dup_spans")(spark, sfSmoke))
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(!plan.toLowerCase.contains("distinct"), "no distinct aggregate")
    // span-merge windows partition by doc_id, never globally
    val specs = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("doc_id")),
      specs.mkString("\n"))
  }

  test("dd_minhash_lsh: banded equi-joins only, never an all-pairs shape") {
    // the LSH contract at corpus scale: candidates come from equi-joins
    // on (band, bucket) and verification joins shingles by equality — a
    // cartesian or nested-loop join anywhere in this plan means some
    // rewrite degraded the bucketed pipeline to all-pairs
    val plan = planOf(
      graft.queries.DedupOps.queries("dd_minhash_lsh")(spark, sfSmoke))
    assert(!plan.contains("CartesianProduct"), "cartesian in LSH plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "nested-loop join in LSH plan")
    // the 32-permutation signature is ONE hash aggregate over shingles,
    // not 32 passes
    assert(plan.contains("HashAggregate"), plan.take(2000))
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    import spark.implicits._
    // the engine's other skew answer next to explicit salting
    // (operators/Salting): AQE must detect the hot key's oversized shuffle
    // partition and split it. Thresholds are tuned down to fixture scale —
    // the assertion is that the engine's session config leaves the
    // mechanism armed and the join shape admits it
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-skew-fixture").getAbsolutePath
    if (!new java.io.File(s"$dir/fact/_SUCCESS").exists()
        || !new java.io.File(s"$dir/dim/_SUCCESS").exists()) {
      ((0 until 200000).map(i => (0L, i.toLong)) ++
        (0 until 20000).map(i => ((i % 100).toLong + 1L, i.toLong)))
        .toDF("pk", "v").write.mode("overwrite").parquet(s"$dir/fact")
      (0L to 100L).map(k => (k, s"d$k")).toDF("pk", "name")
        .write.mode("overwrite").parquet(s"$dir/dim")
    }
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      val joined = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim"), "pk")
      assert(joined.count() == 220000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        "AQE did not mark the skewed join:\n" + plan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("curation pipeline queries carry no window or cartesian product") {
    // the curation family must stay pure aggregate/join shapes: a window
    // would serialize per-partition, a cartesian would be quadratic
    for (q <- Seq("tx_repetition", "tx_rarity", "tx_source_report",
        "tx_curation_manifest")) {
      val plan = planOf(graft.queries.TextOps.queries(q)(spark, sfSmoke))
      assert(!plan.contains("Window"), s"$q plans a window:\n${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct"),
        s"$q plans a cartesian:\n${plan.take(1500)}")
    }
  }

  test("a8_histogram: single hash aggregate with map-side partials") {
    val df = graft.queries.Analytics.queries("a8_histogram")(spark, sfSmoke)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "bucket counts must partial-aggregate before the shuffle")
    // histogram sums the table: one full-table window/sort would be wrong
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("partitioned fact + filtered dim join prunes partitions dynamically") {
    import spark.implicits._
    // partition-pruning is the partitioned-sink payoff (the k2 fact table
    // partitions by coin_id for exactly this): a selective dim filter must
    // reach the fact scan as a runtime partition predicate, not an
    // after-scan filter — at 100 TB that is the difference between
    // reading one partition and reading the table
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-dpp-fixture").getAbsolutePath
    // guard on BOTH writes: a crash between them would otherwise wedge
    // the shared fixture dir for every later run
    if (!new java.io.File(s"$dir/fact/_SUCCESS").exists()
        || !new java.io.File(s"$dir/dim/_SUCCESS").exists()) {
      (0L until 1000L).map(i => (i, i % 10)).toDF("v", "pk")
        .write.mode("overwrite").partitionBy("pk").parquet(s"$dir/fact")
      // dim must be file-backed: a literal LocalRelation would constant-
      // fold its filter away and leave no selective predicate for the
      // pruning rule to key on
      Seq((1L, "keep"), (2L, "drop")).toDF("pk", "name")
        .write.mode("overwrite").parquet(s"$dir/dim")
    }
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")
      .filter(org.apache.spark.sql.functions.col("name") === "keep")
    val joined = fact.join(dim, "pk")
    assert(joined.count() == 100)
    val plan = planOf(joined).toLowerCase
    assert(plan.contains("dynamicpruning"), planOf(joined).take(3000))
  }

  test("s10: predicate pushdown and column pruning reach the ORC reader") {
    val plan = planOf(
      graft.queries.Sources.queries("s10_orc_scan")(spark, sfSmoke))
    assert(plan.toLowerCase.contains("orc"), plan.take(2000))
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    assert(plan.contains("event_type"), "filter column missing from scan")
    assert(!plan.contains("props"), "unprojected column leaked into the scan")
  }
  test("tx_bm25: broadcast query join + heap top-k, no corpus window") {
    val df = graft.queries.TextOps.queries("tx_bm25")(spark, sfSmoke)
    df.collect() // finalize the adaptive plan
    val plan = planOf(df)
    assert(!plan.contains("Window"),
      "bm25 must rank via the bounded heap, not a window:\n" + plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"),
      "the tiny query table must broadcast into the postings")
    assert(plan.contains("ObjectHashAggregate"),
      "top-k must run as the typed heap aggregator")
  }

  test("sim_rp_project: map-only projection, no shuffle before the sort") {
    val plan = planOf(
      SimilarityOps.queries("sim_rp_project")(spark, sfSmoke))
    // the projection itself is per-row; the ONLY exchange allowed is the
    // final range partitioning for the display orderBy
    assert(!plan.contains("Exchange hashpartitioning"),
      "random projection must not shuffle:\n" + plan.take(2000))
    assert(!plan.contains("Join"), "no join belongs in a literal projection")
  }

  test("gr_degree_stats: partial aggregation before the exchange") {
    val df = graft.queries.GraphOps.queries("gr_degree_stats")(spark, sfSmoke)
    df.collect()
    val plan = planOf(df)
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "degree counts must map-side combine:\n" + plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("shard-ingest family: the decode stage fans out over >1 partition") {
    // the documents manifest is ONE parquet split at test scale, so a
    // decode chained straight onto the scan inherits one task and the
    // whole corpus decodes serially — the single-file-manifest /
    // heavy-per-row-CPU scale killer. Pin the round-robin fan-out
    // between the manifest scan and the decode mapPartitions.
    val rr = "RoundRobinPartitioning\\((\\d+)".r
    for (q <- Seq("s12_warc_ingest", "s17_lz4_ingest", "s18_snappy_ingest",
        "s19_gzip_ingest", "s20_bzip2_ingest", "s21_avro_ingest",
        "s24_xz_ingest", "s25_arrow_ingest", "s26_zstd_ingest")) {
      val plan = planOf(graft.queries.Sources.queries(q)(spark, sfSmoke))
      val widths = rr.findAllMatchIn(plan).map(_.group(1).toInt).toSeq
      assert(widths.nonEmpty && widths.forall(_ > 1),
        s"$q decode stage is not fanned out (RoundRobinPartitioning " +
          s"missing or width<=1):\n" + plan.take(2000))
    }
  }

  test("s28: the graftpq DSv2 scan records its pushed filters and a " +
      "pruned read schema") {
    val df = graft.queries.Sources.queries("s28_dsv2_scan")(spark, sfSmoke)
    df.collect() // finalize the adaptive plan
    val plan = planOf(df)
    assert(plan.contains("BatchScan"), plan.take(2000))
    assert(plan.contains("graftpq"), plan.take(2000))
    // both comparisons accepted by the ScanBuilder for stats pruning
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(value,0.0)") &&
      plan.contains("GreaterThanOrEqual(user_id,100)"),
      plan.take(3000))
    // event_id is in the fixture but untouched by the query: pruned
    assert(!plan.contains("event_id"),
      "unprojected column leaked into the graftpq scan:\n" +
        plan.take(3000))
  }
}
