package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.{DedupOps, MultimodalOps, SimilarityOps, TextOps,
  TrainingOps}
import graft.multimodal.Media

class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfSmoke}

  // ---- dedup ----------------------------------------------------------

  test("minhash-LSH finds the high-jaccard pairs the exact query finds") {
    val exact = DedupOps.queries("dd_ngram_jaccard")(spark, sfSmoke)
      .filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.queries("dd_minhash_lsh")(spark, sfSmoke)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} pairs")
  }

  test("ngram-jaccard df cap: a shingle shared by every doc joins nothing") {
    import spark.implicits._
    // 60 docs share one boilerplate sentence (3 interior shingles, df=60 >
    // the default cap of 50) and are otherwise unique: an uncapped join
    // would emit 60*59/2 = 1770 boilerplate-only pairs and flood the
    // top-20. One genuine near-dup pair shares rare (df=2) shingles only.
    val boiler = (0 until 60).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c common boiler plate words here"))
    val nearDup = Seq(
      (1000L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (1001L, "alpha beta gamma delta epsilon zeta eta theta kappa"))
    val docs = (boiler ++ nearDup).toDF("doc_id", "text")
    val got = DedupOps.ngramJaccardPairs(docs).collect()
    assert(got.length == 1,
      s"capped join must emit only the rare-shingle pair, got ${got.length}")
    assert((got(0).getLong(0), got(0).getLong(1)) == (1000L, 1001L))
    assert(got(0).getAs[Double]("jaccard") > 0.7)
    // with the cap above the boilerplate df, the quadratic pairs are back
    // (proving the cap, not the fixture, is what bounded the join)
    val uncapped = DedupOps.ngramJaccardPairs(docs, maxDf = 100)
    assert(uncapped.count() == 20, "uncapped top-20 floods with boilerplate")
  }

  test("dup-spans: planted shared sentence yields exactly its token range") {
    import spark.implicits._
    val s10 = (1 to 10).map(j => s"s$j").mkString(" ") // 10 shared tokens
    val docs = Seq(
      (1L, s"a1 a2 a3 $s10 a4 a5"),   // S at tokens 4..13 of 15
      (2L, s"b1 b2 $s10 b3 b4 b5"),   // S at tokens 3..12 of 15
      (3L, (1 to 12).map(j => s"c$j").mkString(" ")) // fully unique
    ).toDF("doc_id", "text")
    val got = DedupOps.dupSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // windows inside S only (straddling windows carry unique context):
    // doc 1 starts {4,5,6} -> one span covering tokens 4..13 = 10 tokens
    assert(got.toSeq == Seq((1L, 1L, 10L, 15L), (2L, 1L, 10L, 15L)),
      s"got ${got.toSeq}")
  }

  test("dup-spans: islands split only when a token escapes coverage") {
    import spark.implicits._
    val s8 = (1 to 8).map(j => s"x$j").mkString(" ")
    val t8 = (1 to 8).map(j => s"y$j").mkString(" ")
    // doc 10: X at 1..8, one unique token, Y at 10..17 -> token 9 is
    // uncovered, so two spans. doc 11: X then Y immediately (1..8, 9..16)
    // -> contiguous coverage, ONE merged span of 16.
    val docs = Seq(
      (10L, s"$s8 gap1 $t8"),
      (11L, s"$s8 $t8"),
      (20L, s"$s8 z1 z2 z3 z4 z5 z6 z7 z8"), // second copy of X
      (21L, s"w1 w2 w3 w4 w5 w6 w7 w8 $t8")  // second copy of Y
    ).toDF("doc_id", "text")
    val rows = DedupOps.dupSpans(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows(10L) == ((2L, 16L)), s"doc 10: ${rows(10L)}")
    assert(rows(11L) == ((1L, 16L)), s"doc 11: ${rows(11L)}")
  }

  test("LSH verified pairs carry true jaccard (subset of exact pair set)") {
    val sh = Dedup.shingles(Tables.t(spark, sfSmoke, "documents"),
      "doc_id", "text", 3)
    val lsh = DedupOps.queries("dd_minhash_lsh")(spark, sfSmoke)
    val verified = Dedup.verifyJaccard(
      lsh.select("id_a", "id_b"), sh, "doc_id")
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).as("expected_jaccard"))
    val joined = lsh.join(verified, Seq("id_a", "id_b"))
      .filter(abs(col("jaccard") - col("expected_jaccard")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("simhash pairs have low hamming distance and include near-dups") {
    val pairs = DedupOps.queries("dd_simhash")(spark, sfSmoke).collect()
    assert(pairs.forall(_.getAs[Int]("hamming") <= 8))
    assert(pairs.nonEmpty, "near-dup fixture should produce simhash pairs")
  }

  test("simhash overflow is empty at the oracle scales (star fallback " +
      "would silently diverge from the DuckDB self-join oracle)") {
    Seq(sfSmoke, "/root/testdata/sf0.01").foreach { sf =>
      val sig = Dedup.simHash(
        Tables.t(spark, sf, "documents"), "doc_id", "text")
      assert(Dedup.simHashOverflow(sig, "doc_id").count() == 0,
        s"$sf: a capped bucket means dd_simhash no longer matches its " +
        "plain-self-join oracle — raise the cap or re-derive the oracle")
    }
  }

  test("simhash bucket cap bounds candidates under adversarial skew") {
    import spark.implicits._
    // 400 byte-identical docs: every band maps them into ONE bucket, the
    // worst case where uncapped pairing is C(400,2) = 79,800 candidates
    val docs = ((0 until 400).map(i =>
        (i.toLong, "the same exact document text repeated verbatim")) ++
      (0 until 50).map(i =>
        (400L + i, s"unique document number $i with words ${i * 31} apart")))
      .toDF("doc_id", "text")
    val sig = Dedup.simHash(docs, "doc_id", "text")
    val capped = Dedup.simHashPairs(sig, "doc_id", maxHamming = 8,
      maxBucketSize = 50)
    val n = capped.count()
    assert(n < 5000, s"candidates must stay linear in bucket size, got $n")
    // the capped mega-bucket stays one connected component: every
    // identical doc pairs with the min-id representative (doc 0)
    assert(capped.filter(col("id_a") === 0L).count() >= 399)
    // and the overflow is observable for logging
    val over = Dedup.simHashOverflow(sig, "doc_id", 50).count()
    assert(over >= 4 && over <= 8, s"expected the 4 mega-buckets, got $over")
  }

  test("capped simhash bucket keeps identical members connected sans rep") {
    import spark.implicits._
    // rep (id 0, sig 0) shares band-0's bucket with 300 identical members
    // whose hamming to the rep is 14 (> maxHamming): star pairs to the rep
    // all fail verification, so the CHAIN over sig-sorted members is the
    // only thing keeping the identical group one component
    val v = (1L << 30) - (1L << 16) // 14 bits set, all outside chunk 0
    val sig = ((0L, 0L) +: (1L to 300L).map(i => (i, v))).toDF("doc_id", "simhash")
    val pairs = Dedup.simHashPairs(sig, "doc_id", maxHamming = 8,
      maxBucketSize = 50)
    assert(pairs.filter(col("id_a") === 0L || col("id_b") === 0L).count() == 0,
      "rep is hamming-14 away — no pair may survive verification")
    val comp = graft.operators.Components.resolve(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 300L).forall(comp.get(_).contains(1L)),
      "identical members must stay one connected component via the chain")
  }

  test("components resolve chains; dedup-keep partitions the corpus") {
    import spark.implicits._
    // a 10-vertex chain (worst diameter), a triangle, a lone pair
    val pairs = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (7L, 8L), (8L, 9L), (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))
      .toDF("id_a", "id_b")
    val comp = graft.operators.Components.resolve(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 9L).forall(comp(_) == 0L), s"chain must collapse to 0: $comp")
    assert((20L to 22L).forall(comp(_) == 20L))
    assert(comp(30L) == 30L && comp(31L) == 30L)
    // an iteration bound too tight for the fixpoint must fail loudly when
    // required (one round can never certify convergence on a non-star)
    intercept[IllegalStateException] {
      graft.operators.Components.resolve(pairs, maxIters = 1,
        requireConvergence = true, maxDriverEdges = 0L).collect()
    }
    // end-to-end: kept clusters partition the documents exactly
    val nDocs = Tables.t(spark, sfSmoke, "documents").count()
    val kept = DedupOps.dedupKeep(spark, sfSmoke).collect()
    assert(kept.map(_.getAs[Long]("n_members")).sum == nDocs,
      "cluster sizes must sum to the corpus size")
    assert(kept.map(_.getAs[Long]("doc_id_kept")).distinct.length == kept.length)
    assert(kept.length < nDocs, "the near-dup fixture must merge something")
  }

  test("components: 10k-chain converges in O(log n) star rounds") {
    import spark.implicits._
    // the adversarial shape for min-label propagation: one path graph of
    // diameter 10k. The star alternation must collapse it to a single
    // component in ~log2(n) rounds, not diameter rounds.
    val n = 10000
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("id_a", "id_b")
    // maxDriverEdges=0 forces the distributed star rounds — this test IS
    // the O(log n) bound on that path
    val (labels, rounds, converged) =
      graft.operators.Components.resolveStats(pairs, maxIters = 25,
        maxDriverEdges = 0L)
    assert(converged, s"10k-chain did not converge in 25 rounds")
    val bound = math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt + 3
    assert(rounds <= bound, s"10k-chain took $rounds rounds (bound $bound)")
    val comp = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comp.length == n)
    assert(comp.forall(_._2 == 0L), "every chain vertex must label to 0")
  }

  test("components: driver union-find equals the distributed star rounds") {
    import spark.implicits._
    // mixed shape: a chain, a clique, singleton self-pairs, and an
    // isolated pair — both paths must produce identical labels
    val pairs = ((0 until 40).map(i => (i.toLong, i.toLong + 1)) ++
      (for (i <- 100 until 110; j <- i + 1 until 110) yield (i.toLong, j.toLong)) ++
      Seq((200L, 200L), (300L, 301L))).toDF("id_a", "id_b")
    val driver = graft.operators.Components.resolve(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = graft.operators.Components.resolve(pairs, maxDriverEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(driver == dist,
      "driver union-find and star rounds must agree on every label")
    assert(driver(200L) == 200L && driver(301L) == 300L && driver(40L) == 0L)
  }

  test("components: two cliques joined by one bridge edge merge fully") {
    import spark.implicits._
    // dense-but-bridged shape: two 50-cliques with a single connecting
    // edge — the bridge must pull both cliques into one component
    val cliqueA = for (i <- 0 until 50; j <- i + 1 until 50)
      yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 100 until 150; j <- i + 1 until 150)
      yield (i.toLong, j.toLong)
    val pairs = (cliqueA ++ cliqueB ++ Seq((49L, 100L))).toDF("id_a", "id_b")
    val (labels, rounds, converged) =
      graft.operators.Components.resolveStats(pairs, maxIters = 25,
        maxDriverEdges = 0L)
    assert(converged)
    val bound = math.ceil(math.log(150.0) / math.log(2.0)).toInt + 3
    assert(rounds <= bound, s"clique-bridge took $rounds rounds (bound $bound)")
    val comp = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp.size == 100)
    assert(comp.values.forall(_ == 0L), "bridge must merge both cliques to 0")
  }

  test("exact dedup keeps every distinct text exactly once") {
    val docs = Tables.t(spark, sfSmoke, "documents")
    val dd = DedupOps.queries("dd_exact")(spark, sfSmoke)
    assert(dd.count() == docs.select(md5(col("text").cast("binary")))
      .distinct().count())
    assert(dd.agg(sum("n_copies")).first().getLong(0) == docs.count())
  }

  // ---- similarity -----------------------------------------------------

  test("IVF results are a subset-quality approximation of brute force") {
    val brute = SimilarityOps.queries("sim_knn_brute")(spark, sfSmoke)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val ivf = SimilarityOps.queries("sim_knn_ivf")(spark, sfSmoke)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(ivf.nonEmpty)
    val recalls = brute.keys.toSeq.map { q =>
      val b = brute(q)
      val i = ivf.getOrElse(q, Set.empty[Long])
      b.count(i.contains).toDouble / b.size
    }
    val avgRecall = recalls.sum / recalls.size
    assert(avgRecall >= 0.2, s"IVF avg recall@10 = $avgRecall")
  }

  test("semantic contamination: split respected, cosine exact, never " +
      "above the true train-side maximum") {
    import org.apache.spark.sql.functions._
    val rows = SimilarityOps.queries("sim_contamination")(spark, sfSmoke)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == 7, s"bench side must be the %10==7 split: $r")
      assert(r.getAs[Long]("nearest_train_id") % 10 != 7,
        s"train side must exclude the bench split: $r")
    }
    // the IVF-probed nearest can never beat the exact train-side max
    // cosine, and the reported cosine must BE the exact cosine of the
    // reported pair (candidates are scored exactly inside the block)
    val e = Tables.t(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bench = e.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("bench_id"), col("v").as("qv"))
    val exactBest = e.filter(col("vec_id") % 10 =!= 7)
      .crossJoin(broadcast(bench))
      .groupBy(col("bench_id"))
      .agg(max(round(SimilarityOps.cosineComposed(col("qv"), col("v")), 6))
        .as("best"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exactPair = e.filter(col("vec_id") % 10 =!= 7)
      .crossJoin(broadcast(bench))
      .select(col("bench_id"), col("vec_id"),
        round(SimilarityOps.cosineComposed(col("qv"), col("v")), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    rows.foreach { r =>
      val (b, t, c) = (r.getLong(0), r.getAs[Long]("nearest_train_id"),
        r.getAs[Double]("cos"))
      assert(c <= exactBest(b) + 1e-12, s"probed cos above exact max: $r")
      assert(math.abs(c - exactPair((b, t))) < 1e-12,
        s"reported cosine must equal the exact pair cosine: $r")
    }
  }

  test("topic sample: per-topic cap, members only, exactly the smallest " +
      "hashes") {
    import org.apache.spark.sql.functions._
    val cap = 3
    val sample = SimilarityOps.topicSample(spark, sfSmoke, k = 4, cap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sample.nonEmpty)
    val byTopic = sample.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    byTopic.foreach { case (t, ids) =>
      assert(ids.size <= cap, s"topic $t exceeds the cap: $ids")
    }
    // recompute membership + hash order directly: the kept set per topic
    // must be exactly the cap ascending-(hash, id) members
    val e = Tables.t(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = graft.operators.Ivf.centroids(e, "vec_id", "v", 4, iters = 3)(
      SimilarityOps.cosineComposed)
    val member = graft.operators.Ivf.assign(e, cents, "vec_id", "v")(
      SimilarityOps.cosineComposed)
      .select(col("cell"), col("vec_id"),
        graft.operators.Dedup.portableHash60(
          col("vec_id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = member.groupBy(_._1).view.mapValues(
      _.sortBy(m => (m._3, m._2)).take(cap).map(_._2).toSet).toMap
    assert(byTopic == expect,
      s"kept sets must be the smallest-hash members: got $byTopic")
  }

  test("PQ + exact re-rank recovers brute-force top-10 with high recall; " +
      "codes are m dense nibbles") {
    val brute = SimilarityOps.queries("sim_knn_brute")(spark, sfSmoke)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val pq = SimilarityOps.knnPq(spark, sfSmoke).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(pq.nonEmpty)
    val recalls = brute.keys.toSeq.map { q =>
      brute(q).count(pq.getOrElse(q, Set.empty[Long]).contains)
        .toDouble / brute(q).size
    }
    val avgRecall = recalls.sum / recalls.size
    // ADC ranks 64 candidates, exact cosine re-ranks: on this corpus the
    // lookup-table scores must put most of the true top-10 inside the
    // re-rank window
    assert(avgRecall >= 0.5, s"PQ avg recall@10 = $avgRecall")
    // the exact cosines of re-ranked survivors are bit-equal to brute
    // force for the ids both agree on (re-rank really is exact)
    val bruteCos = SimilarityOps.queries("sim_knn_brute")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Double]("cos")).toMap
    SimilarityOps.knnPq(spark, sfSmoke).collect().foreach { r =>
      val key = (r.getLong(0), r.getAs[Long]("neighbor_id"))
      bruteCos.get(key).foreach(bc => assert(bc == r.getAs[Double]("cos"),
        s"re-rank cosine differs from exact at $key"))
    }
    // compression contract: every vector encodes to m dense 4-bit codes
    val e = Tables.t(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cb = graft.operators.Pq.codebooks(spark, e, "vec_id", "v", 8, 64, 16)
    assert(cb.count() == 8 * 16)
    val enc = graft.operators.Pq.encode(e, cb, "vec_id", "v", 8, 64)
    assert(enc.count() == e.count())
    val bad = enc.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c > 15)).count()
    assert(bad == 0, "codes must be exactly m nibbles in [0, 16)")
  }

  test("IVF-PQ composes the tiers: candidates only from probed cells, " +
      "exact re-rank, IVF-bounded recall") {
    val ivfpq = SimilarityOps.knnIvfPq(spark, sfSmoke).collect()
    assert(ivfpq.nonEmpty)
    val byQ = ivfpq.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    // re-rank is exact: where IVF-PQ and brute force agree on an id, the
    // cosine must be bit-equal
    val bruteCos = SimilarityOps.queries("sim_knn_brute")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Double]("cos")).toMap
    ivfpq.foreach { r =>
      val key = (r.getLong(0), r.getAs[Long]("neighbor_id"))
      bruteCos.get(key).foreach(bc => assert(bc == r.getAs[Double]("cos")))
    }
    // tier composition really prunes: every returned neighbor must sit in
    // a cell the query probed (recompute the same deterministic tiers)
    val e = Tables.t(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val numCells = math.max(2, math.sqrt(e.count().toDouble).toInt)
    val cents = graft.operators.Ivf.centroids(e, "vec_id", "v", numCells)(
      SimilarityOps.cosineComposed)
    val cellOf = graft.operators.Ivf.assign(e, cents, "vec_id", "v")(
      SimilarityOps.cosineComposed)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q5 = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probed = graft.operators.Ivf.probeCells(q5, cents, "query_id",
      "qv", 2)(SimilarityOps.cosineComposed)
      .select(col("query_id"), col("cell")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    byQ.foreach { case (q, ids) =>
      ids.foreach { id =>
        assert(probed(q).contains(cellOf(id)),
          s"neighbor $id of query $q is outside the probed cells")
      }
    }
  }

  test("knn-join covers every vector; rank order and recall hold") {
    val g = SimilarityOps.knnJoin(spark, sfSmoke, k = 5).collect()
    val n = Tables.t(spark, sfSmoke, "embeddings").count()
    val byVec = g.groupBy(_.getLong(0))
    // every vector appears as a source (no cell is a singleton at this SF)
    assert(byVec.size == n, s"knn-join covers ${byVec.size} of $n vectors")
    byVec.values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
        (1L to byRank.length).toSeq)
      // cosine non-increasing down the ranks
      val cs = byRank.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(rows.forall(r => r.getAs[Long]("neighbor_id") != r.getLong(0)),
        "self-pairs must be excluded")
    }
    // for the 5 brute-force query vectors, the cell-blocked graph's top-5
    // must substantially overlap the exact top-10 (1-probe approximation)
    val brute = SimilarityOps.queries("sim_knn_brute")(spark, sfSmoke)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      val mine = byVec.getOrElse(q, Array.empty)
        .map(_.getAs[Long]("neighbor_id")).toSet
      mine.count(brute(q).contains).toDouble / math.max(1, mine.size)
    }
    val precision = recalls.sum / recalls.size
    assert(precision >= 0.2,
      s"knn-join precision vs exact top-10 = $precision")
  }

  test("embedding dedup-keep: every original heads a 2-cluster with its copy") {
    val e = Tables.t(spark, sfSmoke, "embeddings")
    val n = e.count()
    val offset = e.agg(max(col("vec_id"))).first().getLong(0) + 1L
    val m = SimilarityOps.dedupKeepEmbeddings(spark, sfSmoke).collect()
    // the doubled corpus (2N vectors) collapses to N kept originals
    assert(m.length == n, s"kept ${m.length} of expected $n")
    assert(m.forall(_.getAs[Long]("n_members") == 2L),
      "every cluster must pair an original with exactly its injected copy")
    assert(m.forall(_.getAs[Long]("vec_id_kept") < offset),
      "the min-id keep policy must always keep the original, not the copy")
  }

  test("IVF tight clusters: recall@10 >= 0.9 with sqrt-N cells / 2 probes") {
    import spark.implicits._
    // 50 well-separated tight clusters of 12 points: any query's true
    // top-10 lives in its own cluster, which a tight cluster maps whole
    // into one IVF cell — so sqrt-N cells + 2 probes must recover it
    val rnd = new scala.util.Random(42)
    val dim = 16
    val pts = for (cl <- 0 until 50; i <- 0 until 12) yield {
      val center = new scala.util.Random(1000 + cl)
      val c = Array.fill(dim)(center.nextGaussian())
      (cl, i, c.map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    }
    val (qs, rest) = pts.partition { case (cl, i, _) => cl < 5 && i == 0 }
    val rows =
      qs.zipWithIndex.map { case ((cl, _, v), k) => (k.toLong, cl.toLong, v) } ++
      rest.zipWithIndex.map { case ((cl, _, v), k) => (k + 5L, cl.toLong, v) }
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-ivf-fix-${java.util.UUID.randomUUID()}").getAbsolutePath
    rows.toDF("vec_id", "label", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val brute = SimilarityOps.queries("sim_knn_brute")(spark, dir)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val ivf = SimilarityOps.knnIvf(spark, dir)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      brute(q).count(ivf.getOrElse(q, Set.empty[Long]).contains)
        .toDouble / brute(q).size
    }
    val avgRecall = recalls.sum / recalls.size
    assert(avgRecall >= 0.9, s"IVF clustered-fixture recall@10 = $avgRecall")
    // structural scale contract: <= sqrt(N) cells, exactly nprobe probes
    val e = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val numCells = math.max(2, math.sqrt(rows.size.toDouble).toInt)
    assert(numCells <= math.sqrt(rows.size.toDouble).toInt)
    val cents = graft.operators.Ivf.centroids(e, "vec_id", "v", numCells)(
      SimilarityOps.cosineComposed)
    assert(cents.count() <= numCells)
    val q5 = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = graft.operators.Ivf.probeCells(q5, cents, "query_id", "qv", 2)(
      SimilarityOps.cosineComposed)
    assert(probes.count() == 10, "each of 5 queries probes exactly 2 cells")
  }

  test("cosine-LSH recovers exactly the injected near-duplicate embeddings") {
    val emb = Tables.t(spark, sfSmoke, "embeddings")
    val n = emb.count()
    val offset = emb.agg(max(col("vec_id"))).first().getLong(0) + 1L
    val pairs = SimilarityOps.nearDupLsh(spark, sfSmoke).collect()
    // recall 1.0 AND precision 1.0 on this corpus: the only pairs with
    // cos >= 0.99 are each vector and its perturbed copy (real data tops
    // out at cos ~0.48)
    assert(pairs.length == n, s"expected $n injected pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + offset))
    assert(pairs.forall(_.getAs[Double]("cos") >= 0.99))
    // prefilter tightness: among the unrelated real vectors the banded
    // hamming<=8 candidate set must be near-empty, nowhere near all-pairs
    val e = Tables.t(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val sig = graft.operators.CosineLsh.signatures(e, "vec_id", "v", 64)
    val cand = graft.operators.Dedup.simHashPairs(sig, "vec_id", maxHamming = 8)
    assert(cand.count() <= n / 10,
      "unrelated vectors must rarely survive the banded prefilter")
  }

  test("int8 quantization: reconstruction error within half a step") {
    val rows = SimilarityOps.queries("sim_quantize_stats")(spark, sfSmoke)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val err = r.getAs[Double]("max_err")
      assert(scale > 0)
      // half a quantization step (scale/127/2) plus float slack
      assert(err <= scale / 254.0 + 1e-12,
        s"vec ${r.getLong(0)}: err $err > half-step ${scale / 254.0}")
    }
  }

  test("brute-force knn: 10 neighbors per query, self excluded, sorted") {
    val rows = SimilarityOps.queries("sim_knn_brute")(spark, sfSmoke).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 10)
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q))
      val cs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("random projection roughly preserves pairwise distances (JL)") {
    val proj = SimilarityOps.queries("sim_rp_project")(spark, sfSmoke)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(rs => rs.sortBy(_.getLong(1)).map(_.getDouble(2)))
      .toMap
    val orig = Tables.t(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(proj.size == orig.size)
    assert(proj.values.forall(_.length == 16))
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(20)
    val ratios = for (Seq(a, b) <- ids.combinations(2).toSeq)
      yield d2(proj(a).toArray, proj(b).toArray) / d2(orig(a), orig(b))
    // 16 output dims is a loose JL regime: individual squared-distance
    // ratios stay within a wide band, the mean concentrates near 1
    assert(ratios.forall(r => r > 0.1 && r < 3.5),
      s"JL distortion out of band: min ${ratios.min}, max ${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean distance ratio drifted: $mean")
  }

  // ---- text -----------------------------------------------------------

  test("quality features are internally consistent") {
    val rows = TextOps.queries("tx_quality")(spark, sfSmoke).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_words") > 0)
      val ratio = r.getAs[Double]("stopword_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      val score = r.getAs[Double]("quality_score")
      assert(score >= 0.0 && score <= 1.0)
    }
  }

  test("langid confusion matrix covers all labeled docs") {
    val n = TextOps.queries("tx_langid")(spark, sfSmoke)
      .agg(sum("n")).first().getLong(0)
    assert(n == Tables.t(spark, sfSmoke, "documents").count())
  }

  test("winnowing: near-dups share fingerprints, unrelated docs don't") {
    val fps = TextOps.winnowFingerprints(spark, sfSmoke).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val nd = DedupOps.queries("dd_ngram_jaccard")(spark, sfSmoke)
      .filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(nd.nonEmpty, "fixture should contain near-dup pairs")
    nd.foreach { case (a, b) =>
      val overlap = fps(a).intersect(fps(b)).size.toDouble /
        math.min(fps(a).size, fps(b).size)
      assert(overlap >= 0.5, s"near-dup ($a,$b) shares only $overlap")
    }
    // two docs that are NOT near-dups must share (almost) nothing
    val paired = nd.flatMap(p => Seq(p._1, p._2)).toSet
    val unrelated = fps.keys.toSeq.sorted.filterNot(paired.contains).take(2)
    val (u, v) = (unrelated(0), unrelated(1))
    val o = fps(u).intersect(fps(v)).size.toDouble /
      math.min(fps(u).size, fps(v).size)
    assert(o <= 0.2, s"unrelated ($u,$v) share $o of fingerprints")
  }

  test("ahash dedup: byte-identical images (ids = mod 320) collapse") {
    val rows = MultimodalOps.queries("mm_ahash_dedup")(spark, sfSmoke)
      .collect()
    val n = Tables.t(spark, sfSmoke, "documents").count()
    assert(rows.map(_.getAs[Long]("n_images")).sum == n)
    assert(rows.length < n, "no perceptual collapse at all")
    // ids congruent mod 320 decode to byte-identical images, so no such
    // id can LEAD a hash group — its mod-320 twin has the smaller id
    if (n > 320) {
      val keepers = rows.map(_.getAs[Long]("keeper_id")).toSet
      (320L until n).foreach { id =>
        assert(!keepers.contains(id),
          s"id $id should collapse into id ${id - 320}'s group")
      }
    }
  }

  test("drift report: every corpus term appears, ratios near 1 for balance") {
    val rows = TextOps.queries("tx_drift_report")(spark, sfSmoke).collect()
    import spark.implicits._
    val vocab = Tables.t(spark, sfSmoke, "documents")
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .distinct().count()
    assert(rows.length == vocab)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("rate_ratio")
      assert(ratio > 0.0, s"ratio must be positive: $r")
      // the even/odd split is a random halving, so no common term should
      // drift an order of magnitude; rare terms can swing a few-fold
      val n = r.getAs[Long]("n_old") + r.getAs[Long]("n_new")
      if (n > 100) assert(ratio > 0.5 && ratio < 2.0, s"drifted: $r")
    }
  }

  test("url dedup: scheme/port/case/dot-segment/utm variants collapse") {
    val rows = DedupOps.queries("dd_url_dedup")(spark, sfSmoke).collect()
    val n = Tables.t(spark, sfSmoke, "documents").count()
    // 4 variants per target: v0+v1 collapse, v2 and v3 stay singletons
    assert(rows.map(_.getAs[Long]("n_variants")).sum == n)
    val pairs = rows.filter(_.getAs[Long]("n_variants") == 2)
    assert(pairs.nonEmpty, "no collapsed variant pairs found")
    // every pair's keeper is a v0 id and its canonical is the https form
    pairs.foreach { r =>
      assert(r.getAs[Long]("keeper_id") % 4 == 0)
      val c = r.getAs[String]("canonical")
      assert(c.startsWith("https://example.com/") && c.endsWith("?x=1"), c)
      assert(!c.contains("www.") && !c.contains("utm") && !c.contains(".."))
    }
  }

  test("tfidf terms: top-3 per doc, terms drawn from the doc itself") {
    val rows = TextOps.queries("tx_tfidf_terms")(spark, sfSmoke).collect()
    val docs = Tables.t(spark, sfSmoke, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSet).toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size == docs.size)
    byDoc.foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq)
      assert(sorted.length <= 3)
      // score non-increasing in rank; every term occurs in the document
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      sorted.foreach(r => assert(docs(id).contains(r.getAs[String]("term"))))
    }
  }

  test("bm25: rare term dominates its query; OOV term contributes nothing") {
    val rows = TextOps.queries("tx_bm25")(spark, sfSmoke).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    // every query with in-vocabulary terms returns a ranked, score-sorted
    // top list with positive scores
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(_ > 0.0))
    }
    // query 1 = {dup, join}: 'dup' is the corpus's one rare term, so every
    // doc ranked above a dup-free doc must itself contain 'dup' (idf of
    // the ubiquitous 'join' is tiny by comparison)
    val dupDocs = Tables.t(spark, sfSmoke, "documents")
      .filter(col("text").rlike("\\bdup\\b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    if (dupDocs.nonEmpty && byQ.contains(1L)) {
      val q1 = byQ(1L).sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Long]("doc_id"))
      val firstNonDup = q1.indexWhere(!dupDocs.contains(_))
      if (firstNonDup >= 0)
        assert(q1.take(firstNonDup).forall(dupDocs.contains))
      assert(dupDocs.contains(q1.head),
        s"top doc for the dup query should contain 'dup': ${q1.head}")
    }
    // query 3 carries the OOV term 'shuffle': it must not crash, NaN, or
    // zero out the query — the in-vocab terms still rank docs
    assert(byQ.contains(3L) && byQ(3L).length == 10)
  }

  test("winnow pairs: fp-join recovers the exact high-jaccard pairs") {
    val exact = DedupOps.queries("dd_ngram_jaccard")(spark, sfSmoke)
      .filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val wp = TextOps.queries("tx_winnow_pairs")(spark, sfSmoke).collect()
    val pairs = wp.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(pairs.contains).toDouble / exact.size
    assert(recall >= 0.9, s"winnow-pair recall $recall over ${exact.size}")
    // overlap coefficient is a valid ratio and respects the threshold
    wp.foreach { r =>
      val o = r.getAs[Double]("overlap")
      assert(o >= 0.5 && o <= 1.0, s"overlap out of range: $r")
    }
  }

  // ---- multimodal -----------------------------------------------------

  test("audio WHT: Parseval holds over the full 128-coefficient basis") {
    // Σ_k C_k² = N · Σ_i v_i² for the (unnormalized) Walsh–Hadamard
    // transform — an exact integer identity that pins every sample AND
    // every sign: any slip breaks it
    for (id <- Seq(0L, 3L, 7L)) {
      val sr = 8000 + ((id % 8) * 1000).toInt
      val ch = 1 + (id % 2).toInt
      val frames = 128 + (id % 256).toInt
      val v = graft.multimodal.Media.wavSamples(
        graft.multimodal.Media.encodeWavPattern(sr, ch, frames)).take(128)
      def wht(k: Int): Long = (0 until 128).map { i =>
        (if (Integer.bitCount(i & k) % 2 == 0) 1L else -1L) * v(i)
      }.sum
      val lhs = (0 until 128).map(k => BigInt(wht(k)) * wht(k)).sum
      val rhs = BigInt(128) * v.map(x => BigInt(x.toLong) * x.toLong).sum
      assert(lhs == rhs, s"id=$id: Parseval violated")
    }
  }

  test("mapPartitions decode path equals the codegen expression path") {
    val expr = MultimodalOps.queries("mm_decode_meta")(spark, sfSmoke)
      .select(col("doc_id").as("id"), col("width"), col("height"),
        col("format"), col("n_frames"))
    val batch = Media.decodeBatch(
      Tables.t(spark, sfSmoke, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload")),
      "doc_id", "payload", Media.FakeDecoder)
    assert(expr.count() == batch.count())
    assert(expr.except(batch).count() == 0)
  }

  test("jpeg: fixture decodes to the closed-form pixels, block by block") {
    import graft.multimodal.Jpeg
    for (id <- Seq(0L, 1L, 7L, 42L, 63L)) {
      val img = Jpeg.decode(Jpeg.fixturePayload(id))
      val w = 8 * (2 + (id % 5).toInt)
      val h = 8 * (2 + ((id * 3) % 4).toInt)
      assert(img.width == w && img.height == h, s"dims for id=$id")
      for (by <- 0 until h / 8; bx <- 0 until w / 8) {
        val dc = ((id + 7L * bx + 13L * by) % 64).toInt - 32
        val expected = 128 + 2 * dc
        for (yy <- 0 until 8; xx <- 0 until 8) {
          val got = img.pixels((by * 8 + yy) * w + bx * 8 + xx)
          assert(got == expected,
            s"id=$id block($bx,$by) pixel($xx,$yy): $got != $expected")
        }
      }
      // the header tier reads the same file without entropy decode
      val meta = Media.HeaderDecoder.decode(Jpeg.fixturePayload(id))
      assert(meta == Media.MediaMeta(w, h, "jpeg", 1))
    }
  }

  test("jpeg: AC coefficients, ZRL runs, and stuffing agree with ImageIO") {
    import graft.multimodal.Jpeg
    // random-but-seeded quantized blocks exercise the AC run-length
    // paths (long zero runs → ZRL, trailing zeros → EOB, dense blocks)
    // and, statistically, byte stuffing. The JDK's ImageIO JPEG reader
    // is an INDEPENDENT implementation; T.81 allows ±1 IDCT variance
    // between compliant decoders, so compare within that bound.
    val rng = new java.util.Random(4242L)
    val (w, h) = (64, 48)
    val blocks = Array.fill((h / 8) * (w / 8)) {
      val coef = new Array[Int](64)
      coef(0) = rng.nextInt(128) - 64
      // a few AC coefficients at random positions (random zigzag depths)
      (0 until rng.nextInt(6)).foreach { _ =>
        coef(1 + rng.nextInt(63)) = rng.nextInt(21) - 10
      }
      coef
    }
    val bytes = Jpeg.encodeGray(w, h, Jpeg.QuantFlat16,
      (bx, by) => blocks(by * (w / 8) + bx))
    val ours = Jpeg.decode(bytes)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO failed to read the generated JPEG")
    assert(ref.getWidth == w && ref.getHeight == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = ref.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(r - ours.pixels(y * w + x)))
    }
    assert(maxDiff <= 1, s"decoders disagree by $maxDiff (> 1)")
  }

  test("jpeg: restart markers round-trip and agree with ImageIO") {
    import graft.multimodal.Jpeg
    val rng = new java.util.Random(777L)
    val (w, h) = (48, 32)
    val blocks = Array.fill((h / 8) * (w / 8)) {
      val coef = new Array[Int](64)
      coef(0) = rng.nextInt(96) - 48
      (0 until rng.nextInt(4)).foreach { _ =>
        coef(1 + rng.nextInt(63)) = rng.nextInt(15) - 7
      }
      coef
    }
    val bytes = Jpeg.encodeGray(w, h, Jpeg.QuantFlat16,
      (bx, by) => blocks(by * (w / 8) + bx), restartInterval = 5)
    // the stream really carries RSTn markers (0xffd0..0xffd7)
    val hasRst = bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff &&
      ((p(1) & 0xff) & 0xf8) == 0xd0 && (p(1) & 0xff) != 0xd8)
    assert(hasRst, "restartInterval=5 must emit RSTn markers")
    val ours = Jpeg.decode(bytes)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(ref != null && ref.getWidth == w && ref.getHeight == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      maxDiff = math.max(maxDiff, math.abs(
        ref.getRaster.getSample(x, y, 0) - ours.pixels(y * w + x)))
    }
    assert(maxDiff <= 1, s"restart-marker decode disagrees by $maxDiff")
  }

  test("wav samples: pattern roundtrip, sign decode, torn data refused") {
    val p = Media.encodeWavPattern(16000, 2, 300)
    val s = Media.wavSamples(p)
    assert(s.length == 600)
    s.zipWithIndex.foreach { case (v, k) =>
      assert(v == ((k * 37 + 13) % 2048) - 1024, s"sample $k")
    }
    assert(s.exists(_ < 0), "negative samples must decode as signed")
    intercept[IllegalArgumentException] {
      Media.wavSamples(p.take(50)) // data chunk torn off
    }
    intercept[IllegalArgumentException] {
      Media.wavSamples(Array[Byte](1, 2, 3))
    }
  }

  test("jpeg: unsupported modes and torn streams fail loudly") {
    import graft.multimodal.Jpeg
    val good = Jpeg.fixturePayload(3L)
    intercept[IllegalArgumentException] {
      Jpeg.decode(good.take(good.length / 2)) // torn entropy data
    }
    intercept[IllegalArgumentException] {
      Jpeg.decode(Array[Byte](1, 2, 3, 4)) // not a JPEG
    }
    // flip SOF0 to SOF2 on a BASELINE stream: the scan header (Ss=0,
    // Se=63) is malformed for progressive (a DC scan must carry Se=0), so
    // the decoder — which now supports real SOF2 (JpegProgressiveSpec) —
    // must reject the inconsistent frame loudly rather than misdecode it
    val good0 = Jpeg.fixturePayload(3L) // id % 3 == 0 → baseline encoding
    val prog = good0.clone()
    val sofAt = good0.indices.find(i => (good0(i) & 0xff) == 0xff &&
      (good0(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException] { Jpeg.decode(prog) }
    assert(e.getMessage.contains("progressive"))
  }

  test("stubbed decoder is clearly not implemented") {
    intercept[NotImplementedError] {
      Media.NotImplementedDecoder.decode(Array[Byte](1, 2, 3))
    }
  }

  test("resize plan: long side hits 224, aspect kept, padding centers") {
    val rows = MultimodalOps.queries("mm_resize_plan")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      val (px, py) = (r.getAs[Long]("pad_x"), r.getAs[Long]("pad_y"))
      assert(math.max(ow, oh) == 224, s"long side must land on 224: $r")
      assert(ow >= 1 && oh >= 1 && ow <= 224 && oh <= 224)
      // rounded dims stay within half a pixel of the exact scaled size
      val scale = 224.0 / math.max(w, h)
      assert(math.abs(ow - w * scale) <= 0.5 + 1e-9, s"out_w drift: $r")
      assert(math.abs(oh - h * scale) <= 0.5 + 1e-9, s"out_h drift: $r")
      assert(px >= 0 && py >= 0 && px * 2 + ow <= 225 && py * 2 + oh <= 225)
    }
  }

  test("frame sampling strides correctly") {
    val rows = MultimodalOps.queries("mm_frame_sample")(spark, sfSmoke)
      .filter(col("doc_id") === 0).collect()
    val idxs = rows.map(_.getAs[Long]("frame_idx"))
    assert(idxs.forall(_ % 2 == 0))
    assert(rows.forall(r =>
      r.getAs[Long]("byte_offset") == r.getAs[Long]("frame_idx") * 100))
  }

  // ---- training-data curation -----------------------------------------

  test("pack manifest: offsets bounded, bins start at 0 and never regress") {
    val rows = TrainingOps.queries("tx_pack")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val off = r.getAs[Long]("bin_offset")
      off >= 0 && off < 2048
    })
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val byDoc = rs.sortBy(_.getAs[Long]("doc_id"))
      assert(byDoc.head.getAs[Long]("bin_id") == 0L,
        s"shard $shard must start at bin 0")
      // cum_before is a prefix sum, so bin ids are monotone within a shard
      val bins = byDoc.map(_.getAs[Long]("bin_id"))
      assert(bins.zip(bins.tail).forall { case (a, b) => b >= a },
        s"bin ids regress in shard $shard")
    }
  }

  test("stratified sample: hash-deterministic, rates respected, en downsampled") {
    val q = TrainingOps.queries("tx_sample")
    val a = q(spark, sfSmoke).collect()
    val b = q(spark, sfSmoke).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "same input must yield the identical sample")
    assert(a.forall { r =>
      val cap = if (r.getAs[String]("lang") == "en") 25L else 80L
      r.getAs[Long]("bucket") < cap
    })
    val total = Tables.t(spark, sfSmoke, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    // en is downsampled 25%, the rest kept at 80% — the kept FRACTION of
    // en must land well below the others (binomial noise stays far from
    // crossing at these fixture sizes)
    val enFrac = kept("en").toDouble / total("en")
    assert(total.keys.filter(_ != "en").forall { l =>
      enFrac < kept(l).toDouble / total(l)
    }, s"en kept fraction $enFrac should be the smallest")
  }

  test("normalization is a fixpoint: applying it twice changes nothing") {
    val once = TrainingOps.queries("tx_normalize")(spark, sfSmoke)
    val drift = once
      .withColumn("again", TrainingOps.normalizeText(col("norm_text")))
      .filter(col("again") =!= col("norm_text"))
    assert(drift.count() == 0)
  }

  test("topics: partition of the corpus, cohesive clusters, deterministic") {
    val n = Tables.t(spark, sfSmoke, "embeddings").count()
    val a = SimilarityOps.topics(spark, sfSmoke).collect()
    assert(a.nonEmpty && a.length <= 8, s"k=8 gives at most 8 topics")
    assert(a.map(_.getAs[Long]("n_members")).sum == n,
      "every vector lands in exactly one topic")
    a.foreach { r =>
      val c = r.getAs[Double]("mean_cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // hash seeding + Lloyd are deterministic: a re-run is identical
    val b = SimilarityOps.topics(spark, sfSmoke).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("bigram LM: bigram mass matches token counts; surprisal bounded") {
    import org.apache.spark.sql.functions.{col, size, split}
    val docs = Tables.t(spark, sfSmoke, "documents")
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    val rows = TextOps.queries("tx_bigram_lm")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_bigrams") == docs(id) - 1,
        s"doc $id: bigram count must be token count - 1")
      val mean = r.getAs[Double]("mean_surprisal")
      val mx = r.getAs[Double]("max_surprisal")
      assert(mean > 0.0 && mean <= mx)
    }
    // every multi-token doc is represented
    assert(rows.length == docs.count(_._2 >= 2))
  }

  test("pca power iteration: integer loadings align with double PCA") {
    val rows = SimilarityOps.queries("sim_pca_power")(spark, sfSmoke)
      .collect().sortBy(_.getAs[Long]("dim"))
    assert(rows.length == 64)
    val v = rows.map(_.getAs[Double]("loading"))
    assert(math.abs(v.map(math.abs).max - 1.0) < 1e-9,
      "max-|.| normalization must land exactly on 1.0")
    // ground truth: a DOUBLE-precision replica of the same schedule (same
    // all-ones start, same 6 rounds, same max-|.| renormalization) over
    // the unquantized covariance. The corpus is near-isotropic (random
    // embeddings have an almost flat spectrum), so "the converged top
    // eigenvector" is not a usable reference — what IS pinned down is
    // that the integer/truncating arithmetic tracks the real-valued
    // iteration to high precision.
    val data = Tables.t(spark, sfSmoke, "embeddings")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS v").collect()
      .map(_.getSeq[Double](0).toArray)
    val n = data.length
    val mean = Array.tabulate(64)(j => data.map(_(j)).sum / n)
    val cov = Array.tabulate(64, 64)((j, k) =>
      data.map(r => (r(j) - mean(j)) * (r(k) - mean(k))).sum)
    var w = Array.fill(64)(1.0)
    for (_ <- 0 until 6) {
      val mw = Array.tabulate(64)(j =>
        (0 until 64).map(k => cov(j)(k) * w(k)).sum)
      val m = mw.map(math.abs).max
      w = mw.map(_ / m)
    }
    val dot = v.zip(w).map { case (a, b) => a * b }.sum
    val vn = math.sqrt(v.map(x => x * x).sum)
    val wn = math.sqrt(w.map(x => x * x).sum)
    assert(math.abs(dot) / (vn * wn) > 0.999,
      s"integer iteration diverges from the double replica: |cos|=" +
        s"${math.abs(dot) / (vn * wn)}")
  }

  test("semdedup: drops are injected copies only; accounting is exact") {
    val n = Tables.t(spark, sfSmoke, "embeddings").count()
    val rows = SimilarityOps.semDedup(spark, sfSmoke).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == 2 * n,
      "cluster sizes must sum to the doubled corpus")
    val dropped = rows.map(_.getAs[Long]("n_dropped")).sum
    // the source corpus has no true near-dups at 0.99 (max pairwise cos
    // ~0.48), so only injected copies can drop — and a copy drops iff it
    // lands in its original's cluster, which the tight 0.9999 cosine
    // makes the norm
    assert(dropped > 0 && dropped <= n,
      s"dropped=$dropped must be within (0, $n]")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") ==
        r.getAs[Long]("n_vectors") - r.getAs[Long]("n_dropped"))
    }
    // deterministic: a re-run is identical
    val again = SimilarityOps.semDedup(spark, sfSmoke).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("semdedup: derived k scales with the corpus; pair work stays " +
      "O(N^1.5) on a 10x corpus") {
    // 10 deterministic jittered replicas of the smoke embeddings: copy c
    // scales coordinate i by 1 + ((c*31+i) % 97 - 48)/1e3 — distinct
    // vectors, preserved direction structure, zero randomness. This is
    // the shape a 10x-scaled corpus takes: the same topic clumps, more
    // members each.
    val base = Tables.t(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n0 = base.count()
    val big = spark.range(10).crossJoin(base)
      .select((col("vec_id") + col("id") * n0).as("vec_id"),
        expr("transform(v, (x, i) -> x * (1.0 + " +
          "((id * 31 + i) % 97 - 48) / 1000.0))").as("v"))
      .localCheckpoint()
    val rowsBig = SimilarityOps.semDedupCorpus(spark, big).collect()
    val nBig = rowsBig.map(_.getAs[Long]("n_vectors")).sum
    assert(nBig == 10 * n0, s"corpus accounting: $nBig != ${10 * n0}")
    // k derives as max(8, floor(sqrt(N))) — the observed (non-empty)
    // cluster count must stay under that cap AND materially exceed the
    // doubled smoke corpus's cap of floor(sqrt(2*n0)): a frozen k could
    // not clear this bar on the scaled corpus
    val kCapBig = math.max(8, math.sqrt(nBig.toDouble).toInt)
    val kCapBase = math.max(8, math.sqrt(2.0 * n0).toInt)
    assert(rowsBig.length <= kCapBig,
      s"${rowsBig.length} clusters exceed the derived cap $kCapBig")
    assert(rowsBig.length > kCapBase,
      s"only ${rowsBig.length} non-empty clusters on the 10x corpus — " +
        s"no more than the small-corpus cap $kCapBase, k did not scale")
    // the within-cluster quadratic is the whole point of deriving k:
    // total pair work must stay a small multiple of N^1.5 (it would be
    // ~N^2/k with a frozen k), and no single cluster may hog the corpus
    val pairWork = rowsBig.map { r =>
      val m = r.getAs[Long]("n_vectors"); m * (m - 1) / 2
    }.sum
    val bound = 4L * math.pow(nBig.toDouble, 1.5).toLong
    assert(pairWork <= bound,
      s"within-cluster pair work $pairWork exceeds 4*N^1.5 = $bound")
    val maxCluster = rowsBig.map(_.getAs[Long]("n_vectors")).max
    assert(maxCluster <= 8L * math.sqrt(nBig.toDouble).toLong,
      s"max cluster $maxCluster exceeds 8*sqrt(N)")
  }

  test("header decoder: roundtrip, top-down BMP, chunked WAV, bad magic") {
    import Media.{HeaderDecoder, MediaMeta}
    // construction → decode roundtrip across the parameter space
    for (w <- Seq(1, 16, 640); h <- Seq(1, 16, 480)) {
      assert(HeaderDecoder.decode(Media.encodePpm(w, h)) ==
        MediaMeta(w, h, "ppm", 1))
      assert(HeaderDecoder.decode(Media.encodeBmp(w, h)) ==
        MediaMeta(w, h, "bmp", 1))
    }
    assert(HeaderDecoder.decode(Media.encodeWav(44100, 2, 1000)) ==
      MediaMeta(44100, 2, "wav", 1000))
    // top-down BMP stores a NEGATIVE height; the dimension is |h|
    val topDown = Media.encodeBmp(32, 8)
    val bb = java.nio.ByteBuffer.wrap(topDown)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -8)
    assert(HeaderDecoder.decode(topDown) == MediaMeta(32, 8, "bmp", 1))
    // a LIST chunk before "data" must be skipped by the RIFF scan
    val wav = Media.encodeWav(8000, 1, 64)
    val extra = java.nio.ByteBuffer
      .allocate(wav.length + 12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(wav, 0, 36) // RIFF header + fmt chunk
    extra.put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII"))
    extra.put(wav, 36, wav.length - 36) // the data chunk
    assert(HeaderDecoder.decode(extra.array()) ==
      MediaMeta(8000, 1, "wav", 64))
    // unknown magic fails loudly, never a garbage decode
    intercept[IllegalArgumentException] {
      HeaderDecoder.decode("GIF89a....".getBytes("US-ASCII"))
    }
  }

  test("header decoder: PNG chunk walk (acTL frames) and GIF block walk " +
      "(descriptor-counted frames, color tables skipped)") {
    import Media.{HeaderDecoder, MediaMeta}
    for (w <- Seq(1, 16, 640); h <- Seq(1, 16, 480)) {
      // plain PNG: no acTL → 1 frame; APNG: acTL num_frames
      assert(HeaderDecoder.decode(Media.encodePng(w, h, 1)) ==
        MediaMeta(w, h, "png", 1))
      assert(HeaderDecoder.decode(Media.encodePng(w, h, 7)) ==
        MediaMeta(w, h, "png", 7))
      // GIF frames are counted, not declared — with and without a
      // global color table in the walk's way
      assert(HeaderDecoder.decode(Media.encodeGif(w, h, 3)) ==
        MediaMeta(w, h, "gif", 3))
      assert(HeaderDecoder.decode(Media.encodeGif(w, h, 3, gct = true)) ==
        MediaMeta(w, h, "gif", 3))
    }
    // a GIF missing its trailer fails loudly, never a silent count
    val cut = Media.encodeGif(8, 8, 2)
    intercept[Exception] {
      HeaderDecoder.decode(cut.dropRight(1))
    }
    // a PNG whose IHDR is not first is rejected
    intercept[IllegalArgumentException] {
      val p = Media.encodePng(8, 8, 1)
      p(13) = 'X'.toByte
      HeaderDecoder.decode(p)
    }
  }

  test("count-min heavy hitters: one-sided, partition-independent, exact top") {
    import spark.implicits._
    // quadratic-weight fixture: tok_i appears i² times → true top-10 is
    // tok50..tok41, far enough apart that any sketch error would reorder
    val words = (1 to 50).flatMap(i => Seq.fill(i * i)(f"tok$i%02d"))
    val truth = (1 to 50).map(i => f"tok$i%02d" -> (i.toLong * i)).toMap
    val agg = new graft.functions.CountMinTopK(10)
    val one = words.toDS().repartition(1).select(agg.toColumn).head()
    val many = words.toDS().repartition(8).select(agg.toColumn).head()
    // cell-wise merge: the result cannot depend on partitioning
    assert(one == many, s"partitioning changed the sketch: $one vs $many")
    assert(one.map(_._1) ==
      (41 to 50).reverse.map(i => f"tok$i%02d"), s"top-10 wrong: $one")
    // CMS estimates are one-sided: est ≥ true, and within εN above it
    val n = words.size
    one.foreach { case (tok, est) =>
      assert(est >= truth(tok), s"$tok underestimated")
      assert(est <= truth(tok) + (3.0 * n / 1024).ceil.toLong,
        s"$tok overestimated beyond the CMS bound: $est vs ${truth(tok)}")
    }
    // the corpus query reports est ≥ exact on every row
    val rows = TextOps.queries("tx_heavy_hitters")(spark, sfSmoke).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_count") >= r.getAs[Long]("exact_count"))
    }
  }

  // ---- curation: repetition / contamination / rarity -------------------

  test("repetition: flags injected spam, passes normal prose, flag = rule") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, ("buy now " * 20).trim),
      // long enough that 1/(n_grams) clears the 0.08 bar: a SHORT unique
      // doc still has top2_frac = 1/(words-1), which is the length-
      // sensitivity the Gopher rules accept on long-form corpora
      (3L, (1 to 30).map(i => s"word$i").mkString(" ")))
      .toDF("doc_id", "text")
    val m = TextOps.repetitionMetrics(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: every 2-gram is "spam spam" → top2_frac = 1, flagged
    assert(m(1L).getAs[Double]("top2_frac") == 1.0)
    assert(m(1L).getAs[Long]("flagged") == 1L)
    // doc 2: "buy now" dominates and every 3-gram repeats → both fire
    assert(m(2L).getAs[Double]("dup3_frac") == 1.0)
    assert(m(2L).getAs[Long]("flagged") == 1L)
    // doc 3: no repeated n-gram at all
    assert(m(3L).getAs[Double]("top2_frac") < 0.08)
    assert(m(3L).getAs[Double]("dup3_frac") == 0.0)
    assert(m(3L).getAs[Long]("flagged") == 0L)
    // the flag is exactly the published rule on the fixture corpus
    val rows = TextOps.queries("tx_repetition")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = r.getAs[Double]("top2_frac") > 0.08 ||
        r.getAs[Double]("dup3_frac") > 0.02
      assert((r.getAs[Long]("flagged") == 1L) == expect)
    }
  }

  test("contamination: only train docs reported, every hit shares a gram") {
    val rows = TextOps.queries("tx_contamination")(spark, sfSmoke).collect()
    assert(rows.nonEmpty, "fixture near-dups should cross the bench split")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 10 != 7, "bench docs are not train")
      assert(r.getAs[Long]("n_shared_grams") >= 1L)
      assert(r.getAs[Long]("n_bench_docs") >= 1L)
    }
    // independent recompute of one reported doc's shared-gram count
    val docId = rows.head.getAs[Long]("doc_id")
    val sh = Dedup.shingles(Tables.t(spark, sfSmoke, "documents"),
      "doc_id", "text", 8)
    val benchGrams = sh.filter(col("doc_id") % 10 === 7)
      .select("shingle").distinct()
    val expected = sh.filter(col("doc_id") === docId)
      .join(benchGrams, Seq("shingle")).count()
    assert(rows.head.getAs[Long]("n_shared_grams") == expected)
  }

  test("PII redaction: injected emails/IPs/phones replaced and counted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact alice.smith+x@example.co.uk or bob@host.org today"),
      (2L, "server at 192.168.1.254 peered with 10.0.0.1 overnight"),
      (3L, "call 415-555-1234 or 212.555.9876 before noon"),
      (4L, "version 1.2 of chapter 12 has no sensitive content at all"))
      .toDF("doc_id", "text")
    val r = TextOps.redactPii(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_emails") == 2)
    assert(r(1L).getAs[String]("red_text") ==
      "contact <EMAIL> or <EMAIL> today")
    assert(r(2L).getAs[Long]("n_ips") == 2)
    assert(r(2L).getAs[String]("red_text") ==
      "server at <IP> peered with <IP> overnight")
    assert(r(3L).getAs[Long]("n_phones") == 2)
    assert(r(3L).getAs[String]("red_text") ==
      "call <PHONE> or <PHONE> before noon")
    // no false positives on version-number-ish text
    assert(r(4L).getAs[String]("red_text") == docs.collect()(3).getString(1))
    assert(r(4L).getAs[Long]("n_emails") + r(4L).getAs[Long]("n_ips")
      + r(4L).getAs[Long]("n_phones") == 0)
  }

  test("curation manifest: verdicts consistent with their source rules") {
    val m = TextOps.queries("tx_curation_manifest")(spark, sfSmoke).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    val nDocs = Tables.t(spark, sfSmoke, "documents").count()
    assert(m.size == nDocs.toInt, "one verdict per document")
    assert(m.values.toSet.subsetOf(
      Set("kept", "duplicate", "contaminated", "repetitive", "too_short")))
    // contaminated verdicts ⊆ the contamination query's hits (a doc can
    // be contaminated yet verdict 'duplicate' — severity order)
    val contDocs = TextOps.queries("tx_contamination")(spark, sfSmoke)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    m.collect { case (id, "contaminated") => id }.foreach { id =>
      assert(contDocs.contains(id), s"doc $id marked contaminated w/o hit")
    }
    // every duplicate has a kept doc with the same text and a smaller id
    val byHash = Tables.t(spark, sfSmoke, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    m.collect { case (id, "duplicate") => id }.foreach { id =>
      val keeper = byHash.collect {
        case (i, h) if h == byHash(id) => i }.min
      assert(keeper < id, s"dup $id should not be its hash's min")
    }
    // a kept doc fails none of the rules its verdict outranks
    val flagged = TextOps.queries("tx_repetition")(spark, sfSmoke)
      .filter(col("flagged") === 1L).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    m.collect { case (id, "kept") => id }.foreach { id =>
      assert(!contDocs.contains(id) && !flagged.contains(id),
        s"doc $id kept despite a failing rule")
    }
  }

  test("rarity: df-weighted mean bounded by min; token mass conserved") {
    val rows = TextOps.queries("tx_rarity")(spark, sfSmoke).collect()
    val nDocs = Tables.t(spark, sfSmoke, "documents").count()
    assert(rows.length == nDocs.toInt)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_df") >= 1L)
      assert(r.getAs[Long]("min_df") <= nDocs)
      assert(r.getAs[Double]("mean_df") >= r.getAs[Long]("min_df").toDouble)
      assert(r.getAs[Long]("n_tokens") >= 1L)
    }
    // every token instance is scored exactly once
    val totalTokens = Tables.t(spark, sfSmoke, "documents")
      .select(size(split(col("text"), "\\s+")).cast("long").as("n"))
      .agg(sum(col("n"))).first().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalTokens)
  }
}
