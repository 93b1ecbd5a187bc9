package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.TimeSeriesStats

/** Property-based checks (ScalaCheck driven from ScalaTest). */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("integer-cents sum is exact for any 2-decimal amounts") {
    val cents = Gen.chooseNum(-10000000L, 10000000L)
    check(Prop.forAll(Gen.listOfN(50, cents)) { cs =>
      // the engine's canonicalization: sum(round(x*100).toLong)/100.0
      val doubles = cs.map(_ / 100.0)
      val viaCents = doubles.map(d => math.round(d * 100)).sum
      viaCents == cs.sum
    })
  }

  test("cents sum is order-independent (associativity restored)") {
    val cents = Gen.chooseNum(-1000000L, 1000000L)
    check(Prop.forAll(Gen.listOfN(40, cents), Gen.long) { (cs, seed) =>
      val doubles = cs.map(_ / 100.0)
      val shuffled = new scala.util.Random(seed).shuffle(doubles)
      doubles.map(d => math.round(d * 100)).sum ==
        shuffled.map(d => math.round(d * 100)).sum
    })
  }

  test("cusum closed form equals the tabular recursion for any series") {
    // ts_cusum's window form: S+_t = P_t - min_{i<=t} P_i (and the mirror
    // for S-) must equal Page's recursion S+_t = max(0, S+_{t-1} + dev_t)
    // for ANY integer deviation sequence — the identity the whole query
    // rests on.
    val dev = Gen.chooseNum(-1000L, 1000L)
    check(Prop.forAll(Gen.listOfN(60, dev)) { ds =>
      val p = ds.scanLeft(0L)(_ + _).tail
      val closedPos = p.zipWithIndex.map { case (pt, i) =>
        pt - (0L +: p.take(i + 1)).min }
      val closedNeg = p.zipWithIndex.map { case (pt, i) =>
        (0L +: p.take(i + 1)).max - pt }
      val recPos = ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
      val recNeg = ds.scanLeft(0L)((s, d) => math.max(0L, s - d)).tail
      closedPos == recPos && closedNeg == recNeg
    })
  }

  test("interval-overlap bucketing: each overlapping pair matches once") {
    // the arithmetic contract behind RangeJoin.intervalOverlap: for any
    // two intervals and width, the shared-bucket + overlap-start-bucket
    // rule fires exactly once iff the intervals overlap.
    val bound = Gen.chooseNum(0L, 5000L)
    val w = Gen.chooseNum(1L, 500L)
    check(Prop.forAll(bound, bound, bound, bound, w) { (a1, a2, b1, b2, w) =>
      val (as, ae) = (math.min(a1, a2), math.max(a1, a2) + 1)
      val (bs, be) = (math.min(b1, b2), math.max(b1, b2) + 1)
      val overlaps = as < be && bs < ae
      def buckets(s: Long, e: Long) =
        (math.floorDiv(s, w) to math.floorDiv(e, w)).toSet
      val startBucket = math.max(math.floorDiv(as, w), math.floorDiv(bs, w))
      val matches = buckets(as, ae).intersect(buckets(bs, be))
        .count(bk => overlaps && bk == startBucket)
      matches == (if (overlaps) 1 else 0)
    })
  }

  test("range-join bucketing: every in-interval point matches exactly once") {
    // the arithmetic contract behind RangeJoin.pointInInterval: a point in
    // [s, e) shares exactly ONE bucket with the interval's exploded bucket
    // range; a point outside shares either none, or one that the residual
    // predicate then rejects — so bucket-join + exact recheck ≡ the naive
    // inequality join, with no dedup step
    val ts = Gen.chooseNum(0L, 4102444800L) // epochs through 2100
    val width = Gen.chooseNum(1L, 90L * 86400L)
    check(Prop.forAll(ts, ts, Gen.chooseNum(1L, 120L * 86400L), width) {
      (p, s, len, w) =>
      val e = s + len
      def bucket(x: Long) = math.floor(x.toDouble / w).toLong
      // membership in the exploded bucket set is a range test (buckets are
      // consecutive), so the joined-then-rechecked hit count is closed-form
      val bucketHit = bucket(p) >= bucket(s) && bucket(p) <= bucket(e)
      val hits = if (bucketHit && p >= s && p < e) 1 else 0
      hits == (if (p >= s && p < e) 1 else 0)
    })
  }

  test("TopKByScore reduce/merge equals full-sort take-k for any split") {
    // the Aggregator contract Spark relies on: reducing rows into two
    // separate buffers (any partitioning) and merging must equal sorting
    // the whole input by (score desc, id asc) and taking k
    val row = for {
      id <- Gen.chooseNum(0L, 500L)
      // coarse scores force ties so the id tie-break is actually exercised
      s <- Gen.chooseNum(0, 20)
    } yield (0L, id, s / 10.0)
    val agg = new graft.functions.TopKByScore(10)
    check(Prop.forAll(Gen.listOfN(60, row), Gen.chooseNum(0, 60)) {
      (rows, cut) =>
        val distinctRows = rows.distinctBy(_._2) // one score per id
        val (l, r) = distinctRows.splitAt(math.min(cut, distinctRows.size))
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce))
        val expected = distinctRows.map(t => (t._3, t._2))
          .sortBy { case (s, id) => (-s, id) }.take(10)
        agg.finish(merged) == expected
    })
  }

  test("TopKByScore merge is associative with zero as identity") {
    val row = for {
      id <- Gen.chooseNum(0L, 300L)
      s <- Gen.chooseNum(0, 15)
    } yield (0L, id, s / 5.0)
    val agg = new graft.functions.TopKByScore(5)
    check(Prop.forAll(Gen.listOfN(20, row), Gen.listOfN(20, row),
        Gen.listOfN(20, row)) { (xs, ys, zs) =>
      def buf(rs: List[(Long, Long, Double)]) =
        rs.distinctBy(_._2).foldLeft(agg.zero)(agg.reduce)
      val (a, b, c) = (buf(xs), buf(ys), buf(zs))
      agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)) &&
        agg.merge(a, agg.zero) == a && agg.merge(agg.zero, a) == a
    })
  }

  test("PNG roundtrip: decode(encode(img)) == img for random shapes, " +
      "color types, filters, and both interlace modes") {
    val dim = Gen.chooseNum(1, 40)
    val ct = Gen.oneOf(0, 2, 4, 6)
    val seed = Gen.chooseNum(0L, 1L << 40)
    check(Prop.forAll(dim, dim, ct, Gen.oneOf(true, false), seed) {
      (w, h, colorType, il, s) =>
        def pix(x: Int, y: Int, c: Int) =
          (((x * 31 + y * 17 + c * 7 + s) % 256 + 256) % 256).toInt
        val img = graft.multimodal.Png.decode(
          graft.multimodal.Png.encode(w, h, colorType, il, pix))
        img.width == w && img.height == h &&
          (0 until h).forall { y =>
            (0 until w).forall { x =>
              val p = img.pixels(y * w + x)
              colorType match {
                case 0 => ((p >> 16) & 0xff) == pix(x, y, 0)
                case 2 => ((p >> 16) & 0xff) == pix(x, y, 0) &&
                  ((p >> 8) & 0xff) == pix(x, y, 1) &&
                  (p & 0xff) == pix(x, y, 2)
                case 4 => ((p >> 16) & 0xff) == pix(x, y, 0) &&
                  ((p >>> 24) & 0xff) == pix(x, y, 1)
                case 6 => ((p >> 16) & 0xff) == pix(x, y, 0) &&
                  ((p >> 8) & 0xff) == pix(x, y, 1) &&
                  (p & 0xff) == pix(x, y, 2) &&
                  ((p >>> 24) & 0xff) == pix(x, y, 3)
              }
            }
          }
    })
  }

  test("GIF roundtrip: LZW + interlace survive random frames and sizes") {
    val dim = Gen.chooseNum(1, 40)
    val nf = Gen.chooseNum(1, 3)
    val seed = Gen.chooseNum(0L, 1L << 40)
    check(Prop.forAll(dim, dim, nf, Gen.oneOf(true, false), seed) {
      (w, h, frames, il, s) =>
        def pix(x: Int, y: Int, f: Int) =
          (((x * 5 + y * 11 + f * 3 + s) % 16 + 16) % 16).toInt
        val img = graft.multimodal.Gif.decode(graft.multimodal.Gif.encode(
          w, h, frames, graft.multimodal.Gif.fixturePalette, il, pix))
        img.width == w && img.height == h && img.frames.size == frames &&
          img.frames.zipWithIndex.forall { case (px, f) =>
            (0 until h).forall { y =>
              (0 until w).forall { x =>
                px(y * w + x) ==
                  graft.multimodal.Gif.fixturePalette(pix(x, y, f))
              }
            }
          }
    })
  }

  test("GARCH NLL is finite and penalizes infeasible parameters") {
    val r = Gen.listOfN(60, Gen.chooseNum(-5.0, 5.0))
    check(Prop.forAll(r) { xs =>
      val arr = xs.toArray
      if (TimeSeriesStats.variance(arr) <= 0) true
      else {
        val ok = TimeSeriesStats.garchNll(arr, 0.1, 0.1, 0.8)
        val bad = TimeSeriesStats.garchNll(arr, 0.1, 0.6, 0.6) // a+b>=1
        !ok.isNaN && bad == Double.MaxValue
      }
    })
  }

  test("ljung-box and ACF are shift-invariant") {
    val base = Gen.listOfN(80, Gen.chooseNum(-10.0, 10.0))
    check(Prop.forAll(base, Gen.chooseNum(-100.0, 100.0)) { (xs, c) =>
      val a = xs.toArray
      val b = a.map(_ + c)
      if (TimeSeriesStats.variance(a) == 0) true
      else {
        val d = math.abs(
          TimeSeriesStats.ljungBox(a, 5) - TimeSeriesStats.ljungBox(b, 5))
        d < 1e-5 * (1 + math.abs(TimeSeriesStats.ljungBox(a, 5)))
      }
    })
  }

  test("progressive JPEG decode equals baseline for random coefficient " +
      "blocks (spectral selection + successive approximation roundtrip)") {
    import graft.multimodal.Jpeg
    // random quantized blocks across the full AC band: exercises EOB
    // placement, ZRL runs, refinement correction bits, and both DC signs
    // far beyond the deterministic fixtures
    val coefGen = Gen.listOfN(64, Gen.frequency(
      8 -> Gen.const(0),
      3 -> Gen.chooseNum(-3, 3),
      1 -> Gen.chooseNum(-40, 40)))
    val caseGen = for {
      bw <- Gen.chooseNum(1, 4)
      bh <- Gen.chooseNum(1, 3)
      blocks <- Gen.listOfN(bw * bh, coefGen)
    } yield (bw, bh, blocks.map(_.toArray).toArray)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60),
      Prop.forAllNoShrink(caseGen) { case (bw, bh, blocks) =>
        def gen(c: Int, bx: Int, by: Int): Array[Int] = {
          val coef = blocks(by * bw + bx).clone()
          coef(0) = math.max(-32, math.min(31, coef(0))) // DC in range
          coef
        }
        val w = bw * 8
        val h = bh * 8
        val base = Jpeg.decode(
          Jpeg.encodeGray(w, h, Jpeg.QuantFlat16, (bx, by) => gen(0, bx, by)))
        val prog = Jpeg.decode(
          Jpeg.encodeProgressive(w, h, Jpeg.QuantFlat16, Jpeg.QuantFlat16,
            (1, 1), 1, gen))
        prog.pixels.sameElements(base.pixels)
      })
    assert(res.passed, res.status.toString)
  }

  test("progressive color decode equals baseline for random blocks " +
      "(interleaved DC + per-component AC scans)") {
    import graft.multimodal.Jpeg
    val coefGen = Gen.listOfN(64, Gen.frequency(
      8 -> Gen.const(0),
      3 -> Gen.chooseNum(-3, 3),
      1 -> Gen.chooseNum(-24, 24)))
    // 4:2:0: luma grid is 2x2 denser than chroma per 16-px macroblock
    val caseGen = for {
      mw <- Gen.chooseNum(1, 2)
      mh <- Gen.chooseNum(1, 2)
      luma <- Gen.listOfN(4 * mw * mh, coefGen)
      chroma <- Gen.listOfN(2 * mw * mh, coefGen)
    } yield (mw, mh, luma.map(_.toArray).toArray,
      chroma.map(_.toArray).toArray)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30),
      Prop.forAllNoShrink(caseGen) { case (mw, mh, luma, chroma) =>
        def gen(c: Int, bx: Int, by: Int): Array[Int] = {
          val coef =
            if (c == 0) luma((by * 2 * mw + bx) % luma.length).clone()
            else chroma(((by * mw + bx) + (c - 1) * mw * mh)
              % chroma.length).clone()
          coef(0) = math.max(-24, math.min(23, coef(0)))
          coef
        }
        val w = mw * 16
        val h = mh * 16
        val base = Jpeg.decode(Jpeg.encodeColor(
          w, h, Jpeg.QuantFlat16, Jpeg.QuantFlat16, (2, 2), gen))
        val prog = Jpeg.decode(Jpeg.encodeProgressive(
          w, h, Jpeg.QuantFlat16, Jpeg.QuantFlat16, (2, 2), 3, gen))
        prog.channels == 3 && prog.pixels.sameElements(base.pixels)
      })
    assert(res.passed, res.status.toString)
  }

  test("StateTuning partition sizing: clamped, monotone, ~32MB per slot") {
    import graft.streaming.StateTuning._
    check(Prop.forAll { (bytes: Long) =>
      val n = partitionsForBytes(math.max(0L, bytes))
      n >= MinPartitions && n <= MaxPartitions
    })
    assert(partitionsForBytes(0L) == MinPartitions)
    assert(partitionsForBytes(1L << 20) == MinPartitions) // 1 MB → floor
    assert(partitionsForBytes(320L << 20) == 10) // 320 MB / 32 MB
    assert(partitionsForBytes(Long.MaxValue) == MaxPartitions)
    // monotone in input size
    val samples = Seq(0L, 1L << 20, 1L << 25, 1L << 30, 1L << 35, 1L << 40)
    val ns = samples.map(partitionsForBytes)
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b })
  }

  test("hive partition-value escaping round-trips any string, and " +
      "escaped names never contain path-hostile characters") {
    import graft.sources.GraftParquetTestBridge.{escapePath, unescapePath}
    // targeted hostile shapes first
    for (s <- Seq("a/b", "x=1", "a%2Fb", "%", "%%", "a b", "日本語",
        "trailing%", "q?*<>|", "{[]}^", "a\\b", "", "plain"))
      if (s.nonEmpty)
        assert(unescapePath(escapePath(s)) == s, s"round-trip '$s'")
    val anyStr = Gen.listOf(Gen.choose(1.toChar, 0x2FFF.toChar))
      .map(_.mkString)
    check(Prop.forAll(anyStr) { s =>
      val e = escapePath(s)
      unescapePath(e) == s &&
        !e.exists(c => c < ' ' || "/\\=*?\"'<>|".indexOf(c) >= 0)
    })
  }
}
