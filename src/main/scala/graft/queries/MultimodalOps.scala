package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.multimodal.Media

/** Multimodal-column queries: `documents.text` cast to binary stands in for
  * media payloads (no codecs in this container — Media.FakeDecoder derives
  * deterministic metadata from payload bytes; the plumbing — schema,
  * binary column handling, explode shape, mapPartitions batch path — is
  * real). Oracles express the same byte arithmetic over strlen in DuckDB.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  private def payloads(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  // Metadata extraction through the codegen expression path.
  private def mmDecodeMeta(s: SparkSession, dir: String): DataFrame =
    payloads(s, dir)
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("meta", Media.imageMetaExpr("payload"))
      .select(col("doc_id"), col("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"), col("meta.n_frames").as("n_frames"))
      .orderBy(col("doc_id"))

  private val mmDecodeMetaSql =
    """SELECT doc_id, strlen(text) AS n_bytes,
      |  CAST(64 + strlen(text) % 512 AS INT) AS width,
      |  CAST(64 + (strlen(text)*7) % 512 AS INT) AS height,
      |  CASE WHEN strlen(text) % 3 = 0 THEN 'jpeg'
      |       WHEN strlen(text) % 3 = 1 THEN 'png' ELSE 'webp' END AS format,
      |  CAST(strlen(text) // 100 + 1 AS INT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // Frame sampling: every 2nd frame, 100-byte frames.
  private def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    Media.frameSample(payloads(s, dir), "doc_id", "payload",
      stride = 2, frameBytes = 100)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("byte_offset").cast("long").as("byte_offset"))
      .orderBy(col("doc_id"), col("frame_idx"))

  private val mmFrameSampleSql =
    """WITH meta AS (
      |  SELECT doc_id, CAST(strlen(text) // 100 + 1 AS INT) AS n_frames
      |  FROM documents),
      |frames AS (
      |  SELECT doc_id, unnest(generate_series(0, n_frames - 1, 2)) AS frame_idx
      |  FROM meta)
      |SELECT doc_id, frame_idx, frame_idx * 100 AS byte_offset
      |FROM frames ORDER BY doc_id, frame_idx""".stripMargin

  // REAL JPEG entropy decode on the mapPartitions batch path: per doc, a
  // deterministically constructed grayscale JPEG (Annex K tables,
  // DC-only blocks over the flat-16 quant table) is Huffman-decoded,
  // dequantized, and IDCT'd back to pixels by graft.multimodal.Jpeg —
  // every third id as a PROGRESSIVE (SOF2) stream, the rest baseline, so
  // this one query chews a mixed crawl-like corpus through both entropy
  // modes. The fixture's pixel values have a closed form (every block is
  // exactly 128 + 2·dc) regardless of coding mode, so the oracle
  // recomputes width, height, block count, and the full pixel sum from
  // doc_id alone — a wrong Huffman code, EXTEND sign, zigzag slot,
  // progressive refinement bit, or IDCT scale fails the value compare.
  // The general decoder (AC runs, ZRL, byte unstuffing, restarts, EOBn)
  // is cross-validated against the JDK's independent ImageIO decoder in
  // ScaleOpsSpec and JpegProgressiveSpec.
  private def mmDecodeBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = graft.multimodal.Jpeg.decode(
          graft.multimodal.Jpeg.fixturePayload(id))
        var sum = 0L
        img.pixels.foreach(sum += _)
        (id, "jpeg", img.width.toLong, img.height.toLong,
          (img.width / 8).toLong * (img.height / 8).toLong, sum)
      })
      .toDF("doc_id", "format", "width", "height", "n_blocks", "pixel_sum")
      .orderBy(col("doc_id"))
  }

  private val mmDecodeBatchSql =
    """WITH dims AS (
      |  SELECT doc_id, 8*(2 + doc_id % 5) AS w, 8*(2 + (doc_id*3) % 4) AS h
      |  FROM documents),
      |blocks AS (
      |  SELECT doc_id, w, h, bx, by
      |  FROM dims,
      |    unnest(generate_series(0, w//8 - 1)) t1(bx),
      |    unnest(generate_series(0, h//8 - 1)) t2(by))
      |SELECT doc_id, 'jpeg' AS format, w AS width, h AS height,
      |  (w//8)*(h//8) AS n_blocks,
      |  CAST(sum(64 * (128 + 2*(((doc_id + 7*bx + 13*by) % 64) - 32)))
      |    AS BIGINT) AS pixel_sum
      |FROM blocks GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  // Letterbox resize planning to 224×224 (the preprocessing-geometry step
  // of an image pipeline): scale the long side to 224, round dims with
  // floor(+0.5) (cross-engine-stable), center with integer padding. The
  // actual pixel resample lives behind the codec seam; the geometry — the
  // part that must be exact and is pure arithmetic — is computed here and
  // DuckDB-oracled.
  private def mmResizePlan(s: SparkSession, dir: String): DataFrame =
    mmDecodeMeta(s, dir)
      .withColumn("scale", lit(224.0) / greatest(col("width"), col("height")))
      .withColumn("out_w", floor(col("width") * col("scale") + 0.5).cast("long"))
      .withColumn("out_h", floor(col("height") * col("scale") + 0.5).cast("long"))
      .withColumn("pad_x", expr("(224 - out_w) div 2"))
      .withColumn("pad_y", expr("(224 - out_h) div 2"))
      .select(col("doc_id"), col("width"), col("height"), col("scale"),
        col("out_w"), col("out_h"), col("pad_x"), col("pad_y"))
      .orderBy(col("doc_id"))

  private val mmResizePlanSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(64 + strlen(text) % 512 AS INT) AS width,
      |    CAST(64 + (strlen(text)*7) % 512 AS INT) AS height
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, width, height,
      |    224.0 / greatest(width, height) AS scale
      |  FROM m)
      |SELECT doc_id, width, height, scale,
      |  CAST(floor(width * scale + 0.5) AS BIGINT) AS out_w,
      |  CAST(floor(height * scale + 0.5) AS BIGINT) AS out_h,
      |  (224 - CAST(floor(width * scale + 0.5) AS BIGINT)) // 2 AS pad_x,
      |  (224 - CAST(floor(height * scale + 0.5) AS BIGINT)) // 2 AS pad_y
      |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // REAL header decode — deterministic PPM/BMP/WAV files built per doc_id,
  // parsed back through Media.HeaderDecoder on the mapPartitions batch
  // path. The parse is genuine (magic sniffing, ASCII tokenization with
  // comments, little-endian offsets, RIFF chunk scan); the oracle
  // recomputes the construction parameters from doc_id, so a wrong offset
  // or endianness in the parser fails the value compare.
  private def mmDecodeReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val built = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(id => (id, Media.syntheticPayload(id)))
      .toDF("doc_id", "payload")
    Media.decodeBatch(built, "doc_id", "payload", Media.HeaderDecoder)
      .select(col("id").as("doc_id"), col("format"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"))
      .orderBy(col("doc_id"))
  }

  private val mmDecodeRealSql =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
      |       ELSE 'wav' END AS format,
      |  CASE WHEN doc_id % 3 = 2 THEN 8000 + (doc_id % 8) * 1000
      |       ELSE 16 + doc_id % 64 END AS width,
      |  CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 2
      |       ELSE 16 + (doc_id * 3) % 64 END AS height,
      |  CASE WHEN doc_id % 3 = 2 THEN 128 + doc_id % 256
      |       ELSE 1 END AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // The second image tier on the same codec seam: REAL PNG (CRC-correct
  // chunks; APNG acTL found by the chunk walk drives the frame count) and
  // REAL GIF (logical-screen header; frames counted by walking extension
  // and image-descriptor blocks — GIF stores no frame-count field).
  // Payloads are deterministically constructed real files, so the oracle
  // recomputes every parameter the parser must recover; wrong chunk
  // arithmetic, CRC-offset slips, or a mis-skipped color table all fail
  // the value compare.
  private def mmDecodePngGif(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val built = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(id => (id, Media.syntheticPayload2(id)))
      .toDF("doc_id", "payload")
    Media.decodeBatch(built, "doc_id", "payload", Media.HeaderDecoder)
      .select(col("id").as("doc_id"), col("format"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"))
      .orderBy(col("doc_id"))
  }

  private val mmDecodePngGifSql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS format,
      |  16 + doc_id % 64 AS width,
      |  16 + (doc_id * 3) % 64 AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 4
      |       ELSE 1 + doc_id % 5 END AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // REAL pixel resample — the execution of what mm_resize_plan only
  // planned: build a gradient-raster PPM per doc, nearest-neighbor
  // resample it to 8×8 on the batch path, and report the sampled bytes'
  // sum. The gradient makes the result closed-form, so the oracle
  // recomputes the expected checksum arithmetically: any off-by-one in
  // the header offset, row stride, or NN index map fails the compare.
  private def mmResizeReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 16 + (id % 64).toInt
        val h = 16 + ((id * 3) % 64).toInt
        (id, w.toLong, h.toLong, Media.resamplePpmChecksum(
          Media.encodePpmGradient(w, h), outW = 8, outH = 8))
      })
      .toDF("doc_id", "width", "height", "checksum")
      .orderBy(col("doc_id"))
  }

  private val mmResizeRealSql =
    """WITH dims AS (
      |  SELECT doc_id, 16 + doc_id % 64 AS w, 16 + (doc_id*3) % 64 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |    (((i*w)//8)*7 + ((j*h)//8)*13 + c) % 256 AS v
      |  FROM dims,
      |    unnest(generate_series(0, 7)) t1(i),
      |    unnest(generate_series(0, 7)) t2(j),
      |    unnest(generate_series(0, 2)) t3(c))
      |SELECT doc_id, w AS width, h AS height,
      |  CAST(sum(v) AS BIGINT) AS checksum
      |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Decode → transform CHAIN: entropy-decode the fixture JPEG, then
  // nearest-neighbor thumbnail the decoded pixels to 8×8 — the two-stage
  // shape every image-preprocessing pipeline runs (decode, then resize),
  // executed end to end on the batch path. The fixture's blocks are
  // constant, so each sampled pixel equals its source block's value and
  // the oracle recomputes the thumbnail sum from doc_id in closed form —
  // an NN index-map bug or a decode error both fail the compare.
  private def mmThumbnailJpeg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = graft.multimodal.Jpeg.decode(
          graft.multimodal.Jpeg.fixturePayload(id))
        var sum = 0L
        var j = 0
        while (j < 8) {
          val sy = j * img.height / 8
          var i = 0
          while (i < 8) {
            sum += img.pixels(sy * img.width + i * img.width / 8)
            i += 1
          }
          j += 1
        }
        (id, img.width.toLong, img.height.toLong, sum)
      })
      .toDF("doc_id", "width", "height", "thumb_sum")
      .orderBy(col("doc_id"))
  }

  private val mmThumbnailJpegSql =
    """WITH dims AS (
      |  SELECT doc_id, 8*(2 + doc_id % 5) AS w, 8*(2 + (doc_id*3) % 4) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |    128 + 2*(((doc_id + 7*((i*w//8)//8) + 13*((j*h//8)//8)) % 64) - 32)
      |      AS v
      |  FROM dims,
      |    unnest(generate_series(0, 7)) t1(i),
      |    unnest(generate_series(0, 7)) t2(j))
      |SELECT doc_id, w AS width, h AS height,
      |  CAST(sum(v) AS BIGINT) AS thumb_sum
      |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Perceptual-hash image dedup (average hash over the decode → thumbnail
  // chain) — the image modality's dd_exact: a 64-bit aHash (bit k = 1 iff
  // thumbnail pixel k exceeds the integer-mean) collapses re-encoded /
  // renamed copies of the same picture without comparing a single pixel
  // pair, and grouping by the hash IS the dedup — O(N), no pairwise
  // stage. The fixture family genuinely contains duplicates: dims cycle
  // with id mod 20 and block values with id mod 64, so ids congruent
  // mod 320 decode to byte-identical images and MUST collapse. The hash
  // is emitted as two unsigned 32-bit halves (hi/lo) so no sign-bit
  // wrap enters the cross-engine compare; mean is `sum div 64` (integer,
  // order-free). Fully oracled: the closed-form thumbnail pixels let
  // DuckDB recompute every hash bit — a decode slip, NN-map bug, or
  // threshold off-by-one flips a bit and fails the value compare.
  private def mmAhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = graft.multimodal.Jpeg.decode(
          graft.multimodal.Jpeg.fixturePayload(id))
        val thumb = new Array[Long](64)
        var j = 0
        while (j < 8) {
          val sy = j * img.height / 8
          var i = 0
          while (i < 8) {
            thumb(j * 8 + i) = img.pixels(sy * img.width + i * img.width / 8)
            i += 1
          }
          j += 1
        }
        val mean = thumb.sum / 64
        var hi = 0L; var lo = 0L
        var k = 0
        while (k < 64) {
          if (thumb(k) > mean) {
            if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
          }
          k += 1
        }
        (id, hi, lo)
      })
      .toDF("doc_id", "ahash_hi", "ahash_lo")
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_images"))
      .orderBy(col("keeper_id"))
  }

  private val mmAhashDedupSql =
    """WITH dims AS (
      |  SELECT doc_id, 8*(2 + doc_id % 5) AS w, 8*(2 + (doc_id*3) % 4) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, j*8 + i AS k,
      |    128 + 2*(((doc_id + 7*(((i*w//8))//8) + 13*(((j*h//8))//8)) % 64)
      |      - 32) AS v
      |  FROM dims,
      |    unnest(generate_series(0, 7)) t1(i),
      |    unnest(generate_series(0, 7)) t2(j)),
      |m AS (SELECT doc_id, sum(v) // 64 AS mean FROM px GROUP BY 1),
      |bits AS (
      |  SELECT px.doc_id,
      |    CAST(sum(CASE WHEN px.v > m.mean AND px.k >= 32
      |      THEN (1::BIGINT << (px.k - 32)) ELSE 0 END) AS BIGINT)
      |      AS ahash_hi,
      |    CAST(sum(CASE WHEN px.v > m.mean AND px.k < 32
      |      THEN (1::BIGINT << px.k) ELSE 0 END) AS BIGINT) AS ahash_lo
      |  FROM px JOIN m USING (doc_id) GROUP BY px.doc_id)
      |SELECT ahash_hi, ahash_lo, min(doc_id) AS keeper_id,
      |  count(*) AS n_images
      |FROM bits GROUP BY ahash_hi, ahash_lo ORDER BY keeper_id""".stripMargin

  // ---------------------------------------------------------------------
  // GIF frame index — frame sampling against a REAL container: the block
  // walk records each image descriptor's byte offset (no LZW decode), so
  // a video-style sampler can seek straight to frame k. The fixture GIFs
  // have a fixed per-frame block layout, so every offset is closed-form
  // from doc_id and a mis-skipped extension or color table fails the
  // value compare.
  private def mmGifFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 2 == 1) // syntheticPayload2's GIF half
      .flatMap { id =>
        Media.HeaderDecoder.gifFrameOffsets(Media.syntheticPayload2(id))
          .zipWithIndex.map { case (off, i) =>
            (id, i.toLong, off.toLong)
          }
      }
      .toDF("doc_id", "frame_idx", "byte_offset")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val mmGifFramesSql =
    """WITH g AS (
      |  SELECT doc_id, 1 + doc_id % 5 AS frames FROM documents
      |  WHERE doc_id % 2 = 1),
      |f AS (
      |  SELECT doc_id, unnest(generate_series(0, frames - 1)) AS frame_idx
      |  FROM g)
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST(13 + 24*frame_idx + 8 AS BIGINT) AS byte_offset
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------------
  // Audio feature extraction — the amplitude-statistics pass an audio
  // corpus runs before filtering (peak/RMS gates, silence detection):
  // REAL 16-bit PCM parsing (Media.wavSamples reads the data chunk the
  // header tier only measured) over deterministically constructed WAVs,
  // so every statistic has a closed form. Integer peak/sum are exact;
  // RMS is one sqrt over an integer ratio, bit-stable across engines.
  private def mmAudioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val sr = 8000 + ((id % 8) * 1000).toInt
        val ch = 1 + (id % 2).toInt
        val frames = 128 + (id % 256).toInt
        val samples = graft.multimodal.Media.wavSamples(
          graft.multimodal.Media.encodeWavPattern(sr, ch, frames))
        var peak = 0L
        var sumAbs = 0L
        var sumSq = 0L
        samples.foreach { v =>
          val a = math.abs(v.toLong)
          if (a > peak) peak = a
          sumAbs += a
          sumSq += v.toLong * v
        }
        // micro-unit RMS: both engines compute the SAME IEEE double
        // (exact integer sums < 2^53, correctly-rounded divide/sqrt/mul)
        // and then floor it — bit-stable, unlike comparing two
        // independently decimal-rounded doubles whose HALF_UP paths can
        // disagree by one ulp near .5 boundaries
        (id, sr.toLong, frames.toLong, peak, sumAbs,
          math.floor(
            math.sqrt(sumSq.toDouble / samples.length) * 1e6).toLong)
      })
      .toDF("doc_id", "sample_rate", "n_frames", "peak_abs", "sum_abs",
        "rms_micro")
      .orderBy(col("doc_id"))
  }

  private val mmAudioFeaturesSql =
    """WITH d AS (
      |  SELECT doc_id, 8000 + (doc_id % 8)*1000 AS sr, 1 + doc_id % 2 AS ch,
      |    128 + doc_id % 256 AS frames
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, sr, frames, ((k*37 + 13) % 2048) - 1024 AS v
      |  FROM d, unnest(generate_series(0, frames*ch - 1)) t(k))
      |SELECT doc_id, CAST(sr AS BIGINT) AS sample_rate,
      |  CAST(frames AS BIGINT) AS n_frames,
      |  CAST(max(abs(v)) AS BIGINT) AS peak_abs,
      |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
      |  CAST(floor(sqrt(sum(v*v)*1.0/count(*)) * 1e6) AS BIGINT)
      |    AS rms_micro
      |FROM s GROUP BY doc_id, sr, frames ORDER BY doc_id""".stripMargin

  // Walsh–Hadamard band analysis over the decoded PCM — the cheap
  // spectral tier of the audio pass (sequency-domain energy is the
  // classic integer-exact stand-in for a DFT band profile: same
  // window-dot-basis shape, but ±1 coefficients keep every value an
  // exact BIGINT, so the cross-engine oracle is sharp where floating
  // trig sums would drift). Coefficient k over the first 128 samples:
  // C_k = Σ v_i · (−1)^popcount(i AND k); emitted RAW (signed), which is
  // strictly stronger than an energy — any sample or sign slip flips it.
  // The samples come through the REAL RIFF/PCM parse, not the formula.
  private def mmAudioSpectrum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val sr = 8000 + ((id % 8) * 1000).toInt
        val ch = 1 + (id % 2).toInt
        val frames = 128 + (id % 256).toInt
        val samples = graft.multimodal.Media.wavSamples(
          graft.multimodal.Media.encodeWavPattern(sr, ch, frames))
        def wht(k: Int): Long = {
          var acc = 0L
          var i = 0
          while (i < 128) {
            val sign = if (Integer.bitCount(i & k) % 2 == 0) 1L else -1L
            acc += sign * samples(i)
            i += 1
          }
          acc
        }
        (id, wht(0), wht(1), wht(2), wht(4), wht(8))
      })
      .toDF("doc_id", "wht_0", "wht_1", "wht_2", "wht_4", "wht_8")
      .orderBy(col("doc_id"))
  }

  private val mmAudioSpectrumSql =
    """WITH s AS (
      |  SELECT doc_id, i, ((i*37 + 13) % 2048) - 1024 AS v
      |  FROM documents, unnest(generate_series(0, 127)) t(i))
      |SELECT doc_id,
      |  CAST(sum(v) AS BIGINT) AS wht_0,
      |  CAST(sum(CASE WHEN bit_count(i & 1) % 2 = 0 THEN v ELSE -v END)
      |    AS BIGINT) AS wht_1,
      |  CAST(sum(CASE WHEN bit_count(i & 2) % 2 = 0 THEN v ELSE -v END)
      |    AS BIGINT) AS wht_2,
      |  CAST(sum(CASE WHEN bit_count(i & 4) % 2 = 0 THEN v ELSE -v END)
      |    AS BIGINT) AS wht_4,
      |  CAST(sum(CASE WHEN bit_count(i & 8) % 2 = 0 THEN v ELSE -v END)
      |    AS BIGINT) AS wht_8
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // COLOR (YCbCr 4:2:0) baseline-JPEG decode on the batch path — the
  // shape real corpora are overwhelmingly made of. Per doc, a
  // deterministically constructed three-component interleaved JPEG is
  // entropy-decoded per component, chroma-upsampled, and converted to
  // RGB (BT.601 full-range, floor(x+0.5)); the DC-only flat blocks give
  // every output pixel a closed form, so the oracle recomputes the full
  // per-channel sums from doc_id alone — a wrong MCU interleave order,
  // per-component DC predictor, chroma index, or conversion coefficient
  // all fail the value compare.
  private def mmDecodeColor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = graft.multimodal.Jpeg.decode(
          graft.multimodal.Jpeg.fixtureColorPayload(id))
        var (sr, sg, sb) = (0L, 0L, 0L)
        img.pixels.foreach { p =>
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        }
        (id, img.width.toLong, img.height.toLong,
          (img.width / 8).toLong * (img.height / 8).toLong, sr, sg, sb)
      })
      .toDF("doc_id", "width", "height", "n_blocks",
        "sum_r", "sum_g", "sum_b")
      .orderBy(col("doc_id"))
  }

  private val mmDecodeColorSql =
    """WITH dims AS (
      |  SELECT doc_id, 16*(1 + doc_id % 3) AS w, 16*(1 + (doc_id*5) % 3) AS h
      |  FROM documents),
      |blocks AS (
      |  SELECT doc_id, w, h, bx, by,
      |    128 + 2*(((doc_id + 7*bx + 13*by) % 64) - 32) AS yv,
      |    128 + 2*(((doc_id*3 + 5*(bx//2) + 11*(by//2)) % 48) - 24) AS cb,
      |    128 + 2*(((doc_id*7 + 3*(bx//2) + 17*(by//2)) % 48) - 24) AS cr
      |  FROM dims,
      |    unnest(generate_series(0, w//8 - 1)) t1(bx),
      |    unnest(generate_series(0, h//8 - 1)) t2(by)),
      |rgb AS (
      |  SELECT doc_id, w, h,
      |    least(255, greatest(0,
      |      CAST(floor(yv + 1.402*(cr-128) + 0.5) AS BIGINT))) AS r,
      |    least(255, greatest(0,
      |      CAST(floor(yv - 0.344136*(cb-128) - 0.714136*(cr-128) + 0.5)
      |        AS BIGINT))) AS g,
      |    least(255, greatest(0,
      |      CAST(floor(yv + 1.772*(cb-128) + 0.5) AS BIGINT))) AS b
      |  FROM blocks)
      |SELECT doc_id, w AS width, h AS height, (w//8)*(h//8) AS n_blocks,
      |  CAST(sum(64*r) AS BIGINT) AS sum_r,
      |  CAST(sum(64*g) AS BIGINT) AS sum_g,
      |  CAST(sum(64*b) AS BIGINT) AS sum_b
      |FROM rgb GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Full PNG pixel decode — the LOSSLESS image tier next to the JPEG
  // family (multimodal.Png): real zlib IDAT, all five scanline filters
  // (the encoder fixture cycles them per row), color types 0/2/3/6 at
  // 8-bit, and Adam7 interlacing on odd ids — the deinterlace pass
  // placement is checked by a POSITION-WEIGHTED checksum
  // Σ (1+x+2y)·(r+2g+3b+4a): a plain pixel sum would be invariant under
  // wrong pass placement, the weighted one is not. The oracle recomputes
  // every pixel from the closed-form fixture family; byte-exact parity
  // with javax.imageio additionally asserted in PngSpec (PNG is lossless,
  // so parity is exact, not tolerance-based).
  // Baseline TIFF (multimodal.Tiff): both byte orders, all four chunk
  // compressions, gray/RGB/palette photometrics, multi-strip slicing
  // AND §15 tiled organization (id%5 in {3,4} — padded edge tiles)
  // — features over REAL container parsing with the same
  // position-weighted checksum as the PNG tier (invariant-breaking for
  // misplaced strips), oracle a pure closed form of the fixture.
  private def mmTiffDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = graft.multimodal.Tiff.decode(
          graft.multimodal.Tiff.fixturePayload(id))
        var chk = 0L
        var y = 0
        while (y < img.height) {
          var x = 0
          while (x < img.width) {
            val p = img.pixels(y * img.width + x)
            val r = (p >> 16) & 0xff
            val g = (p >> 8) & 0xff; val b = p & 0xff
            chk += (1L + x + 2L * y) * (r + 2L * g + 3L * b)
            x += 1
          }
          y += 1
        }
        (id, img.width.toLong, img.height.toLong, img.photometric.toLong,
          img.compression.toLong, chk)
      })
      .toDF("doc_id", "width", "height", "photometric", "compression",
        "checksum")
      .orderBy(col("doc_id"))
  }

  private val mmTiffDecodeSql =
    """WITH dims AS (
      |  SELECT doc_id,
      |    16 + doc_id % 17 AS w, 8 + (doc_id*3) % 13 AS h,
      |    CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END AS pm,
      |    CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 32773
      |         WHEN 2 THEN 5 ELSE 8 END AS comp
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, pm, comp, x, y,
      |    ((x // 5)*31 + y*7 + doc_id*13) % 256 AS v0,
      |    ((x // 5)*31 + y*7 + doc_id*13 + 5) % 256 AS v1,
      |    ((x // 5)*31 + y*7 + doc_id*13 + 10) % 256 AS v2
      |  FROM dims,
      |    unnest(generate_series(0, w - 1)) t1(x),
      |    unnest(generate_series(0, h - 1)) t2(y)),
      |rgb AS (
      |  SELECT doc_id, w, h, pm, comp, x, y,
      |    CASE pm WHEN 3 THEN (v0*37) % 256 ELSE v0 END AS r,
      |    CASE pm WHEN 1 THEN v0 WHEN 3 THEN (v0*59) % 256
      |         ELSE v1 END AS g,
      |    CASE pm WHEN 1 THEN v0 WHEN 3 THEN (v0*83) % 256
      |         ELSE v2 END AS b
      |  FROM px)
      |SELECT doc_id, w AS width, h AS height,
      |  CAST(pm AS BIGINT) AS photometric,
      |  CAST(comp AS BIGINT) AS compression,
      |  CAST(sum((1 + x + 2*y) * (r + 2*g + 3*b)) AS BIGINT) AS checksum
      |FROM rgb GROUP BY doc_id, w, h, pm, comp
      |ORDER BY doc_id""".stripMargin

  private def mmDecodePngPixels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = graft.multimodal.Png.decode(
          graft.multimodal.Png.fixturePayload(id))
        var chk = 0L
        var y = 0
        while (y < img.height) {
          var x = 0
          while (x < img.width) {
            val p = img.pixels(y * img.width + x)
            val a = (p >>> 24) & 0xff; val r = (p >> 16) & 0xff
            val g = (p >> 8) & 0xff; val b = p & 0xff
            chk += (1L + x + 2L * y) * (r + 2L * g + 3L * b + 4L * a)
            x += 1
          }
          y += 1
        }
        (id, img.width.toLong, img.height.toLong, img.colorType.toLong,
          img.interlaced, chk)
      })
      .toDF("doc_id", "width", "height", "color_type", "interlaced",
        "checksum")
      .orderBy(col("doc_id"))
  }

  private val mmDecodePngPixelsSql =
    """WITH dims AS (
      |  SELECT doc_id,
      |    8 + doc_id % 24 AS w, 8 + (doc_id*3) % 24 AS h,
      |    CASE doc_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3
      |         ELSE 6 END AS ct,
      |    doc_id % 2 = 1 AS il
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, ct, il, x, y,
      |    (x + y + doc_id) % 16 AS idx,
      |    (x*7 + y*13 + doc_id*31) % 256 AS v0,
      |    (x*7 + y*13 + doc_id*31 + 5) % 256 AS v1,
      |    (x*7 + y*13 + doc_id*31 + 10) % 256 AS v2,
      |    (x*7 + y*13 + doc_id*31 + 15) % 256 AS v3
      |  FROM dims,
      |    unnest(generate_series(0, w - 1)) t1(x),
      |    unnest(generate_series(0, h - 1)) t2(y)),
      |rgba AS (
      |  SELECT doc_id, w, h, ct, il, x, y,
      |    CASE ct WHEN 3 THEN (idx*17) % 256 ELSE v0 END AS r,
      |    CASE ct WHEN 0 THEN v0 WHEN 3 THEN (idx*29) % 256
      |         ELSE v1 END AS g,
      |    CASE ct WHEN 0 THEN v0 WHEN 3 THEN (idx*43) % 256
      |         ELSE v2 END AS b,
      |    CASE ct WHEN 6 THEN v3 ELSE 255 END AS a
      |  FROM px)
      |SELECT doc_id, w AS width, h AS height,
      |  CAST(ct AS BIGINT) AS color_type, il AS interlaced,
      |  CAST(sum((1 + x + 2*y) * (r + 2*g + 3*b + 4*a)) AS BIGINT)
      |    AS checksum
      |FROM rgba GROUP BY doc_id, w, h, ct, il ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Full GIF pixel decode — the third image container tier (multimodal.
  // Gif): genuine variable-width LZW with the spec's early-change width
  // bump, sub-block reassembly, the 16-entry global color table, ALL
  // frames of the animation, and GIF's 4-pass row interlace on odd ids.
  // Same position-weighted checksum idea as the PNG tier, extended with a
  // frame term (Σ (1+x+2y+3f)·(r+2g+3b)) so wrong frame order, wrong
  // interlace row placement, or an LZW dictionary bug all fail the
  // oracle. ImageIO cross-parity (exact — indexed color is lossless) in
  // GifSpec.
  private def mmDecodeGifPixels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = graft.multimodal.Gif.decode(
          graft.multimodal.Gif.fixturePayload(id))
        var chk = 0L
        img.frames.zipWithIndex.foreach { case (px, f) =>
          var y = 0
          while (y < img.height) {
            var x = 0
            while (x < img.width) {
              val p = px(y * img.width + x)
              val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
              val b = p & 0xff
              chk += (1L + x + 2L * y + 3L * f) * (r + 2L * g + 3L * b)
              x += 1
            }
            y += 1
          }
        }
        (id, img.width.toLong, img.height.toLong, img.frames.size.toLong,
          img.interlaced, chk)
      })
      .toDF("doc_id", "width", "height", "n_frames", "interlaced",
        "checksum")
      .orderBy(col("doc_id"))
  }

  private val mmDecodeGifPixelsSql =
    """WITH dims AS (
      |  SELECT doc_id,
      |    8 + doc_id % 16 AS w, 8 + (doc_id*3) % 16 AS h,
      |    1 + doc_id % 3 AS nf, doc_id % 2 = 1 AS il
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, nf, il, x, y, f,
      |    (x + 3*y + 7*f + doc_id) % 16 AS idx
      |  FROM dims,
      |    unnest(generate_series(0, w - 1)) t1(x),
      |    unnest(generate_series(0, h - 1)) t2(y),
      |    unnest(generate_series(0, nf - 1)) t3(f))
      |SELECT doc_id, w AS width, h AS height, nf AS n_frames,
      |  il AS interlaced,
      |  CAST(sum((1 + x + 2*y + 3*f) *
      |    ((idx*17) % 256 + 2*((idx*29) % 256) + 3*((idx*43) % 256)))
      |    AS BIGINT) AS checksum
      |FROM px GROUP BY doc_id, w, h, nf, il ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // MP4 / ISO-BMFF container metadata — the video-modality tier
  // (multimodal.Mp4): a real box walker (32/64-bit sizes, nested
  // moov/trak/mdia/minf/stbl), mvhd v0 AND v1 (odd ids build the 64-bit
  // v1 layout so both parser paths run on every corpus), tkhd 16.16
  // dimensions, the stsd codec fourcc, and the FULL stsz sample-size
  // table — total_bytes forces the parser to read the whole index, not
  // just its count; that index is how a video sampler seeks frames at
  // 100 TB without touching mdat. Pixel decode of video codecs is
  // genuinely out of JVM scope and stays behind the documented seam.
  private def mmMp4Meta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val m = graft.multimodal.Mp4.parse(
          graft.multimodal.Mp4.fixturePayload(id))
        (id, m.brand, m.codec, m.width.toLong, m.height.toLong,
          m.durationMs, m.nSamples.toLong, m.totalBytes)
      })
      .toDF("doc_id", "brand", "codec", "width", "height", "duration_ms",
        "n_samples", "total_bytes")
      .orderBy(col("doc_id"))
  }

  private val mmMp4MetaSql =
    """WITH dims AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
      |    CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'hev1' END AS codec,
      |    160 + (doc_id % 8) * 16 AS width,
      |    90 + (doc_id % 6) * 18 AS height,
      |    1000 + doc_id % 9000 AS duration_ms,
      |    10 + doc_id % 50 AS n
      |  FROM documents),
      |sz AS (
      |  SELECT doc_id, sum(100 + (i + doc_id) % 32) AS total_bytes
      |  FROM dims, unnest(generate_series(0, n - 1)) t(i)
      |  GROUP BY doc_id)
      |SELECT d.doc_id, brand, codec, width, height, duration_ms,
      |  n AS n_samples, CAST(total_bytes AS BIGINT) AS total_bytes
      |FROM dims d JOIN sz USING (doc_id) ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // WebP container metadata (multimodal.Webp) — the third web-image
  // format's sniff/dims/frames layer over a real RIFF chunk walk: all
  // three bitstream variants (lossy "VP8 " frame tag + start code,
  // lossless "VP8L" LSB-packed 14-bit dims + alpha bit, extended "VP8X"
  // 24-bit canvas + feature flags with ANMF animation frames counted by
  // the walk). VP8 entropy decode is out of JVM scope (documented seam);
  // this is the filter-before-decode metadata a curation pass runs on
  // every crawled image.
  private def mmWebpMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val m = graft.multimodal.Webp.parse(
          graft.multimodal.Webp.fixturePayload(id))
        (id, m.variant, m.width.toLong, m.height.toLong, m.hasAlpha,
          m.nFrames.toLong)
      })
      .toDF("doc_id", "variant", "width", "height", "has_alpha", "n_frames")
      .orderBy(col("doc_id"))
  }

  private val mmWebpMetaSql =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l'
      |       ELSE 'vp8x' END AS variant,
      |  32 + doc_id % 300 AS width,
      |  24 + (doc_id*3) % 200 AS height,
      |  CASE doc_id % 3 WHEN 0 THEN false WHEN 1 THEN doc_id % 2 = 1
      |       ELSE doc_id % 2 = 0 END AS has_alpha,
      |  CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 4
      |       ELSE 1 END AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Full VP8L (WebP LOSSLESS) pixel decode (multimodal.Vp8l): real
  // canonical-Huffman entropy streams with the coding class rotating per
  // id — literals (meta-Huffman groups on id%12==6), color cache + LZ77
  // RLE, subtract-green, predictor transform (all 14 modes across the
  // corpus), delta-coded palette at every bundling width, cross-color —
  // over the same position-weighted checksum as the PNG/TIFF tiers
  // (alpha-weighted too: Σ (1+x+2y)(r+2g+3b+4a)), so a misplaced LZ77
  // copy, a swapped Huffman group or a wrong transform inverse all fail
  // the value compare. Every class is LOSSLESS, so the oracle is the one
  // closed form regardless of coding path. Scale shape: pure per-row CPU
  // in one mapPartitions, no shuffle.
  private def mmWebpDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val img = graft.multimodal.Vp8l.decode(
          graft.multimodal.Vp8l.fixtureLosslessPayload(id))
        var chk = 0L
        var y = 0
        while (y < img.height) {
          var x = 0
          while (x < img.width) {
            val p = img.pixels(y * img.width + x)
            chk += (1L + x + 2L * y) * (((p >>> 16) & 0xff) +
              2L * ((p >>> 8) & 0xff) + 3L * (p & 0xff) +
              4L * ((p >>> 24) & 0xff))
            x += 1
          }
          y += 1
        }
        (id, img.width.toLong, img.height.toLong,
          if (img.hasAlpha) 1L else 0L, chk)
      })
      .toDF("doc_id", "width", "height", "has_alpha", "checksum")
      .orderBy(col("doc_id"))
  }

  private val mmWebpDecodeSql =
    """WITH dims AS (
      |  SELECT doc_id, 8 + doc_id % 25 AS w, 8 + (doc_id*3) % 21 AS h,
      |    doc_id % 6 AS cls,
      |    CASE ((doc_id // 6) % 4) WHEN 0 THEN 2 WHEN 1 THEN 4
      |         WHEN 2 THEN 16 ELSE 64 END AS psize
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, cls, x, y,
      |    (x + y + doc_id) % psize AS pi
      |  FROM dims,
      |    unnest(generate_series(0, w - 1)) t1(x),
      |    unnest(generate_series(0, h - 1)) t2(y)),
      |rgba AS (
      |  SELECT doc_id, w, h, x, y,
      |    CASE WHEN cls = 4 THEN (pi*37) % 256
      |         ELSE ((x//4)*7 + y*11 + doc_id*13) % 256 END AS r,
      |    CASE WHEN cls = 4 THEN (pi*59) % 256
      |         ELSE ((x//4)*3 + y*5 + doc_id*17) % 256 END AS g,
      |    CASE WHEN cls = 4 THEN (pi*83) % 256
      |         ELSE ((x//4)*11 + y*13 + doc_id*19) % 256 END AS b,
      |    CASE WHEN cls = 4 THEN 255
      |         WHEN doc_id % 3 = 1 THEN 200 + (x//4 + y + doc_id) % 56
      |         ELSE 255 END AS a,
      |    CASE WHEN doc_id % 3 = 1 AND cls != 4 THEN 1 ELSE 0 END AS ha
      |  FROM px)
      |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(min(ha) AS BIGINT) AS has_alpha,
      |  CAST(sum((1 + x + 2*y) * (r + 2*g + 3*b + 4*a)) AS BIGINT)
      |    AS checksum
      |FROM rgba GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // MJPEG-in-AVI video frame sampling + decode — the video tier DONE, not
  // seamed: Motion-JPEG is the one video codec a bare JVM can genuinely
  // decode (every frame is a baseline JPEG), so this query runs the full
  // 100-TB video-sampling pattern end to end: parse the real AVI RIFF
  // container (multimodal.Avi — avih/strh/strf headers, movi chunk walk,
  // idx1 index VERIFIED against the walk), SEEK to the middle frame by
  // its index offset without touching any other chunk, and entropy-decode
  // that one frame through the existing JPEG machinery. The per-frame
  // fixture blocks are closed-form in (doc_id, frame), so the oracle
  // recomputes the sampled frame's full pixel sum — a wrong index offset,
  // a mis-parsed header, or a decode slip all fail the value compare.
  private def mmVideoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val payload = graft.multimodal.Avi.fixturePayload(id)
        val meta = graft.multimodal.Avi.parse(payload)
        val k = meta.nFrames / 2
        val img = graft.multimodal.Jpeg.decode(
          graft.multimodal.Avi.frame(payload, meta, k))
        var sum = 0L
        img.pixels.foreach(sum += _)
        (id, meta.handler.toLowerCase, meta.width.toLong,
          meta.height.toLong, meta.fps.toLong, meta.nFrames.toLong,
          k.toLong, sum)
      })
      .toDF("doc_id", "codec", "width", "height", "fps", "n_frames",
        "sampled_idx", "pixel_sum")
      .orderBy(col("doc_id"))
  }

  private val mmVideoFramesSql =
    """WITH dims AS (
      |  SELECT doc_id, 8*(2 + doc_id % 5) AS w, 8*(2 + (doc_id*3) % 4) AS h,
      |    2 + doc_id % 4 AS nf, 10 + doc_id % 20 AS fps,
      |    (2 + doc_id % 4) // 2 AS k
      |  FROM documents),
      |blocks AS (
      |  SELECT doc_id, w, h, nf, fps, k, bx, by
      |  FROM dims,
      |    unnest(generate_series(0, w//8 - 1)) t1(bx),
      |    unnest(generate_series(0, h//8 - 1)) t2(by))
      |SELECT doc_id, 'mjpg' AS codec, w AS width, h AS height,
      |  CAST(fps AS BIGINT) AS fps, CAST(nf AS BIGINT) AS n_frames,
      |  CAST(k AS BIGINT) AS sampled_idx,
      |  CAST(sum(64 * (128 + 2*(((doc_id + 31*k + 7*bx + 13*by) % 64)
      |    - 32))) AS BIGINT) AS pixel_sum
      |FROM blocks GROUP BY doc_id, w, h, nf, fps, k
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // EXIF metadata extraction — the provenance/orientation pass a crawl
  // pipeline runs on every image before decode (multimodal.Exif): a real
  // JPEG marker walk to APP1, then the embedded TIFF structure in BOTH
  // byte orders (even ids II, odd MM), IFD entries with the
  // inline-vs-offset value rule (the short Model string rides inline, the
  // longer Make/DateTime behind offsets), and the ExifIFD sub-directory.
  // Every field is a closed form of doc_id, so the oracle recomputes the
  // whole record — a wrong endian read, offset slip, or NUL handling bug
  // fails the value compare.
  private def mmExifMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val m = graft.multimodal.Exif.parse(
          graft.multimodal.Exif.fixturePayload(id))
        (id, m.byteOrder, m.make, m.model, m.orientation.toLong,
          m.dateTime, m.pixelW.toLong, m.pixelH.toLong)
      })
      .toDF("doc_id", "byte_order", "make", "model", "orientation",
        "date_time", "exif_w", "exif_h")
      .orderBy(col("doc_id"))
  }

  private val mmExifMetaSql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
      |  'Cam' || (doc_id % 5) AS make,
      |  'M' || (doc_id % 7) AS model,
      |  1 + doc_id % 8 AS orientation,
      |  '2024:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
      |    || ' ' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
      |    || ':00:00' AS date_time,
      |  8*(2 + doc_id % 5) AS exif_w,
      |  8*(2 + (doc_id*3) % 4) AS exif_h
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // ID3v2 audio metadata — the audio modality's provenance layer
  // (multimodal.Id3): syncsafe tag size, frame walk with the v2.3
  // (plain-size) vs v2.4 (syncsafe-size) split that trips real parsers —
  // even ids encode v2.3, odd v2.4, so both decoders run on every
  // corpus — plus an unknown frame the walk must skip by size and
  // trailing padding. Every field is a closed form of doc_id.
  private def mmId3Meta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val m = graft.multimodal.Id3.parse(
          graft.multimodal.Id3.fixturePayload(id))
        (id, m.version.toLong, m.title, m.artist, m.album, m.track.toLong,
          m.lengthMs)
      })
      .toDF("doc_id", "id3_version", "title", "artist", "album", "track",
        "length_ms")
      .orderBy(col("doc_id"))
  }

  private val mmId3MetaSql =
    """SELECT doc_id,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS BIGINT)
      |    AS id3_version,
      |  'Track ' || (doc_id % 100) AS title,
      |  'Artist ' || (doc_id % 12) AS artist,
      |  'Album ' || (doc_id % 9) AS album,
      |  1 + doc_id % 20 AS track,
      |  30000 + (doc_id % 300) * 1000 AS length_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // FLAC STREAMINFO — the lossless-audio container tier (multimodal.
  // Flac): metadata-block walk (last-flag + type + 24-bit length) and
  // STREAMINFO's dense bit layout — the 64-bit field packing sample
  // rate (20 bits), channels-1 (3), bits-1 (5), total samples (36) —
  // with a VORBIS_COMMENT block exercising the skip path. Sample decode
  // stays behind the documented seam; this is the filter-before-decode
  // pass. Every field is a closed form of doc_id.
  private def mmFlacMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val m = graft.multimodal.Flac.parse(
          graft.multimodal.Flac.fixturePayload(id))
        (id, m.sampleRate.toLong, m.channels.toLong,
          m.bitsPerSample.toLong, m.totalSamples,
          m.minBlock.toLong, m.maxBlock.toLong)
      })
      .toDF("doc_id", "sample_rate", "channels", "bits_per_sample",
        "total_samples", "min_block", "max_block")
      .orderBy(col("doc_id"))
  }

  // Full FLAC SAMPLE decode (multimodal.Flac.decodeAudio): frame sync +
  // CRC-8/CRC-16 verification, FIXED(2) subframes, partitioned-Rice
  // residuals, 16/24-bit samples, mono/stereo, multi-frame streams — the
  // audio-features pass over PCM recovered from REAL entropy-coded
  // bits, not a formula. The oracle regenerates the closed-form signal
  // with integer arithmetic and recomputes every feature, so a slipped
  // bit anywhere in the Rice/CRC/predictor chain fails the value compare
  // (first/last are order-sensitive on purpose). Scale shape: one
  // mapPartitions over doc ids, pure per-row CPU work, no shuffle.
  private def mmFlacDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val a = graft.multimodal.Flac.decodeAudio(
          graft.multimodal.Flac.fixtureAudioPayload(id))
        val v = a.samples
        var peak = 0L
        var sumAbs = 0L
        var sumSq = 0L
        v.foreach { x =>
          val ab = math.abs(x.toLong)
          if (ab > peak) peak = ab
          sumAbs += ab
          sumSq += x.toLong * x
        }
        // micro-unit RMS (floor of an IEEE-identical double) — see
        // mmAudioFeatures for why this beats double-vs-double rounding
        (id, a.meta.sampleRate.toLong, v.length.toLong,
          v(0).toLong, v(v.length - 1).toLong, peak, sumAbs,
          math.floor(math.sqrt(sumSq.toDouble / v.length) * 1e6).toLong)
      })
      .toDF("doc_id", "sample_rate", "n_samples", "first_sample",
        "last_sample", "peak_abs", "sum_abs", "rms_micro")
      .orderBy(col("doc_id"))
  }

  private val mmFlacDecodeSql =
    """WITH d AS (
      |  SELECT doc_id, 8000 + (doc_id % 6) * 8000 AS sr,
      |    1 + doc_id % 2 AS ch,
      |    512 + (doc_id % 4) * 256 AS n,
      |    (doc_id % 200) - 100 AS base,
      |    (doc_id % 7) - 3 AS step
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, sr, ch, n, c, i,
      |    base + step * i + (i * 37 + 13 + 7 * c) % 33 - 16 AS v
      |  FROM d, unnest(generate_series(0, n - 1)) t(i),
      |       unnest(generate_series(0, ch - 1)) u(c))
      |SELECT doc_id, CAST(sr AS BIGINT) AS sample_rate,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(min(CASE WHEN c = 0 AND i = 0 THEN v END) AS BIGINT)
      |    AS first_sample,
      |  CAST(min(CASE WHEN c = ch - 1 AND i = n - 1 THEN v END) AS BIGINT)
      |    AS last_sample,
      |  CAST(max(abs(v)) AS BIGINT) AS peak_abs,
      |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
      |  CAST(floor(sqrt(sum(v*v)*1.0/count(*)) * 1e6) AS BIGINT)
      |    AS rms_micro
      |FROM s GROUP BY doc_id, sr, ch, n ORDER BY doc_id""".stripMargin

  private val mmFlacMetaSql =
    """SELECT doc_id,
      |  8000 + (doc_id % 6) * 8000 AS sample_rate,
      |  1 + doc_id % 2 AS channels,
      |  16 + (doc_id % 2) * 8 AS bits_per_sample,
      |  10000 + (doc_id % 90000) * 7 AS total_samples,
      |  CAST(1024 AS BIGINT) AS min_block,
      |  CAST(4096 AS BIGINT) AS max_block
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "mm_webp_decode" -> mmWebpDecode _,
    "mm_flac_decode" -> mmFlacDecode _,
    "mm_tiff_decode" -> mmTiffDecode _,
    "mm_flac_meta" -> mmFlacMeta _,
    "mm_id3_meta" -> mmId3Meta _,
    "mm_exif_meta" -> mmExifMeta _,
    "mm_video_frames" -> mmVideoFrames _,
    "mm_webp_meta" -> mmWebpMeta _,
    "mm_mp4_meta" -> mmMp4Meta _,
    "mm_decode_gif_pixels" -> mmDecodeGifPixels _,
    "mm_decode_png_pixels" -> mmDecodePngPixels _,
    "mm_decode_real" -> mmDecodeReal _,
    "mm_decode_png_gif" -> mmDecodePngGif _,
    "mm_resize_real" -> mmResizeReal _,
    "mm_decode_meta" -> mmDecodeMeta _,
    "mm_frame_sample" -> mmFrameSample _,
    "mm_decode_batch" -> mmDecodeBatch _,
    "mm_decode_color" -> mmDecodeColor _,
    "mm_thumbnail_jpeg" -> mmThumbnailJpeg _,
    "mm_ahash_dedup" -> mmAhashDedup _,
    "mm_audio_features" -> mmAudioFeatures _,
    "mm_audio_spectrum" -> mmAudioSpectrum _,
    "mm_gif_frames" -> mmGifFrames _,
    "mm_resize_plan" -> mmResizePlan _
  )

  val oracle: Map[String, String] = Map(
    "mm_webp_decode" -> mmWebpDecodeSql,
    "mm_flac_decode" -> mmFlacDecodeSql,
    "mm_tiff_decode" -> mmTiffDecodeSql,
    "mm_flac_meta" -> mmFlacMetaSql,
    "mm_id3_meta" -> mmId3MetaSql,
    "mm_exif_meta" -> mmExifMetaSql,
    "mm_video_frames" -> mmVideoFramesSql,
    "mm_webp_meta" -> mmWebpMetaSql,
    "mm_mp4_meta" -> mmMp4MetaSql,
    "mm_decode_gif_pixels" -> mmDecodeGifPixelsSql,
    "mm_decode_png_pixels" -> mmDecodePngPixelsSql,
    "mm_decode_real" -> mmDecodeRealSql,
    "mm_decode_png_gif" -> mmDecodePngGifSql,
    "mm_resize_real" -> mmResizeRealSql,
    "mm_decode_meta" -> mmDecodeMetaSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_decode_batch" -> mmDecodeBatchSql,
    "mm_decode_color" -> mmDecodeColorSql,
    "mm_thumbnail_jpeg" -> mmThumbnailJpegSql,
    "mm_ahash_dedup" -> mmAhashDedupSql,
    "mm_audio_features" -> mmAudioFeaturesSql,
    "mm_audio_spectrum" -> mmAudioSpectrumSql,
    "mm_gif_frames" -> mmGifFramesSql,
    "mm_resize_plan" -> mmResizePlanSql
  )
}
