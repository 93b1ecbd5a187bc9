package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs — the Spark-side schema,
  * partitioning, and batch shape are real; the actual codec decode is
  * STUBBED (no image/audio libraries in this container; BASELINE.json
  * scopes the plumbing, not the codecs).
  *
  * Scale design: media payloads stay as binary columns in parquet (row
  * groups keep them columnar-compressed); metadata extraction is a narrow
  * map (no shuffle); frame sampling explodes to one row per sampled frame,
  * partition-pruned by whatever key the table is laid out on.
  */
object Media {

  /** Decoder contract. Real implementations (JPEG/PNG/WAV) plug in here. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
  }

  final case class MediaMeta(width: Int, height: Int, format: String,
      nFrames: Int)

  /** STUB — a real build links an image codec; this container has none. */
  object NotImplementedDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta =
      throw new NotImplementedError(
        "codec decode is stubbed in this environment (no image libs)")
  }

  /** Deterministic fake decoder: derives metadata purely from payload
    * length, mirroring what a real header parse would return in shape.
    */
  object FakeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      MediaMeta(
        width = 64 + n % 512,
        height = 64 + (n * 7) % 512,
        format = (n % 3) match {
          case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
        },
        nFrames = n / 100 + 1)
    }
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Column-expression metadata extraction — the whole-stage-codegen path
    * used when metadata is derivable without a codec (here: the FakeDecoder
    * arithmetic expressed as Catalyst expressions, byte-identical to it).
    */
  def imageMetaExpr(payloadCol: String): org.apache.spark.sql.Column = {
    val n = length(col(payloadCol))
    struct(
      (lit(64) + n % 512).cast("int").as("width"),
      (lit(64) + (n * 7) % 512).cast("int").as("height"),
      when(n % 3 === 0, "jpeg").when(n % 3 === 1, "png").otherwise("webp")
        .as("format"),
      (n / lit(100) + 1).cast("int").as("n_frames"))
  }

  /** mapPartitions decode path — the batch shape a real codec uses (one
    * decoder instance per partition, iterator-to-iterator, no collect).
    */
  def decodeBatch(df: DataFrame, idCol: String, payloadCol: String,
      decoder: MediaDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one decoder per partition; iterator stays lazy (no materialization)
        it.map { case (id, payload) =>
          val m = decoder.decode(payload)
          (id, m.width, m.height, m.format, m.nFrames)
        }
      }
      .toDF("id", "width", "height", "format", "n_frames")
  }

  /** Frame sampling: one output row per sampled frame index (every
    * `stride`-th frame), offset = frame * frameBytes — the explode shape a
    * video pipeline uses before per-frame feature extraction.
    */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
      stride: Int = 2, frameBytes: Int = 100): DataFrame =
    df.withColumn("meta", imageMetaExpr(payloadCol))
      .select(col(idCol), col("meta.n_frames").as("n_frames"),
        explode(expr(s"sequence(0, meta.n_frames - 1, $stride)"))
          .as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * frameBytes)
}
