package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video as opaque BINARY columns with typed metadata, processed in
  * batched per-partition passes (the Scala analog of `mapInPandas` —
  * `mapPartitions` over a typed Dataset, one codec context per partition,
  * amortized across the batch).
  *
  * The actual codecs (JPEG decode, audio resample, video frame extraction)
  * are NOT available in this container, so the decode kernel is STUBBED
  * with a deterministic fake (content-hash-seeded features). Everything
  * Spark-side — schema, partitioning, batch shape, the partition-local
  * init/amortize pattern — is real and tested; swapping `FakeCodec` for a
  * JNI/javacpp codec changes no plan shape.
  */
object Multimodal {

  /** Asset schema: the binary payload plus typed metadata (never parse
    * metadata out of the blob on the hot path — store it columnar so
    * filters prune without touching bytes).
    */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("codec", StringType, nullable = true)))

  final case class Asset(asset_id: Long, media_type: String, payload: Array[Byte],
      width: Option[Int], height: Option[Int], duration_ms: Option[Long],
      codec: Option[String])

  final case class AssetFeatures(asset_id: Long, media_type: String,
      n_bytes: Long, feature: Array[Float], n_frames_sampled: Int)

  /** STUB codec: deterministic bytes → features. A real implementation
    * decodes/resizes/frame-samples here; the fake derives a stable
    * 8-dim feature from a rolling byte hash so tests are reproducible.
    */
  object FakeCodec {
    def features(payload: Array[Byte], dims: Int = 8): Array[Float] = {
      val acc = new Array[Long](dims)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        acc(i % dims) += (h & 0xFFFF)
        i += 1
      }
      acc.map(v => (v % 10000) / 10000.0f)
    }
    /** Frame sampling stub: one "frame" per second of duration, capped. */
    def sampleFrames(durationMs: Option[Long], maxFrames: Int = 8): Int =
      durationMs.map(d => math.min((d / 1000L).toInt max 1, maxFrames)).getOrElse(1)
  }

  /** Batched feature extraction: one pass per partition, codec context
    * initialized once per partition (the mapInPandas batch shape).
    */
  def extractFeatures(spark: SparkSession, assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition codec init would go here (expensive, amortized)
      it.map { a =>
        val payload = Option(a.payload).getOrElse(Array.emptyByteArray)
        AssetFeatures(a.asset_id, a.media_type, payload.length.toLong,
          FakeCodec.features(payload), FakeCodec.sampleFrames(a.duration_ms))
      }
    }
  }

  /** Deterministic frame-sampling PLAN: for each asset, the frame
    * indices a decoder fleet should extract — uniform stride over
    * `duration × fps` total frames, capped at `maxFrames`, first-frame
    * anchored. The plan is the relational artifact the expensive decode
    * stage consumes (each row = one decode task), so making it exact,
    * engine-reproducible integer algebra matters even though the codec
    * itself is stubbed: re-runs and retries must schedule the SAME
    * frames or features drift. Pure per-row arithmetic + one explode —
    * no shuffle; output is bounded at maxFrames rows per asset.
    */
  def frameSamplePlan(assets: org.apache.spark.sql.DataFrame, fps: Int = 30,
      maxFrames: Int = 8): org.apache.spark.sql.DataFrame = {
    require(fps >= 1 && maxFrames >= 1, "frameSamplePlan: fps/maxFrames >= 1")
    assets
      .filter(col("duration_ms").isNotNull)
      .withColumn("total_frames",
        greatest(lit(1L), expr(s"(duration_ms * $fps) div 1000")))
      .withColumn("n_samples",
        least(lit(maxFrames.toLong), col("total_frames")))
      .withColumn("stride", expr("total_frames div n_samples"))
      .withColumn("sample_seq",
        explode(sequence(lit(0L), col("n_samples") - 1L)))
      .select(col("asset_id"), col("media_type"), col("duration_ms"),
        col("total_frames"), col("n_samples"), col("sample_seq"),
        (col("sample_seq") * col("stride")).as("frame_index"))
  }

  /** Deterministic synthetic assets derived from the documents table —
    * lets the plumbing run against fixture data with no media libs.
    */
  def syntheticAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        lit(64).as("width"), lit(64).as("height"),
        (col("n_chars") * 100L).as("duration_ms"),
        lit("fake").as("codec"))
      .as[Asset]
  }
}
