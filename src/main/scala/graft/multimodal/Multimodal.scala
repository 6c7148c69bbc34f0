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
  * The IMAGE path is REAL as of round 10: `javax.imageio` ships in the
  * JDK, so image payloads are genuine PNG bytes, decoded to
  * (width, height, pixel checksum, channel mean) — exercised end-to-end
  * by the oracled `multimodal_image_decode` query (PNG is lossless, so
  * the decoded raster is an exact integer function the oracle recomputes
  * without touching bytes). Audio/video codecs are NOT available in this
  * container, so those decode kernels remain STUBBED with a deterministic
  * fake (content-hash-seeded features). Everything Spark-side — schema,
  * partitioning, batch shape, the partition-local init/amortize pattern —
  * is real and tested; swapping `FakeCodec` for a JNI/javacpp codec
  * changes no plan shape.
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
      n_bytes: Long, feature: Array[Float], n_frames_sampled: Int,
      decoded_width: Option[Int], decoded_height: Option[Int])

  /** REAL image codec — `javax.imageio` is in the JDK, no new jars.
    * Raster samples (not `getRGB`) are read so gray byte values roundtrip
    * exactly: PNG is lossless and the color-model conversion `getRGB`
    * applies would perturb the integer checksum the oracle recomputes.
    */
  object ImageCodec {
    final case class Decoded(width: Int, height: Int, pxSum: Long, nPx: Long)

    /** Decode real image bytes (PNG/BMP/GIF — whatever ImageIO reads) to
      * exact integer metadata over the first band. None for bytes that
      * are not a decodable image (the caller falls back to the stub).
      */
    def decode(payload: Array[Byte]): Option[Decoded] = {
      if (payload == null || payload.isEmpty) return None
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val r = img.getRaster
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) { s += r.getSample(x, y, 0); x += 1 }
          y += 1
        }
        Decoded(img.getWidth, img.getHeight, s,
          img.getWidth.toLong * img.getHeight.toLong)
      } catch { case _: java.io.IOException => None }
    }

    /** Deterministic w×h gray PNG: pixel(x,y) = (id·31 + x·7 + y·13) mod
      * 256. The formula is the contract — the DuckDB oracle recomputes the
      * decoded checksum from (asset_id, x, y) alone, so the encode→decode
      * roundtrip is hash-proven without the oracle reading a byte.
      */
    def syntheticPng(id: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          r.setSample(x, y, 0, (((id % 256L) * 31L + x * 7L + y * 13L) % 256L).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

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
    * Image payloads take the REAL [[ImageCodec]] decode path (feature =
    * the decoded channel mean, dims filled in); everything else — and
    * image bytes ImageIO cannot parse — falls back to the stub.
    */
  def extractFeatures(spark: SparkSession, assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition codec init would go here (expensive, amortized)
      it.map { a =>
        val payload = Option(a.payload).getOrElse(Array.emptyByteArray)
        val real =
          if (a.media_type == "image") ImageCodec.decode(payload) else None
        real match {
          case Some(d) =>
            AssetFeatures(a.asset_id, a.media_type, payload.length.toLong,
              Array((d.pxSum.toDouble / d.nPx.toDouble).toFloat), 1,
              Some(d.width), Some(d.height))
          case None =>
            AssetFeatures(a.asset_id, a.media_type, payload.length.toLong,
              FakeCodec.features(payload), FakeCodec.sampleFrames(a.duration_ms),
              None, None)
        }
      }
    }
  }

  /** Exact decode metadata for the image assets — the oracled readout of
    * the real codec path: (asset_id, width, height, px_sum, n_px,
    * mean_px). One per-partition decode pass, no shuffle; non-image and
    * undecodable payloads are dropped (this is the image audit, not the
    * generic feature pass).
    */
  def decodeImageMetadata(spark: SparkSession,
      assets: Dataset[Asset]): DataFrame = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        if (a.media_type != "image") None
        else ImageCodec.decode(Option(a.payload).getOrElse(Array.emptyByteArray))
          .map(d => (a.asset_id, d.width.toLong, d.height.toLong, d.pxSum, d.nPx))
      }
    }.toDF("asset_id", "width", "height", "px_sum", "n_px")
      .withColumn("mean_px",
        round(col("px_sum").cast("double") / col("n_px").cast("double"), 9))
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

  /** Deterministic synthetic assets derived from the documents table.
    * IMAGE assets carry REAL 8×8 PNG bytes ([[ImageCodec.syntheticPng]] —
    * encoded on executors, one pass, pure JDK); audio/video keep the
    * text-bytes stand-in for the stub codec.
    */
  def syntheticAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        lit(8).as("width"), lit(8).as("height"),
        (col("n_chars") * 100L).as("duration_ms"),
        lit("fake").as("codec"))
      .as[Asset]
      .mapPartitions { it => // encoder context amortized per partition
        it.map { a =>
          if (a.media_type == "image")
            a.copy(payload = ImageCodec.syntheticPng(a.asset_id),
              codec = Some("png"))
          else a
        }
      }
  }
}
