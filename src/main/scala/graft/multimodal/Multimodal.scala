package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.11 [EXT]): image/audio/video
  * assets as opaque `binary` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample operators a training
  * pipeline runs over them.
  *
  * The actual codecs are NOT in this container, so the decode kernels are
  * deterministic STUBS (clearly marked) — the Spark-side contract is
  * real and tested: schema, per-partition batched execution (the
  * mapPartitions shape an Arrow/pandas-batch UDF would have), shuffle-
  * free narrow execution, and frame explosion.
  *
  * Scale notes: assets are processed strictly per-partition (narrow),
  * so 100 TB of binaries stream through executors at
  * `spark.sql.files.maxPartitionBytes` granularity; nothing is
  * collected, and metadata-only plans never touch the bytes column
  * (parquet column pruning).
  */
object Multimodal {

  /** Canonical asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))), nullable = false)))

  /** Deterministic synthetic assets derived from `documents` — stands in
    * for an ingested media table so the pipeline shape is testable with
    * the driver's data. Payload = recycled utf-8 of the text, truncated/
    * padded to a deterministic length; metadata derived from doc fields.
    */
  def syntheticAssets(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables(spark, sfDir, "documents").select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      to_binary(rpad(repeat(col("text"), 8), 1024, "."), lit("utf-8"))
        .as("bytes"),
      struct(
        lit(32).as("width"), lit(32).as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(8)) + 1).cast("int").as("n_frames"))
        .as("meta"))

  /** Result row of the decode/feature pass. */
  case class AssetFeatures(asset_id: Long, kind: String, byte_len: Int,
      mean_byte: Double, checksum: Long, feature: Array[Float])

  // ----- STUB KERNELS ------------------------------------------------
  // Real implementations would call an image/audio codec here (e.g.
  // JPEG decode to pixels, PCM resample). Not available in this
  // container — each stub is a deterministic pure function of the bytes
  // so tests pin the plumbing end-to-end.

  /** STUB decode: byte statistics + a fixed-width "embedding" projection
    * (mean of each 64-byte stripe) standing in for decoded features.
    */
  private[graft] def decodeKernel(id: Long, kind: String,
      bytes: Array[Byte]): AssetFeatures = {
    var sum = 0L
    var crc = 1469598103934665603L // FNV-1a
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      crc = (crc ^ (bytes(i) & 0xff)) * 1099511628211L
      i += 1
    }
    val dim = 16
    val stripe = math.max(1, bytes.length / dim)
    val feat = Array.tabulate(dim) { j =>
      val from = j * stripe
      val until = math.min(bytes.length, from + stripe)
      if (from >= bytes.length) 0.0f
      else {
        var s = 0L; var k = from
        while (k < until) { s += bytes(k) & 0xff; k += 1 }
        (s.toDouble / (until - from)).toFloat
      }
    }
    AssetFeatures(id, kind,
      bytes.length, if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
      crc, feat)
  }

  /** Decode + feature-extract over asset batches: per-partition batched
    * iteration (the exact shape an Arrow-batched pandas UDF has —
    * batches of `batchSize` rows per call), narrow, no shuffle.
    */
  def decodeFeatures(assets: DataFrame, batchSize: Int = 64)
      : Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("bytes"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized kernel would run once
          batch.iterator.map { r =>
            decodeKernel(r.getLong(0), r.getString(1),
              r.getAs[Array[Byte]](2))
          }
        }
      }
  }

  /** STUB resize: keeps every (h/newH × w/newW)-th "pixel" byte — real
    * impl would resample decoded pixels. Returns the same asset schema
    * with updated metadata, so resize composes with decode/frameSample.
    */
  def resize(assets: DataFrame, newW: Int, newH: Int): DataFrame = {
    val spark = assets.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(assetSchema)
    assets.select("asset_id", "kind", "bytes", "meta").map { r =>
      val bytes = r.getAs[Array[Byte]](2)
      val meta = r.getStruct(3)
      val w = meta.getInt(0); val h = meta.getInt(1)
      val step = math.max(1, (w.toLong * h / math.max(1, newW * newH)).toInt)
      val out = bytes.grouped(step).map(_.head).toArray
      Row(r.getLong(0), r.getString(1), out,
        Row(newW, newH, meta.getInt(2), meta.getInt(3)))
    }(enc)
  }

  /** Frame sampling: split the payload into meta.n_frames equal chunks
    * and keep every `everyN`-th — one output row per kept frame
    * (explode; still narrow).
    */
  def frameSample(assets: DataFrame, everyN: Int): DataFrame =
    assets
      .withColumn("frame_size",
        greatest(lit(1), (length(col("bytes")) / col("meta.n_frames"))
          .cast("int")))
      .select(col("asset_id"), col("kind"), col("meta"), col("frame_size"),
        posexplode(expr(
          """transform(sequence(0, meta.n_frames - 1),
            |  f -> substring(bytes, f * frame_size + 1, frame_size))"""
            .stripMargin)))
      .toDF("asset_id", "kind", "meta", "frame_size", "frame_idx", "frame")
      .filter(pmod(col("frame_idx"), lit(everyN)) === 0)
      .select(col("asset_id"), col("kind"), col("frame_idx"), col("frame"))
}
