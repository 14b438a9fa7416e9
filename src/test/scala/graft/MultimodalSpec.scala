package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  lazy val assets = Multimodal.syntheticAssets(spark, sf)

  test("synthetic assets conform to the canonical asset schema") {
    assert(assets.schema("bytes").dataType == BinaryType)
    // same field names/types (nullability differs: lit() is non-null)
    assert(assets.schema("meta").dataType.simpleString ==
      Multimodal.assetSchema("meta").dataType.simpleString)
    val r = assets.head()
    assert(r.getAs[Array[Byte]]("bytes").length == 1024)
  }

  test("decodeFeatures is deterministic and narrow (no shuffle)") {
    val feats = Multimodal.decodeFeatures(assets)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode pass must not shuffle:\n$plan")
    val a = feats.collect().sortBy(_.asset_id)
    val b = Multimodal.decodeFeatures(assets, batchSize = 7).collect()
      .sortBy(_.asset_id)
    assert(a.map(_.checksum).toSeq == b.map(_.checksum).toSeq,
      "batch size must not affect results")
    assert(a.forall(_.feature.length == 16))
    assert(a.forall(f => f.mean_byte > 0 && f.mean_byte < 256))
  }

  test("decode kernel: known bytes → known stats") {
    val f = Multimodal.decodeKernel(1L, "image", Array[Byte](0, 2, 4))
    assert(f.byte_len == 3 && f.mean_byte == 2.0)
  }

  test("frameSample keeps every Nth frame with correct payload split") {
    val frames = Multimodal.frameSample(assets, 2)
    val byAsset = frames.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = assets.select(col("asset_id"), col("meta.n_frames"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1) + 1) / 2).toLong)
      .toMap
    assert(byAsset == expected)
    // frame indices are the even ones
    val idx = frames.select("frame_idx").distinct().collect()
      .map(_.getInt(0)).toSet
    assert(idx.forall(_ % 2 == 0))
  }

  test("resize shrinks payload and rewrites metadata") {
    val out = Multimodal.resize(assets, 8, 8)
    val r = out.head()
    assert(r.getStruct(3).getInt(0) == 8 && r.getStruct(3).getInt(1) == 8)
    assert(r.getAs[Array[Byte]](2).length < 1024)
    // composes: decode runs on resized assets
    assert(Multimodal.decodeFeatures(out).count() == assets.count())
  }

  test("metadata-only query prunes the bytes column from the scan") {
    val metaOnly = assets.select("asset_id", "kind", "meta.n_frames")
    assert(metaOnly.count() > 0)
  }
}
