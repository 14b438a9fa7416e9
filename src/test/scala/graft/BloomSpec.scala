package graft

import org.apache.spark.sql.functions._

import graft.functions.{bloom, BloomUtil}

class BloomSpec extends SparkSpec {

  private val NumBits = 1 << 14 // 16384 bits
  private val K = 6

  test("bloom has no false negatives and bounded false positives") {
    import spark.implicits._
    val members = (1L to 1000L).map(BloomUtil.mix1) // arbitrary 64-bit values
    val bytes = members.toDF("v").repartition(8)
      .agg(bloom.bloom_agg(col("v"), NumBits, K)).head().getAs[Array[Byte]](0)
    val bits = BloomUtil.toLongs(bytes)
    members.foreach(v =>
      assert(BloomUtil.contains(bits, K, v), s"false negative for $v"))
    // m/n = 16.4 at k=6 -> theoretical fpp ~0.16%; allow 1%
    val nonMembers = (100001L to 110000L).map(BloomUtil.mix1)
    val fp = nonMembers.count(BloomUtil.contains(bits, K, _))
    assert(fp <= 100, s"false-positive rate too high: $fp / 10000")
  }

  test("bloom is bit-identical under any partitioning (merge = OR)") {
    import spark.implicits._
    val df = (1L to 500L).toDF("v")
    val a = df.repartition(1)
      .agg(bloom.bloom_agg(col("v"), NumBits, K)).head().getAs[Array[Byte]](0)
    val b = df.repartition(7)
      .agg(bloom.bloom_agg(col("v"), NumBits, K)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("bloom_contains agrees between codegen and interpreted paths") {
    import spark.implicits._
    val bits = new Array[Long](NumBits / 64)
    (1L to 100L).foreach(BloomUtil.set(bits, K, _))
    val bytes = BloomUtil.toBytes(bits)
    val probe = (1L to 200L).toDF("v")
      .select(col("v"), bloom.bloom_contains(bytes, col("v"), K).as("hit"))
    val withCodegen = probe.collect().map(r => r.getLong(0) -> r.getBoolean(1))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted =
      try probe.collect().map(r => r.getLong(0) -> r.getBoolean(1))
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(withCodegen.sameElements(interpreted))
    // every inserted value hits; most of 101..200 should miss
    assert(withCodegen.filter(_._1 <= 100).forall(_._2))
    assert(withCodegen.count(p => p._1 > 100 && p._2) <= 2)
  }

  test("bloom decontamination == broadcast decontamination exactly") {
    val a = SparkEntry.queries("q57_decontaminate")(spark, sf)
      .collect().map(_.getLong(0)).sorted
    val b = SparkEntry.queries("q69_decontaminate_bloom")(spark, sf)
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }
}
