package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.operators.ResultCache

/** The result-reuse contract: hits skip plan execution, input mutation
  * invalidates, plan-equivalent queries share an entry, and
  * non-deterministic plans are refused.
  */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  test("second call is a hit and does not re-execute the plan") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-rescache").toString
    val in = java.nio.file.Files
      .createTempDirectory("graft-rescache-in").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$in/t.parquet")
    // a side-effecting UDF proves (non-)execution: its counter moves
    // only when the plan actually runs. The singleton is referenced
    // INSIDE the lambda — capturing the AtomicLong by value would hand
    // the executor a serialized COPY
    val calls = ResultCacheSpec.Calls
    calls.set(0L)
    val tick = udf((k: Long) => {
      ResultCacheSpec.Calls.incrementAndGet(); k * 10
    })
    def q = spark.read.parquet(s"$in/t.parquet")
      .select(col("k"), tick(col("k")).as("k10"))
    val (r1, hit1) = ResultCache.cached(q, root)
    val rows1 = r1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!hit1 && calls.get() > 0L)
    assert(rows1 === Set((1L, 10L), (2L, 20L), (3L, 30L)))
    calls.set(0L)
    val (r2, hit2) = ResultCache.cached(q, root)
    assert(hit2, "identical query + unchanged input must hit")
    assert(r2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === rows1)
    assert(calls.get() === 0L, "a hit must not re-execute the plan")
    // plan-equivalent rebuild (fresh DataFrame object) also hits
    assert(ResultCache.cached(q, root)._2)
    // mutated input -> new fingerprint -> miss and fresh result
    Seq((9L, "z")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$in/t.parquet")
    val (r3, hit3) = ResultCache.cached(q, root)
    assert(!hit3, "rewritten input must invalidate")
    assert(r3.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((9L, 90L)))
  }

  test("non-deterministic plans are refused") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-rescache-nd").toString
    val q = spark.range(5).select(rand().as("r"))
    intercept[IllegalArgumentException] {
      ResultCache.cached(q, root)
    }
  }

  test("snapshot-version key: hit at a version, miss after a commit") {
    import graft.operators.VersionedTable
    val root = java.nio.file.Files
      .createTempDirectory("graft-rescache-v").toString
    val vt = java.nio.file.Files
      .createTempDirectory("graft-rescache-vt").toString
    VersionedTable.write(Seq((1L, 2.0), (2L, 4.0)).toDF("k", "x"), vt)
    def q = VersionedTable.read(spark, vt)
      .agg(sum(col("x").cast("decimal(18,4)")).cast("double").as("sx"))
    val (r1, h1) = ResultCache.cachedVersioned(q, root, Seq(vt))
    assert(!h1 && r1.collect().head.getDouble(0) === 6.0)
    val (r2, h2) = ResultCache.cachedVersioned(q, root, Seq(vt))
    assert(h2, "same plan at the same table version must hit")
    assert(r2.collect().head.getDouble(0) === 6.0)
    // a new commit bumps the version — the SAME logical query re-keys
    VersionedTable.write(Seq((1L, 2.0), (2L, 4.0), (3L, 10.0))
      .toDF("k", "x"), vt)
    val (r3, h3) = ResultCache.cachedVersioned(q, root, Seq(vt))
    assert(!h3, "a committed version must invalidate")
    assert(r3.collect().head.getDouble(0) === 16.0)
    // an uncommitted table root is refused, not silently keyed
    val empty = java.nio.file.Files
      .createTempDirectory("graft-rescache-empty").toString
    intercept[IllegalArgumentException] {
      ResultCache.cachedVersioned(q, root, Seq(empty))
    }
  }
}

object ResultCacheSpec {
  /** JVM-wide so executor threads (local mode) and the driver see it. */
  val Calls = new AtomicLong(0L)
}
