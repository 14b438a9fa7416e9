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
}

object ResultCacheSpec {
  /** JVM-wide so executor threads (local mode) and the driver see it. */
  val Calls = new AtomicLong(0L)
}
