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

  test("write-then-claim: a racing loser never disturbs published files") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-rescache-race").toString
    def q = spark.range(1, 100).select(
      col("id"), (col("id") * 2).as("dbl"))
    val (r1, h1) = ResultCache.cached(q, root)
    assert(!h1 && r1.count() === 99)
    val dataRoot = new java.io.File(root, "data")
    val published = dataRoot.listFiles().filter(_.getName.head != '.')
    assert(published.length === 1)
    val keyDir = published.head
    val before = keyDir.listFiles().map(f =>
      f.getName -> (f.lastModified(), f.length())).toMap
    // Simulate the losing racer: the winner's rename landed but (from
    // this writer's view) the marker check already passed — delete the
    // marker so the next call takes the miss path against an existing
    // destination. The loser must stage to a temp dir, FAIL the rename,
    // drop its temp, and serve the winner's files untouched — the old
    // in-place mode(overwrite) would rewrite them here.
    val marker = new java.io.File(root, s"_commits/${keyDir.getName}")
    assert(marker.delete())
    val (r2, h2) = ResultCache.cached(q, root)
    assert(!h2 && r2.count() === 99)
    val after = keyDir.listFiles().map(f =>
      f.getName -> (f.lastModified(), f.length())).toMap
    assert(after === before,
      "published parquet files must survive a losing writer byte-for-byte")
    assert(marker.exists(), "the loser still publishes the marker")
    // no orphaned temp staging dirs remain
    assert(dataRoot.listFiles().count(_.getName.head == '.') === 0)
  }

  test("concurrent writers of one key: both serve, one data dir, no temps") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-rescache-conc").toString
    def q = spark.range(1, 501).select(col("id"), (col("id") % 7).as("m"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val runs = Seq(Future(ResultCache.cached(q, root)),
      Future(ResultCache.cached(q, root)))
    val results = Await.result(Future.sequence(runs), 120.seconds)
    results.foreach { case (df, _) => assert(df.count() === 500) }
    val dataRoot = new java.io.File(root, "data")
    assert(dataRoot.listFiles().count(_.getName.head != '.') === 1)
    assert(dataRoot.listFiles().count(_.getName.head == '.') === 0,
      "losing racer must clean its temp staging dir")
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
