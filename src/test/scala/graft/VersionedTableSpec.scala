package graft

import org.apache.hadoop.fs.Path

import graft.operators.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-vt").toString

  test("snapshots commit in order and time travel reads any of them") {
    val root = freshRoot()
    val v1 = VersionedTable.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    val v2 = VersionedTable.write(Seq((1, "a2"), (3, "c")).toDF("k", "v"), root)
    assert(v1 == 1L && v2 == 2L)
    assert(VersionedTable.versions(spark, root) == Seq(1L, 2L))
    val latest = VersionedTable.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(latest == Set((1, "a2"), (3, "c")))
    val old = VersionedTable.read(spark, root, Some(1L)).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(old == Set((1, "a"), (2, "b")))
  }

  test("merge: matched keys replace, unmatched insert, rest carry over") {
    val root = freshRoot()
    VersionedTable.write(
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), root)
    val v = VersionedTable.merge(spark, root,
      Seq((2, "B!"), (4, "d")).toDF("k", "v"), "k")
    assert(v == 2L)
    val merged = VersionedTable.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(merged == Set((1, "a"), (2, "B!"), (3, "c"), (4, "d")))
    // snapshot isolation: the pre-merge version is untouched
    val pre = VersionedTable.read(spark, root, Some(1L)).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(pre == Set((1, "a"), (2, "b"), (3, "c")))
    // MERGE rejects multiple update rows per target key (it would
    // otherwise silently commit duplicate rows for that key)
    intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, root,
        Seq((5, "x"), (5, "y")).toDF("k", "v"), "k")
    }
    // ... and the refused merge committed nothing
    assert(VersionedTable.versions(spark, root).last == v)
  }

  test("changelog between versions; applying it reproduces the target") {
    import org.apache.spark.sql.functions._
    val root = freshRoot()
    VersionedTable.write(
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), root)
    VersionedTable.write(
      Seq((1, "a"), (2, "B!"), (4, "d")).toDF("k", "v"), root)
    val cl = VersionedTable.changelog(spark, root, 1L, 2L, "k")
    val ops = cl.collect()
      .map(r => r.getInt(0) -> (Option(r.getString(1)), r.getString(2)))
      .toMap
    assert(ops == Map(
      2 -> (Some("B!"), "U"),
      3 -> (None, "D"),
      4 -> (Some("d"), "I")))
    // ROUNDTRIP: v1 + changelog == v2 (the q123 CDC-apply semantics:
    // drop D and U keys, add back U and I rows)
    val v1 = VersionedTable.read(spark, root, Some(1L))
    val touched = cl.select(col("k"))
    val applied = v1.join(touched, Seq("k"), "left_anti")
      .unionByName(cl.filter(col("op") =!= "D").select(col("k"), col("v")))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val v2 = VersionedTable.read(spark, root, Some(2L)).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(applied == v2, "changelog applied to v1 must reproduce v2")
  }

  test("an uncommitted (crashed) snapshot is invisible to readers") {
    val root = freshRoot()
    VersionedTable.write(Seq((1, "a")).toDF("k", "v"), root)
    // simulate a writer that crashed after staging data, before commit
    Seq((9, "ghost")).toDF("k", "v")
      .write.parquet(new Path(root, "data/v=2").toString)
    assert(VersionedTable.versions(spark, root) == Seq(1L))
    val latest = VersionedTable.read(spark, root).collect()
      .map(_.getInt(0)).toSet
    assert(latest == Set(1))
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(2L))
    }
  }

  test("the commit-marker claim is exclusive (the atomicity primitive)") {
    val root = freshRoot()
    VersionedTable.write(Seq((1, "a")).toDF("k", "v"), root)
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // a second create(overwrite = false) on the same marker must throw —
    // this is exactly the call a racing writer loses on
    intercept[Exception] {
      fs.create(new Path(root, "_commits/1"), false).close()
    }
  }

  test("read on an empty root fails loudly, not with empty data") {
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, freshRoot())
    }
  }

  test("delete + expire: forgotten keys leave no residue and no history") {
    import spark.implicits._
    import graft.operators.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("vt-forget").toString
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    VersionedTable.write(base, root)
    val doomed = Seq(2L, 4L).toDF("id")
    val v2 = VersionedTable.delete(spark, root, doomed, "id")
    // snapshot isolation BEFORE expire: v1 still serves the old rows
    assert(VersionedTable.read(spark, root, Some(1L)).count() === 4)
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    // expire ends time travel below v2
    assert(VersionedTable.expire(spark, root, v2) === Seq(1L))
    assert(VersionedTable.versions(spark, root) === Seq(v2))
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(1L))
    }
    // newest still reads, residue zero
    val cur = VersionedTable.read(spark, root)
    assert(cur.join(doomed, Seq("id")).count() === 0)
    // refuses to expire everything
    intercept[IllegalArgumentException] {
      VersionedTable.expire(spark, root, v2 + 10)
    }
  }

  test("vacuum removes aged orphans only; committed and fresh survive") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-vt-vacuum").toString
    val v1 = VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), root)
    // a CRASHED write's residue: data staged at v2, no commit marker
    Seq((-1L, "crashed")).toDF("k", "v")
      .write.parquet(s"$root/data/v=${v1 + 1}")
    val orphan = new java.io.File(s"$root/data/v=${v1 + 1}")
    assert(orphan.exists, "the crashed write's data dir is the fixture")
    // horizon in the future of the orphan's mtime → not yet collectable
    assert(VersionedTable.vacuumOrphans(spark, root, 60000L).isEmpty)
    assert(orphan.exists)
    // horizon 0 → aged out; the orphan goes, the committed version stays
    assert(VersionedTable.vacuumOrphans(spark, root, -1L) === Seq(v1 + 1))
    assert(!orphan.exists)
    assert(VersionedTable.read(spark, root).count() === 1L)
    assert(VersionedTable.versions(spark, root) === Seq(v1))
    // idempotent on a clean table
    assert(VersionedTable.vacuumOrphans(spark, root, -1L).isEmpty)
  }

  test("timestamp travel: AS OF picks the newest commit at-or-before") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-vt-asof").toString
    val v1 = VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), root)
    val v2 = VersionedTable.write(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    val times = VersionedTable.versionTimes(spark, root).toMap
    // exactly at v1's instant → v1; at v2's instant → v2; far future →
    // latest; before everything → loud failure
    assert(VersionedTable.readAsOf(spark, root, times(v1)).count() === 1L
      || times(v1) == times(v2)) // same-millisecond commits: max wins
    if (times(v1) == times(v2))
      assert(VersionedTable.readAsOf(spark, root, times(v1)).count() === 2L)
    assert(VersionedTable.readAsOf(spark, root, times(v2)).count() === 2L)
    assert(VersionedTable
      .readAsOf(spark, root, System.currentTimeMillis() + 60000)
      .count() === 2L)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.readAsOf(spark, root, times(v1) - 60000)
    }
    assert(e.getMessage.contains("no version"))
  }

  test("CHECK constraints: violating commit refused, table unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft-vt-check").toString
    val ok = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x")
    val v1 = VersionedTable.writeChecked(ok, root,
      Seq("k_positive" -> (col("k") > 0),
        "x_nonnull" -> col("x").isNotNull))
    assert(VersionedTable.read(spark, root).count() === 2L)
    // two constraints violated at once → refused with BOTH counts, no
    // new version, current data untouched
    val bad = Seq((0L, 5.0), (3L, Double.NaN), (-1L, 1.0))
      .toDF("k", "x")
      .withColumn("x", when(col("k") === 3L, lit(null)).otherwise(col("x")))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.writeChecked(bad, root,
        Seq("k_positive" -> (col("k") > 0),
          "x_nonnull" -> col("x").isNotNull))
    }
    assert(e.getMessage.contains("k_positive=2")
      && e.getMessage.contains("x_nonnull=1"))
    assert(VersionedTable.versions(spark, root) === Seq(v1))
    assert(VersionedTable.read(spark, root).count() === 2L)
  }

  test("CHECK constraints: an empty commit lands (vacuously satisfied)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft-vt-check-empty").toString
    // sum(when(...)) over zero rows is NULL — regression: this NPE'd on
    // getLong instead of committing the (vacuously valid) empty snapshot
    val empty = Seq.empty[(Long, Double)].toDF("k", "x")
    val v1 = VersionedTable.writeChecked(empty, root,
      Seq("k_positive" -> (col("k") > 0)))
    assert(VersionedTable.versions(spark, root) === Seq(v1))
    assert(VersionedTable.read(spark, root).count() === 0L)
  }

  test("fragment appends: O(delta) bytes written, reads resolve the chain") {
    val root = freshRoot()
    VersionedTable.write(
      (1L to 100L).map(i => (i, s"r$i")).toDF("k", "v"), root)
    // a fragment cannot be the first commit — there is nothing to layer on
    intercept[IllegalArgumentException] {
      VersionedTable.writeFragment(Seq((0L, "x")).toDF("k", "v"), freshRoot())
    }
    val f1 = VersionedTable.writeFragment(
      Seq((101L, "f1"), (102L, "f1")).toDF("k", "v"), root)
    val f2 = VersionedTable.writeFragment(
      Seq((103L, "f2")).toDF("k", "v"), root)
    assert(f1 == 2L && f2 == 3L)
    assert(VersionedTable.versionMeta(spark, root)
      == Seq((1L, false), (2L, true), (3L, true)))
    // THE delta-write contract: each fragment's data directory holds
    // exactly its delta — never a table rewrite
    assert(spark.read.parquet(s"$root/data/v=2").count() == 2)
    assert(spark.read.parquet(s"$root/data/v=3").count() == 1)
    // logical reads resolve base ∪ fragments, per version
    assert(VersionedTable.read(spark, root).count() == 103)
    assert(VersionedTable.read(spark, root, Some(2L)).count() == 102)
    assert(VersionedTable.read(spark, root, Some(1L)).count() == 100)
    // readParts exposes the chain for callers that shade on a key
    val (base, baseDf, frags) = VersionedTable.readParts(spark, root)
    assert(base == 1L && baseDf.count() == 100
      && frags.map(_._1) == Seq(2L, 3L))
    // expire below a surviving fragment's base is refused (reads would
    // break) until compaction folds the chain
    intercept[IllegalArgumentException] {
      VersionedTable.expire(spark, root, 2L)
    }
    val c = VersionedTable.compact(spark, root)
    assert(c == 4L
      && VersionedTable.versionMeta(spark, root).last == ((4L, false)))
    assert(VersionedTable.read(spark, root).count() == 103)
    assert(VersionedTable.expire(spark, root, c) == Seq(1L, 2L, 3L))
    assert(VersionedTable.read(spark, root).count() == 103)
  }
}
