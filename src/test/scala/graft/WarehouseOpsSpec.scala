package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Compaction
import graft.queries.WarehouseOps

/** Warehouse-maintenance ops: single-pass quality audit, aggregate-state
  * merge (incremental MV maintenance), small-file compaction.
  */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q273 fk check: orphans and NULL FKs counted, clean FK passes") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None)
      .toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = WarehouseOps.fkCheck("t.ck->p", child, "ck", parent, "pk")
      .head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getBoolean(4)) === (("t.ck->p", 4L, 1L, 1L, false)))
    val clean = WarehouseOps.fkCheck("c", Seq(1L, 2L).toDF("ck"), "ck",
      parent, "pk").head()
    assert(clean.getLong(2) === 0L && clean.getBoolean(4))
  }

  test("q274 key check: dups and NULL components counted; composite ok") {
    val t = Seq((Some(1L), Some(1)), (Some(1L), Some(2)),
      (Some(1L), Some(2)), (None, Some(3))).toDF("a", "b")
    val r = WarehouseOps.keyCheck("t.(a,b)", t, Seq("a", "b")).head()
    // 4 rows, 1 null component, 2 distinct non-null keys -> 1 excess
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getBoolean(5)) === ((4L, 1L, 2L, 1L, false)))
    val ok = WarehouseOps.keyCheck("u", Seq((1L, 1), (1L, 2)).toDF("a", "b"),
      Seq("a", "b")).head()
    assert(ok.getLong(4) === 0L && ok.getBoolean(5))
  }

  test("quality audit flags injected nulls, dup keys, and bad lengths") {
    val clean = Seq(
      (1L, "abcd", "en", "web", 4L),
      (2L, "xy", "de", "web", 2L)).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val cleanRows = WarehouseOps.qualityAudit(clean)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(cleanRows.size == 8 && cleanRows.values.forall(identity))

    val dirty = Seq(
      (1L, "abcd", "en", "web", 4L),
      (1L, null: String, null: String, "web", 9L), // dup key, nulls, bad len
      (2L, "xy", "de", "web", 2L)).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val rows = WarehouseOps.qualityAudit(dirty)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    assert(rows("row_count") == ((3.0, true)))
    assert(rows("completeness_text") == ((0.666667, false)))
    assert(rows("completeness_lang") == ((0.666667, false)))
    assert(rows("distinctness_doc_id") == ((0.666667, false)))
    // null text vs n_chars=9 fails the cross-column consistency check
    assert(rows("len_consistency") == ((0.666667, false)))
    assert(rows("min_n_chars")._2 && rows("max_n_chars")._2)
  }

  test("quality audit is ONE aggregation pass over the table") {
    val df = WarehouseOps.qualityAudit(Tables(spark, sf, "documents"))
    df.collect()
    val scans = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, "constraint suite must not re-scan per constraint")
  }

  test("state merge == full recompute for count/sum/avg") {
    val o = Tables(spark, sf, "orders")
    val cut = lit(WarehouseOps.MergeCutoff).cast("timestamp")
    val merged = WarehouseOps.stateMerge(
      o.filter(col("o_orderdate") < cut),
      o.filter(col("o_orderdate") >= cut))
    val full = WarehouseOps.stateMerge(o, o.limit(0)) // state of everything
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("q193 join-MV maintenance lands exactly on the full recompute") {
    val inc = SparkEntry.queries("q193_mv_join_maintain")(spark, sf)
      .collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getDouble(1), r.getLong(2))))
      .toMap
    val full = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(round(sum(col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))), 4)
        .cast("double").as("rev"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getDouble(1), r.getLong(2))))
      .toMap
    assert(inc == full, "base + delta must equal the from-scratch view")
  }

  test("q218 delete-delta == recompute; fully-deleted groups vanish") {
    val inc = SparkEntry.queries("q218_mv_delete_delta")(spark, sf)
      .collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getDouble(1), r.getLong(2)))).toMap
    val full = Tables(spark, sf, "orders")
      .filter(col("o_orderkey") % 10 =!= 0)
      .join(Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(round(sum(col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 4))), 4)
        .cast("double").as("rev"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getDouble(1), r.getLong(2)))).toMap
    assert(inc == full, "base - delete delta must equal the survivor view")
    // crafted: a nation whose EVERY order is deleted must fold to
    // (0, 0) and be dropped, exactly as the recompute never emits it
    val dir = Files.createTempDirectory("graft-mvdel").toString
    Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, 5.0), (20L, 7.0)).toDF("l_orderkey", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, 99), (2L, 7)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    // both orders are %10==0 -> both delete -> NO groups survive
    val out = SparkEntry.queries("q218_mv_delete_delta")(spark, dir)
      .collect()
    assert(out.isEmpty, s"fully-deleted view must be empty, got ${out.toSeq}")
  }

  test("state merge with an empty delta is identity") {
    val o = Tables(spark, sf, "orders")
    val base = WarehouseOps.stateMerge(o, o.limit(0))
    val again = WarehouseOps.stateMerge(o, o.limit(0))
    assert(base.exceptAll(again).isEmpty)
    assert(base.count() == o.select("o_custkey").distinct().count())
  }

  test("compaction shrinks a 64-shard table to target-sized files, content intact") {
    val base = Files.createTempDirectory("graft_compact_spec").toString
    val docs = Tables(spark, sf, "documents")
    docs.repartition(64).write.mode("overwrite").parquet(s"$base/frag")

    val audit = Compaction.compact(spark, s"$base/frag", s"$base/out",
      WarehouseOps.CompactTargetBytes)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val (inFiles, inRows) = audit("before")
    val (outFiles, outRows) = audit("after")
    assert(inFiles == 64 && outFiles < inFiles && outRows == inRows)

    // content equality, not just counts
    val out = spark.read.parquet(s"$base/out")
    assert(out.exceptAll(docs).isEmpty && docs.exceptAll(out).isEmpty)

    // target sizing: every output file well below pathological tiny-file
    // land and ≤ ~2x target (parquet row groups round up)
    val (_, outBytes, _) = Compaction.stats(spark, s"$base/out")
    assert(outBytes / outFiles <= 2 * WarehouseOps.CompactTargetBytes)
  }

  test("upsert: updates win, inserts appear, the rest carries over, keys stay unique") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "v")
    val changes = Seq((2L, "B2"), (9L, "new")).toDF("doc_id", "v")
    val got = WarehouseOps.upsert(target, changes, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "new"))
    // idempotent: applying the same change set again is a no-op
    val again = WarehouseOps.upsert(
      WarehouseOps.upsert(target, changes, "doc_id"), changes, "doc_id")
    assert(again.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      == got)
  }

  test("cdc apply: last change per key wins, deleted keys vanish") {
    val got = SparkEntry.queries("q123_cdc_apply")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"), md5(col("text")).as("h"),
        md5(concat(lit("[u] "), col("text"))).as("hu"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    docs.foreach { case (id, (_, h, hu)) =>
      if (id % 9 == 2) assert(!got.contains(id), s"deleted key $id survived")
      else if (id % 4 == 1) assert(got(id) == ((2L, hu)),
        s"update must win for $id")
      else assert(got(id) == ((1L, h)), s"insert state wrong for $id")
    }
    assert(got.keySet == docs.keySet.filterNot(_ % 9 == 2))
  }

  test("checksum compare flags exactly the buckets holding divergent docs") {
    val rows = SparkEntry.queries("q124_checksum_compare")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    // reference: replay the snapshot simulation per doc and compare the
    // per-bucket (id → content) maps directly — a doc dropped from BOTH
    // sides (id%7==2 AND id%11==3) diverges nothing, so a naive "any
    // touched doc dirties its bucket" over-flags
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val a = docs.filter(_._1 % 7 != 2).toMap
    val b = docs.filter(_._1 % 11 != 3)
      .map { case (id, t) => id -> (if (id % 13 == 5) t + " v2" else t) }
      .toMap
    (0L until 64L).foreach { bucket =>
      val aB = a.filter(_._1 % 64 == bucket)
      val bB = b.filter(_._1 % 64 == bucket)
      if (aB.nonEmpty || bB.nonEmpty)
        assert(rows(bucket) == (aB == bB),
          s"bucket $bucket: in_sync=${rows(bucket)} but ref=${aB == bB}")
    }
    assert(rows.values.exists(!_), "simulation must produce dirty buckets")
  }

  test("dynamic partition overwrite replaces only the delivered partitions") {
    // the incremental-rewrite contract a daily pipeline needs: re-running
    // one day's job must replace THAT day's partition and leave every
    // other day untouched (static overwrite mode would truncate them all)
    val dir = Files.createTempDirectory("graft_dyn_part").toString
    val days = Seq((1L, "d1", 10.0), (2L, "d2", 20.0), (3L, "d3", 30.0))
      .toDF("id", "day", "v")
    days.write.partitionBy("day").mode("overwrite").parquet(dir)

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // corrected re-delivery of day d2 only
      Seq((2L, "d2", 21.0), (4L, "d2", 22.0)).toDF("id", "day", "v")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    val got = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("day"),
        r.getAs[Double]("v"))).toSet
    assert(got == Set((1L, "d1", 10.0), (3L, "d3", 30.0),
      (2L, "d2", 21.0), (4L, "d2", 22.0)))
  }

  test("compaction with clusterBy keeps range clustering") {
    val base = Files.createTempDirectory("graft_compact_rng").toString
    Tables(spark, sf, "documents").repartition(32)
      .write.mode("overwrite").parquet(s"$base/frag")
    Compaction.compact(spark, s"$base/frag", s"$base/out", 1L << 20,
      clusterBy = Seq("doc_id")).collect()
    // each output file covers a disjoint doc_id range: per-file min/max
    // extents must not overlap
    val extents = spark.read.parquet(s"$base/out")
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    extents.sliding(2).foreach {
      case Array((_, mx1), (mn2, _)) => assert(mx1 <= mn2,
        s"overlapping file extents: $mx1 > $mn2")
      case _ =>
    }
  }
}
