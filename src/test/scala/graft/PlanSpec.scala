package graft

/** Physical-plan assertions: the scale properties SURVEY.md promises are
  * pinned here so a regression in plan shape (lost pushdown, broadcast
  * degrading to shuffle, partial agg disappearing) fails the build, not
  * just the benchmark.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2 filter+project: predicates and pruning reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"no pushed filters:\n$p")
    val readSchema = p.linesIterator.mkString
    // only the 6 referenced columns are read, not all 16
    assert(!readSchema.contains("l_comment"),
      "scan reads unused columns (no pruning)")
  }

  test("q3 join: small dims broadcast, no shuffle for nation/region") {
    val p = plan("q3_join_revenue")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
  }

  test("q1 agg: partial + final hash aggregation (map-side combine)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate:\n$p")
  }

  test("q0 wordcount: whole-stage codegen covers the explode+agg pipeline") {
    // AQE only shows codegen spans in the FINAL plan — execute first
    val df = SparkEntry.queries("q0_wordcount")(spark, sf)
    df.collect()
    // codegen spans print as `*(n) Op` in the executed plan string
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"no codegen spans:\n$p")
  }

  test("q24 embedding near-dup: block-grid equi-join, never all-pairs") {
    val p = plan("q24_embedding_dedup")
    assert(p.contains("vec_cosine"), s"custom kernel missing from plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"pair generation must be the block-grid equi-join:\n$p")
  }

  test("q21 minhash: candidate generation is an equi-join, not cartesian") {
    val p = plan("q21_minhash_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"LSH candidates must come from an equi-join:\n$p")
  }

  test("LSH banding computes the signature pipeline exactly ONCE") {
    // The self-join formulation relied on AQE ReusedExchange, which Spark
    // 4.1 does NOT grant above cached InMemoryRelations — candidate pairs
    // now come from bucket grouping instead, so the final plan must
    // contain exactly one partial signature aggregation (one subtree).
    Seq("q21_minhash_lsh" -> "partial_oph_sig",
        "dedup_simhash" -> "partial_simhash_sig").foreach { case (q, agg) =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      // the executed AdaptiveSparkPlan prints final + initial sections;
      // count in the final section only
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val n = agg.r.findAllIn(p).size
      assert(n == 1, s"$q computes the signature $n times (want 1):\n$p")
    }
  }

  test("q5 sort+limit: TakeOrderedAndProject, not a global sort") {
    val p = plan("q5_sort_limit")
    assert(p.contains("TakeOrderedAndProject"),
      s"limit should fuse into the sort:\n$p")
  }

  test("q80 interval overlap: bucketed equi-join, never an inequality BNLJ") {
    val p = plan("q80_interval_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"interval overlap must stay a (supplier, block) equi-join:\n$p")
  }

  test("q56 quantile budget: thresholds broadcast, no cartesian") {
    val p = plan("q56_quantile_budget")
    assert(p.contains("BroadcastHashJoin"),
      s"per-lang thresholds must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"degenerate join:\n$p")
  }

  test("q57 decontamination: probe shingles broadcast, clean docs anti-join") {
    val p = plan("q57_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"probe shingle set must broadcast:\n$p")
    assert(p.contains("LeftAnti"), s"clean docs must come from an anti-join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"degenerate join:\n$p")
  }

  test("q69 bloom decontamination: codegen'd bloom prune ahead of the verify join") {
    val p = plan("q69_decontaminate_bloom")
    assert(p.contains("bloom_contains"),
      s"bloom pre-filter missing from the corpus scan side:\n$p")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"exact verify semi-join + clean anti-join expected:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"degenerate join:\n$p")
  }

  test("q65 packing: bucket offsets broadcast, corpus never globally sorted") {
    val p = plan("q65_pack_sequences")
    assert(p.contains("BroadcastHashJoin"),
      s"16-row bucket offsets must broadcast:\n$p")
    // the corpus window sorts WITHIN hash buckets; the only global
    // (un-partitioned) artifacts allowed are over the 16-row offsets
    // frame, which reaches the join through a broadcast exchange
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"degenerate join:\n$p")
    assert(p.contains("hashpartitioning(bkt"),
      s"corpus cumsum must partition by bucket:\n$p")
  }

  test("q66 domain mix: per-source rates broadcast over the corpus") {
    val p = plan("q66_domain_mix")
    assert(p.contains("BroadcastHashJoin"),
      s"rate table (one row per source) must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"degenerate join:\n$p")
  }
}
