package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.SecondMaxAgg

/** Window-function surface (SURVEY.md §2.6) and the custom-Aggregator
  * fold surface (§2.9) — the two extension points beyond plain groupBy.
  */
object AdvancedQueries {

  private val dec = DecimalType(18, 4)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // §2.6: lag/lead/rank + running & rolling frames over a deterministic
    // per-customer order (o_orderdate is date-grained and can tie, so
    // o_orderkey breaks ties; rank is over the full key for determinism).
    "q32_window_fns" -> ((s, d) => {
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(byDate))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(byDate))
        .withColumn("order_idx", row_number().over(byDate))
        .withColumn("running_spend",
          sum(col("o_totalprice").cast(dec))
            .over(byDate.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)).cast("double"))
        .withColumn("rolling3_max",
          max(col("o_totalprice"))
            .over(byDate.rowsBetween(-2, Window.currentRow)))
    }),

    // §2.4: AS-OF join — for every click, the same user's most recent
    // prior-or-simultaneous purchase. Implemented the merge-based way
    // (union both streams, per-user event-time order, carry the last
    // purchase forward with last_value(ignoreNulls) over an unbounded
    // preceding frame): ONE shuffle on user_id, no range cross-join —
    // the shape that scales to per-key sorted merges at 100 TB. Oracle is
    // DuckDB's native ASOF JOIN.
    // §2.4: the SAME as-of semantics through the NATIVE custom operator
    // (graft.plans.AsOfJoinExec — logical node + strategy + sort-merge
    // physical exec): one co-partitioned exchange per side, per-
    // partition O(|L|+|R|) merge, no union/window rematerialization.
    // Shares q34's DuckDB ASOF JOIN oracle; AsOfJoinSpec additionally
    // pins native == composed on this exact query.
    "q176_asof_native" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"),
          col("value").as("purchase_value"))
      graft.plans.AsOfJoin
        .asof(clicks, purchases, Seq("user_id"), "ts", "purchase_ts")
        .filter(col("purchase_ts").isNotNull)
        .select(col("event_id"), clicks("user_id"), col("ts"),
          col("purchase_ts"), col("purchase_value"))
    }),

    // FORWARD as-of through the same native exec (pandas merge_asof
    // direction='forward'; DuckDB mirrors it with the <= comparator):
    // each click picks the FIRST purchase at/after it — the
    // "time-to-conversion" join shape. Same co-partitioned sort-merge
    // plan; the matched right row stays BUFFERED so one purchase can
    // serve many preceding clicks in a single pass.
    "q217_asof_forward" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"),
          col("value").as("purchase_value"))
      graft.plans.AsOfJoin
        .asof(clicks, purchases, Seq("user_id"), "ts", "purchase_ts",
          direction = graft.plans.AsOfForward)
        .filter(col("purchase_ts").isNotNull)
        .select(col("event_id"), clicks("user_id"), col("ts"),
          col("purchase_ts"), col("purchase_value"))
    }),

    "q34_asof_join" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val unioned = purchases
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
          col("ts").as("p_ts"), col("value").as("p_value"), lit(0).as("side"))
        .union(clicks
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(null).cast("timestamp").as("p_ts"),
            lit(null).cast("double").as("p_value"), lit(1).as("side")))
      // order purchases before clicks at identical ts (side 0 first) so a
      // simultaneous purchase matches, like ASOF's >= semantics
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      unioned
        .withColumn("last_p_ts", last(col("p_ts"), ignoreNulls = true).over(w))
        .withColumn("last_p_value",
          last(col("p_value"), ignoreNulls = true).over(w))
        .filter(col("side") === 1 && col("last_p_ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("last_p_ts").as("purchase_ts"),
          col("last_p_value").as("purchase_value"))
    }),

    // §2.9: custom typed Aggregator (second-largest distinct price per
    // group) — partial+final fold Spark derives from reduce/merge.
    "q33_custom_agg" -> ((s, d) => {
      import org.apache.spark.sql.Encoders
      val secondMax = udaf(SecondMaxAgg, Encoders.scalaDouble)
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          secondMax(col("l_extendedprice")).as("second_max"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n"))
    })
  ) ++ extraQueries

  def extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5 [EXT]: cube — all grouping-set combinations in one pass.
    "q35_cube" -> ((s, d) =>
      Tables(s, d, "orders")
        .cube(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("rev"))),

    // §2.11 text: bigram extraction + counting (the n-gram analysis pass).
    "q36_bigrams" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(split(col("text"), " ").as("tk"))
        .select(explode(expr(
          """transform(sequence(1, size(tk) - 1),
            |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))"""
            .stripMargin)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))),

    // §2.10: sliding windows (10 min every 5 min) in batch form — each
    // event lands in exactly two overlapping windows.
    "q37_sliding_windows" -> ((s, d) =>
      graft.streaming.EventStream.slidingCounts(Tables(s, d, "events"))),

    // §2.5 [EXT]: explicit GROUPING SETS — the general form rollup/cube
    // specialize; one pass, same expand-then-aggregate shape.
    "q43_grouping_sets" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("rev"))),

    // §2.5 [EXT]: exact interpolated percentiles per group (Spark
    // `percentile` == DuckDB `quantile_cont`, both linear interpolation
    // over the sorted group; rounded to absorb the last-ULP of differing
    // interpolation orders). The exact form needs the group sorted —
    // at 100 TB prefer percentile_approx (SketchSpec) unless exactness
    // is contractual.
    "q47_percentiles" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))),

    // §2.8 [EXT]: array functions over the token array — size, distinct,
    // membership, slicing, negative indexing; all codegen'd builtins.
    "q48_array_fns" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"),
          size(col("tk")).as("n_tokens"),
          size(array_distinct(col("tk"))).as("n_distinct"),
          array_contains(col("tk"), "the").as("has_the"),
          concat_ws(" ", slice(col("tk"), 1, 3)).as("first3"),
          element_at(col("tk"), -1).as("last_tok"))),

    // §2.7 [EXT]: ordered grouped concatenation (listagg/string_agg) —
    // collect + sort inside the aggregation buffer, deterministic output.
    // Map-side partial aggregation applies (ObjectHashAggregate), so the
    // shuffle carries one partial list per (group, mapper), not raw rows.
    "q41_listagg" -> ((s, d) =>
      Tables(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(expr("""array_join(transform(array_sort(collect_list(doc_id)),
                    |  x -> cast(x AS string)), ',')""".stripMargin).as("ids"),
          count(lit(1)).as("n"))),

    // §2.5 [EXT]: pivot — long-to-wide reshaping with an explicit value
    // list (revenue by priority × year). With pinned pivot values this is
    // ONE pass of conditional aggregation (no second job to discover
    // values), the form that scales.
    "q42_pivot" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderpriority"),
          year(col("o_orderdate")).as("yr"),
          col("o_totalprice").cast(dec).as("p"))
        .groupBy(col("o_orderpriority"))
        .pivot("yr", 1992 to 1998)
        .agg(sum(col("p")).cast("double"))),

    // §2.4 [EXT]: range join, BUCKETED — successive event pairs of the
    // same user within 5 minutes. A naive plan equi-joins on user_id and
    // post-filters the range (hot users → hot partitions, full per-user
    // cross products). Bucketing ts to the range width and probing
    // (bucket, bucket+1) makes it a pure equi-join on (user, bucket)
    // whose per-key fan-in is bounded by the bucket's event count — the
    // shape that survives 100 TB.
    "q38_range_join" -> ((s, d) => {
      val ev = Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          expr("unix_micros(ts) div 300000000").as("bucket"))
      val a = ev.select(col("user_id").as("u"), col("event_id").as("id_a"),
          col("ts").as("ts_a"),
          explode(array(col("bucket"), col("bucket") + 1)).as("probe"))
      val b = ev.select(col("user_id").as("u2"), col("event_id").as("id_b"),
        col("ts").as("ts_b"), col("bucket").as("b2"))
      a.join(b, col("u") === col("u2") && col("probe") === col("b2"))
        .filter(col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
        .select(col("u").as("user_id"), col("id_a"), col("id_b"))
    }),

    // §2.4 [EXT]: interval-OVERLAP join, BUCKETED — pairs of shipments
    // of the same supplier whose shipment intervals overlap (interval
    // end synthesized deterministically: ship + 1 + quantity%30 days,
    // since the test tables carry no receiptdate). Distinct from q38
    // (point-vs-point proximity): both join sides are intervals. Each
    // interval explodes to the 32-day blocks it covers (≤ 31-day
    // intervals → ≤ 2 blocks each), the
    // join is a pure equi-join on (supplier, block), and each pair is
    // emitted exactly once — in the block containing the LATER start,
    // which both intervals overlap by construction — so no post-join
    // distinct shuffle. Per-key fan-in is bounded by per-block shipment
    // counts, never a per-supplier cross product over all time: the
    // shape that survives 100 TB. A naive BNLJ on the raw inequality
    // is what this replaces.
    "q80_interval_overlap" -> ((s, d) => {
      val W = 32 // days per block; must be ≥ the max interval length
      val li = Tables(s, d, "lineitem")
        .filter(col("l_shipdate").between("1996-01-01", "1996-03-31"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          expr("unix_date(cast(l_shipdate as date))").as("sd"),
          (expr("unix_date(cast(l_shipdate as date))") + 1 +
            expr("cast(l_quantity as int) % 30")).as("rd"))
      val a = li.filter(col("l_linenumber") === 1)
        .select(col("l_suppkey").as("suppkey"),
          col("l_orderkey").as("okey_a"),
          col("sd").as("sd_a"), col("rd").as("rd_a"),
          explode(expr(s"sequence(sd div $W, rd div $W)")).as("blk"))
      val b = li.filter(col("l_linenumber") === 2)
        .select(col("l_suppkey").as("sk2"),
          col("l_orderkey").as("okey_b"),
          col("sd").as("sd_b"), col("rd").as("rd_b"),
          explode(expr(s"sequence(sd div $W, rd div $W)")).as("blk2"))
      a.join(b, col("suppkey") === col("sk2") && col("blk") === col("blk2"))
        .filter(col("sd_a") <= col("rd_b") && col("sd_b") <= col("rd_a") &&
          col("blk") === expr(s"greatest(sd_a, sd_b) div $W"))
        .select(col("suppkey"), col("okey_a"), col("okey_b"),
          (least(col("rd_a"), col("rd_b")) -
            greatest(col("sd_a"), col("sd_b")) + 1).cast("long")
            .as("overlap_days"))
    }),

    // Bloom-pruned fact/dim join (see operators.RuntimeFilter): a
    // selective dimension predicate becomes a 16 KB bloom literal that
    // prunes the fact scan BEFORE its shuffle — the explicit form of
    // Spark's stats-gated runtime filter. Result == the plain join
    // (blooms have no false negatives; positives die in the real
    // join), so the oracle is the unhinted SQL. Revenue follows the
    // q3 decimal discipline.
    "q130_bloom_join" -> ((s, d) => {
      val d184 = DecimalType(18, 4)
      val hot = Tables(s, d, "orders")
        .filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.RuntimeFilter
        .bloomPrunedJoin(Tables(s, d, "lineitem"), "l_orderkey",
          hot, "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(round(sum((col("l_extendedprice").cast(d184) *
          (lit(1).cast(d184) - col("l_discount").cast(d184)))
          .cast(DecimalType(28, 8))), 4).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // §2.6 [EXT]: SCD2 (slowly-changing-dimension type 2) history build
    // from a change log — each user's event stream becomes versioned
    // rows with [valid_from, valid_to) ranges and a current-row flag,
    // the canonical warehouse shape for incremental dimension ingest.
    // One window shuffle on user_id (ties broken by event_id for
    // determinism); no self-join — lead() IS the interval close.
    "q83_scd2" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("version", row_number().over(w))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"), col("version"))
    }),

    // §2.5: second-moment statistics (variance/stddev/correlation) from
    // EXPLICIT decimal sums — Spark's builtin stddev/corr merge partial
    // double states in partition order, so their low bits are run-
    // dependent and can't hash-match an oracle. Routing every Σ through
    // DECIMAL makes the reduction order-independent; the final scalar
    // math is plain double arithmetic on identical inputs. Same cost
    // shape as any grouped agg: one map-side-combined shuffle.
    "q61_moment_stats" -> ((s, d) => {
      // moments through the Sum128 fast path (value is 2-dp exact,
      // user_id integer — products exact at 4 dp, matching the oracle's
      // DECIMAL(18,4) quantization bit for bit)
      import graft.functions.Sum128.{sumExact, sumExactProduct}
      Tables(s, d, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sumExact(col("value"), 4).as("sx"),
          sumExact(col("user_id"), 4).as("sy"),
          sumExactProduct(col("value"), col("value"), 2).as("sxx"),
          sumExactProduct(col("user_id"), col("user_id"), 2).as("syy"),
          sumExactProduct(col("value"), col("user_id"), 2).as("sxy"))
        .select(col("event_type"), col("n"),
          round(col("sx") / col("n"), 6).as("mean_value"),
          round((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - 1), 6).as("var_value"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - 1)), 6).as("stddev_value"),
          round((col("sxy") - col("sx") * col("sy") / col("n"))
            / sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
              * (col("syy") - col("sy") * col("sy") / col("n"))), 6)
            .as("corr_value_user"))
    }),

    // §2.6: ranking family — rank/dense_rank/percent_rank/cume_dist over
    // a TIED key (the integer floor of value, so rank semantics show)
    // plus ntile over the deterministic (ts, event_id) order. All
    // outputs are exact integers or exact rationals of them — bit-equal
    // cross-engine without rounding.
    "q62_rank_fns" -> ((s, d) => {
      val byVal = Window.partitionBy(col("event_type"))
        .orderBy(floor(col("value")))
      val byTime = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, d, "events")
        .select(col("event_id"), col("event_type"), col("ts"), col("value"))
        .withColumn("rn", row_number().over(byTime))
        .withColumn("nt", ntile(4).over(byTime))
        .withColumn("rk", rank().over(byVal))
        .withColumn("drk", dense_rank().over(byVal))
        .withColumn("prk", percent_rank().over(byVal))
        .withColumn("cd", cume_dist().over(byVal))
        .select(col("event_id"), col("event_type"),
          // DuckDB's rank family returns BIGINT; Spark's returns INT —
          // align for the dtype-strict oracle compare
          col("rn").cast("long").as("rn"), col("nt").cast("long").as("nt"),
          col("rk").cast("long").as("rk"), col("drk").cast("long").as("drk"),
          col("prk"), col("cd"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q61_moment_stats" ->
      """WITH a AS (SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(user_id AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(value * value AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(user_id * user_id AS DECIMAL(18,4))) AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(value * user_id AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        | FROM events GROUP BY event_type)
        |SELECT event_type, n,
        | round(sx / n, 6) AS mean_value,
        | round((sxx - sx * sx / n) / (n - 1), 6) AS var_value,
        | round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_value,
        | round((sxy - sx * sy / n)
        |   / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
        |   AS corr_value_user
        |FROM a""".stripMargin,
    "q62_rank_fns" ->
      """SELECT event_id, event_type,
        | ROW_NUMBER() OVER wt AS rn,
        | NTILE(4) OVER wt AS nt,
        | RANK() OVER wv AS rk,
        | DENSE_RANK() OVER wv AS drk,
        | PERCENT_RANK() OVER wv AS prk,
        | CUME_DIST() OVER wv AS cd
        |FROM events
        |WINDOW wt AS (PARTITION BY event_type ORDER BY ts, event_id),
        |       wv AS (PARTITION BY event_type ORDER BY floor(value))"""
        .stripMargin,
    "q47_percentiles" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q48_array_fns" ->
      """SELECT doc_id,
        | CAST(len(tk) AS INTEGER) AS n_tokens,
        | CAST(len(list_distinct(tk)) AS INTEGER) AS n_distinct,
        | list_contains(tk, 'the') AS has_the,
        | array_to_string(tk[1:3], ' ') AS first3,
        | tk[-1] AS last_tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |      FROM documents)""".stripMargin,
    "q43_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"""
        .stripMargin,
    "q41_listagg" ->
      """SELECT lang, source,
        | string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS ids,
        | COUNT(*) AS n
        |FROM documents GROUP BY lang, source""".stripMargin,
    "q42_pivot" -> {
      val cols = (1992 to 1998).map(y =>
        s"""CAST(SUM(CASE WHEN year(o_orderdate) = $y
           |  THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
           |  AS "$y"""".stripMargin).mkString(",\n ")
      s"""SELECT o_orderpriority,\n $cols\nFROM orders GROUP BY o_orderpriority"""
    },
    "q35_cube" ->
      """SELECT o_orderpriority, CAST(yr AS INTEGER) AS yr, n, rev FROM (
        | SELECT o_orderpriority, year(o_orderdate) AS yr, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        | FROM orders
        | GROUP BY CUBE(o_orderpriority, year(o_orderdate)))""".stripMargin,
    "q36_bigrams" ->
      """SELECT bigram, COUNT(*) AS n FROM (
        | SELECT unnest([tk[i] || ' ' || tk[i+1]
        |                FOR i IN range(1, len(tk))]) AS bigram
        | FROM (SELECT string_split(text, ' ') AS tk FROM documents))
        |GROUP BY bigram""".stripMargin,
    "q37_sliding_windows" ->
      """SELECT ws, COUNT(*) AS n FROM (
        | SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws FROM events
        | UNION ALL
        | SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
        |  FROM events)
        |GROUP BY ws""".stripMargin,
    "q38_range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'"""
        .stripMargin,
    "q83_scd2" ->
      """SELECT user_id, event_id, event_type, ts AS valid_from,
        | lead(ts, 1) OVER w AS valid_to,
        | (lead(ts, 1) OVER w IS NULL) AS is_current,
        | CAST(row_number() OVER w AS INTEGER) AS version
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""
        .stripMargin,
    "q130_bloom_join" ->
      """SELECT o_orderpriority,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |   (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))),
        |   4) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN (SELECT o_orderkey, o_orderpriority FROM orders
        |      WHERE o_totalprice > 450000) o ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q80_interval_overlap" ->
      """WITH li AS (
        | SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |    AS sd,
        |  CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |    + 1 + (CAST(l_quantity AS INTEGER) % 30) AS rd
        | FROM lineitem
        | WHERE CAST(l_shipdate AS DATE)
        |       BETWEEN DATE '1996-01-01' AND DATE '1996-03-31')
        |SELECT a.l_suppkey AS suppkey,
        | a.l_orderkey AS okey_a, b.l_orderkey AS okey_b,
        | CAST(least(a.rd, b.rd) - greatest(a.sd, b.sd) + 1 AS BIGINT)
        |   AS overlap_days
        |FROM li a JOIN li b
        |  ON a.l_suppkey = b.l_suppkey
        | AND a.sd <= b.rd AND b.sd <= a.rd
        |WHERE a.l_linenumber = 1 AND b.l_linenumber = 2"""
        .stripMargin,
    "q32_window_fns" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | CAST(row_number() OVER w AS INTEGER) AS order_idx,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS running_spend,
        | MAX(o_totalprice) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling3_max
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""
        .stripMargin,
    "q34_asof_join" ->
      """SELECT c.event_id, c.user_id, c.ts,
        | p.ts AS purchase_ts, p.value AS purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') c
        |ASOF JOIN (SELECT user_id, ts, value FROM events
        |           WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q176_asof_native" ->
      """SELECT c.event_id, c.user_id, c.ts,
        | p.ts AS purchase_ts, p.value AS purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') c
        |ASOF JOIN (SELECT user_id, ts, value FROM events
        |           WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q217_asof_forward" ->
      """SELECT c.event_id, c.user_id, c.ts,
        | p.ts AS purchase_ts, p.value AS purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') c
        |ASOF JOIN (SELECT user_id, ts, value FROM events
        |           WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin,
    "q33_custom_agg" ->
      """WITH r AS (SELECT l_returnflag, l_extendedprice AS p,
        |  DENSE_RANK() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice DESC) AS rk
        |  FROM lineitem),
        |sm AS (SELECT l_returnflag, CAST(max(p) AS DOUBLE) AS second_max
        |  FROM r WHERE rk = 2 GROUP BY l_returnflag),
        |base AS (SELECT l_returnflag, MAX(l_extendedprice) AS max_price,
        |  COUNT(*) AS n FROM lineitem GROUP BY l_returnflag)
        |SELECT base.l_returnflag, second_max, max_price, n
        |FROM base JOIN sm USING (l_returnflag)""".stripMargin
  )
}
