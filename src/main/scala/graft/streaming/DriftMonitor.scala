package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Continuous distribution-drift monitoring — the streaming twin of
  * q220's batch PSI: a training-data pipeline that ingests corpus
  * snapshots continuously wants the "has the feature distribution
  * moved?" alarm per arriving window, not per offline audit.
  *
  * Split the same way the other streaming twins are:
  *
  *  - [[refModel]] runs ONCE, batch-side, over the reference corpus
  *    (what the model was trained on): exact decile boundaries per
  *    event_type via the integer cum·10 ≥ k·n walk (no quantile
  *    interpolation), plus the reference per-bucket counts. The result
  *    is types×(9 doubles + 10 longs) — pure metadata, broadcast to
  *    the stream.
  *  - [[psi]] is ONE streaming aggregation: bucket assignment is a
  *    narrow array-filter count against the broadcast boundaries, the
  *    per-window bucket histogram is 10 conditional sums (fixed-width
  *    state per (window, type) group — no per-value state), and PSI
  *    folds over the zipped current/reference histograms in a
  *    projection AFTER the agg. With a watermark the query runs in
  *    append mode and each window emits exactly one PSI row when it
  *    closes — bounded state, exactly-once via the sink's usual
  *    contract.
  *
  * The same `psi` function applied to a BATCH frame produces the
  * identical result (it is plain DataFrame code), which is what
  * StreamingDriftSpec pins: streamed == batch on the same split, and a
  * planted location shift fires the alarm (PSI > 0.2) in its window
  * only.
  *
  * Scale: stream state is (windows in flight)×types×10 counters;
  * the reference model is KB-scale broadcast; the bucket walk is
  * codegen'd array arithmetic on the hot path. Nothing grows with
  * corpus size.
  */
object DriftMonitor {

  /** PSI bucket count (reference deciles). */
  val Buckets = 10

  /** Scale-safe inclusive cumulative + per-type totals over a
    * per-(event_type, value) class table carrying `cr` — replaces
    * `sum(cr) OVER (PARTITION BY event_type ORDER BY value)` +
    * `sum(cr) OVER (PARTITION BY event_type)`: `value` is a CONTINUOUS
    * feature, so the class table is ~corpus-sized (17,792 distinct in
    * 100k rows at sf0.1) and a per-type window makes each of the ~6
    * types ONE sort task of corpus/|types| rows at 100 TB — the exact
    * coarse-group hazard GlobalRank's scaladoc names. Here the running
    * sum is the range-partitioned `GlobalRank.withPrefixSumInGroups`
    * pass ((type, value) is unique by construction of the class table,
    * so the result is deterministic) and the totals are a bounded
    * |types|-row groupBy broadcast back. Extra columns (q220's `cc`)
    * ride along. Callers pin `vc` first — the machinery evaluates its
    * input several times. Appends `cum` (inclusive) and `nr`.
    */
  private[graft] def cumulativeByValue(vc: DataFrame): DataFrame = {
    // per-type totals are |types| rows — the same bounded-metadata
    // contract as the broadcast boundary arrays — so collect them ONCE
    // and feed both the prefix pass (literal group offsets, no goffs
    // aggregation/window/broadcast join) and the `nr` column (literal
    // chain, no totals broadcast join). NULL types (none in the events
    // schema) sort first, matching the rank pass's NULLS FIRST order.
    val totals: Seq[(Any, Long)] = vc.groupBy(col("event_type"))
      .agg(sum(col("cr")).as("nr"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toSeq
      .sortWith((a, b) => a._1 == null ||
        (b._1 != null && a._1.asInstanceOf[String] < b._1.asInstanceOf[String]))
    val nrExpr = totals.foldLeft(lit(0L)) { case (acc, (g, n)) =>
      if (g == null) acc // NULL-type arm handled by when's null semantics
      else when(col("event_type") === lit(g), lit(n)).otherwise(acc)
    }
    graft.operators.GlobalRank.withPrefixSumInGroupsKnownTotals(
        vc, "__cum_pre", col("cr"), col("event_type"), totals, col("value"))
      .withColumn("cum", col("__cum_pre") + col("cr"))
      .drop("__cum_pre")
      .withColumn("nr", nrExpr)
  }

  /** Reference model: (event_type, bnds array[9], ref_counts array[10],
    * n_ref) from a batch reference frame with (event_type, value).
    */
  def refModel(ref: DataFrame): DataFrame = {
    // pinned: the cumulative pass, the totals pass and the histogram
    // branch below all re-read the class table (conc_globalrank's
    // checkpoint discipline); released once the |types|-row model is
    // itself materialized
    val vc = ref.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("cr"))
      .localCheckpoint(true)
    val cum = cumulativeByValue(vc)
    val bounds = cum
      .withColumn("k", explode(sequence(lit(1), lit(Buckets - 1))))
      .filter(col("cum") * Buckets >= col("k") * col("nr"))
      .groupBy(col("event_type"), col("k"))
      .agg(min(col("value")).as("bk"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("k"), col("bk")))).as("kb"))
      .select(col("event_type"), expr("transform(kb, x -> x.bk)").as("bnds"))
      .localCheckpoint(true) // |types| rows; consumed by two joins below
    // reference bucket histogram over the same boundaries
    val out = vc.join(broadcast(bounds), "event_type")
      .withColumn("bucket", expr("size(filter(bnds, b -> value > b))"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("cr")).as("c"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("c"))))
        .as("bc"))
      .join(broadcast(bounds), "event_type")
      .select(col("event_type"), col("bnds"),
        // scaffold missing buckets with 0 (a decile CAN be empty only
        // if a later boundary duplicates an earlier one on heavy ties).
        // try_element_at, NOT element_at: under ANSI mode (the Spark 4
        // default) element_at on a missing map key throws instead of
        // returning NULL, so a tie-heavy reference would crash here
        expr(s"""transform(sequence(0, ${Buckets - 1}), i ->
             coalesce(try_element_at(map_from_entries(
               transform(bc, x -> struct(x.bucket, x.c))), i), 0L))""")
          .as("ref_counts"))
      .withColumn("n_ref", expr("aggregate(ref_counts, 0L, (a, x) -> a + x)"))
      .localCheckpoint(true) // |types| rows — the broadcast model
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(bounds)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(vc)
    out
  }

  /** Windowed PSI of `events` (streaming OR batch; columns ts,
    * event_type, value) against a [[refModel]] frame. Returns
    * (ws, event_type, n_cur, psi) — one row per closed window per type.
    *
    * Contract: the model join is INNER — a type with no reference model
    * has no deciles to compare against, so its rows do not produce a
    * PSI (they are not silently zero). An entirely NEW type appearing
    * in the stream is itself a drift signal; monitor it with the
    * complementary count `stream.join(model, Seq("event_type"),
    * "left_anti")` (one line, same broadcast), which is how
    * StreamingDriftSpec's alarm framing expects deployments to pair it.
    */
  def psi(events: DataFrame, model: DataFrame, windowDur: String,
      watermark: String = "0 seconds"): DataFrame = {
    val hist = histogram(events, model, windowDur, watermark)
    hist.select(col("window.start").as("ws"), col("event_type"),
      col("n_cur"),
      round(expr(
        """CAST(aggregate(
          |  zip_with(cur_counts, ref_counts, (cc, cr) ->
          |    CAST(round(
          |      ((CAST(cc AS DOUBLE) + 0.5D) / (CAST(n_cur AS DOUBLE) + 5.0D)
          |        - (CAST(cr AS DOUBLE) + 0.5D) /
          |          (CAST(n_ref AS DOUBLE) + 5.0D)) *
          |      ln(((CAST(cc AS DOUBLE) + 0.5D) /
          |          (CAST(n_cur AS DOUBLE) + 5.0D)) /
          |         ((CAST(cr AS DOUBLE) + 0.5D) /
          |          (CAST(n_ref AS DOUBLE) + 5.0D))), 8) AS DECIMAL(18, 8))),
          |  CAST(0 AS DECIMAL(28, 8)),
          |  (acc, x) -> CAST(acc + x AS DECIMAL(28, 8))) AS DOUBLE)"""
          .stripMargin), 6).as("psi"))
  }

  /** Windowed ordered EMD against the same [[refModel]] — the streaming
    * twin of q250's batch form (the distance-aware alarm PSI cannot
    * give: see DriftOps.emdDrift). Identical state shape to [[psi]] —
    * the SAME fixed-width per-(window, type) histogram aggregation,
    * only the fold differs: the cumulative walk
    * Σ|cumc·n_ref − cumr·n_cur| runs integer-exactly over the two
    * 10-slot arrays in the post-agg projection (the O(B²) slice-sums
    * are 100 long adds per emitted row). Same inner-join model
    * contract as psi.
    */
  def emd(events: DataFrame, model: DataFrame, windowDur: String,
      watermark: String = "0 seconds"): DataFrame = {
    val hist = histogram(events, model, windowDur, watermark)
    hist.select(col("window.start").as("ws"), col("event_type"),
      col("n_cur"),
      round(expr(
        s"""CAST(aggregate(
           |  transform(sequence(1, ${Buckets - 1}), i ->
           |    abs(aggregate(slice(cur_counts, 1, i), 0L,
           |          (a, x) -> a + x) * n_ref
           |      - aggregate(slice(ref_counts, 1, i), 0L,
           |          (a, x) -> a + x) * n_cur)),
           |  0L, (a, x) -> a + x) AS DOUBLE)
           |  / (${Buckets - 1}.0D * CAST(n_ref AS DOUBLE)
           |     * CAST(n_cur AS DOUBLE))""".stripMargin), 6).as("emd"))
  }

  /** The shared windowed bucket histogram: one streaming aggregation
    * with fixed-width state per (window, type) — 10 conditional sums
    * against the broadcast reference boundaries.
    */
  private def histogram(events: DataFrame, model: DataFrame,
      windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(model), "event_type")
      .withColumn("bucket", expr("size(filter(bnds, b -> value > b))"))
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("n_cur"),
        array((0 until Buckets).map(k =>
          sum(when(col("bucket") === k, 1L).otherwise(0L))): _*)
          .as("cur_counts"),
        first(col("ref_counts")).as("ref_counts"),
        first(col("n_ref")).as("n_ref"))
}
