package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Distribution-drift monitoring and feature normalization (SURVEY.md
  * §2.11 [EXT]) — the ops a training-data pipeline runs between corpus
  * snapshots to decide whether the feature/data distribution still
  * matches what the model was trained on:
  *
  *  - q220 PSI (population stability index) per event_type between the
  *    first and second half of the event calendar, over reference-period
  *    exact decile buckets. The corpus reduces to per-(type, value, arm)
  *    counts in ONE grouped pass; decile boundaries come from the
  *    cumulative-count walk over that (bounded) distinct-value table in
  *    integer arithmetic (cum·10 ≥ k·n — no float quantile
  *    interpolation to diverge cross-engine); bucket assignment is a
  *    broadcast of the 9-boundary array per type + a narrow array
  *    `filter` count — no join multiplier, no BNLJ. Per-bucket PSI terms
  *    are smoothed ((c+0.5)/(n+5): a current-period bucket CAN be
  *    empty), rounded once, and summed as DECIMAL so the 10-term
  *    reduction is order-independent and the oracle hash-compares.
  *  - q221 m-estimate target encoding of customer nation against order
  *    totals — the leakage-safe categorical encoder: enc = (Σy + m·μ) /
  *    (n + m) with the global mean μ as the prior. Sums are
  *    DECIMAL-exact; the only float ops are the two final divisions.
  *    One grouped pass over orders⋈customer (customer broadcast).
  *  - q223 quantile normalization of n_chars across sources (the
  *    microarray-normalization classic): rank within source, average
  *    the rank-profile across sources (BIGINT-exact), map every doc to
  *    its rank's cross-source mean. Two windows keyed by source +
  *    one rank-keyed aggregation — all shuffles on bounded keys.
  *
  * Scale: every aggregation here is map-side combined on (type, value)
  * or (source, rank) keys; the boundary/profile tables are metadata
  * (9·types doubles, max-rank rows) and travel by broadcast. At 100 TB
  * the one care is q220's distinct-value table on a continuous feature —
  * pre-quantize `value` to the q106 histogram grid first (PSI is a
  * binned statistic by definition, so grid pre-bucketing changes
  * nothing once the grid is finer than the deciles).
  */
object DriftOps {

  private val dec = DecimalType(18, 2)

  /** Decile count for q220's PSI buckets. */
  private val PsiBuckets = 10

  /** m-estimate prior weight for q221's target encoder. */
  private val PriorM = 20

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q220 and q250 audit the IDENTICAL reference-decile grid (psiGrid
    // — one corpus shuffle + the range-partitioned cumulative pass),
    // and the grid is |types|×10 rows: the entries share it through
    // PsiGridCache (driver metadata, nothing executor-side pinned)
    // instead of each paying the full build. Specs that grid crafted
    // frames keep using psiDrift/emdDrift, which never touch the cache.
    "q220_psi_drift" -> ((s, d) => psiDriftFrom(PsiGridCache.grid(s, d))),
    // q250 ordered-EMD drift — see [[emdDrift]]: the distance-aware
    // alternative to PSI over the identical reference-decile grid.
    "q250_emd_drift" -> ((s, d) => emdDriftFrom(PsiGridCache.grid(s, d))),
    "q221_target_encode" -> ((s, d) => targetEncode(
      Tables(s, d, "orders"), Tables(s, d, "customer"),
      Tables(s, d, "nation"))),
    // q256 embedding-space drift — see [[embeddingDrift]]: the
    // EMBEDDING counterpart to q220/q250's scalar-feature audits.
    "q256_emb_drift" -> ((s, d) =>
      embeddingDrift(Tables(s, d, "embeddings"))),

    // STREAMING embedding drift (rows-only; StreamingDriftSpec): the
    // q256 Welch per ARRIVING window against the reference arm's
    // broadcast moments — see EmbeddingDriftMonitor. The entry feeds
    // the current arm through a REAL two-batch MemoryStream (synthetic
    // deterministic day stamps off vec_id — embeddings carry no event
    // time) and REQUIRES streamed == the same aggregation batch-side
    // before returning.
    "stream_emb_drift" -> ((s, d) => {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      implicit val enc
          : org.apache.spark.sql.Encoder[(java.sql.Timestamp, Seq[Float])] =
        org.apache.spark.sql.Encoders.product[(java.sql.Timestamp, Seq[Float])]
      val emb = Tables(s, d, "embeddings")
      val model = graft.streaming.EmbeddingDriftMonitor.refModel(
        emb.filter(col("vec_id") % 2 === 0).select(col("embedding")))
      val cur = emb.filter(col("vec_id") % 2 =!= 0)
        .select(timestamp_seconds(lit(1704067200L)
          + pmod(col("vec_id"), lit(20)) * 86400).as("ts"),
          col("embedding"))
      val feed = graft.streaming.FeedGuard.collectFeed(
        cur.as[(java.sql.Timestamp, Seq[Float])], "stream_emb_drift")
      val mid =
        if (feed.isEmpty) 0L
        else feed.map(_._1.getTime).sorted.apply(feed.size / 2)
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, Seq[Float])]
      val out = graft.streaming.EmbeddingDriftMonitor.welch(
        stream.toDF().toDF("ts", "embedding"), model, "5 days")
      val q = out.writeStream.format("memory")
        .queryName("stream_emb_drift").outputMode("complete").start()
      stream.addData(feed.filter(_._1.getTime < mid))
      q.processAllAvailable()
      stream.addData(feed.filter(_._1.getTime >= mid))
      q.processAllAvailable()
      q.stop()
      val got = s.table("stream_emb_drift").collect().toSet
      val batch = graft.streaming.EmbeddingDriftMonitor.welch(
        cur, model, "5 days").collect().toSet
      require(got == batch,
        s"streamed embedding drift diverged from batch: " +
          s"${(got diff batch).take(3)} vs ${(batch diff got).take(3)}")
      s.table("stream_emb_drift")
    }),
    "q223_quantile_norm" -> ((s, d) =>
      quantileNorm(Tables(s, d, "documents"))),
    // The 100 TB form of q223 — same oracle (identical ranks: the
    // (n_chars, doc_id) tiebreak is unique): PARTITION BY source has
    // FEW values, so q223's rank window sorts corpus/|sources| rows in
    // ONE task at scale — the coarse-group hazard the grouped global
    // rank removes (the rfm_globalrank / stats_*_rank twin discipline).
    // Rank means stay BIGINT-exact, so the oracle hash carries over.
    "drift_qnorm_rank" -> ((s, d) =>
      quantileNormRank(Tables(s, d, "documents"))),

    // Streaming PSI monitor (rows-only; pinned by StreamingDriftSpec):
    // reference model from days 1-15 batch-side, then the SAME windowed
    // PSI aggregation driven through the file-stream source over days
    // 16+ — one streaming agg, bounded per-window state, append mode.
    "stream_psi_drift" -> ((s, d) => {
      val batch = Tables(s, d, "events")
      val model = graft.streaming.DriftMonitor.refModel(
        batch.filter(dayofmonth(col("ts")) <= 15)
          .select(col("event_type"), col("value")))
      val cur = graft.streaming.EventStream.readEventsStream(s, d)
        .filter(dayofmonth(col("ts")) > 15)
        .select(col("ts"), col("event_type"), col("value"))
      val out = graft.streaming.DriftMonitor.psi(cur, model, "5 days")
      // complete mode so the tail window (still above the watermark when
      // the file source drains) is in the sink too — production append
      // mode is what StreamingDriftSpec drives
      graft.streaming.EventStream.runToMemory(out, "stream_psi_drift",
        org.apache.spark.sql.streaming.OutputMode.Complete())
      s.table("stream_psi_drift")
    }),

    // Streaming EMD monitor (rows-only; pinned by StreamingDriftSpec):
    // the q250 cumulative walk per arriving window — same reference
    // model, same fixed-width histogram state as stream_psi_drift,
    // distance-aware fold. See DriftMonitor.emd.
    "stream_emd_drift" -> ((s, d) => {
      val batch = Tables(s, d, "events")
      val model = graft.streaming.DriftMonitor.refModel(
        batch.filter(dayofmonth(col("ts")) <= 15)
          .select(col("event_type"), col("value")))
      val cur = graft.streaming.EventStream.readEventsStream(s, d)
        .filter(dayofmonth(col("ts")) > 15)
        .select(col("ts"), col("event_type"), col("value"))
      val out = graft.streaming.DriftMonitor.emd(cur, model, "5 days")
      graft.streaming.EventStream.runToMemory(out, "stream_emd_drift",
        org.apache.spark.sql.streaming.OutputMode.Complete())
      s.table("stream_emd_drift")
    }))

  /** PSI per event_type: reference = calendar days 1-15, current =
    * days 16+. Returns (event_type, n_ref, n_cur, psi).
    */
  def psiDrift(events: DataFrame): DataFrame =
    psiDriftFrom(psiGrid(events))

  private[graft] def psiDriftFrom(full: DataFrame): DataFrame = {
    // Smoothed proportions; each term rounded once then summed as
    // DECIMAL so the reduction order cannot move the hash.
    val pr = (col("cr") + lit(0.5)) / (col("nr") + lit(5.0))
    val pc = (col("cc") + lit(0.5)) / (col("nc") + lit(5.0))
    full
      .withColumn("term",
        round((pc - pr) * log(pc / pr), 8).cast(DecimalType(18, 8)))
      .groupBy(col("event_type"))
      .agg(max(col("nr")).as("n_ref"), max(col("nc")).as("n_cur"),
        round(sum(col("term")).cast("double"), 6).as("psi"))
  }

  /** Ordered EMD per event_type over the SAME reference-decile buckets
    * as [[psiDrift]] — the q249 t-closeness distance generalized to the
    * drift audit [Li, Li & Venkatasubramanian, ICDE'07 §3]: PSI is a
    * per-bucket divergence and cannot see WHERE displaced mass went
    * (moving 10% of rows one bucket over scores the same as moving them
    * nine buckets over), while the cumulative walk
    *   EMD = (1/(B−1)) · Σ_{i<B−1} |CumP_i − CumQ_i|
    * charges mass by the DISTANCE it travels — the alarm that separates
    * benign jitter from a regime change (DriftOpsSpec pins a PSI-blind
    * pair). Computed INTEGER-EXACTLY as |cumcr·Nc − cumcc·Nr| summed in
    * longs with one double division (the q249 discipline), so both
    * engines hash-agree. Same scale shape as PSI: everything after the
    * one corpus aggregation runs on the |types|×B grid. Long bound:
    * counts fit 32 bits through ~2·10⁹ rows per arm; beyond that the
    * same formula lifts to DECIMAL. Returns
    * (event_type, n_ref, n_cur, emd, drifted).
    */
  def emdDrift(events: DataFrame): DataFrame =
    emdDriftFrom(psiGrid(events))

  private[graft] def emdDriftFrom(full: DataFrame): DataFrame = {
    val wcum = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full
      .withColumn("cumr", sum(col("cr")).over(wcum))
      .withColumn("cumc", sum(col("cc")).over(wcum))
      .filter(col("bucket") < PsiBuckets - 1) // EMD sums B−1 cumulatives
      .groupBy(col("event_type"))
      .agg(max(col("nr")).as("n_ref"), max(col("nc")).as("n_cur"),
        round(sum(abs(col("cumr") * col("nc") - col("cumc") * col("nr")))
          .cast("double") /
          (lit((PsiBuckets - 1).toDouble) * max(col("nr")) * max(col("nc"))),
          6).as("emd"))
      // a type present in only ONE arm makes the division 0/0 = NaN
      // (and Spark's NaN ordering would read NaN > 0.1 as drifted=true
      // while DuckDB disagrees): an entirely-appeared or entirely-
      // vanished distribution IS maximal drift — report emd 1.0
      // explicitly, mirrored in the oracle
      .withColumn("emd",
        when(col("n_ref") === 0 || col("n_cur") === 0, lit(1.0))
          .otherwise(col("emd")))
      .withColumn("drifted", col("emd") > 0.1)
  }

  /** The shared drift scaffold: per-(type, bucket) reference/current
    * counts over reference-decile buckets, all B buckets scaffolded so
    * empty ones still carry their term, with per-type arm totals.
    * Returns (event_type, bucket, cr, cc, nr, nc).
    */
  private[graft] def psiGrid(events: DataFrame): DataFrame = {
    val arm = events.select(col("event_type"), col("value"),
      (dayofmonth(col("ts")) <= 15).as("is_ref"))
    // ONE map-side-combined shuffle: per-(type, value) arm counts —
    // pinned (the conc_globalrank checkpoint discipline): the
    // cumulative pass, the totals pass and the bucketing branch all
    // re-read the class table; released once the |types|×10 grid is
    // itself materialized below.
    val vc = arm.groupBy(col("event_type"), col("value"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("cr"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cc"))
      .localCheckpoint(true)
    // Inclusive reference cumulative + per-type totals, SCALE-SAFE:
    // `value` is continuous, so the class table is ~corpus-sized and a
    // `sum OVER (PARTITION BY event_type ORDER BY value)` window would
    // make each of the ~6 types ONE sort task of corpus/|types| rows at
    // 100 TB. cumulativeByValue runs the range-partitioned
    // GlobalRank.withPrefixSumInGroups pass instead (same numbers —
    // (type, value) is unique — so the oracle's window SQL carries over
    // unchanged). Shared with the streaming monitors' refModel.
    val cum = graft.streaming.DriftMonitor.cumulativeByValue(vc)
    // Boundary k (k = 1..9) = smallest value with cum·10 ≥ k·n_ref —
    // integer comparison, no quantile interpolation. The explode is a
    // bounded 9× of the DISTINCT-VALUE table, not the corpus.
    val bounds = cum
      .select(col("event_type"), col("value"), col("cum"), col("nr"))
      .withColumn("k", explode(sequence(lit(1), lit(PsiBuckets - 1))))
      .filter(col("cum") * PsiBuckets >= col("k") * col("nr"))
      .groupBy(col("event_type"), col("k"))
      .agg(min(col("value")).as("bk"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("k"), col("bk"))))
        .as("kb"))
      .select(col("event_type"),
        expr("transform(kb, x -> x.bk)").as("bnds"))
      .localCheckpoint(true) // |types| rows; consumed twice below
    // Bucket = #boundaries strictly below the value (0..9), via a
    // per-type broadcast of the 9-double array — a narrow map, no join
    // explosion. Scaffold all 10 buckets so empty current buckets
    // still contribute their smoothed term.
    val bucketed = vc.join(broadcast(bounds), "event_type")
      .withColumn("bucket",
        expr("size(filter(bnds, b -> value > b))"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("cr")).as("cr"), sum(col("cc")).as("cc"))
    val grid = bounds.select(col("event_type"))
      .withColumn("bucket", explode(sequence(lit(0), lit(PsiBuckets - 1))))
    // these per-type windows run over the |types|×10 GRID, not the
    // class table — bounded metadata, not a scale hazard
    val tw = Window.partitionBy(col("event_type"))
    val out = grid.join(bucketed, Seq("event_type", "bucket"), "left")
      .na.fill(0L, Seq("cr", "cc"))
      .withColumn("nr", sum(col("cr")).over(tw))
      .withColumn("nc", sum(col("cc")).over(tw))
      .localCheckpoint(true) // |types|×10 rows
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(bounds)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(vc)
    out
  }

  /** q256 embedding-space drift: per-DIMENSION Welch two-sample test
    * between two deterministic corpus arms (vec_id parity) — the
    * embedding counterpart to q220/q250's scalar audits: a retrained
    * encoder or a shifted upstream corpus moves the embedding
    * DISTRIBUTION long before any scalar metadata notices, and the
    * mean embedding (the linear-kernel mean map) shifts per dimension.
    * One posexplode + ONE map-side-combined (dim)-keyed aggregation —
    * |dims| rows of output regardless of corpus size; the q136 Welch
    * discipline (conditional decimal sums cast double once) makes the
    * hash cross-engine. Constant dimensions (se² = 0) report NULL t —
    * mirrored in the oracle — rather than a cross-engine ±inf.
    * Returns (dim, na, nb, mean_a, mean_b, t_stat, shifted).
    */
  def embeddingDrift(emb: DataFrame): DataFrame = {
    // MICRO-LONG discipline (the q189/q195 pattern, 1e8 here): each
    // element and its square round ONCE to integer 1e-8 units and sum
    // as exact longs — a float→DECIMAL cast at scale 10 diverged by one
    // ulp cross-engine (measured at sf0.01). Long bound: |e| ≤ ~10 →
    // Σ|xm| ≤ 1e9·n — safe through ~10⁹ rows per arm; lift to Sum128
    // beyond.
    val M = 1e8
    val e = col("col").cast("double")
    val cells = emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("pos").as("dim"),
        (col("vec_id") % 2 === 0).as("arm_a"),
        round(e * lit(M), 0).cast("long").as("xm"),
        round(e * e * lit(M), 0).cast("long").as("xxm"))
    def csum(cond: org.apache.spark.sql.Column,
        v: org.apache.spark.sql.Column) =
      sum(when(cond, v).otherwise(lit(null))).cast("double")
    val a = col("arm_a")
    val g = cells.groupBy(col("dim"))
      .agg(count(when(a, 1)).as("na"), count(when(!a, 1)).as("nb"),
        csum(a, col("xm")).as("sa"), csum(!a, col("xm")).as("sb"),
        csum(a, col("xxm")).as("ssa"), csum(!a, col("xxm")).as("ssb"))
    val ma = col("sa") / M / col("na")
    val mb = col("sb") / M / col("nb")
    val va = (col("ssa") / M - col("sa") / M * (col("sa") / M) /
      col("na")) / (col("na") - 1)
    val vb = (col("ssb") / M - col("sb") / M * (col("sb") / M) /
      col("nb")) / (col("nb") - 1)
    val se2 = va / col("na") + vb / col("nb")
    val t = (ma - mb) / sqrt(se2)
    g.select(col("dim"), col("na"), col("nb"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      when(se2 > 0, round(t, 6)).as("t_stat"),
      when(se2 > 0, abs(round(t, 6)) > 3.0).as("shifted"))
  }

  /** m-estimate target encoding: customer nation → smoothed mean order
    * total. Returns (n_name, n, enc).
    */
  def targetEncode(orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val joined = orders.select(col("o_custkey"), col("o_totalprice"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
    val global = joined.agg(
      sum(col("o_totalprice").cast(dec)).as("sy"),
      count(lit(1)).as("n"))
      .select((col("sy").cast("double") / col("n")).as("mu"))
      .head().getDouble(0)
    joined.groupBy(col("c_nationkey"))
      .agg(sum(col("o_totalprice").cast(dec)).as("sy"),
        count(lit(1)).as("n"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n"),
        round((col("sy").cast("double") + lit(PriorM) * lit(global)) /
          (col("n") + lit(PriorM)), 6).as("enc"))
  }

  /** Quantile normalization across sources. Returns
    * (doc_id, source, n_chars, qnorm).
    */
  def quantileNorm(docs: DataFrame): DataFrame = {
    val ranked = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))))
    // Rank profile: BIGINT sum / count per rank — exact, and only
    // max-rank rows of metadata.
    val profile = ranked.groupBy(col("rk"))
      .agg(round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
        .as("qnorm"))
    ranked.join(profile, "rk")
      .select(col("doc_id"), col("source"), col("n_chars"), col("qnorm"))
  }

  /** Scale twin of [[quantileNorm]]: per-source ranks via
    * `GlobalRank.withRankInGroups` (range-partitioned — no per-source
    * single-task sort), then the identical BIGINT-exact rank-profile
    * aggregation and join-back. Bit-identical to q223 (the
    * (n_chars, doc_id) tiebreak is unique), pinned by DriftSpec. The
    * input is a narrow 3-column scan, so the rank machinery's multiple
    * input evaluations are the cheap case (the q160 argument) — no pin
    * needed.
    */
  def quantileNormRank(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val ranked = graft.operators.GlobalRank.withRankInGroups(
      base, "rk", col("source"), col("n_chars"), col("doc_id"))
    val profile = ranked.groupBy(col("rk"))
      .agg(round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
        .as("qnorm"))
    ranked.join(profile, "rk")
      .select(col("doc_id"), col("source"), col("n_chars"), col("qnorm"))
  }

  def oracle: Map[String, String] = Map(
    "q220_psi_drift" ->
      s"""WITH arm AS (
        |  SELECT event_type, value,
        |    CASE WHEN EXTRACT(day FROM ts) <= 15 THEN TRUE ELSE FALSE END
        |      AS is_ref
        |  FROM events),
        |vc AS (
        |  SELECT event_type, value,
        |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cr,
        |    SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cc
        |  FROM arm GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, value,
        |    SUM(cr) OVER (PARTITION BY event_type ORDER BY value) AS cum,
        |    SUM(cr) OVER (PARTITION BY event_type) AS nr
        |  FROM vc),
        |bnd AS (
        |  SELECT event_type, k, MIN(value) AS bk
        |  FROM cum, (SELECT UNNEST(range(1, ${PsiBuckets})) AS k)
        |  WHERE cum * ${PsiBuckets} >= k * nr
        |  GROUP BY 1, 2),
        |bl AS (
        |  SELECT event_type, list(bk ORDER BY k) AS bnds
        |  FROM bnd GROUP BY 1),
        |bucketed AS (
        |  SELECT vc.event_type,
        |    len(list_filter(bl.bnds, b -> vc.value > b)) AS bucket,
        |    SUM(cr) AS cr, SUM(cc) AS cc
        |  FROM vc JOIN bl ON vc.event_type = bl.event_type
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type, k AS bucket
        |  FROM bl, (SELECT UNNEST(range(0, ${PsiBuckets})) AS k)),
        |full_g AS (
        |  SELECT g.event_type, g.bucket,
        |    COALESCE(b.cr, 0) AS cr, COALESCE(b.cc, 0) AS cc
        |  FROM grid g LEFT JOIN bucketed b
        |    ON g.event_type = b.event_type AND g.bucket = b.bucket),
        |tot AS (
        |  SELECT event_type, bucket, cr, cc,
        |    SUM(cr) OVER (PARTITION BY event_type) AS nr,
        |    SUM(cc) OVER (PARTITION BY event_type) AS nc
        |  FROM full_g)
        |SELECT event_type, CAST(MAX(nr) AS BIGINT) AS n_ref,
        |  CAST(MAX(nc) AS BIGINT) AS n_cur,
        |  round(CAST(SUM(CAST(round(
        |    ((cc + 0.5) / (nc + 5.0) - (cr + 0.5) / (nr + 5.0)) *
        |    ln(((cc + 0.5) / (nc + 5.0)) / ((cr + 0.5) / (nr + 5.0))), 8)
        |    AS DECIMAL(18, 8))) AS DOUBLE), 6) AS psi
        |FROM tot GROUP BY 1""".stripMargin,
    // identical grid CTEs as q220, then the q249 cumulative walk —
    // integer-exact cross products, one double division
    "q250_emd_drift" ->
      s"""WITH arm AS (
        |  SELECT event_type, value,
        |    CASE WHEN EXTRACT(day FROM ts) <= 15 THEN TRUE ELSE FALSE END
        |      AS is_ref
        |  FROM events),
        |vc AS (
        |  SELECT event_type, value,
        |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cr,
        |    SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cc
        |  FROM arm GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, value,
        |    SUM(cr) OVER (PARTITION BY event_type ORDER BY value) AS cum,
        |    SUM(cr) OVER (PARTITION BY event_type) AS nr
        |  FROM vc),
        |bnd AS (
        |  SELECT event_type, k, MIN(value) AS bk
        |  FROM cum, (SELECT UNNEST(range(1, ${PsiBuckets})) AS k)
        |  WHERE cum * ${PsiBuckets} >= k * nr
        |  GROUP BY 1, 2),
        |bl AS (
        |  SELECT event_type, list(bk ORDER BY k) AS bnds
        |  FROM bnd GROUP BY 1),
        |bucketed AS (
        |  SELECT vc.event_type,
        |    len(list_filter(bl.bnds, b -> vc.value > b)) AS bucket,
        |    SUM(cr) AS cr, SUM(cc) AS cc
        |  FROM vc JOIN bl ON vc.event_type = bl.event_type
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type, k AS bucket
        |  FROM bl, (SELECT UNNEST(range(0, ${PsiBuckets})) AS k)),
        |full_g AS (
        |  SELECT g.event_type, g.bucket,
        |    COALESCE(b.cr, 0) AS cr, COALESCE(b.cc, 0) AS cc
        |  FROM grid g LEFT JOIN bucketed b
        |    ON g.event_type = b.event_type AND g.bucket = b.bucket),
        |walk AS (
        |  SELECT event_type, bucket, cr, cc,
        |    SUM(cr) OVER (PARTITION BY event_type ORDER BY bucket) AS cumr,
        |    SUM(cc) OVER (PARTITION BY event_type ORDER BY bucket) AS cumc,
        |    SUM(cr) OVER (PARTITION BY event_type) AS nr,
        |    SUM(cc) OVER (PARTITION BY event_type) AS nc
        |  FROM full_g),
        |emd AS (
        |  SELECT event_type, CAST(MAX(nr) AS BIGINT) AS n_ref,
        |    CAST(MAX(nc) AS BIGINT) AS n_cur,
        |    round(CAST(SUM(ABS(cumr * nc - cumc * nr)) AS DOUBLE)
        |      / (${PsiBuckets - 1}.0 * MAX(nr) * MAX(nc)), 6) AS emd
        |  FROM walk
        |  WHERE bucket < ${PsiBuckets - 1}
        |  GROUP BY 1),
        |guarded AS (
        |  SELECT event_type, n_ref, n_cur,
        |    CASE WHEN n_ref = 0 OR n_cur = 0 THEN 1.0 ELSE emd END AS emd
        |  FROM emd)
        |SELECT event_type, n_ref, n_cur, emd, emd > 0.1 AS drifted
        |FROM guarded""".stripMargin,
    "q256_emb_drift" ->
      """WITH cells AS (
        |  SELECT gs - 1 AS dim, vec_id % 2 = 0 AS arm_a,
        |    CAST(round(CAST(e AS DOUBLE) * 100000000.0, 0) AS BIGINT)
        |      AS xm,
        |    CAST(round(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)
        |      * 100000000.0, 0) AS BIGINT) AS xxm
        |  FROM (SELECT vec_id, unnest(embedding) AS e,
        |          generate_subscripts(embedding, 1) AS gs
        |        FROM embeddings)),
        |g AS (
        |  SELECT dim,
        |    COUNT(*) FILTER (arm_a) AS na,
        |    COUNT(*) FILTER (NOT arm_a) AS nb,
        |    CAST(SUM(xm) FILTER (arm_a) AS DOUBLE) AS sa,
        |    CAST(SUM(xm) FILTER (NOT arm_a) AS DOUBLE) AS sb,
        |    CAST(SUM(xxm) FILTER (arm_a) AS DOUBLE) AS ssa,
        |    CAST(SUM(xxm) FILTER (NOT arm_a) AS DOUBLE) AS ssb
        |  FROM cells GROUP BY dim),
        |w AS (
        |  SELECT dim, na, nb,
        |    sa / 100000000.0 / na AS ma, sb / 100000000.0 / nb AS mb,
        |    (ssa / 100000000.0 - sa / 100000000.0 * (sa / 100000000.0)
        |        / na) / (na - 1) / na
        |      + (ssb / 100000000.0 - sb / 100000000.0
        |        * (sb / 100000000.0) / nb) / (nb - 1) / nb AS se2
        |  FROM g)
        |SELECT CAST(dim AS INTEGER) AS dim, na, nb,
        |  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |  CASE WHEN se2 > 0 THEN round((ma - mb) / sqrt(se2), 6) END
        |    AS t_stat,
        |  CASE WHEN se2 > 0
        |    THEN abs(round((ma - mb) / sqrt(se2), 6)) > 3.0 END
        |    AS shifted
        |FROM w""".stripMargin,
    "q221_target_encode" ->
      s"""WITH j AS (
        |  SELECT c.c_nationkey, o.o_totalprice
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2)))
        |    AS DOUBLE) / COUNT(*) AS mu FROM j)
        |SELECT n.n_name, COUNT(*) AS n,
        |  round((CAST(SUM(CAST(j.o_totalprice AS DECIMAL(18, 2)))
        |      AS DOUBLE) + ${PriorM} * MAX(g.mu)) /
        |    (COUNT(*) + ${PriorM}), 6) AS enc
        |FROM j CROSS JOIN g
        |JOIN nation n ON j.c_nationkey = n.n_nationkey
        |GROUP BY 1""".stripMargin,
    // the scale twin shares q223's oracle verbatim — identical ranks
    // (unique (n_chars, doc_id) tiebreak), BIGINT-exact profile means
    "drift_qnorm_rank" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rk
        |  FROM documents),
        |p AS (
        |  SELECT rk, round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6)
        |    AS qnorm
        |  FROM r GROUP BY 1)
        |SELECT r.doc_id, r.source, r.n_chars, p.qnorm
        |FROM r JOIN p ON r.rk = p.rk""".stripMargin,
    "q223_quantile_norm" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rk
        |  FROM documents),
        |p AS (
        |  SELECT rk, round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6)
        |    AS qnorm
        |  FROM r GROUP BY 1)
        |SELECT r.doc_id, r.source, r.n_chars, p.qnorm
        |FROM r JOIN p ON r.rk = p.rk""".stripMargin)
}

/** Session-scoped cache of the q220/q250 reference-decile grid — the
  * grid is |types|×10 rows but costs one corpus shuffle plus the
  * range-partitioned cumulative pass to build, and BOTH drift audits
  * read the identical grid on the same immutable table. Cached as
  * DRIVER rows (rebuilt into a frame per call) so nothing executor-side
  * is pinned. Lifecycle contract as [[TokenCache]]: evict on dir
  * rewrite; keyed per session.
  */
private[graft] object PsiGridCache {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Seq[(String, Int, Long, Long, Long, Long)]]

  def grid(s: SparkSession, d: String): DataFrame = {
    val rows = graft.SessionCaches.getOrBuild(cache, (s, d),
      (k: (SparkSession, String)) => k._1) {
      DriftOps.psiGrid(Tables(s, d, "events")).collect().toSeq.map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
    }
    import s.implicits._
    rows.toDF("event_type", "bucket", "cr", "cc", "nr", "nc")
  }

  def evict(s: SparkSession, d: String): Unit = cache.remove((s, d))

  def clear(): Unit = cache.clear()
}
