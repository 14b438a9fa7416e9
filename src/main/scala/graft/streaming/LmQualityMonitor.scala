package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous LM-quality monitoring — the streaming twin of q258's
  * held-out Kneser-Ney perplexity: an ingestion pipeline wants "did the
  * arriving data's language-model quality move?" per window — a scraper
  * suddenly feeding boilerplate, markup, or another language drops the
  * window's mean log-likelihood under the reference model long before
  * volume metrics notice. The MODEL-quality alarm beside the
  * data-distribution ones (PSI q220 / EMD q250 / embedding q256).
  *
  * Split the [[DriftMonitor]] way:
  *
  *  - [[knModel]] runs ONCE, batch-side: the interpolated-KN bigram
  *    model of q258 (types + context fan-out + continuation fan-in,
  *    discount 0.75, add-one OOV bucket) — three VOCABULARY-bounded
  *    tables pinned by eager localCheckpoint plus two driver scalars.
  *    q258 itself consumes this builder, so batch query and monitor
  *    can never drift apart.
  *  - [[score]] is ONE windowed aggregation: arriving docs explode to
  *    bigrams (narrow), stream-static join the model tables (broadcast
  *    here — vocabulary-bounded; at extreme vocab drop the hint and
  *    let the stream-static join shuffle the model side), per-row
  *    ln P in integer MICROS (the q189/q258 discipline), and the
  *    per-window state is TWO numbers: a long micros sum + a count.
  *    Plain DataFrame code — the same call on a batch frame is the
  *    identical result (streamed == batch, pinned by the spec and the
  *    entry's REQUIRE gate).
  *
  * Scale: state is (windows in flight) × 2 numbers; the model travels
  * once; the bigram explode is narrow. Long bound: |ln P|·1e6 ≤ ~4e7
  * per bigram → the window sum is safe through ~2·10¹¹ bigrams per
  * window (lift to Sum128 beyond).
  */
object LmQualityMonitor {

  /** Fixed KN discount (q258's; Chen & Goodman CSL'99). */
  val Discount = 0.75

  /** Degradation gate: a window flags when its pooled mean ll drops
    * more than this below the reference mean ll.
    */
  val LlGate = 0.3

  /** The batch-trained KN bigram model: vocabulary-bounded tables +
    * the two scalars (bigram TYPE count, train vocab size).
    */
  final case class KnModel(types: DataFrame, ctx: DataFrame,
      cont: DataFrame, tTypes: Long, vocab: Long)

  /** (keep…, w1, w2) bigram rows off a `text` column — narrow; docs
    * under 2 tokens carry no bigrams (both engines, q239's contract).
    */
  def bigrams(df: DataFrame, keep: Column*): DataFrame =
    df.withColumn("__lm_tk", split(col("text"), " "))
      .filter(size(col("__lm_tk")) >= 2)
      .select((keep :+ explode(expr(
        "transform(sequence(0, size(__lm_tk) - 2), " +
          "i -> struct(__lm_tk[i] AS w1, __lm_tk[i+1] AS w2))"))
        .as("__lm_p")): _*)
      .select((keep :+ col("__lm_p.w1").as("w1")
        :+ col("__lm_p.w2").as("w2")): _*)

  /** Train the KN model on a batch frame with a `text` column.
    *
    * `pin = true` (the monitor's mode) eagerly localCheckpoints the
    * three tables so the scalar actions and every micro-batch's
    * scoring joins read the aggregation once; pinned frames live for
    * the monitor's lifetime (the caller owns eviction). One-shot batch
    * callers (q258) pass `pin = false` — Catalyst recomputation is
    * cheaper there than leaking pinned blocks per invocation (the
    * exactQuantilesByRank checkpoint-leak lesson).
    */
  def knModel(train: DataFrame, pin: Boolean = true): KnModel = {
    def p(df: DataFrame) = if (pin) df.localCheckpoint(true) else df
    val tb = bigrams(train)
    val types = p(tb.groupBy("w1", "w2").agg(count(lit(1)).as("c2")))
    val ctx = p(types.groupBy("w1")
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1fw")))
    val cont = p(types.groupBy("w2").agg(count(lit(1)).as("n1bw")))
    val t = types.count()
    val v = tb.select(col("w1")).union(tb.select(col("w2")))
      .distinct().count()
    KnModel(types, ctx, cont, t, v)
  }

  /** Per-bigram ln P in integer micros, over a row already joined to
    * the model tables (c2, c1, n1fw, n1bw — all nullable): q258's
    * interpolated-KN probability verbatim.
    */
  def knLpMicros(tTypes: Long, vocab: Long,
      discount: Double = Discount): Column = {
    val pcont = (coalesce(col("n1bw"), lit(0L)) + 1.0) /
      lit(tTypes.toDouble + vocab.toDouble + 1.0)
    val d = lit(discount)
    val p = when(col("c1").isNotNull,
      greatest(coalesce(col("c2"), lit(0L)).cast("double") - d, lit(0.0))
        / col("c1") + (d * col("n1fw") / col("c1")) * pcont)
      .otherwise(pcont)
    round(log(p) * lit(1e6), 0).cast("long")
  }

  /** Windowed pooled mean log-likelihood of the feed under the model.
    *
    * @param cur   stream OR batch with (ts, text)
    * @param refLl the clean reference's pooled mean ll (driver scalar,
    *              from one batch aggregation)
    * @return (ws, n_bigrams, mean_ll, degraded) — degraded when the
    *         window's pooled ll drops more than [[LlGate]] under refLl
    */
  def score(cur: DataFrame, m: KnModel, refLl: Double, windowDur: String,
      watermark: String = "0 seconds"): DataFrame = {
    val j = bigrams(cur.withWatermark("ts", watermark), col("ts"))
      .join(broadcast(m.types), Seq("w1", "w2"), "left")
      .join(broadcast(m.ctx), Seq("w1"), "left")
      .join(broadcast(m.cont), Seq("w2"), "left")
      .withColumn("lpm", knLpMicros(m.tTypes, m.vocab))
    val meanLl = round(col("s") / (col("n_bigrams") * lit(1e6)), 6)
    j.groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lpm")).as("s"))
      .select(col("window.start").as("ws"), col("n_bigrams"),
        meanLl.as("mean_ll"),
        (meanLl < lit(refLl - LlGate)).as("degraded"))
  }
}
