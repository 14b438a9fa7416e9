package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous content-defined-chunk novelty monitoring — the streaming
  * twin of q261's batch CDC dedup: an ingestion pipeline wants "how
  * much of the arriving data is genuinely NEW bytes?" per window —
  * counted in insert-robust CDC chunks, so a re-crawled page with one
  * edited sentence registers as ~one novel chunk, not as a whole novel
  * document (the exact-hash novelty rate stream_dedup_inc reports) and
  * not as zero (what a fuzzy near-dup gate would say).
  *
  * Split the [[DriftMonitor]] way:
  *
  *  - [[refChunks]] runs ONCE, batch-side: the reference corpus's
  *    distinct chunk-hash set (q261's chunker), pinned by eager
  *    localCheckpoint — the caller owns eviction. The set is
  *    corpus-chunk-sized: it is the dedup INDEX, the stream_index_inc
  *    precedent, NOT per-window state.
  *  - [[novelty]] is ONE windowed aggregation: arriving docs chunk in
  *    a narrow per-row expression (q261's cdcChunkTable with `ts`
  *    carried through), a stream-static LEFT join marks known chunk
  *    hashes (no broadcast hint — the reference side is corpus-scale;
  *    Spark plans the static side per micro-batch), and the
  *    per-window state is THREE counters. Plain DataFrame code —
  *    streamed == batch by construction, pinned by the spec and the
  *    entry's REQUIRE gate.
  *
  * Scale: state is (windows in flight) × 3 longs; the chunk explode
  * is narrow; the join is keyed on the 32-byte chunk hash exactly as
  * q261's batch report. Nothing grows with stream volume except the
  * static index every dedup design must hold somewhere.
  */
object CdcIngest {

  /** Distinct reference chunk hashes (one column `h`), pinned. */
  def refChunks(ref: DataFrame): DataFrame =
    graft.queries.DedupQueries.cdcChunkTable(ref)
      .select(col("h")).distinct()
      .withColumn("known", lit(true))
      .localCheckpoint(true)

  /** Windowed chunk-novelty of the feed against [[refChunks]].
    *
    * @param cur stream OR batch with (ts, text)
    * @return (ws, n_chunks, n_novel, novelty_ratio)
    */
  def novelty(cur: DataFrame, ref: DataFrame, windowDur: String,
      watermark: String = "0 seconds"): DataFrame =
    graft.queries.DedupQueries
      .cdcChunkTable(cur.withWatermark("ts", watermark),
        keep = Seq(col("ts")))
      .join(ref, Seq("h"), "left")
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("window.start").as("ws"), col("n_chunks"),
        col("n_novel"),
        round(col("n_novel") / col("n_chunks"), 6).as("novelty_ratio"))
}
