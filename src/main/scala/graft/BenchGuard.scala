package graft

/** Round-over-round bench regression guard.
  *
  * Round 8's guard parsed the newest stamped `BENCH_r*.json`, but the
  * driver truncates those files to an output *tail* that no longer
  * contains the `"queries":{...}` map — so the guard compared nothing,
  * ever. The fix (round 9): [[Bench]] appends its FULL result line to
  * `BENCH_HISTORY.jsonl` after every complete run, and the guard reads
  * the last same-scale-factor line of that history. The parse/compare
  * logic lives here, pure, so BenchGuardSpec can prove the guard fires
  * on a synthetic 2× regression instead of trusting `regressions: {}`
  * to mean "no regressions" when it could mean "nothing compared".
  */
object BenchGuard {

  /** Flag threshold: a query regressed if it got > 1.5× slower while
    * now costing > 1 s (sub-second jitter is machine noise).
    */
  private val Ratio = 1.5
  private val MinSec = 1.0

  /** Extract the flat `"queries":{"name":sec,...}` map from one bench
    * JSON line. Minimal regex parse — the format is our own.
    */
  private[graft] def parseQueries(line: String): Map[String, Double] =
    "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(line)
      .map(_.group(1)).toSeq
      .flatMap(body => "\"([^\"]+)\":([-0-9.eE]+)".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble))
      .toMap

  /** The last history line recorded at `sfDir` (like-for-like scale
    * factors only: a local sf0.01 run compared against the stamped
    * sf0.1 history would flag nothing real).
    */
  private[graft] def lastRunFor(history: Seq[String], sfDir: String)
      : Option[Map[String, Double]] =
    recentRunsFor(history, sfDir, 1).headOption

  /** Up to `n` most recent same-sf history lines, newest first. */
  private[graft] def recentRunsFor(history: Seq[String], sfDir: String,
      n: Int): Seq[Map[String, Double]] =
    history.reverseIterator
      .filter(_.contains("\"sf\":\"" + sfDir + "\""))
      .map(parseQueries)
      .filter(_.nonEmpty)
      .take(n).toSeq

  /** Per-query baseline: MEDIAN over the last ≤3 same-sf runs
    * (round 10 — comparing against a single line let one outlier-fast
    * observation from a contended sweep flag five in-range queries as
    * "real": q154 sat at 3.5–6.1 s across six runs, the one 2.83 s
    * outlier became `prev`, and a normal 5.4 s run tripped the 1.5×
    * bar; the median of three absorbs a single outlier in either
    * direction while a genuine step change still shifts it within two
    * runs).
    */
  private[graft] def baseline(history: Seq[String], sfDir: String)
      : Map[String, Double] = {
    val runs = recentRunsFor(history, sfDir, 3)
    runs.flatMap(_.keys).distinct.flatMap { name =>
      val vs = runs.flatMap(_.get(name)).filter(_ > 0).sorted
      // LOWER middle on even counts: with exactly 2 lines this takes
      // the faster one (the strict old single-line behavior) — the
      // upper middle would let one outlier-SLOW line become the
      // baseline and mask a real regression
      if (vs.isEmpty) None else Some(name -> vs((vs.size - 1) / 2))
    }.toMap
  }

  /** queries that are now > [[Ratio]]× their baseline (median of the
    * last ≤3 same-sf runs) and cost > [[MinSec]] s.
    * Returns name -> (baselineSec, nowSec).
    */
  def regressions(history: Seq[String], sfDir: String,
      now: Map[String, Double]): Map[String, (Double, Double)] =
    baseline(history, sfDir).flatMap { case (name, old) =>
      now.get(name).collect {
        case n if old > 0 && n > MinSec && n > old * Ratio =>
          name -> (old, n)
      }
    }

  /** Arbitration verdict for a flagged query (round-10): given the
    * history time and the best (min) of the sweep time and the 3
    * in-run re-probes, the flag is "real" only if even the best
    * re-measurement stays over the same 1.5×/1 s bar that raised it —
    * otherwise the sweep number was transient machine contention
    * ("noise"). Pure so BenchGuardSpec can pin both branches.
    */
  def arbitrate(prev: Double, best: Double): String =
    if (prev > 0 && best > MinSec && best > prev * Ratio) "real"
    else "noise"

  /** Read `BENCH_HISTORY.jsonl` if present (empty history otherwise). */
  def readHistory(path: java.nio.file.Path): Seq[String] =
    if (java.nio.file.Files.exists(path))
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(path)).asScala.toSeq
    else Seq.empty
}
