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
    * now costing > 1 s (sub-second jitter is machine noise). The
    * [[TightTopN]] most expensive baseline entries get the tighter
    * [[TightRatio]] bar instead (round-10 verdict item 2: q70's 1.22×
    * drift on a 5.7 s query — 1.2 wall-clock seconds — sat below the
    * uniform 1.5× bar for a whole round and was never arbitrated; on
    * the expensive tail a 1.2× move is seconds of real signal, while
    * on the sub-second tail it would be noise-storming).
    */
  private val Ratio = 1.5
  private[graft] val TightRatio = 1.2
  private[graft] val TightTopN = 20
  private val MinSec = 1.0

  /** Per-query flag ratio for a baseline: tighter bar on the TopN most
    * expensive entries, default bar elsewhere.
    */
  private[graft] def ratioFor(baseline: Map[String, Double])
      : Map[String, Double] = {
    val top = baseline.toSeq.sortBy(-_._2).take(TightTopN).map(_._1).toSet
    baseline.map { case (n, _) =>
      n -> (if (top.contains(n)) TightRatio else Ratio)
    }
  }

  /** The per-query flag ratios Bench's probe arbitration must reuse —
    * the flag and its verdict have to apply the SAME bar.
    */
  def flagRatios(history: Seq[String], sfDir: String): Map[String, Double] =
    ratioFor(baseline(history, sfDir))

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

  /** queries that are now > their flag ratio × baseline (median of the
    * last ≤3 same-sf runs; ratio per [[ratioFor]]) and cost > [[MinSec]]
    * s. Returns name -> (baselineSec, nowSec).
    */
  def regressions(history: Seq[String], sfDir: String,
      now: Map[String, Double]): Map[String, (Double, Double)] = {
    val base = baseline(history, sfDir)
    val ratios = ratioFor(base)
    base.flatMap { case (name, old) =>
      now.get(name).collect {
        case n if old > 0 && n > MinSec && n > old * ratios(name) =>
          name -> (old, n)
      }
    }
  }

  /** Arbitration verdict for a flagged query (round-10): given the
    * history time and the best (min) of the sweep time and the 3
    * in-run re-probes, the flag is "real" only if even the best
    * re-measurement stays over the same ratio/1 s bar that raised it —
    * otherwise the sweep number was transient machine contention
    * ("noise"). Pure so BenchGuardSpec can pin both branches. `ratio`
    * must be the flag's own bar (see [[flagRatios]]).
    */
  def arbitrate(prev: Double, best: Double, ratio: Double = Ratio): String =
    if (prev > 0 && best > MinSec && best > prev * ratio) "real"
    else "noise"

  /** Read `BENCH_HISTORY.jsonl` if present (empty history otherwise). */
  def readHistory(path: java.nio.file.Path): Seq[String] =
    if (java.nio.file.Files.exists(path))
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(path)).asScala.toSeq
    else Seq.empty
}
