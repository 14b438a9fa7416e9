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

  /** Flag bars, per tier (round-11 verdict item 4 added the MID tier —
    * the uniform (1.5×, 1 s) bar left a mid-band blind spot twice in
    * two rounds: q70's 1.22× drift on a 5.7 s query in round 10, then
    * four unprobed 1.3–1.45× drifts on 0.5–1.5 s entries in round 11 —
    * visible in the artifact diff but never arbitrated):
    *
    *  - TOP tier: the [[TightTopN]] most expensive baseline entries
    *    flag at [[TightRatio]]× over a [[MinSec]] s floor — on the
    *    expensive tail a 1.2× move is seconds of real signal.
    *  - MID tier: entries with baseline ≥ [[MidMinBase]] s flag at
    *    [[MidRatio]]× over a [[MidMinSec]] s floor — wide enough to
    *    catch the round-11 drifts (1.31–1.42× on 0.5–1.1 s baselines),
    *    and any noise it over-flags is auto-arbitrated by the in-run
    *    probes rather than by a human after the fact.
    *  - default: [[Ratio]]× over [[MinSec]] s — sub-0.4 s baselines
    *    are job-orchestration constants where relative drift is noise.
    */
  private[graft] val Ratio = 1.5
  private[graft] val TightRatio = 1.2
  private[graft] val TightTopN = 20
  private[graft] val MidRatio = 1.3
  private[graft] val MidMinBase = 0.4
  private[graft] val MidMinSec = 0.5
  private[graft] val MinSec = 1.0

  /** Per-query (flagRatio, minSec) bar for a baseline — see the tier
    * table above.
    */
  private[graft] def barsFor(baseline: Map[String, Double])
      : Map[String, (Double, Double)] = {
    val top = baseline.toSeq.sortBy(-_._2).take(TightTopN).map(_._1).toSet
    baseline.map { case (n, b) =>
      n -> (if (top.contains(n)) (TightRatio, MinSec)
            else if (b >= MidMinBase) (MidRatio, MidMinSec)
            else (Ratio, MinSec))
    }
  }

  /** The per-query bars Bench's probe arbitration must reuse — the
    * flag and its verdict have to apply the SAME bar. Covers every
    * baseline name, so every flag [[regressions]] can raise has a bar
    * here; [[Ratio]]/[[MinSec]] are the exposed defaults for anything
    * outside the baseline (they cannot diverge from the flag bar
    * silently — they ARE the flag bar's default tier).
    */
  def flagBars(history: Seq[String], sfDir: String)
      : Map[String, (Double, Double)] =
    barsFor(baseline(history, sfDir))

  /** Extract the flat `"queries":{"name":sec,...}` map from one bench
    * JSON line. Minimal regex parse — the format is our own.
    */
  private[graft] def parseQueries(line: String): Map[String, Double] =
    "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(line)
      .map(_.group(1)).toSeq
      .flatMap(body => "\"([^\"]+)\":([-0-9.eE]+)".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble))
      .toMap

  /** Extract the prior "real"-verdict flags from one bench line's
    * `"guard":{...}` section: name -> the flag's own baseline (`prev`).
    * The guard object nests per-query objects, so the slice is bounded
    * by the `,"n_flagged"` key that always follows it.
    */
  private[graft] def parseRealFlags(line: String): Map[String, Double] = {
    val gi = line.indexOf("\"guard\":{")
    val ei = line.indexOf(",\"n_flagged\"")
    if (gi < 0 || ei <= gi) Map.empty
    else ("\"([^\"]+)\":\\{\"prev\":([-0-9.eE]+),\"sweep\":[-0-9.eE]+," +
      "\"probe\":\\[[^\\]]*\\],\"verdict\":\"real\"\\}").r
      .findAllMatchIn(line.substring(gi + 9, ei))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Unresolved "real" regression verdicts from the last ≤3 same-sf
    * runs: name -> the original flag's baseline. Round-11 verdict
    * item 1: a contended sweep can stamp `real` flags that in-run
    * probes cannot exonerate (they share the contended box), so the
    * NEXT quiet run re-arbitrates them against its own measurement —
    * [[Bench]] records the verdicts in `prior_real_rearb`. Newest
    * occurrence of a name wins.
    */
  def priorRealFlags(history: Seq[String], sfDir: String)
      : Map[String, Double] =
    history.reverseIterator
      .filter(_.contains("\"sf\":\"" + sfDir + "\""))
      .take(3).toSeq.reverse // oldest first, so ++ keeps the newest
      .foldLeft(Map.empty[String, Double])(_ ++ parseRealFlags(_))

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
    * last ≤3 same-sf runs) and cost > their tier's minSec floor — see
    * [[barsFor]]. Returns name -> (baselineSec, nowSec).
    */
  def regressions(history: Seq[String], sfDir: String,
      now: Map[String, Double]): Map[String, (Double, Double)] = {
    val base = baseline(history, sfDir)
    val bars = barsFor(base)
    base.flatMap { case (name, old) =>
      val (ratio, minSec) = bars(name)
      now.get(name).collect {
        case n if old > 0 && n > minSec && n > old * ratio =>
          name -> (old, n)
      }
    }
  }

  /** Arbitration verdict for a flagged query (round-10): given the
    * history time and the best (min) of the sweep time and the 3
    * in-run re-probes, the flag is "real" only if even the best
    * re-measurement stays over the same ratio/minSec bar that raised
    * it — otherwise the sweep number was transient machine contention
    * ("noise"). Pure so BenchGuardSpec can pin both branches.
    * `ratio`/`minSec` must be the flag's own bar (see [[flagBars]]).
    */
  def arbitrate(prev: Double, best: Double, ratio: Double = Ratio,
      minSec: Double = MinSec): String =
    if (prev > 0 && best > minSec && best > prev * ratio) "real"
    else "noise"

  /** Read `BENCH_HISTORY.jsonl` if present (empty history otherwise). */
  def readHistory(path: java.nio.file.Path): Seq[String] =
    if (java.nio.file.Files.exists(path))
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(path)).asScala.toSeq
    else Seq.empty
}
