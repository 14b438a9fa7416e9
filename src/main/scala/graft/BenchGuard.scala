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
    history.reverseIterator
      .filter(_.contains("\"sf\":\"" + sfDir + "\""))
      .map(parseQueries)
      .find(_.nonEmpty)

  /** queries that are now > [[Ratio]]× their previous steady time and
    * cost > [[MinSec]] s. Returns name -> (prevSec, nowSec).
    */
  def regressions(history: Seq[String], sfDir: String,
      now: Map[String, Double]): Map[String, (Double, Double)] =
    lastRunFor(history, sfDir).toSeq.flatMap { prev =>
      prev.flatMap { case (name, old) =>
        now.get(name).collect {
          case n if old > 0 && n > MinSec && n > old * Ratio =>
            name -> (old, n)
        }
      }
    }.toMap

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
