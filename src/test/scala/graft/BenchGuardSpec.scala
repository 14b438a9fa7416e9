package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proves the bench regression guard actually compares data — the
  * round-8 guard parsed driver-truncated artifacts and never fired
  * (VERDICT r8 "What's wrong" #3). Pure tests over [[BenchGuard]].
  */
class BenchGuardSpec extends AnyFunSuite {

  private def line(sf: String, qs: (String, Double)*): String = {
    val body = qs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":{$body},"cold":{},"errors":{},"n_failed":0,"regressions":{},"sf":"$sf"}"""
  }

  test("fires on a synthetic 2x regression above the 1s floor") {
    val hist = Seq(line("/sf0.1", "q1" -> 2.0, "q2" -> 0.2))
    val now = Map("q1" -> 4.0, "q2" -> 0.4)
    val r = BenchGuard.regressions(hist, "/sf0.1", now)
    assert(r === Map("q1" -> (2.0, 4.0))) // q2 doubled too but stays sub-1s
  }

  test("quiet when times hold steady or improve") {
    val hist = Seq(line("/sf0.1", "q1" -> 2.0, "q2" -> 5.0))
    val r = BenchGuard.regressions(
      hist, "/sf0.1", Map("q1" -> 2.2, "q2" -> 1.1))
    assert(r.isEmpty)
  }

  test("baseline is the MEDIAN of the last 3 same-sf lines, other sfs ignored") {
    // round-10 fix: one outlier-fast observation (2.0 below, from a
    // contended sweep's lucky rep) must not flag an in-range run
    val hist = Seq(
      line("/sf0.1", "q1" -> 9.9),  // 4th-newest: outside the window
      line("/sf0.1", "q1" -> 5.0),
      line("/sf0.1", "q1" -> 5.2),
      line("/sf0.1", "q1" -> 2.0),  // outlier-fast, newest
      line("/sf0.01", "q1" -> 0.01)) // different sf: must be ignored
    // 6.0 < 1.5 × median(5.0, 5.2, 2.0) = 7.5 → quiet
    assert(BenchGuard.regressions(hist, "/sf0.1", Map("q1" -> 6.0)).isEmpty)
    // 8.0 > 7.5 → flagged, with the MEDIAN as prev
    assert(BenchGuard.regressions(hist, "/sf0.1", Map("q1" -> 8.0))
      === Map("q1" -> (5.0, 8.0)))
  }

  test("two-line history: the FASTER line is the baseline (lower middle)") {
    // one outlier-slow line must not mask a real regression
    val hist = Seq(
      line("/sf0.1", "q1" -> 5.0),  // contended outlier
      line("/sf0.1", "q1" -> 2.0))  // true steady
    assert(BenchGuard.regressions(hist, "/sf0.1", Map("q1" -> 4.0))
      === Map("q1" -> (2.0, 4.0)))
  }

  test("a genuine step change still fires through the median window") {
    val hist = Seq(
      line("/sf0.1", "q1" -> 2.0),
      line("/sf0.1", "q1" -> 2.1),
      line("/sf0.1", "q1" -> 1.9))
    assert(BenchGuard.regressions(hist, "/sf0.1", Map("q1" -> 4.0))
      === Map("q1" -> (2.0, 4.0)))
  }

  test("failed previous runs (-1 sentinel) never baseline a comparison") {
    val hist = Seq(line("/sf0.1", "q1" -> -1.0))
    assert(BenchGuard.regressions(hist, "/sf0.1", Map("q1" -> 9.0)).isEmpty)
  }

  test("empty or missing history compares nothing without error") {
    assert(BenchGuard.regressions(Seq.empty, "/sf0.1", Map("q1" -> 9.0)).isEmpty)
    val missing = java.nio.file.Paths.get("target/no-such-history.jsonl")
    assert(BenchGuard.readHistory(missing).isEmpty)
  }

  test("arbitrate: probe min clearing the bar is noise, staying over is real") {
    // prev 2.0 s, bar = 3.0 s: a 6.2 s sweep whose re-probe lands at
    // 2.1 s was contention; one whose best re-measurement is still
    // 4.0 s is a real regression
    assert(BenchGuard.arbitrate(2.0, 2.1) === "noise")
    assert(BenchGuard.arbitrate(2.0, 4.0) === "real")
    // sub-second probes never grade "real" (the MinSec floor), and a
    // failed/absent baseline (-1) can't accuse anything
    assert(BenchGuard.arbitrate(0.2, 0.9) === "noise")
    assert(BenchGuard.arbitrate(-1.0, 9.0) === "noise")
  }

  test("top-20 expensive entries get the tighter 1.2x bar") {
    // 25 queries: q01..q25 with baselines 25s down to 1.5s — the top
    // 20 by cost (q01..q20, >= 6s... actually 25-(n-1)s) are tight
    val qs = (1 to 25).map(i => (f"q$i%02d", 26.0 - i))
    val hist = Seq(line("/sf0.1", qs: _*))
    val ratios = BenchGuard.flagRatios(hist, "/sf0.1")
    assert(ratios("q01") === BenchGuard.TightRatio)
    assert(ratios("q20") === BenchGuard.TightRatio)
    assert(ratios("q21") === 1.5)
    assert(ratios.values.count(_ == BenchGuard.TightRatio)
      === BenchGuard.TightTopN)
    // a 1.3x drift on an expensive entry now FLAGS (it sat invisible
    // under the uniform 1.5x bar through round 10)...
    val drift = BenchGuard.regressions(hist, "/sf0.1",
      Map("q01" -> 25.0 * 1.3))
    assert(drift === Map("q01" -> (25.0, 32.5)))
    // ...while the same relative drift on a cheap entry stays quiet
    assert(BenchGuard.regressions(hist, "/sf0.1",
      Map("q21" -> 5.0 * 1.3)).isEmpty)
    // and arbitrate applies the tight bar when told to: best=1.25x
    // prev is REAL under 1.2, noise under the default 1.5
    assert(BenchGuard.arbitrate(10.0, 12.5, BenchGuard.TightRatio)
      === "real")
    assert(BenchGuard.arbitrate(10.0, 12.5) === "noise")
  }

  test("parseQueries round-trips the bench line format") {
    val qs = BenchGuard.parseQueries(
      line("/sf0.1", "q1_agg" -> 0.25, "q74_pagerank" -> 4.27))
    assert(qs === Map("q1_agg" -> 0.25, "q74_pagerank" -> 4.27))
  }
}
