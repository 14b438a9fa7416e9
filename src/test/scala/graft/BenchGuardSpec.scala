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
    // 5.9 < 1.2 × median(5.0, 5.2, 2.0) = 6.0 → quiet (single-entry
    // baseline: q1 is trivially in the top-20 tight tier)
    assert(BenchGuard.regressions(hist, "/sf0.1", Map("q1" -> 5.9)).isEmpty)
    // 8.0 > 6.0 → flagged, with the MEDIAN as prev
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
    // the mid tier's own floor lets a 0.7 s verdict stand
    assert(BenchGuard.arbitrate(0.5, 0.7,
      BenchGuard.MidRatio, BenchGuard.MidMinSec) === "real")
  }

  test("three bar tiers: top-20 tight, >=0.4s mid band, cheap default") {
    // 25 queries: q01..q25 with baselines 25s down to 1s — q01..q20
    // are the top-20 (tight), q21..q25 (5s..1s) land in the mid band
    val qs = (1 to 25).map(i => (f"q$i%02d", 26.0 - i))
    // plus two cheap entries below the 0.4s mid floor
    val hist = Seq(line("/sf0.1", qs :+ ("q26", 0.3) :+ ("q27", 0.1): _*))
    val bars = BenchGuard.flagBars(hist, "/sf0.1")
    assert(bars("q01") === (BenchGuard.TightRatio, BenchGuard.MinSec))
    assert(bars("q20") === (BenchGuard.TightRatio, BenchGuard.MinSec))
    assert(bars("q21") === (BenchGuard.MidRatio, BenchGuard.MidMinSec))
    assert(bars("q26") === (BenchGuard.Ratio, BenchGuard.MinSec))
    assert(bars.values.count(_._1 == BenchGuard.TightRatio)
      === BenchGuard.TightTopN)
    // a 1.3x drift on an expensive entry FLAGS (it sat invisible
    // under the uniform 1.5x bar through round 10)...
    val drift = BenchGuard.regressions(hist, "/sf0.1",
      Map("q01" -> 25.0 * 1.3))
    assert(drift === Map("q01" -> (25.0, 32.5)))
    // ...and a sub-0.4s baseline tripling but staying under 1s stays
    // quiet (job-orchestration constants, not signal)
    assert(BenchGuard.regressions(hist, "/sf0.1",
      Map("q26" -> 0.9)).isEmpty)
  }

  test("mid band catches the round-11 blind spot (1.4x on a ~1s entry)") {
    // q77_triangles drifted 1.08 -> 1.52 s (1.41x) in round 11 and was
    // never arbitrated: under the old uniform bars it needed 1.5x.
    // 21+ entries so q77 (cheapest) falls OUT of the top-20 tight tier
    // and into the mid band.
    val qs = (1 to 20).map(i => (f"big$i%02d", 30.0 - i)) :+
      ("q77" -> 1.08) :+ ("tiny" -> 0.2)
    val hist = Seq(line("/sf0.1", qs: _*))
    assert(BenchGuard.flagBars(hist, "/sf0.1")("q77")
      === (BenchGuard.MidRatio, BenchGuard.MidMinSec))
    assert(BenchGuard.regressions(hist, "/sf0.1", Map("q77" -> 1.52))
      === Map("q77" -> (1.08, 1.52)))
    // a 0.53 -> 0.75 s drift (q234's round-11 case) also flags now
    val hist2 = Seq(line("/sf0.1",
      (qs.toMap + ("q234" -> 0.53)).toSeq: _*))
    assert(BenchGuard.regressions(hist2, "/sf0.1", Map("q234" -> 0.75))
      === Map("q234" -> (0.53, 0.75)))
    // but the same drift under the mid floor (0.3 -> 0.45) stays quiet
    assert(BenchGuard.regressions(hist, "/sf0.1", Map("tiny" -> 0.3))
      .isEmpty)
  }

  test("prior 'real' flags are parsed from the guard section for re-arbitration") {
    val guarded =
      """{"metric":"total","value":9.0,"unit":"sec","queries":{"a":1.0,"b":2.0,"c":3.0},"cold":{},"errors":{},"n_failed":0,"guard":{"a":{"prev":3.6,"sweep":4.8,"probe":[5.2,4.7],"verdict":"real"},"b":{"prev":1.7,"sweep":3.1,"probe":[2.7],"verdict":"noise"},"c":{"prev":2.3,"sweep":3.2,"probe":[],"verdict":"real"}},"n_flagged":3,"n_real_regressions":2,"sf":"/sf0.1"}"""
    assert(BenchGuard.parseRealFlags(guarded)
      === Map("a" -> 3.6, "c" -> 2.3))
    // lines without a guard section contribute nothing
    assert(BenchGuard.parseRealFlags(line("/sf0.1", "a" -> 1.0)).isEmpty)
    // priorRealFlags unions the last <=3 same-sf lines, newest winning,
    // and ignores other sfs
    val older = guarded.replace("\"prev\":3.6", "\"prev\":9.9")
    val otherSf = guarded.replace("/sf0.1", "/sf9")
    assert(BenchGuard.priorRealFlags(
      Seq(older, otherSf, guarded), "/sf0.1")
      === Map("a" -> 3.6, "c" -> 2.3))
    // a 4th-newest line's flags age out of the window
    val pad = line("/sf0.1", "z" -> 1.0)
    assert(BenchGuard.priorRealFlags(
      Seq(guarded, pad, pad, pad), "/sf0.1").isEmpty)
  }

  test("parseQueries round-trips the bench line format") {
    val qs = BenchGuard.parseQueries(
      line("/sf0.1", "q1_agg" -> 0.25, "q74_pagerank" -> 4.27))
    assert(qs === Map("q1_agg" -> 0.25, "q74_pagerank" -> 4.27))
  }
}
