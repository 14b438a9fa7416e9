package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared stopped-session purge all nine session caches (and
  * [[Tables]]) route through. Driven via the deadness-predicate seam:
  * one JVM holds one SparkContext, so a live-plus-stopped session pair
  * can't exist here to exercise `isStopped` directly.
  */
class SessionCachesSpec extends AnyFunSuite {

  private def chm(entries: (String, String)*) = {
    val m = new java.util.concurrent.ConcurrentHashMap[String, String]
    entries.foreach { case (k, v) => m.put(k, v) }
    m
  }

  test("miss purges dead entries, keeps live ones, builds the key") {
    val m = chm("deadA" -> "a", "deadB" -> "b", "live" -> "c")
    var built = 0
    val got = SessionCaches.getOrBuildWhere(m, "fresh",
      (k: String) => k.startsWith("dead")) { built += 1; "d" }
    assert(got === "d" && built === 1)
    assert(!m.containsKey("deadA") && !m.containsKey("deadB"))
    assert(m.get("live") === "c" && m.get("fresh") === "d")
  }

  test("hit path never purges and never rebuilds (hot path = one get)") {
    val m = chm("dead" -> "a", "hot" -> "h")
    var built = 0
    val got = SessionCaches.getOrBuildWhere(m, "hot",
      (_: String) => true) { built += 1; "rebuilt" }
    assert(got === "h" && built === 0)
    // the dead entry survives: purging is a miss-path duty only
    assert(m.get("dead") === "a")
  }

  test("build runs at most once per key under concurrent misses") {
    val m = new java.util.concurrent.ConcurrentHashMap[String, String]
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        SessionCaches.getOrBuildWhere(m, "k", (_: String) => false) {
          built.incrementAndGet(); "v"
        }
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(built.get() === 1 && m.get("k") === "v")
  }
}
