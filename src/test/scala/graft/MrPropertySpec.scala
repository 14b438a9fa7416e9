package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.mr.MapReduce

/** Property-based pins of the MR facade (SURVEY.md §5.3): the wordcount
  * fold matches an in-memory reference on arbitrary inputs, and results
  * are invariant to partition count — the property that makes the
  * reference's custom hash partitioner a swappable implementation detail.
  */
class MrPropertySpec extends SparkSpec {

  /** Deterministic property loop (no scalatest-scalacheck bridge in the
    * offline cache): fixed seeds, `n` generated cases per property.
    */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 12)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val word: Gen[String] = Gen.oneOf(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "über",
    "чай", "数据", "", "a,b", "x,y,z")
  private val lines: Gen[List[String]] =
    Gen.listOfN(60, Gen.listOfN(5, word).map(_.mkString(" ")))

  test("mapReduce wordcount == sequential fold, for any input") {
    import spark.implicits._
    forAllSeeded(lines) { ls =>
      val ds = spark.createDataset(ls)
      val got = MapReduce.mapReduce(
        ds,
        mapper = l => l.split(" ").iterator.filter(_.nonEmpty).map(w => s"$w,1"),
        reducer = (k, vs) => Iterator(s"$k,${vs.size}"),
        numPartitions = 3
      ).collect().toSet
      val want = ls.flatMap(_.split(" ")).filter(_.nonEmpty)
        // the MR key contract: key = text before the FIRST comma of the
        // emitted `word,1` line, so a word containing commas keys on its
        // first segment — replicate that in the reference fold
        .groupBy(w => MapReduce.keyOf(s"$w,1"))
        .map { case (k, ws) => s"$k,${ws.size}" }.toSet
      assert(got == want)
    }
  }

  test("result is invariant to partition count") {
    import spark.implicits._
    forAllSeeded(Gen.zip(lines, Gen.choose(1, 9))) { case (ls, parts) =>
      val ds = spark.createDataset(ls)
      def run(n: Int) = MapReduce.mapReduce(
        ds,
        mapper = l => l.split(" ").iterator.filter(_.nonEmpty).map(w => s"$w,1"),
        reducer = (k, vs) => Iterator(s"$k,${vs.size}"),
        numPartitions = n
      ).collect().sorted.toSeq
      assert(run(parts) == run(1))
    }
  }
}
