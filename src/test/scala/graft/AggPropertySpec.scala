package graft

import org.apache.spark.sql.functions._

import graft.functions.sketches._
import graft.functions.topk._

/** Seeded generative tests for the custom aggregates: results must equal
  * a sequential reference and be invariant to the partition count (the
  * partition split drives which partial buffers merge, so invariance
  * exercises update/merge/serialize end-to-end).
  */
class AggPropertySpec extends SparkSpec {

  private def randRows(seed: Int, n: Int): Seq[(Int, Long, Double)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt(5), rnd.nextInt(1000).toLong, rnd.nextDouble()))
  }

  test("top_k == sort-take reference, invariant to partitioning") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rows = randRows(seed, 500)
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._3, r._2)).sorted.take(4)
      }
      Seq(1, 7, 32).foreach { parts =>
        val df = spark.sparkContext.parallelize(rows, parts)
          .toDF("g", "id", "v")
        val got = df
          .groupBy(col("g"))
          .agg(top_k(struct(col("v"), col("id")), 4).as("t"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getDouble(0), x.getLong(1))))
          .toMap
        assert(got.view.mapValues(_.toSeq).toMap == want,
          s"seed=$seed parts=$parts")
      }
    }
  }

  test("approx_top_k exact mode == groupBy count, invariant to partitioning") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(800)(s"w${rnd.nextInt(30)}")
      val want = words.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }.take(5)
      Seq(1, 5, 32).foreach { parts =>
        val got = spark.sparkContext.parallelize(words, parts).toDF("w")
          .agg(approx_top_k(col("w"), 64, 5).as("t"))
          .select(explode(col("t")).as("e"))
          .collect()
          .map(r => (r.getStruct(0).getString(0), r.getStruct(0).getLong(1)))
          .toSeq
        assert(got == want, s"seed=$seed parts=$parts: $got vs $want")
      }
    }
  }

  test("oph_sig is invariant to partitioning (slot-min merge)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400)((rnd.nextInt(4), rnd.nextLong()))
    val sigs = Seq(1, 8, 32).map { parts =>
      spark.sparkContext.parallelize(rows, parts).toDF("g", "h")
        .groupBy(col("g")).agg(oph_sig(col("h"), 16).as("sig"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toVector).toMap
    }
    assert(sigs.distinct.size == 1, "signature depends on partitioning")
  }
}
