package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

class SkewOpsSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def skewed(): (DataFrame, DataFrame) = {
    import spark.implicits._
    // one hot key (0) carrying 90% of rows
    val left = spark.range(10000)
      .select(when(col("id") < 9000, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val right = spark.range(200).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    (left, right)
  }

  test("saltedJoin == plain join (inner)") {
    val (l, r) = skewed()
    val plain = l.join(r, "k").select("k", "v", "w").collect().toSet
    val salted = SkewOps.saltedJoin(l, r, "k", salts = 8)
      .select("k", "v", "w").collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin == plain join (left outer, unmatched rows kept once)") {
    val (l, r) = skewed()
    val plain = l.join(r, Seq("k"), "left")
      .select("k", "v", "w").collect().toSet
    val salted = SkewOps.saltedJoin(l, r, "k", salts = 4, joinType = "left")
      .select("k", "v", "w").collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin rejects right/full outer (replicated unmatched rows)") {
    val (l, r) = skewed()
    Seq("right", "right_outer", "full", "full_outer", "outer").foreach { jt =>
      intercept[IllegalArgumentException] {
        SkewOps.saltedJoin(l, r, "k", salts = 4, joinType = jt)
      }
    }
  }

  test("saltedSum == plain sum, spread across salt sub-keys first") {
    val (l, _) = skewed()
    val plain = l.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedSum(l, "k", col("v"), salts = 8, "s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
