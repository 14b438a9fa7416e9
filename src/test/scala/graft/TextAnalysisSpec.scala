package graft

import graft.queries.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("fingerprint: NULL below 8 chars, min 8-gram md5 at/above") {
    import spark.implicits._
    val got = Seq("short", "exactly8", "a longer text with many grams")
      .toDF("text")
      .select(TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).isEmpty, "sub-8-char text must fingerprint to NULL")
    // a single 8-gram: fp == md5 of the whole string
    assert(got(1).contains(
      java.security.MessageDigest.getInstance("MD5")
        .digest("exactly8".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString))
    assert(got(2).nonEmpty)
  }

  test("mr_wordcount key escaping round-trips comma/percent tokens") {
    import org.apache.spark.sql.functions.lit
    import graft.queries.MrQueries
    val tokens = Seq("foo,bar", "a%2Cb", "50%", "plain", ",", "%")
    tokens.foreach { t =>
      val esc = MrQueries.escKey(t)
      assert(!esc.contains(","), s"escaped key '$esc' still has a comma")
      val back = spark.range(1)
        .select(MrQueries.unescKey(lit(esc)).as("w"))
        .head().getString(0)
      assert(back == t, s"round-trip broke: '$t' -> '$esc' -> '$back'")
    }
  }
}
