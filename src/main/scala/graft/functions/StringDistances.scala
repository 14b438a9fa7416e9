package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** String-distance kernels for fuzzy matching beyond Spark's built-in
  * `levenshtein`: unrestricted Damerau-Levenshtein and Jaro-Winkler —
  * the two standard record-linkage measures (Damerau 1964; Winkler,
  * JASA 1990). Both are implemented as static methods so whole-stage
  * codegen calls them directly (same dispatch pattern as Spark's own
  * levenshtein), keeping the kernel inside the codegen'd stage.
  *
  * Semantics are pinned to the common textbook definitions, which DuckDB
  * also implements, so oracle rows can hash-compare:
  *  - damerau_levenshtein: UNRESTRICTED (a transposed pair may be edited
  *    again later), so dl("ca","abc") = 2 where the simpler optimal
  *    string alignment variant gives 3.
  *  - jaro_winkler: match window floor(max(|a|,|b|)/2)-1, either side
  *    empty -> 0.0; Winkler prefix boost (scale 0.1, prefix capped at 4)
  *    applied only when the Jaro similarity exceeds 0.7.
  */
object StringDistance {

  /** Unrestricted Damerau-Levenshtein distance (char-level). O(n·m) time,
    * two-row-free full matrix because the transposition rule reaches back
    * to arbitrary earlier rows; bounded by the input lengths, which for
    * the fuzzy-join use sit under a few hundred chars — per-row scratch,
    * no executor-lifetime state.
    */
  def damerauLevenshtein(au: UTF8String, bu: UTF8String): Int = {
    val a = au.toString
    val b = bu.toString
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is (n+2) x (m+2) with a sentinel border row/col of `inf`
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val last = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = { val v = last.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue() }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        var best = d(i)(j) + cost // substitution / match
        val ins = d(i + 1)(j) + 1
        if (ins < best) best = ins
        val del = d(i)(j + 1) + 1
        if (del < best) best = del
        val tr = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        if (tr < best) best = tr
        d(i + 1)(j + 1) = best
        j += 1
      }
      last.put(a.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  /** Jaro-Winkler similarity (char-level), DuckDB-compatible constants:
    * empty input -> 0.0, boost threshold 0.7, prefix scale 0.1, max
    * prefix 4.
    */
  def jaroWinkler(au: UTF8String, bu: UTF8String): Double = {
    val a = au.toString
    val b = bu.toString
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val aMatched = new Array[Boolean](n)
    val bMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars compared in order
    var transpositions = 0
    var bi = 0
    i = 0
    while (i < n) {
      if (aMatched(i)) {
        while (!bMatched(bi)) bi += 1
        if (a.charAt(i) != b.charAt(bi)) transpositions += 1
        bi += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    // transpositions are halved with INTEGER division (an odd mismatch
    // count floors) — the convention DuckDB/jellyfish/commons-text share;
    // fractional halving diverges on e.g. "red widget"/"new widget"
    val jaro = (mm / n + mm / m + (mm - transpositions / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(n, m)) &&
        a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** damerau_levenshtein(a, b) — unrestricted Damerau-Levenshtein edit
  * distance. Integer-exact, so oracle hash-comparison needs no rounding.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "dam_lev"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistance.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringDistance.damerauLevenshtein($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

/** jaro_winkler(a, b) — Jaro-Winkler similarity in [0, 1]. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistance.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringDistance.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the string-distance kernels. */
object stringdistances {
  def dam_lev(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
