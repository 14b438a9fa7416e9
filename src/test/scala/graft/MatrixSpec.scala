package graft

import org.apache.spark.sql.functions._

import graft.queries.MatrixOps

class MatrixSpec extends SparkSpec {

  private lazy val e = Tables(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("jacobi eigensolver: known 2x2 and 3x3 spectra") {
    // [[2,1],[1,2]] → eigenvalues 3, 1
    val (v2, _) = MatrixOps.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(v2(0) - 3.0) < 1e-10 && math.abs(v2(1) - 1.0) < 1e-10)
    // diagonal matrix: eigenvalues are the diagonal, sorted desc
    val (v3, w3) = MatrixOps.jacobiEigen(
      Array(Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0),
        Array(0.0, 0.0, 3.0)))
    assert(v3.toSeq == Seq(5.0, 3.0, 1.0))
    // eigenvector of the top eigenvalue is ±e_1 (index of the 5)
    assert(math.abs(math.abs(w3(0)(1)) - 1.0) < 1e-10)
  }

  test("PCA: orthonormal components, descending variance, trace preserved") {
    val dim = 64
    val (_, cov) = MatrixOps.meanAndCovariance(e, dim)
    // covariance is symmetric
    for (i <- 0 until dim; j <- i + 1 until dim)
      assert(math.abs(cov(i)(j) - cov(j)(i)) < 1e-9)
    val (vals, vecs) = MatrixOps.jacobiEigen(cov)
    // descending, non-negative (PSD matrix)
    vals.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    assert(vals.last > -1e-9)
    // eigenvalue sum == trace (rotation preserves total variance)
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    assert(math.abs(vals.sum - trace) < 1e-8 * math.abs(trace))
    // components orthonormal
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- 0 until 8; j <- 0 until 8) {
      val d = dot(vecs(i), vecs(j))
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-8,
        s"vecs $i . $j = $d")
    }
  }

  test("PCA projection: per-component variance equals its eigenvalue") {
    val dim = 64
    val (_, cov) = MatrixOps.meanAndCovariance(e, dim)
    val (vals, _) = MatrixOps.jacobiEigen(cov)
    val proj = MatrixOps.pcaProject(e).collect()
    val n = proj.length.toDouble
    (1 to 3).foreach { c =>
      val xs = proj.map(_.getDouble(c))
      val mean = xs.sum / n
      val varc = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      // 6-dp rounding of scores puts a small floor on the comparison
      assert(math.abs(varc - vals(c - 1)) < 1e-4 + 1e-3 * vals(c - 1),
        s"pc$c variance $varc vs eigenvalue ${vals(c - 1)}")
    }
    // top-8 capture is a meaningful fraction and scores are bounded
    assert(vals.take(8).sum > 0)
  }
}
