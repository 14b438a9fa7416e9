package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Matrix-shaped analytics over columns and embeddings:
  *
  *  - q126 correlation matrix: pairwise Pearson over lineitem's four
  *    measures, ALL moments (4 sums, 4 sums-of-squares, 6 cross sums)
  *    in ONE aggregation pass — the data-profiling staple. Sums run
  *    through the 128-bit integer accumulator (Sum128 — the inputs are
  *    exact 2-dp values, so the scaled-long sum equals the decimal-sum
  *    discipline bit for bit, at long-sum speed) and the Pearson
  *    formula runs in double on those exact sums, rounded to 6 dp:
  *    bit-identical cross-engine, hash-comparable.
  *  - q127 per-group OLS: slope/intercept/r² from the same exact
  *    Sum128 moment pass, grouped — the regression counterpart of q126 (and
  *    the hash-safe alternative to engine-native `regr_*`, whose
  *    float accumulation order differs per engine).
  *  - sim_pca: distributed PCA over the embedding corpus. The cluster
  *    computes the mean vector and the 64×64 covariance (explode to
  *    (i, j, product) with map-side partial aggregation — shuffle
  *    volume is partitions × 4096 regardless of corpus size); the
  *    eigendecomposition runs on the DRIVER via cyclic Jacobi (a 64×64
  *    symmetric matrix is KB metadata — the IVF-centroid class), and
  *    the projection onto the top components is a narrow expression
  *    pass with the eigenvectors as literals. Iterative + float →
  *    rows-only; MatrixSpec pins orthonormality, descending
  *    eigenvalues, variance capture, and per-component projected
  *    variance == eigenvalue.
  */
object MatrixOps {

  /** q126 columns. */
  private val CorrCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Pairwise Pearson over `cols` in ONE pass: per column Σx and Σx²,
    * per pair Σxy; corr assembled in double from the exact sums. The
    * moments run through [[graft.functions.Sum128]] (128-bit integer
    * accumulation of the 2-dp-exact measures) — bit-identical to the
    * decimal-sum form this replaced, at long-sum speed (the 14-moment
    * pass measured 3.9 s decimal vs 0.6 s here at sf0.1; non-compact
    * decimal buffers re-serialize per row).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    def s(c: String) = graft.functions.Sum128.sumExact(col(c), 2)
    def sxx(c: String) =
      graft.functions.Sum128.sumExactProduct(col(c), col(c), 2)
    def sxy(a: String, b: String) =
      graft.functions.Sum128.sumExactProduct(col(a), col(b), 2)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs: Seq[Column] =
      cols.map(c => s(c).as(s"s_$c")) ++
        cols.map(c => sxx(c).as(s"ss_$c")) ++
        pairs.map { case (a, b) => sxy(a, b).as(s"sp_${a}_$b") }
    val m = df.agg(count(lit(1)).as("n"), aggs: _*)
    val rows = pairs.map { case (a, b) =>
      val n = col("n").cast("double")
      val num = n * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")
      val den = sqrt((n * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")) *
        (n * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        round(num / den, 6).as("corr"))
    }
    m.select(col("n"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        col("p.corr").as("corr"), col("n"))
  }

  /** Mean vector + covariance of the embedding corpus, computed
    * distributed; returned as driver-side metadata (64 + 64×64 doubles).
    */
  private[graft] def meanAndCovariance(e: DataFrame, dim: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val n = e.count().toDouble
    val mean = e.select(posexplode(col("embedding")))
      .groupBy("pos").agg(sum(col("col").cast("double")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1) / n).toMap
    val mu = Array.tabulate(dim)(mean)
    val muLit = typedlit(mu.toSeq)
    // centered outer product, exploded to (i, j, prod): map-side partial
    // aggregation folds each partition to ≤ dim² rows before the shuffle
    val cov = e.withColumn("muv", muLit)
      .select(expr("transform(embedding, (x, i) -> " +
        "cast(x as double) - element_at(muv, i + 1))").as("xc"))
      .select(posexplode(col("xc")).as(Seq("i", "xi")), col("xc"))
      .select(col("i"), posexplode(expr("transform(xc, y -> y * xi)"))
        .as(Seq("j", "p")))
      .groupBy(col("i"), col("j")).agg(sum(col("p")).as("s"))
      .collect()
    val c = Array.fill(dim, dim)(0.0)
    cov.foreach(r => c(r.getInt(0))(r.getInt(1)) =
      r.getDouble(2) / (n - 1))
    (mu, c)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix [Golub &
    * Van Loan §8.5] — O(dim³) per sweep on the driver; 64×64 converges
    * in a handful of sweeps. Returns (eigenvalues, eigenvectors as
    * rows), sorted by descending eigenvalue.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 50 && off > 1e-12) {
      off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-14) {
          val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
              case x => x
            }
          val cth = 1 / math.sqrt(t * t + 1); val sth = t * cth
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = cth * akp - sth * akq
            a(k)(q) = sth * akp + cth * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = cth * apk - sth * aqk
            a(q)(k) = sth * apk + cth * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = cth * vkp - sth * vkq
            v(k)(q) = sth * vkp + cth * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until n).map(k => v(k)(i)).toArray).toArray)
  }

  /** q127: per-group simple OLS (y ~ x) assembled from the SAME
    * decimal-exact moment pass as the correlation matrix — slope,
    * intercept, and r² from {n, Σx, Σy, Σx², Σy², Σxy} per group. The
    * moments are exact decimals, the closed-form assembly runs in
    * double on identical values in both engines, rounded to 6 dp:
    * hash-comparable, unlike engine-native `regr_slope` whose internal
    * float accumulation order differs per engine.
    */
  def linReg(df: DataFrame, y: String, x: String, by: String): DataFrame = {
    import graft.functions.Sum128.{sumExact, sumExactProduct}
    val g = df.groupBy(col(by)).agg(
      count(lit(1)).cast("double").as("n"),
      sumExact(col(x), 2).as("sx"), sumExact(col(y), 2).as("sy"),
      sumExactProduct(col(x), col(x), 2).as("sxx"),
      sumExactProduct(col(y), col(y), 2).as("syy"),
      sumExactProduct(col(x), col(y), 2).as("sxy"))
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val sxx = col("sxx"); val syy = col("syy"); val sxy = col("sxy")
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val slope = num / denx
    g.select(col(by), n.cast("long").as("n"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / n, 6).as("intercept"),
      round((num * num) / (denx * deny), 6).as("r2"))
  }

  /** PCA projection: (vec_id, pc array of `k` scores) — the narrow
    * expression pass over eigenvector literals.
    */
  def pcaProject(e: DataFrame, k: Int = 8, dim: Int = 64): DataFrame = {
    val (mu, cov) = meanAndCovariance(e, dim)
    val (_, vecs) = jacobiEigen(cov)
    val muLit = typedlit(mu.toSeq)
    val comps = (0 until k).map(i =>
      round(vec_dot_d(expr("transform(embedding, (x, i) -> " +
        "cast(x as double) - element_at(mu_v, i + 1))"),
        typedlit(vecs(i).toSeq)), 6))
    e.withColumn("mu_v", muLit)
      .select(col("vec_id") +: comps.zipWithIndex.map { case (c, i) =>
        c.as(s"pc${i + 1}") }: _*)
  }

  /** Double-precision dot product over array<double> columns via
    * zip_with + aggregate (element order fixed → deterministic).
    */
  private def vec_dot_d(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_corr_matrix" -> ((s, d) =>
      corrMatrix(Tables(s, d, "lineitem"), CorrCols)),
    "sim_pca" -> ((s, d) =>
      pcaProject(Tables(s, d, "embeddings")
        .select(col("vec_id"), col("embedding")))),
    "q127_linreg" -> ((s, d) =>
      linReg(Tables(s, d, "lineitem"),
        y = "l_extendedprice", x = "l_quantity", by = "l_returnflag"))
  )

  def oracle: Map[String, String] = Map(
    "q126_corr_matrix" -> {
      val cols = CorrCols
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield (cols(i), cols(j))
      val moments =
        cols.map(c => s"CAST(SUM(CAST($c AS DECIMAL(38,8))) AS DOUBLE)" +
          s" AS s_$c") ++
          cols.map(c => s"CAST(SUM(CAST($c * $c AS DECIMAL(38,8)))" +
            s" AS DOUBLE) AS ss_$c") ++
          pairs.map { case (a, b) =>
            s"CAST(SUM(CAST($a * $b AS DECIMAL(38,8))) AS DOUBLE)" +
              s" AS sp_${a}_$b" }
      val selects = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           |  round((n * sp_${a}_$b - s_$a * s_$b) /
           |    sqrt((n * ss_$a - s_$a * s_$a) *
           |         (n * ss_$b - s_$b * s_$b)), 6) AS corr,
           |  CAST(n0 AS BIGINT) AS n FROM m""".stripMargin }
      s"""WITH m AS (SELECT COUNT(*) AS n0, CAST(COUNT(*) AS DOUBLE) AS n,
         |  ${moments.mkString(",\n  ")}
         |  FROM lineitem)
         |${selects.mkString("\nUNION ALL\n")}""".stripMargin
    },
    "q127_linreg" ->
      """WITH m AS (SELECT l_returnflag,
        |  CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8)))
        |    AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice * l_extendedprice
        |    AS DECIMAL(38,8))) AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8)))
        |    AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
        |    / n, 6) AS intercept,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM m""".stripMargin)
}
