package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.vectors._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2.11 [EXT]).
  *
  *  - q25: brute-force exact cosine top-k — the correctness baseline.
  *    Query set broadcasts against the corpus; per-query top-k via
  *    window. At 100 TB the corpus side stays partitioned and only the
  *    (small) query set is replicated — this shape scales to any corpus
  *    size, it is the k·|Q| per-partition heap that matters.
  *  - sim_ann_lsh: random-hyperplane LSH variant — the scale path. Each
  *    vector gets a B-bit bucket signature (sign of dot with B fixed
  *    pseudo-random planes); candidates are corpus vectors in any of the
  *    query's multi-probe buckets (hamming ≤ h flips of its own bucket),
  *    ranked by exact cosine. B and h are parameters with the scaling
  *    law documented on annLsh. Approximate recall → no SQL oracle
  *    (driver records rows-only); AnnSpec sweeps B × h, pins the default
  *    setting's recall ≥ 0.6 vs q25 (this corpus's "neighbors" sit at
  *    cosine ≈ 0.4, i.e. ~65°, so per-plane agreement is only ~0.64 —
  *    recall is bounded by the data's geometry, not the implementation).
  */
object SimilarityQueries {

  private val K = 10
  private val NumQueries = 20

  /** LSH defaults for the driver's sim_ann_lsh entry — the best sweep
    * setting at this corpus scale (500 vectors): AnnSpec sweeps
    * planes × probe radius and pins this one's recall.
    */
  private val NumPlanes = 4
  private val ProbeHamming = 2

  /** Fixed pseudo-random ±1 hyperplanes, seeded — deterministic across
    * runs and engines (seed 42, dim 64).
    */
  private def planes(dim: Int, numPlanes: Int): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numPlanes)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f))
  }

  private def bucketCol(emb: Column, dim: Int, numPlanes: Int): Column =
    planes(dim, numPlanes).zipWithIndex.map { case (p, i) =>
      when(vec_dot(emb, typedlit(p.toSeq)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Random-hyperplane LSH ANN, parameterized by plane count and
    * multi-probe radius.
    *
    * Scaling law (how to pick `numPlanes` as the corpus grows): expected
    * bucket population is n / 2^numPlanes, so plane count must grow as
    * log₂(n / targetBucketSize) — at n = 500 (this test corpus) 4 planes
    * give ~31 vectors/bucket; at n = 10⁹ the same bucket size needs ~25
    * planes. Recall: two vectors at angle θ agree on one plane with
    * probability 1 − θ/π, land in the same bucket with (1 − θ/π)^B, and
    * hamming-h probing adds the binomial tail Σ_{i≤h} C(B,i)·p^(B−i)·
    * (1−p)^i — so as B grows, raise `probeHamming` (candidates probed:
    * Σ_{i≤h} C(B,i) buckets) to hold recall. Candidate work per query is
    * (buckets probed) × (bucket population): the knobs trade recall
    * against exactly that product.
    *
    * Join shape: corpus stays partitioned; only the (tiny) exploded
    * query×probe side broadcasts. Each candidate's bucket matches at most
    * one probe mask (masks are distinct), so no dedup shuffle is needed
    * between the join and the top-k window.
    */
  private[graft] def annLsh(e: DataFrame, numPlanes: Int, probeHamming: Int,
      numQueries: Int = NumQueries, k: Int = K): DataFrame = {
    val dim = 64
    val withBucket =
      e.withColumn("bucket", bucketCol(col("embedding"), dim, numPlanes))
    val masks = (0 until (1 << numPlanes))
      .filter(m => Integer.bitCount(m) <= probeHamming)
    val q = withBucket.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        explode(array(masks.map(m =>
          col("bucket").bitwiseXOR(lit(m))): _*)).as("qb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    withBucket.join(broadcast(q),
        col("bucket") === col("qb") && col("vec_id") =!= col("q_id"))
      .withColumn("sim", vec_cosine(col("qe"), col("embedding")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rk"),
        round(col("sim"), 6).as("sim"))
  }

  /** Per-centroid (sim, idx) struct array for argmax assignment. */
  private def simArray(cents: Array[Array[Float]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      struct(vec_cosine(col("embedding"), typedlit(c.toSeq)).as("sim"),
        lit(i).as("idx"))
    }: _*)

  /** Deterministic k-means-lite coarse quantizer shared by sim_ann_ivf
    * and dedup_semantic: seeds = lowest vec_ids, `iters` Lloyd rounds as
    * Spark jobs (assign = argmax cosine against broadcast centroid
    * literals; update = per-dimension mean via posexplode+groupBy). The
    * returned centroids are KB-scale driver metadata — the standard IVF
    * shape; the corpus itself never leaves the executors.
    */
  private[graft] def trainCentroids(e: DataFrame, c: Int, iters: Int)
      : Array[Array[Float]] = {
    var centroids: Array[Array[Float]] = e.filter(col("vec_id") < c)
      .orderBy(col("vec_id")).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    (1 to iters).foreach { _ =>
      val assigned = e.withColumn("sims", simArray(centroids))
        .withColumn("c", expr("array_max(sims).idx"))
        .select(col("c"), posexplode(col("embedding")))
      val means = assigned.groupBy(col("c"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("c"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> CAST(x.m AS FLOAT))")
          .as("centroid"))
        .collect().map(r => r.getInt(0) ->
          r.getAs[scala.collection.Seq[Float]]("centroid").toArray).toMap
      centroids = centroids.indices
        .map(i => means.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** Cluster assignment column (argmax cosine; ties break to the lower
    * centroid index via the struct ordering).
    */
  private[graft] def assignCluster(e: DataFrame,
      cents: Array[Array[Float]]): DataFrame =
    e.withColumn("sims", simArray(cents))
      .withColumn("c", expr("array_max(sims).idx")).drop("sims")

  /** SemDeDup-style semantic dedup [Abbas et al. '23, arXiv:2303.09540]:
    * k-means-cluster the embeddings with the shared quantizer, compare
    * pairs ONLY within a cluster, and drop the higher-id side of any
    * pair with exact cosine ≥ `thr`. Approximate by design — a dup pair
    * split across clusters is unseen (the quantizer quality is the
    * recall knob; precision is exact because the within-cluster cosine
    * is exact). Scale shape: the cluster id IS the shuffle key, per-
    * cluster work is (n/C)² — C grows with n to hold cluster size
    * constant, exactly the SemDeDup recipe at 100 TB. Output: one row
    * per dropped vector with its lowest-id duplicate and best sim.
    */
  private[graft] def semanticDedup(e: DataFrame, c: Int, thr: Double)
      : DataFrame = {
    val indexed = assignCluster(e, trainCentroids(e, c, 2))
    val a = indexed.select(col("c"), col("vec_id").as("id_a"),
      col("embedding").as("ea"))
    val b = indexed.select(col("c"), col("vec_id").as("id_b"),
      col("embedding").as("eb"))
    a.join(b, Seq("c"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", vec_cosine(col("ea"), col("eb")))
      .filter(col("sim") >= thr)
      .groupBy(col("id_b"))
      .agg(min(col("id_a")).as("dup_of"),
        round(max(col("sim")), 6).as("max_sim"))
      .select(col("id_b").as("vec_id"), col("dup_of"), col("max_sim"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = centroidQueries ++ Map(
    // Exact brute-force cosine top-k for the first NumQueries vectors.
    "q25_ann_topk" -> ((s, d) => {
      val e = Tables(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("sim", vec_cosine(col("qe"), col("embedding")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= K)
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rk"),
          round(col("sim"), 6).as("sim"))
    }),

    // IVF ANN: inverted-file index with a k-means-lite coarse quantizer.
    // Deterministic: seeds = lowest vec_ids, 2 Lloyd iterations computed
    // as Spark jobs (assign = argmax cosine against broadcast centroid
    // literals; update = per-dimension mean via posexplode+groupBy).
    // Query probes its `Probes` nearest centroids and ranks only those
    // clusters' vectors by exact cosine — at 100 TB the corpus stays
    // partitioned by cluster and only centroids (a few KB) move.
    "sim_ann_ivf" -> ((s, d) => {
      val C = 16; val Probes = 4; val LloydIters = 2
      val e = Tables(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val centroids = trainCentroids(e, C, LloydIters)
      val indexed = assignCluster(e, centroids)
      // query side: top-`Probes` centroids per query vector
      val q = indexed.filter(col("vec_id") < NumQueries)
        .withColumn("sims", simArray(centroids))
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          explode(expr(
            s"transform(slice(reverse(array_sort(sims)), 1, $Probes), x -> x.idx)"))
            .as("probe"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      indexed.join(broadcast(q),
          col("c") === col("probe") && col("vec_id") =!= col("q_id"))
        .withColumn("sim", vec_cosine(col("qe"), col("embedding")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= K)
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rk"),
          round(col("sim"), 6).as("sim"))
    }),

    // SemDeDup semantic dedup over the embedding corpus — cluster with
    // the shared quantizer, exact cosine within clusters only, drop the
    // higher id of each ≥ 0.4 pair (0.4 matches q24's exact all-pairs
    // threshold, so AnnSpec can pin precision/recall against it).
    "dedup_semantic" -> ((s, d) => semanticDedup(
      Tables(s, d, "embeddings").select(col("vec_id"), col("embedding")),
      c = 16, thr = 0.4)),

    // LSH-bucketed ANN: exact cosine only within the query's probed
    // buckets — see annLsh for the plane-count/probe-radius scaling law.
    "sim_ann_lsh" -> ((s, d) =>
      annLsh(Tables(s, d, "embeddings").select(col("vec_id"), col("embedding")),
        NumPlanes, ProbeHamming))
  )

  private def cosSql(a: String, b: String): String =
    s"""(list_sum([CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)
       |           FOR i IN range(1, len($a.embedding) + 1)])
       | / (sqrt(list_sum([CAST($a.embedding[i] AS DOUBLE) * CAST($a.embedding[i] AS DOUBLE)
       |                   FOR i IN range(1, len($a.embedding) + 1)]))
       |  * sqrt(list_sum([CAST($b.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)
       |                   FOR i IN range(1, len($b.embedding) + 1)]))))""".stripMargin

  /** Per-label centroid, exploded to (label, dim): the cluster-centroid
    * primitive behind IVF training — one shuffle on (label, dim) with
    * partial sums, no vectors collected anywhere. Decimal sums keep the
    * reduction order-independent, so the result is hash-comparable.
    */
  def centroidQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_centroids" -> ((s, d) =>
      graft.Tables(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(round(sum(col("col").cast("decimal(20,8)")).cast("double")
            / count(lit(1)), 6).as("c"),
          count(lit(1)).as("n")))
  )

  def oracle: Map[String, String] = Map(
    "q51_centroids" ->
      """SELECT label, CAST(gs - 1 AS INTEGER) AS pos,
        | round(CAST(SUM(CAST(e AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*), 6)
        |   AS c,
        | COUNT(*) AS n
        |FROM (SELECT label, unnest(embedding) AS e,
        |        generate_subscripts(embedding, 1) AS gs
        |      FROM embeddings)
        |GROUP BY label, gs""".stripMargin,
    "q25_ann_topk" ->
      s"""SELECT q_id, neighbor_id, CAST(rk AS INTEGER) AS rk,
         | round(sim, 6) AS sim
         |FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
         |    ${cosSql("q", "e")} AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${cosSql("q", "e")} DESC, e.vec_id) AS rk
         |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |  WHERE q.vec_id < $NumQueries)
         |WHERE rk <= $K""".stripMargin
  )
}
