package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-run preparation operators (SURVEY.md §2.11 [EXT]) — the passes
  * that sit between a curated corpus and the actual training job, plus the
  * skew/entity-resolution diagnostics a pipeline operator runs before
  * scheduling one:
  *
  *  - q87 key-skew profile: per-key share + cumulative share of the top
  *    hot keys — the "is this shuffle key safe" diagnostic run before any
  *    large groupBy/join (its output is what decides salting vs AQE skew
  *    handling). The per-key aggregation is the only corpus-sized shuffle;
  *    the total is a driver scalar (parquet metadata count, the IVF-
  *    centroid pattern) and the ranking windows run over the top-20 rows.
  *  - q88 epoch shuffle: the deterministic global permutation that fixes
  *    a training run's data order — ORDER BY md5(id ‖ seed). md5 is the
  *    one hash both engines share, and a keyed hash is the standard
  *    reshuffle-per-epoch trick (new seed ⇒ new permutation, no state).
  *    Sort+limit plans as TakeOrderedAndProject: no global sort at scale;
  *    the row_number window runs over the already-cut 100 rows.
  *  - q89 temperature-scaled mixing weights [GPT-3 / multilingual-T5
  *    recipe]: p_i ∝ (n_i/N)^α with α = 0.7 flattens the language mix so
  *    low-resource languages are upsampled. All arithmetic happens on the
  *    language histogram (bounded rows), windows included — the corpus
  *    contributes one aggregation.
  *  - q91 fuzzy join (edit-distance ≤ 1) via deletion-neighborhood
  *    candidates [FastSS, Bocek et al. '07]: a string's candidate keys are
  *    itself plus every single-character deletion; two strings within one
  *    edit share at least one key (substitution ⇒ same deletion at the
  *    edited position; insert/delete ⇒ the shorter string IS a deletion of
  *    the longer). The equi-join on keys replaces the quadratic all-pairs
  *    compare — candidates are verified with exact levenshtein, so false
  *    candidates (e.g. transpositions at distance 2) drop out and the
  *    result is exact. Linear in corpus size × (name length + 1); bucket
  *    population is bounded by the near-duplicate density, the same
  *    candidates-then-verify shape as MinHash-LSH. The entity set is
  *    capped at a fixed watchlist (custkey < 2000) so the all-pairs
  *    DuckDB oracle stays feasible; the Spark shape needs no cap.
  *
  * All four are oracle-checked (hash-compared against DuckDB).
  */
object TrainingOps {

  /** q87: how many hot keys to profile. */
  private val TopKeys = 20

  /** q88: epoch seed (a new seed is a new permutation) and sample cut. */
  private val EpochSeed = 42
  private val HeadRows = 100

  /** q89: mixing temperature α — 1 = proportional, 0 = uniform. */
  private val Alpha = 0.7

  /** q89: document budget the expected-count column allocates. */
  private val Budget = 100000L

  /** q91: entity-set cap (keeps the quadratic oracle feasible). */
  private val FuzzyCap = 2000

  /** Deletion-neighborhood fuzzy self-join: exact edit-distance ≤ 1 pairs
    * among `names` (columns id, name), id_a < id_b. Candidate keys =
    * the name plus each single-character deletion; exact levenshtein
    * verify after the equi-join.
    */
  private[graft] def fuzzyPairs(names: DataFrame): DataFrame = {
    // the empty string contributes only its identity key: Spark's
    // sequence(0, -1) is the DESCENDING array [0, -1], not empty, so an
    // unguarded transform would mint bogus deletion keys for "" that the
    // all-pairs oracle never produces
    val keyed = names.select(col("id"), col("name"),
      explode(concat(array(col("name")), expr(
        "case when length(name) > 0 then" +
          " transform(sequence(0, length(name) - 1)," +
          " i -> concat(substring(name, 1, i), substring(name, i + 2)))" +
          " else array() end")))
        .as("key"))
    val a = keyed.select(col("id").as("id_a"), col("name").as("name_a"),
      col("key"))
    val b = keyed.select(col("id").as("id_b"), col("name").as("name_b"),
      col("key"))
    a.join(b, Seq("key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(col("name_a"), col("name_b"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q181 per-user ML feature assembly (the feature-store build pass):
    // event counts, active days, decimal-exact value moments, per-type
    // pivot counts, and recency against the dataset horizon — ONE
    // grouped pass over the corpus plus a 1-row horizon broadcast.
    // Wide-row output, one row per user; every derived double divides
    // decimal sums.
    "q181_feature_matrix" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val mx = ev.agg(max(date_trunc("day", col("ts"))).as("horizon"))
      def typeCount(t: String) =
        sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(date_trunc("day", col("ts"))).as("n_active_days"),
          sum(col("value").cast("decimal(18,4)")).as("sv"),
          max(date_trunc("day", col("ts"))).as("last_day"),
          typeCount("click"), typeCount("view"), typeCount("purchase"),
          typeCount("error"), typeCount("signup"))
        .crossJoin(broadcast(mx))
        .select(col("user_id"), col("n_events"), col("n_active_days"),
          round(col("sv").cast("double") / col("n_events"), 6)
            .as("mean_value"),
          datediff(col("horizon"), col("last_day")).as("recency_days"),
          col("n_click"), col("n_view"), col("n_purchase"),
          col("n_error"), col("n_signup"))
    }),

    // Key-skew profile over lineitem's supplier key: the shuffle-safety
    // diagnostic. One corpus-sized aggregation; everything after runs on
    // TopKeys rows.
    "q87_skew_profile" -> ((s, d) => {
      val li = Tables(s, d, "lineitem").select(col("l_suppkey"))
      // one scalar to the driver — a 1-row cross-join would plan BNLJ
      val total = li.count().toDouble
      val byKey = li.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_suppkey"))
        .limit(TopKeys)
      val w = Window.orderBy(col("cnt").desc, col("l_suppkey"))
      byKey
        .withColumn("rank", row_number().over(w))
        .withColumn("share", round(col("cnt") / lit(total), 6))
        .withColumn("cum_share", round(
          sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)) / lit(total), 6))
    }),

    // Deterministic epoch shuffle: first HeadRows docs of the seed-42
    // permutation. TakeOrderedAndProject at any scale; the position
    // window sees only the cut rows.
    "q88_epoch_shuffle" -> ((s, d) => {
      val h = md5(concat(col("doc_id").cast("string"), lit(s":$EpochSeed")))
      Tables(s, d, "documents")
        .select(col("doc_id"), h.as("h"))
        .orderBy(col("h"))
        .limit(HeadRows)
        .select(row_number().over(Window.orderBy(col("h"))).as("position"),
          col("doc_id"))
    }),

    // Temperature-scaled language-mix weights: the corpus contributes one
    // groupBy(lang); the power/normalize windows run on the (bounded)
    // language histogram.
    "q89_temperature_mix" -> ((s, d) => {
      val byLang = Tables(s, d, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val all = Window.partitionBy()
      byLang
        .withColumn("w", pow(col("n_docs") / sum(col("n_docs")).over(all),
          lit(Alpha)))
        .withColumn("p", round(col("w") / sum(col("w")).over(all), 6))
        .withColumn("expected_docs",
          round(col("w") / sum(col("w")).over(all) * lit(Budget.toDouble))
            .cast("long"))
        .select(col("lang"), col("n_docs"), col("p"), col("expected_docs"))
    }),

    // Edit-distance-1 entity resolution over the customer watchlist.
    "q91_fuzzy_join" -> ((s, d) => fuzzyPairs(
      Tables(s, d, "customer")
        .filter(col("c_custkey") < FuzzyCap)
        .select(col("c_custkey").as("id"), col("c_name").as("name")))),

    // Train/val/test split with a cross-split contamination audit — the
    // eval-hygiene gate of a training pipeline: a deterministic md5
    // split (50/25/25 on the first hex digit, stable under
    // repartitioning like q50), then per split the count of documents
    // whose exact text also appears in a DIFFERENT split (such leakage
    // inflates eval scores). One content-hash aggregation + one
    // co-partitioned join back on the hash — the q20 exact-dedup shuffle
    // shape, so it scales the same way.
    "q145_split_leakage" -> ((s, d) => {
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"),
          when(h < "8", "train").when(h < "c", "val").otherwise("test")
            .as("split"),
          sha2(col("text"), 256).as("fp"))
      val spread = docs.groupBy(col("fp"))
        .agg(countDistinct(col("split")).as("n_splits"))
      docs.join(spread, "fp")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("n_splits") > 1, 1)).as("n_leaked"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q181_feature_matrix" ->
      """WITH mx AS (SELECT max(date_trunc('day', ts)) AS horizon
        |  FROM events),
        |g AS (SELECT user_id, COUNT(*) AS n_events,
        |  COUNT(DISTINCT date_trunc('day', ts)) AS n_active_days,
        |  SUM(CAST(value AS DECIMAL(18,4))) AS sv,
        |  max(date_trunc('day', ts)) AS last_day,
        |  COUNT(*) FILTER (event_type = 'click') AS n_click,
        |  COUNT(*) FILTER (event_type = 'view') AS n_view,
        |  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  COUNT(*) FILTER (event_type = 'error') AS n_error,
        |  COUNT(*) FILTER (event_type = 'signup') AS n_signup
        | FROM events GROUP BY user_id)
        |SELECT user_id, n_events, CAST(n_active_days AS BIGINT)
        |    AS n_active_days,
        |  round(CAST(sv AS DOUBLE) / n_events, 6) AS mean_value,
        |  CAST(date_diff('day', last_day, horizon) AS INTEGER)
        |    AS recency_days,
        |  CAST(n_click AS BIGINT) AS n_click,
        |  CAST(n_view AS BIGINT) AS n_view,
        |  CAST(n_purchase AS BIGINT) AS n_purchase,
        |  CAST(n_error AS BIGINT) AS n_error,
        |  CAST(n_signup AS BIGINT) AS n_signup
        |FROM g, mx""".stripMargin,
    "q145_split_leakage" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
        |         THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
        |         THEN 'val'
        |       ELSE 'test' END AS split,
        |  sha256(text) AS fp FROM documents),
        |g AS (SELECT fp, COUNT(DISTINCT split) AS n_splits
        |      FROM d GROUP BY fp)
        |SELECT split, COUNT(*) AS n_docs,
        |  COUNT(*) FILTER (g.n_splits > 1) AS n_leaked
        |FROM d JOIN g USING (fp) GROUP BY split""".stripMargin,
    "q87_skew_profile" ->
      s"""WITH c AS (SELECT l_suppkey, count(*) AS cnt
         |           FROM lineitem GROUP BY l_suppkey),
         |t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
         |top AS (SELECT l_suppkey, cnt FROM c
         |        ORDER BY cnt DESC, l_suppkey LIMIT $TopKeys)
         |SELECT l_suppkey, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(row_number() OVER o AS INTEGER) AS rank,
         |  round(cnt / t.total, 6) AS share,
         |  round(sum(cnt) OVER (ORDER BY cnt DESC, l_suppkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t.total, 6)
         |    AS cum_share
         |FROM top, t
         |WINDOW o AS (ORDER BY cnt DESC, l_suppkey)""".stripMargin,
    "q88_epoch_shuffle" ->
      s"""SELECT CAST(row_number() OVER
         |    (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':$EpochSeed'))
         |    AS INTEGER) AS position,
         |  doc_id
         |FROM documents
         |ORDER BY md5(CAST(doc_id AS VARCHAR) || ':$EpochSeed')
         |LIMIT $HeadRows""".stripMargin,
    "q89_temperature_mix" ->
      s"""WITH h AS (SELECT lang, count(*) AS n_docs
         |           FROM documents GROUP BY lang),
         |w AS (SELECT lang, n_docs,
         |        power(n_docs / (SELECT CAST(sum(n_docs) AS DOUBLE) FROM h),
         |              $Alpha) AS w
         |      FROM h)
         |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
         |  round(w / (SELECT sum(w) FROM w), 6) AS p,
         |  CAST(round(w / (SELECT sum(w) FROM w) * $Budget) AS BIGINT)
         |    AS expected_docs
         |FROM w""".stripMargin,
    "q91_fuzzy_join" ->
      s"""SELECT a.c_name AS name_a, b.c_name AS name_b
         |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         |WHERE a.c_custkey < $FuzzyCap AND b.c_custkey < $FuzzyCap
         |  AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin
  )
}
