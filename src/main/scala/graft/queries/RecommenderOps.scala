package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Item-item collaborative filtering (SURVEY.md §2.11 [EXT]) — the
  * "customers who bought X also bought Y" workload, historically THE
  * marquee MapReduce job [Linden et al., IEEE Internet Computing 2003]:
  *
  * q154: from the (customer, part) purchase relation, count co-purchase
  * pairs within each customer's basket, keep pairs with at least
  * MinSupport common buyers, score them with the co-occurrence cosine
  * n12 / sqrt(n1 * n2), and emit each item's top-K neighbors.
  *
  * Scale shape: the pair explode is bounded by basket size squared per
  * customer (never corpus x corpus) — the standard item-CF bound; the
  * support threshold prunes the long tail BEFORE the cosine join; item
  * popularity (n1) is a one-row-per-item aggregate joined twice; the
  * final top-K window partitions by item over support-surviving
  * candidates only. All counts are exact integers, the cosine is one
  * IEEE division rounded to 6 — hash-comparable cross-engine.
  */
object RecommenderOps {

  /** Minimum common-buyer count for a pair to score. */
  private val MinSupport = 3

  /** Neighbors kept per item. */
  private val TopK = 5

  /** Per-customer basket cap: at most this many parts per customer feed
    * the pair self-join, keeping the MOST RECENT purchases (tie → lower
    * part key). This bounds pair volume at C(cap, 2) per customer — the
    * standard item-CF trade [Linden et al. '03 §"Scalability"] — so one
    * whale basket can never explode quadratically into a single
    * co-partition. 128 exceeds every basket at the test SFs (max 105 at
    * sf0.1), so the driver oracle is the UNCAPPED semantics verbatim;
    * RecommenderSpec pins both sides of the trade (capped == uncapped
    * when no basket exceeds the cap; a crafted whale basket contributes
    * exactly C(cap, 2) pairs).
    */
  private[graft] val BasketCap = 128

  /** q182 candidate pool: the most-popular parts considered as
    * negatives (bounded by construction, broadcast).
    */
  private val PopPool = 50

  /** q182 negatives kept per customer. */
  private val NegK = 5

  /** q154 core over an explicit (cust, part, last) purchase relation —
    * factored out so RecommenderSpec can drive crafted baskets through
    * the EXACT shipped plan. `last` (latest purchase date per pair)
    * orders the basket-cap keep-list: most recent first, part ascending
    * as the deterministic tiebreak.
    */
  /** Broadcast the popularity table only below this many catalog items.
    * Popularity has one row per ITEM, linear in the catalog — an
    * unconditional broadcast is a driver hazard at 100×, while an
    * unconditional shuffle join re-evaluates the whole basket pipeline
    * twice more (measured 4.2 → 7.0 s at sf0.1 when the hint was
    * dropped outright). 4M rows ≈ tens of MB broadcast — safely inside
    * driver budgets; beyond it the shuffle join is the right plan.
    */
  private val BroadcastCatalogMax = 4L * 1000 * 1000

  private[graft] def alsoBoughtFrom(boughtWithDate: DataFrame,
      basketCap: Int = BasketCap,
      itemCatalogSize: Option[Long] = None): DataFrame = {
    // basket cap BEFORE the self-join: one row_number window on cust —
    // the same key the pair join shuffles on, so the exchange is shared
    val capW = Window.partitionBy(col("cust"))
      .orderBy(col("last").desc, col("part"))
    val bought = boughtWithDate
      .withColumn("__keep", row_number().over(capW))
      .filter(col("__keep") <= basketCap)
      .select(col("cust"), col("part"))
    // item popularity is a map-side-combined one-row-per-item count,
    // joined onto the support-filtered pair table. Measured EQUAL
    // to the previous window-count form at sf0.1 (5.9 vs 6.0 s — the
    // pair shuffle dominates both); chosen for the 100× shape: the
    // window form full-sorts the purchase relation by part, making a
    // hub item one giant sort group, while this count stays partial-
    // aggregated and the pair shuffle carries two fewer columns
    val popularity = bought.groupBy(col("part")).agg(count(lit(1)).as("n"))
    val pairs = bought.as("a").join(bought.as("b"),
        col("a.cust") === col("b.cust")
          && col("a.part") < col("b.part"))
      .groupBy(col("a.part").as("p1"), col("b.part").as("p2"))
      .agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= MinSupport)
    // SIZE-GATED broadcast on popularity: one row per ITEM, linear in
    // the catalog (TPC-H part grows with SF), so an unconditional hint
    // is a driver OOM at 100× — but an unconditional shuffle join makes
    // Spark re-derive the whole basket pipeline under two more
    // exchanges. The caller passes the catalog cardinality (a
    // metadata-cheap dimension count); below [[BroadcastCatalogMax]]
    // the hint is safe by construction, above it (or unknown) the plain
    // join lets AQE pick from runtime sizes
    val popSmall = itemCatalogSize.exists(_ <= BroadcastCatalogMax)
    def maybeBroadcast(df: DataFrame) =
      if (popSmall) broadcast(df) else df
    val scored = pairs
      .join(maybeBroadcast(popularity.select(col("part").as("p1"),
        col("n").as("n1"))), "p1")
      .join(maybeBroadcast(popularity.select(col("part").as("p2"),
        col("n").as("n2"))), "p2")
      .select(col("p1"), col("p2"), col("n12"),
        round(col("n12") / sqrt(col("n1") * col("n2")), 6).as("sim"))
    // both orientations so every item ranks its own neighbors
    val directed = scored.select(col("p1").as("item"),
        col("p2").as("neighbor"), col("n12"), col("sim"))
      .union(scored.select(col("p2"), col("p1"), col("n12"), col("sim")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("sim").desc, col("neighbor"))
    directed.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      // DuckDB's ROW_NUMBER is BIGINT, Spark's INT — align dtypes
      .select(col("item"), col("neighbor"), col("n12"), col("sim"),
        col("rk").cast("long").as("rk"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_also_bought" -> ((s, d) => {
      // groupBy (cust, part) with max(date) IS the old distinct, plus
      // the recency key the basket cap orders by — same one shuffle
      val bought = Tables(s, d, "lineitem")
        .join(Tables(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .agg(max(col("o_orderdate")).as("last"))
      // catalog cardinality from the dimension table: a column-pruned
      // parquet count (footer metadata), the cheap gate for the
      // popularity broadcast decision. Absent dimension table (crafted
      // spec corpora) → unknown → the ungated AQE path
      alsoBoughtFrom(bought, itemCatalogSize =
        scala.util.Try(Tables(s, d, "part").count()).toOption)
    }),

    // q182 negative sampling (contrastive training data for a
    // recommender): per customer, NegK deterministic non-purchased
    // items from the PopPool most-popular parts. The candidate pool is
    // bounded by construction (PopPool rows, broadcast), so the
    // customers × pool expansion is linear in customers — never
    // customers × catalog; membership removal is one anti-join against
    // the purchase relation, and the per-customer pick is the md5-rank
    // primitive (reproducible, no RNG state — the q50/q180 family).
    "q182_negative_sample" -> ((s, d) => {
      val bought = Tables(s, d, "lineitem")
        .join(Tables(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .distinct()
      val pool = bought.groupBy(col("part"))
        .agg(count(lit(1)).as("np"))
        .orderBy(col("np").desc, col("part")).limit(PopPool)
        .select(col("part").as("cand"))
      val custs = Tables(s, d, "customer").select(col("c_custkey"))
      val negatives = custs.crossJoin(broadcast(pool))
        .join(bought, col("c_custkey") === col("cust")
          && col("cand") === col("part"), "left_anti")
      negatives.withColumn("rn", row_number().over(
          Window.partitionBy(col("c_custkey")).orderBy(
            md5(concat_ws("_", col("c_custkey"), col("cand"))),
            col("cand"))))
        .filter(col("rn") <= NegK)
        .select(col("c_custkey"), col("cand").as("neg_part"),
          col("rn").cast("long").as("rn"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q182_negative_sample" ->
      s"""WITH bought AS (SELECT DISTINCT o_custkey AS cust,
         |    l_partkey AS part
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |pool AS (SELECT part AS cand FROM (
         |  SELECT part, COUNT(*) AS np FROM bought GROUP BY part
         |  ORDER BY np DESC, part LIMIT $PopPool) z),
         |neg AS (SELECT c_custkey, cand
         |  FROM customer CROSS JOIN pool
         |  WHERE NOT EXISTS (SELECT 1 FROM bought
         |    WHERE bought.cust = customer.c_custkey
         |      AND bought.part = pool.cand)),
         |r AS (SELECT c_custkey, cand,
         |  row_number() OVER (PARTITION BY c_custkey
         |    ORDER BY md5(CAST(c_custkey AS VARCHAR) || '_'
         |      || CAST(cand AS VARCHAR)), cand) AS rn
         | FROM neg)
         |SELECT c_custkey, cand AS neg_part, rn FROM r
         |WHERE rn <= $NegK""".stripMargin,
    "q154_also_bought" ->
      s"""WITH bought AS (SELECT DISTINCT o.o_custkey AS cust,
         |                  l.l_partkey AS part
         |                FROM lineitem l
         |                JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |pop AS (SELECT part, COUNT(*) AS n FROM bought GROUP BY part),
         |co AS (SELECT a.part AS p1, b.part AS p2, COUNT(*) AS n12
         |       FROM bought a JOIN bought b
         |         ON a.cust = b.cust AND a.part < b.part
         |       GROUP BY a.part, b.part
         |       HAVING COUNT(*) >= $MinSupport),
         |scored AS (SELECT co.p1, co.p2, co.n12,
         |    round(co.n12 / sqrt(CAST(x.n AS DOUBLE) * y.n), 6) AS sim
         |  FROM co JOIN pop x ON co.p1 = x.part
         |          JOIN pop y ON co.p2 = y.part),
         |directed AS (
         |  SELECT p1 AS item, p2 AS neighbor, n12, sim FROM scored
         |  UNION ALL
         |  SELECT p2, p1, n12, sim FROM scored),
         |ranked AS (SELECT item, neighbor, n12, sim,
         |    ROW_NUMBER() OVER (PARTITION BY item
         |      ORDER BY sim DESC, neighbor) AS rk
         |  FROM directed)
         |SELECT item, neighbor, n12, sim, CAST(rk AS BIGINT) AS rk
         |FROM ranked WHERE rk <= $TopK""".stripMargin
  )
}
