package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Revenue-analytics operators (SURVEY.md §2.11 [EXT]) — the BI layer a
  * warehouse user runs daily, in the engine's decimal-exact discipline:
  *
  *  - q165 RFM segmentation: per-customer recency/frequency/monetary
  *    quintiles (ntile with a custkey tiebreak, so bucket assignment is
  *    deterministic in both engines). The ntile windows run over
  *    PER-CUSTOMER aggregates; at 100 TB the same scores come from
  *    two-pass quantile boundaries (the q56 histogram-threshold shape)
  *    or [[graft.operators.GlobalRank]] — documented trade, the
  *    driver-scale form keeps the exact window as the oracle gate.
  *  - q167 period-over-period: monthly revenue per region with MoM and
  *    YoY growth. Dims broadcast; the lag windows run over
  *    regions×months rows — bounded metadata.
  *  - q172 market concentration: per-nation Gini coefficient (discrete
  *    Lorenz form, 2Σi·xᵢ/(nΣx) − (n+1)/n over ascending ranks) and
  *    Herfindahl-Hirschman index (Σ share²). Rank windows partition by
  *    nation over customer aggregates; every sum that feeds the final
  *    IEEE division reduces decimally.
  */
object BusinessOps {

  private val dec = DecimalType(18, 4)

  /** Per-customer RFM base measures (recency days, frequency, monetary)
    * — shared by the q165 ntile form and its GlobalRank scale twin.
    */
  private def rfmBase(s: SparkSession, d: String): DataFrame = {
    val o = Tables(s, d, "orders")
    val mx = o.agg(max(date_trunc("day", col("o_orderdate"))).as("m"))
    o.groupBy(col("o_custkey"))
      .agg(max(date_trunc("day", col("o_orderdate"))).as("last_od"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("mon"))
      .crossJoin(broadcast(mx))
      .select(col("o_custkey"),
        datediff(col("m"), col("last_od")).as("rec"),
        col("freq"), col("mon"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_rfm" -> ((s, d) =>
      rfmBase(s, d).select(col("o_custkey"), col("rec"), col("freq"),
        round(col("mon"), 4).as("monetary"),
        ntile(5).over(Window.orderBy(col("rec").desc, col("o_custkey")))
          .as("r_score"),
        ntile(5).over(Window.orderBy(col("freq"), col("o_custkey")))
          .as("f_score"),
        ntile(5).over(Window.orderBy(col("mon"), col("o_custkey")))
          .as("m_score"))),

    // The 100 TB form of q165 — the documented GlobalRank trade, now
    // CODE: the three global ntile(5) windows (each a single-partition
    // sort over every customer) are replaced by three range-partitioned
    // GlobalRank passes plus a CLOSED-FORM ntile from the gap-free rank
    // (first n mod k buckets take ⌈n/k⌉ rows — Spark's exact ntile
    // sizing). Identical quintiles to q165 — same oracle SQL gates it,
    // and BusinessOpsSpec pins row-level equality — with no
    // whole-relation single-task window anywhere.
    "rfm_globalrank" -> ((s, d) => {
      // ONE materialization of the per-customer aggregate (the kCore
      // checkpoint discipline): every downstream consumer — the n
      // count, each rank's boundary count+sample, and the final joins
      // — reads the pinned 1-row-per-customer snapshot instead of
      // re-running the orders aggregation (11 evaluations measured
      // 4.4 s vs ~1 s). The pin is released below after the KB-scale
      // result is itself materialized.
      val base = rfmBase(s, d).localCheckpoint(true)
      val n = base.count() // per-customer row count — driver scalar
      def tile(rank: org.apache.spark.sql.Column) = {
        val k = 5
        val q = n / k
        val rem = n % k
        (if (rem == 0) floor((rank - 1) / lit(q.toDouble))
         else when(rank <= rem * (q + 1),
             floor((rank - 1) / lit((q + 1).toDouble)))
           .otherwise(lit(rem.toDouble)
             + floor((rank - rem * (q + 1) - 1) / lit(q.toDouble))))
          .cast("int") + 1
      }
      // three INDEPENDENT ranks joined back on the customer key —
      // nesting them instead (rank(rank(rank(base)))) compounds each
      // call's input evaluations multiplicatively (measured 10.6 s vs
      // ~2 s at sf0.1); each rank carries only (key, score column) and
      // the joins co-partition on o_custkey
      def rankOf(name: String, score: String, desc: Boolean) = {
        val key = if (desc) col(score).desc else col(score)
        // n is already counted above — skip the machinery's count job
        // (3 ranks × 1 job on the pinned base)
        graft.operators.GlobalRank.withRankN(
          base.select(col("o_custkey"), col(score)),
          name, Some(n), key, col("o_custkey"))
          .select(col("o_custkey"), col(name))
      }
      val ranked = base
        .join(rankOf("rrank", "rec", desc = true), "o_custkey")
        .join(rankOf("frank", "freq", desc = false), "o_custkey")
        .join(rankOf("mrank", "mon", desc = false), "o_custkey")
      val out = ranked.select(col("o_custkey"), col("rec"), col("freq"),
        round(col("mon"), 4).as("monetary"),
        tile(col("rrank")).as("r_score"),
        tile(col("frank")).as("f_score"),
        tile(col("mrank")).as("m_score"))
        .localCheckpoint(true) // one row per customer — KB-scale
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(base)
      out
    }),

    "q167_period_over_period" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables(s, d, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))
      val r = Tables(s, d, "region")
        .select(col("r_regionkey"), col("r_name"))
      val monthly = o
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"),
          date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum(col("o_totalprice").cast(dec)).as("revd"))
      val w = Window.partitionBy(col("r_name")).orderBy(col("month"))
      monthly
        .withColumn("prev_m", lag(col("revd"), 1).over(w))
        .withColumn("prev_y", lag(col("revd"), 12).over(w))
        .select(col("r_name"), col("month"),
          round(col("revd"), 4).cast("double").as("revenue"),
          round((col("revd") - col("prev_m")).cast("double")
            / col("prev_m"), 6).as("mom_pct"),
          round((col("revd") - col("prev_y")).cast("double")
            / col("prev_y"), 6).as("yoy_pct"))
    }),

    // q195 Shannon-entropy mix audit — the information-theoretic sibling
    // of q172's HHI, applied to the training-data question "how diverse
    // is each language's source mix?": per lang, H = −Σ p·ln p over its
    // source distribution, plus the evenness ratio H/ln k. Uses the
    // exact decomposition H = ln T − (Σ c·ln c)/T so the corpus-side
    // work is ONE grouped count to (lang, source) cells — bounded
    // metadata — and the per-term ln c is rounded to integer MICROS and
    // summed as Longs (the q189 discipline): both engines do identical
    // IEEE work and the oracle hash-compares. Single-source groups are
    // reported with entropy 0 and NULL evenness (ln 1 divides) in both
    // engines via the same CASE.
    "q195_entropy_mix" -> ((s, d) => {
      val cells = Tables(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("c"))
      cells.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sources"), sum(col("c")).as("t"),
          sum(col("c") * round(log(col("c")) * lit(1e6), 0).cast("long"))
            .as("hsum"))
        .select(col("lang"), col("n_sources"), col("t").as("n_docs"),
          round(log(col("t"))
            - col("hsum").cast("double") / col("t") / lit(1e6), 6)
            .as("entropy"),
          when(col("n_sources") > 1,
            round((log(col("t"))
              - col("hsum").cast("double") / col("t") / lit(1e6))
              / log(col("n_sources")), 6)).as("evenness"))
    }),

    "q172_concentration" -> ((s, d) => {
      val rev = Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(dec)).as("x"))
      val j = rev.join(broadcast(Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"), col("x"), col("o_custkey"))
      val ranked = j.withColumn("i", row_number().over(
        Window.partitionBy(col("nk")).orderBy(col("x"), col("o_custkey"))))
      concentrationFromRanks(ranked)
    }),

    // The 100 TB form of q172 — same oracle (identical ranks: the
    // (x, custkey) tiebreak is unique): PARTITION BY nationkey has ~25
    // values, so q172's rank window sorts customers/25 rows in ONE task
    // at scale — the coarse-group hazard the grouped global rank
    // removes (the rfm_globalrank / stats_*_rank discipline). The
    // per-customer aggregate is pinned (checkpoint discipline: the rank
    // machinery evaluates its input 4×, and this input carries a
    // join + aggregation); the Gini/HHI fold is unchanged and decimal-
    // exact, so the oracle hash carries over.
    "conc_globalrank" -> ((s, d) => {
      val rev = Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(dec)).as("x"))
      val j = rev.join(broadcast(Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"), col("x"), col("o_custkey"))
        .localCheckpoint(true)
      val ranked = graft.operators.GlobalRank.withRankInGroups(
        j, "i", col("nk"), col("x"), col("o_custkey"))
      val out = concentrationFromRanks(ranked)
        .localCheckpoint(true) // |nations| rows
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(j)
      out
    })
  )

  /** Shared q172 tail: Gini (discrete Lorenz, 2Σi·xᵢ/(nΣx) − (n+1)/n)
    * and HHI from decimal rank moments — ranks arrive as ints/longs
    * from either provider (PARTITION BY window or grouped global rank;
    * the unique (x, custkey) tiebreak makes them identical).
    */
  private def concentrationFromRanks(ranked: DataFrame): DataFrame =
    ranked.groupBy(col("nk"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("x") * col("i")).cast("double").as("sxi"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      .select(col("nk").as("nationkey"), col("n"),
        round(lit(2.0) * col("sxi") / (col("n") * col("sx"))
          - (col("n") + lit(1.0)) / col("n"), 6).as("gini"),
        round(col("sxx") / (col("sx") * col("sx")), 6).as("hhi"))

  def oracle: Map[String, String] = Map(
    "q195_entropy_mix" ->
      """WITH cells AS (SELECT lang, source, COUNT(*) AS c
        |  FROM documents GROUP BY lang, source),
        |g AS (SELECT lang, COUNT(*) AS n_sources, SUM(c) AS t,
        |    SUM(c * CAST(round(ln(c) * 1000000, 0) AS BIGINT)) AS hsum
        |  FROM cells GROUP BY lang)
        |SELECT lang, CAST(n_sources AS BIGINT) AS n_sources,
        |  CAST(t AS BIGINT) AS n_docs,
        |  round(ln(t) - CAST(hsum AS DOUBLE) / t / 1000000, 6) AS entropy,
        |  CASE WHEN n_sources > 1 THEN
        |    round((ln(t) - CAST(hsum AS DOUBLE) / t / 1000000)
        |      / ln(n_sources), 6) END AS evenness
        |FROM g""".stripMargin,
    "q165_rfm" ->
      """WITH mx AS (SELECT max(date_trunc('day', o_orderdate)) AS m
        |  FROM orders),
        |m AS (SELECT o_custkey,
        |   CAST(date_diff('day', max(date_trunc('day', o_orderdate)),
        |     max(mx.m)) AS INTEGER) AS rec,
        |   COUNT(*) AS freq,
        |   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS mon
        | FROM orders, mx GROUP BY o_custkey)
        |SELECT o_custkey, rec, freq, round(mon, 4) AS monetary,
        |  CAST(ntile(5) OVER (ORDER BY rec DESC, o_custkey) AS INTEGER)
        |    AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY freq, o_custkey) AS INTEGER)
        |    AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY mon, o_custkey) AS INTEGER)
        |    AS m_score
        |FROM m""".stripMargin,
    // the GlobalRank twin must land on exactly the ntile answer — gate
    // it with the SAME oracle text as q165
    "rfm_globalrank" ->
      """WITH mx AS (SELECT max(date_trunc('day', o_orderdate)) AS m
        |  FROM orders),
        |m AS (SELECT o_custkey,
        |   CAST(date_diff('day', max(date_trunc('day', o_orderdate)),
        |     max(mx.m)) AS INTEGER) AS rec,
        |   COUNT(*) AS freq,
        |   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS mon
        | FROM orders, mx GROUP BY o_custkey)
        |SELECT o_custkey, rec, freq, round(mon, 4) AS monetary,
        |  CAST(ntile(5) OVER (ORDER BY rec DESC, o_custkey) AS INTEGER)
        |    AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY freq, o_custkey) AS INTEGER)
        |    AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY mon, o_custkey) AS INTEGER)
        |    AS m_score
        |FROM m""".stripMargin,
    "q167_period_over_period" ->
      """WITH monthly AS (SELECT r_name,
        |    date_trunc('month', o_orderdate) AS month,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS revd
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, date_trunc('month', o_orderdate)),
        |w AS (SELECT r_name, month, revd,
        |  lag(revd, 1) OVER (PARTITION BY r_name ORDER BY month) AS prev_m,
        |  lag(revd, 12) OVER (PARTITION BY r_name ORDER BY month) AS prev_y
        | FROM monthly)
        |SELECT r_name, month,
        |  CAST(round(revd, 4) AS DOUBLE) AS revenue,
        |  round(CAST(revd - prev_m AS DOUBLE) / prev_m, 6) AS mom_pct,
        |  round(CAST(revd - prev_y AS DOUBLE) / prev_y, 6) AS yoy_pct
        |FROM w""".stripMargin,
    "q172_concentration" ->
      """WITH rev AS (SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS x
        |  FROM orders GROUP BY o_custkey),
        |j AS (SELECT c_nationkey AS nk, x, o_custkey
        |  FROM rev JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT nk, x,
        |  row_number() OVER (PARTITION BY nk ORDER BY x, o_custkey) AS i
        | FROM j),
        |g AS (SELECT nk, COUNT(*) AS n,
        |   CAST(SUM(x) AS DOUBLE) AS sx,
        |   CAST(SUM(x * i) AS DOUBLE) AS sxi,
        |   CAST(SUM(x * x) AS DOUBLE) AS sxx
        | FROM r GROUP BY nk)
        |SELECT nk AS nationkey, n,
        |  round(2.0 * sxi / (n * sx) - (n + 1.0) / n, 6) AS gini,
        |  round(sxx / (sx * sx), 6) AS hhi
        |FROM g""".stripMargin,
    // the grouped-global-rank form produces IDENTICAL ranks (unique
    // (x, custkey) tiebreak; BusinessOpsSpec pin), so it earns the
    // same oracle
    "conc_globalrank" ->
      """WITH rev AS (SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS x
        |  FROM orders GROUP BY o_custkey),
        |j AS (SELECT c_nationkey AS nk, x, o_custkey
        |  FROM rev JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT nk, x,
        |  row_number() OVER (PARTITION BY nk ORDER BY x, o_custkey) AS i
        | FROM j),
        |g AS (SELECT nk, COUNT(*) AS n,
        |   CAST(SUM(x) AS DOUBLE) AS sx,
        |   CAST(SUM(x * i) AS DOUBLE) AS sxi,
        |   CAST(SUM(x * x) AS DOUBLE) AS sxx
        | FROM r GROUP BY nk)
        |SELECT nk AS nationkey, n,
        |  round(2.0 * sxi / (n * sx) - (n + 1.0) / n, 6) AS gini,
        |  round(sxx / (sx * sx), 6) AS hhi
        |FROM g""".stripMargin
  )
}
