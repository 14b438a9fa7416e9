package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-sequence (behavioral) analytics over the `events` table — the
  * product-analytics surface a reference user would run as chained
  * MapReduce jobs (reference `Worker/worker_v1.py:26-218` mapper/reducer
  * pairs per stage); here each is one Catalyst plan:
  *
  *  - q131 ordered funnel: how many users complete view → click →
  *    purchase IN ORDER. Stage frames are per-user aggregates (bounded
  *    by distinct users, never event volume) and shrink monotonically;
  *    each stage is one co-partitioned equi-join on user_id + min-agg.
  *  - q132 cohort retention: weekly signup cohort × week-offset active
  *    users. Two user-bounded aggregates + one join; the cohort-size
  *    dimension is weeks-cardinality (broadcast).
  *  - q133 transition matrix: first-order Markov transitions between
  *    event types via lag() — one per-user window pass over the event
  *    log, then a K²-bounded aggregation (K = event-type cardinality).
  *  - q135 EWMA smoothing (α = 1/2, adjusted form): per-type daily
  *    series smoothed exactly. All arithmetic is integer/decimal until
  *    one final IEEE division, so the oracle matches bit-for-bit — see
  *    [[BehaviorOps.ewmaDaily]] for the 2^j weighting trick.
  *
  * All four are oracle-checked (hash-compared against DuckDB).
  */
object BehaviorOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
      "q131_funnel" -> ((s, d) => funnel(s, d)),
      "q132_retention" -> ((s, d) => retention(s, d)),
      "q133_transitions" -> ((s, d) => transitions(s, d)),

      // q272 behavioral entropy rate — how PREDICTABLE is the event
      // stream, as one number: the empirical first-order Markov entropy
      // rate H = −Σ_ij (c_ij/N)·ln(c_ij/c_i·) over q133's transition
      // counts [Shannon 1948; the normalized redundancy 1 − H/ln k is
      // the bound-style predictability index of Song et al., Science
      // 2010]. Near ln k → users wander uniformly (sessionization and
      // next-event models won't help); near 0 → behavior is scripted.
      // Everything reduces to q133's bounded |types|² cell table; the
      // per-cell term is INTEGER micros (c_ij·(lnM c_i − lnM c_ij)), so
      // the final sum is order-free and the single output row
      // hash-compares. Degenerate single-next-state alphabets gate the
      // normalized index to NULL.
      "q272_transition_entropy" -> ((s, d) =>
        transitionEntropy(Tables(s, d, "events"))),
      "q135_ewma" -> ((s, d) => ewmaDaily(s, d)),
      "q144_streaks" -> ((s, d) => streaks(s, d)),
      "q152_event_paths" -> ((s, d) => eventPaths(s, d)),
      "q157_attribution" -> ((s, d) => attribution(s, d)),
      "q162_debounce" -> ((s, d) => debounce(s, d)),
      "q164_conversion_lag" -> ((s, d) => conversionLag(s, d)),
      "q194_pattern_match" -> ((s, d) => patternMatch(s, d)),
      "q206_combo_profile" -> ((s, d) => comboProfile(s, d)))

  /** q206 behavioral-combination profile: how many users exhibit each
    * distinct SET of event types — the "segment by capability" audit
    * (who views-and-buys vs only-views…). collect_set is
    * order-nondeterministic, so the combo key is array_sort'd before
    * joining — the q194 shuffle-safety rule for set-valued keys. One
    * shuffle on user_id, one 2^|types|-bounded aggregation.
    */
  def comboProfile(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "events")
      .groupBy(col("user_id"))
      .agg(array_join(array_sort(collect_set(col("event_type"))), ",")
        .as("combo"))
      .groupBy(col("combo"))
      .agg(count(lit(1)).as("n_users"))

  /** q194 MATCH_RECOGNIZE-lite sequence pattern matching: count, per
    * user, non-overlapping occurrences of the journey pattern
    * view → (click|error)* → purchase over the time-ordered event
    * stream. The per-user event-type string is built SHUFFLE-SAFELY —
    * collect_list is order-nondeterministic across merges, so the list
    * carries (ts, event_id, code) structs and array_sort fixes the
    * order after collection — then one regexp_extract_all pass scans
    * it (leftmost, non-overlapping in both engines' regex semantics).
    * One shuffle on user_id; per-user state is that user's event
    * count (the sessionization boundedness argument). The regex-over-
    * codes trick is how sequence patterns compile onto engines without
    * native MATCH_RECOGNIZE; q131's funnel is the fixed-3-stage
    * special case.
    */
  def patternMatch(s: SparkSession, d: String): DataFrame = {
    val code = expr("substring(event_type, 1, 1)") // c/s/e/v/p — unique
    Tables(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"), code.as("c"))
      .groupBy(col("user_id"))
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(ts, event_id, c)))," +
          " x -> x.c)"), "").as("seq"))
      .select(col("user_id"), length(col("seq")).as("n_events"),
        size(regexp_extract_all(col("seq"), lit("v[ce]*p"), lit(0)))
          .as("n_conversions"))
      .filter(col("n_conversions") > 0)
  }

  /** q152 path mining: the 10 most common 3-step event-type sequences
    * across user journeys — q133's transition matrix extended to third
    * order (the "common navigation paths" product-analytics staple).
    * Two lag() columns in ONE per-user window pass (work bounded by
    * events per user), then a K³-bounded aggregation (K = event-type
    * cardinality) and a TakeOrderedAndProject for the deterministic
    * top-10 (ties break lexicographically on the path).
    */
  def eventPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(s, d, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("e1", lag(col("event_type"), 2).over(w))
      .withColumn("e2", lag(col("event_type"), 1).over(w))
      .filter(col("e1").isNotNull)
      .groupBy(col("e1"), col("e2"), col("event_type").as("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(10)
  }

  /** q144 gaps-and-islands: per-user consecutive-day activity streaks —
    * the classic "longest streak" pattern (date minus row_number is
    * constant within a run). Work is bounded by distinct (user, day)
    * pairs, not event volume: one distinct aggregation, one per-user
    * window over day counts (days per user ≤ calendar span), one run
    * aggregation. The longest-streak tie-break (earliest start) packs
    * into a single max(struct(len, -day)) so no second window or join
    * revisits the runs.
    */
  def streaks(s: SparkSession, d: String): DataFrame = {
    val days = Tables(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val runs = days
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
    runs.groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_days"),
        count(lit(1)).as("n_streaks"),
        max(struct(col("len"),
          (lit(0) - unix_date(col("start"))).as("neg"))).as("m"))
      .select(col("user_id"), col("n_days"), col("n_streaks"),
        col("m.len").as("max_streak"),
        date_from_unix_date(lit(0) - col("m.neg")).as("best_start"))
  }

  /** Ordered funnel view → click → purchase. Stage N keeps the earliest
    * qualifying event strictly after the user's stage-N-1 time, so an
    * out-of-order purchase (before the first click) does not count —
    * the semantics product funnels need and a plain per-type count
    * cannot express.
    *
    * Scale: `events` is touched once per stage with the type filter
    * pushed to the scan; every aggregate/join is keyed on user_id, so
    * all three stages reuse one hash-partitioning on a user-cardinality
    * frame. At gate scale AQE broadcasts the shrinking stage frames.
    */
  private def funnel(s: SparkSession, d: String): DataFrame =
    funnelStages(Tables(s, d, "events")
      .select("user_id", "event_type", "ts"))

  private[graft] def funnelStages(e: DataFrame): DataFrame = {
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def stage(df: DataFrame, idx: Long, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          col("n_users"))
    stage(s1, 1L, "view")
      .union(stage(s2, 2L, "click"))
      .union(stage(s3, 3L, "purchase"))
  }

  /** Weekly cohort retention: cohort = ISO week (Monday truncation, the
    * same rule in both engines) of the user's FIRST event; offset =
    * whole weeks between the cohort Monday and the activity timestamp
    * (floor division — identical to DuckDB `//` because the diff is
    * never negative). retention = active / cohort_size, a ratio of two
    * exact BIGINTs, so one IEEE division matches cross-engine.
    */
  private def retention(s: SparkSession, d: String): DataFrame =
    retentionOf(Tables(s, d, "events").select("user_id", "ts"))

  private[graft] def retentionOf(e: DataFrame): DataFrame = {
    val firsts = e.groupBy("user_id").agg(min("ts").as("t0"))
      .select(col("user_id"),
        to_date(date_trunc("week", col("t0"))).as("cohort"))
    val sizes = firsts.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_size"))
    val active = e.join(firsts, "user_id")
      .select(col("cohort"),
        expr("datediff(cast(ts as date), cohort) div 7").as("week_offset"),
        col("user_id"))
      .groupBy("cohort", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
    active.join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 4).as("retention"))
  }

  /** First-order Markov transition matrix over event types: one lag()
    * pass per user (the event log's natural partitioning), then a
    * K²-row aggregation. p = n / Σ_curr n per prev row — exact-int
    * ratio. The row-normalizing window runs over K² ≤ 25 aggregated
    * rows: bounded metadata, not corpus data.
    */
  private def transitions(s: SparkSession, d: String): DataFrame =
    transitionsOf(Tables(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("curr")))

  private[graft] def transitionsOf(e: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = e
      .withColumn("prev", lag(col("curr"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy("prev", "curr").agg(count(lit(1)).as("n"))
    counts
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev")))
          .cast("double"), 4))
  }

  /** q272's entropy-rate computation over an events-shaped frame
    * (user_id, ts, event_id, event_type) — spec seam; scaladoc on the
    * queries entry above.
    */
  private[graft] def transitionEntropy(events: DataFrame): DataFrame = {
    val lnM = (x: org.apache.spark.sql.Column) =>
      round(log(x) * lit(1e6), 0).cast("long")
    val c = transitionsOf(events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("curr")))
      .select(col("prev"), col("curr"), col("n"))
    val wP = Window.partitionBy(col("prev"))
    val h = col("hm") / (col("n_transitions") * lit(1e6))
    c.withColumn("ci", sum(col("n")).over(wP))
      .withColumn("hm", col("n") * (lnM(col("ci")) - lnM(col("n"))))
      .agg(sum(col("n")).as("n_transitions"),
        countDistinct(col("curr")).as("n_states"),
        sum(col("hm")).as("hm"))
      .select(col("n_transitions"), col("n_states"),
        round(h, 6).as("entropy_rate_nats"),
        when(col("n_states") > 1, round(lit(1.0)
          - h / log(col("n_states").cast("double")), 6))
          .as("predictability"))
  }

  /** EWMA (α = 1/2, adjusted form) over the per-type daily value series:
    *
    *   ewma_t = Σ_{j≤t} 2^j · x_j  /  (2^{t+1} − 1)
    *
    * which is the textbook Σ β^{t−j}x_j / Σ β^{t−j} with β = 1−α = 1/2,
    * both sides multiplied by 2^t. Daily x_j is an exact decimal sum
    * rounded to a BIGINT, the 2^j weights are exact shifts, and the
    * running numerator is a BIGINT window sum — so the ONLY floating
    * operation is the final division of two exactly-representable
    * longs (< 2^53), and DuckDB reproduces it bit-for-bit.
    *
    * Preconditions/scale: series length here is days (30), bounded
    * metadata after the daily aggregation — the window runs over
    * day-cardinality rows per type, never raw events. The 2^j encoding
    * caps at j ≤ ~45 for these magnitudes; longer horizons use a
    * bounded trailing frame, which is exact anyway because weights
    * below 2^-40 are sub-ULP in the final double.
    */
  private def ewmaDaily(s: SparkSession, d: String): DataFrame =
    ewmaOf(Tables(s, d, "events"))

  private[graft] def ewmaOf(e: DataFrame): DataFrame = {
    val daily = e
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(graft.functions.Sum128.sumExact(col("value"), 4).as("v"))
      .select(col("event_type"), col("day"),
        round(col("v"), 0).cast("long").as("x"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("j", (row_number().over(byDay) - 1).cast("long"))
      .withColumn("wx", expr("shiftleft(cast(1 as bigint), j) * x"))
      .withColumn("num", sum(col("wx")).over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_type"), col("day"), col("x"),
        round(col("num").cast("double") /
          expr("cast(shiftleft(cast(1 as bigint), j + 1) - 1 as double)"),
          4).as("ewma"))
  }

  /** q157 marketing attribution: every `purchase` event's value is
    * credited to a touch channel under the two standard single-touch
    * models at once — last-touch (most recent preceding non-purchase
    * event) and first-touch (earliest preceding non-purchase event).
    * Purchases with no preceding touch fall into the `direct` bucket.
    * One per-user window pass over the event log (the q133/q152 shape —
    * IGNORE-NULLS running first/last probes, ties broken by event_id),
    * then a models×channels-bounded aggregation; revenue reduces
    * decimally so the oracle hash-compares.
    */
  private def attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val p = Tables(s, d, "events")
      .withColumn("last_ch", last(touch, ignoreNulls = true).over(w))
      .withColumn("first_ch", first(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
    p.select(explode(array(
        struct(lit("last_touch").as("model"),
          coalesce(col("last_ch"), lit("direct")).as("channel")),
        struct(lit("first_touch").as("model"),
          coalesce(col("first_ch"), lit("direct")).as("channel"))))
        .as("m"), col("value"))
      .groupBy(col("m.model").as("model"), col("m.channel").as("channel"))
      .agg(count(lit(1)).as("purchases"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double"), 4)
          .as("revenue"))
  }

  /** q162 event debounce (telemetry throttling): an event is DROPPED
    * when the same (user, type) fired less than 60 s earlier — the
    * gap-based form (each event compares to its immediate predecessor,
    * kept or not), which is one lag() per partition-ordered stream and
    * needs no iterative chain state. Output is the per-type keep/drop
    * tally. One window shuffle on (user, type); microsecond timestamps
    * with an event_id tiebreak keep both engines' lag identical.
    */
  private def debounce(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables(s, d, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("kept", col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") >= 60000000L)
      .groupBy(col("event_type"))
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"))
  }

  /** q164 click-to-purchase conversion lag: for every purchase, the
    * time since the user's most recent click, bucketed to 10-minute
    * bins up to an hour (conversions slower than that fall out of the
    * attribution window). The probe is one IGNORE-NULLS running last()
    * per user — q157's window reused with a time payload — and the
    * bin histogram is a bucket-bounded aggregation.
    */
  private def conversionLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(s, d, "events")
      .withColumn("last_click_us",
        last(when(col("event_type") === "click", unix_micros(col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" &&
        col("last_click_us").isNotNull)
      .withColumn("lag_us", unix_micros(col("ts")) - col("last_click_us"))
      .filter(col("lag_us") <= 3600000000L)
      .select(expr("lag_us div 600000000").as("bucket_10m"))
      .groupBy(col("bucket_10m"))
      .agg(count(lit(1)).as("n_purchases"))
  }

  def oracle: Map[String, String] = Map(
    "q206_combo_profile" ->
      """WITH u AS (SELECT user_id,
        |    array_to_string(list_sort(list(DISTINCT event_type)), ',')
        |      AS combo
        |  FROM events GROUP BY user_id)
        |SELECT combo, COUNT(*) AS n_users FROM u GROUP BY combo"""
        .stripMargin,
    "q194_pattern_match" ->
      """WITH seqs AS (SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(len(seq) AS INTEGER) AS n_events,
        |  CAST(len(regexp_extract_all(seq, 'v[ce]*p'))
        |    AS INTEGER) AS n_conversions
        |FROM seqs
        |WHERE len(regexp_extract_all(seq, 'v[ce]*p')) > 0""".stripMargin,
    "q162_debounce" ->
      """WITH w AS (SELECT event_type,
        |  epoch_us(ts) AS us,
        |  lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS prev_us
        | FROM events),
        |k AS (SELECT event_type,
        |  (prev_us IS NULL OR us - prev_us >= 60000000) AS kept FROM w)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_dropped
        |FROM k GROUP BY event_type""".stripMargin,
    "q164_conversion_lag" ->
      """WITH w AS (SELECT event_type, epoch_us(ts) AS us,
        |  last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts)
        |    END IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS last_click_us
        | FROM events),
        |p AS (SELECT us - last_click_us AS lag_us FROM w
        |  WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
        |    AND us - last_click_us <= 3600000000)
        |SELECT lag_us // 600000000 AS bucket_10m,
        |  COUNT(*) AS n_purchases
        |FROM p GROUP BY 1""".stripMargin,
    "q157_attribution" ->
      """WITH w AS (SELECT user_id, ts, event_id, event_type, value,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type
        |    END IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_ch,
        |  first_value(CASE WHEN event_type <> 'purchase' THEN event_type
        |    END IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_ch
        | FROM events),
        |p AS (SELECT coalesce(last_ch, 'direct') AS last_ch,
        |    coalesce(first_ch, 'direct') AS first_ch, value
        |  FROM w WHERE event_type = 'purchase'),
        |st AS (SELECT 'last_touch' AS model, last_ch AS channel, value
        |    FROM p
        |  UNION ALL
        |  SELECT 'first_touch', first_ch, value FROM p)
        |SELECT model, channel, COUNT(*) AS purchases,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
        |    AS revenue
        |FROM st GROUP BY model, channel""".stripMargin,
    "q152_event_paths" ->
      """WITH seq AS (SELECT event_type AS e3,
        |  LAG(event_type, 2) OVER w AS e1,
        |  LAG(event_type, 1) OVER w AS e2
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, COUNT(*) AS n FROM seq
        |WHERE e1 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 10""".stripMargin,
    "q144_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |  CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |r AS (SELECT user_id, day,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        | FROM days),
        |runs AS (SELECT user_id, day - CAST(rn AS INTEGER) AS grp,
        |  COUNT(*) AS len, MIN(day) AS start
        | FROM r GROUP BY user_id, day - CAST(rn AS INTEGER))
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
        |  COUNT(*) AS n_streaks, CAST(MAX(len) AS BIGINT) AS max_streak,
        |  first(start ORDER BY len DESC, start) AS best_start
        |FROM runs GROUP BY user_id""".stripMargin,
    "q131_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
        |  count(*) AS n_users FROM s1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3""".stripMargin,
    "q132_retention" ->
      """WITH firsts AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |  FROM events GROUP BY user_id),
        |sizes AS (SELECT cohort, count(*) AS cohort_size
        |          FROM firsts GROUP BY cohort),
        |active AS (
        |  SELECT f.cohort,
        |    date_diff('day', f.cohort, CAST(e.ts AS DATE)) // 7
        |      AS week_offset,
        |    count(DISTINCT e.user_id) AS n_active
        |  FROM events e JOIN firsts f ON e.user_id = f.user_id
        |  GROUP BY 1, 2)
        |SELECT a.cohort, a.week_offset, a.n_active, s.cohort_size,
        |  CAST(ROUND(CAST(a.n_active AS DOUBLE) /
        |             CAST(s.cohort_size AS DOUBLE), 4) AS DOUBLE)
        |    AS retention
        |FROM active a JOIN sizes s ON a.cohort = s.cohort""".stripMargin,
    "q272_transition_entropy" ->
      """WITH seq AS (
        |  SELECT event_type AS curr,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events),
        |counts AS (SELECT prev, curr, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY prev, curr),
        |cell AS (SELECT prev, curr, n,
        |    CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT) AS ci
        |  FROM counts),
        |a AS (SELECT CAST(sum(n) AS BIGINT) AS n_transitions,
        |    CAST(count(DISTINCT curr) AS BIGINT) AS n_states,
        |    CAST(sum(n * (CAST(round(ln(ci) * 1000000, 0) AS BIGINT)
        |      - CAST(round(ln(n) * 1000000, 0) AS BIGINT))) AS BIGINT)
        |      AS hm
        |  FROM cell)
        |SELECT n_transitions, n_states,
        |  round(hm / (n_transitions * 1e6), 6) AS entropy_rate_nats,
        |  CASE WHEN n_states > 1 THEN
        |    round(1.0 - (hm / (n_transitions * 1e6))
        |      / ln(CAST(n_states AS DOUBLE)), 6) END AS predictability
        |FROM a""".stripMargin,
    "q133_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS curr,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events),
        |counts AS (SELECT prev, curr, count(*) AS n FROM seq
        |           WHERE prev IS NOT NULL GROUP BY prev, curr)
        |SELECT prev, curr, n,
        |  CAST(ROUND(CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY prev) AS DOUBLE), 4) AS DOUBLE)
        |    AS p
        |FROM counts""".stripMargin,
    "q135_ewma" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 0) AS BIGINT)
        |      AS x
        |  FROM events GROUP BY 1, 2),
        |seq AS (
        |  SELECT event_type, day, x,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |         - 1 AS BIGINT) AS j
        |  FROM daily)
        |SELECT event_type, day, x,
        |  CAST(ROUND(
        |    CAST(sum((1::BIGINT << j) * x) OVER (
        |           PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS DOUBLE) /
        |    CAST((1::BIGINT << (j + 1)) - 1 AS DOUBLE), 4) AS DOUBLE)
        |    AS ewma
        |FROM seq""".stripMargin)
}
