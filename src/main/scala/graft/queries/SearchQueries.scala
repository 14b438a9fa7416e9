package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-retrieval operators (SURVEY.md §2.11 [EXT]) — the search-side
  * counterpart of the curation family. Distributed grep and inverted-index
  * construction are the two canonical jobs of the original MapReduce paper
  * (Dean & Ghemawat, OSDI'04 §2.1), i.e. exactly the workloads the
  * reference framework (`/root/reference/Client/wordcount` family) exists
  * to run; BM25 (Robertson & Zaragoza, FnTIR'09) is the standard ranked
  * retrieval on top of that index.
  *
  *  - q71 distributed grep: regex match over the corpus with per-document
  *    match counts — a map-only narrow pass, zero shuffles; the filter and
  *    the projection both run inside WholeStageCodegen fused into the scan.
  *  - q72 inverted index (dictionary build): term → document frequency +
  *    collection frequency. The postings relation (term, doc_id, tf) is the
  *    intermediate; the dictionary is its two-level aggregation. Exact
  *    distinct-doc counts via partial aggregation on (term, doc_id) — one
  *    shuffle keyed on the term, vocabulary-bounded output.
  *  - q73 BM25 ranked retrieval: score a fixed term query against the
  *    corpus (k1 = 1.2, b = 0.75, Lucene-style non-negative idf
  *    ln(1 + (N - df + ½)/(df + ½))). Per-term statistics (df — 3 rows)
  *    and corpus statistics (N, avgdl — 1 row) BROADCAST; the corpus-side
  *    tf table never moves except for the final per-doc score aggregation
  *    keyed on doc_id. At 100 TB the only large shuffle is that per-doc
  *    sum over ≤ |query| rows per doc.
  *  - q76 word entropy: per-document Shannon entropy of the token
  *    distribution (a unigram quality signal — gibberish and boilerplate
  *    both sit in distinctive entropy bands). Computed entirely with
  *    narrow array expressions — sort the token array, find run
  *    boundaries, fold -Σ p·ln p over run lengths — O(len·log len) per
  *    row, ZERO shuffles, vs the naive explode → groupBy(doc, term) →
  *    groupBy(doc) which shuffles every token in the corpus twice.
  *
  * All four are oracle-checked (hash-compared against DuckDB).
  */
object SearchQueries {

  /** Grep pattern — literal-word/character-class form that parses
    * identically under Java regex (Spark) and RE2-ish DuckDB regex.
    */
  private val GrepPattern = "key [a-z]+ scan"

  /** BM25 query terms (fixed, so both engines score the same query). */
  private val QueryTerms = Seq("key", "scan", "merge")

  private val K1 = 1.2
  private val B = 0.75

  /** q90 phrase terms (fixed, so both engines search the same phrase). */
  private val PhraseW1 = "table"
  private val PhraseW2 = "scan"

  /** q197 NEAR window: w2 at most this many positions after w1. */
  private val ProximitySlop = 3

  /** q246 RRF fusion: query docs (ids below this), per-arm candidate
    * depth, the RRF smoothing constant (60 per Cormack et al.,
    * SIGIR'09), and the fused result depth.
    */
  private val RrfQueries = 10
  private val RrfPool = 20
  private val RrfC = 60
  private val RrfOut = 10

  /** Reciprocal-rank fusion of two per-query rank lists [Cormack,
    * Clarke & Büttcher, SIGIR'09]: score(cand) = Σ_lists 1/(C + rank),
    * absent-from-a-list contributes 0. Inputs are (q_id, cand, *_rk)
    * relations already cut to a bounded pool per query, so the full
    * outer join and the fused window both run over ≤ 2·pool rows per
    * query — never the corpus. Factored out so SearchSpec can drive
    * crafted rank lists through the exact shipped fusion.
    */
  private[graft] def rrfFuse(lex: DataFrame, sem: DataFrame,
      c: Int, outK: Int): DataFrame = {
    val wf = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("cand"))
    lex.join(sem, Seq("q_id", "cand"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("lex_rk")), lit(0.0))
          + coalesce(lit(1.0) / (lit(c) + col("sem_rk")), lit(0.0)), 6))
      .withColumn("rk", row_number().over(wf))
      .filter(col("rk") <= outK)
      .select(col("q_id"), col("cand"), col("lex_rk"), col("sem_rk"),
        col("rrf"), col("rk").cast("long").as("rk"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Distributed grep: the OSDI'04 §2.1 example workload. rlike pushes
    // into the scan filter; match count + first match are computed only
    // for surviving rows. Narrow end-to-end.
    // q246 hybrid retrieval with reciprocal-rank fusion — the standard
    // two-arm search stack [Cormack SIGIR'09]: a LEXICAL arm (token-set
    // Jaccard of each query doc against the corpus — intersection from
    // ONE postings equi-join against the broadcast query-token table,
    // so candidate volume is postings-of-the-query-terms, never the
    // corpus) and a SEMANTIC arm (q25's exact cosine top-k over the
    // aligned embeddings), each cut to a RrfPool-deep rank list per
    // query, fused by rrfFuse. Every arithmetic step is either integer
    // (ranks, intersections) or a single IEEE division of exact ints —
    // hash-comparable cross-engine.
    "q246_rrf_fusion" -> ((s, d) => {
      import graft.functions.vectors._
      val docs = Tables(s, d, "documents")
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      val sizes = docs.select(col("doc_id"),
        size(array_distinct(split(col("text"), " "))).as("nd"))
      val qt = toks.filter(col("doc_id") < RrfQueries)
        .select(col("doc_id").as("q_id"), col("w"))
      val qsz = sizes.filter(col("doc_id") < RrfQueries)
        .select(col("doc_id").as("q_id"), col("nd").as("nq"))
      val inter = toks.join(broadcast(qt), "w")
        .filter(col("doc_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("doc_id")).agg(count(lit(1)).as("ni"))
      val wl = Window.partitionBy(col("q_id"))
        .orderBy(col("jac").desc, col("doc_id"))
      val lex = inter.join(sizes, "doc_id").join(broadcast(qsz), "q_id")
        .withColumn("jac", col("ni") / (col("nd") + col("nq") - col("ni")))
        .withColumn("lex_rk", row_number().over(wl))
        .filter(col("lex_rk") <= RrfPool)
        .select(col("q_id"), col("doc_id").as("cand"), col("lex_rk"))
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") < RrfQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val ws = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      val sem = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("sim", vec_cosine(col("qe"), col("embedding")))
        .withColumn("sem_rk", row_number().over(ws))
        .filter(col("sem_rk") <= RrfPool)
        .select(col("q_id"), col("vec_id").as("cand"), col("sem_rk"))
      rrfFuse(lex, sem, RrfC, RrfOut)
    }),

    "q71_grep" -> ((s, d) =>
      Tables(s, d, "documents")
        .filter(col("text").rlike(GrepPattern))
        .select(col("doc_id"),
          regexp_count(col("text"), lit(GrepPattern)).as("n_matches"),
          regexp_extract(col("text"), GrepPattern, 0).as("first_match"))),

    // Inverted-index dictionary: term → (df, cf). The (term, doc_id)
    // partial aggregation bounds the shuffle to distinct postings (not
    // raw token occurrences); the dictionary itself is vocabulary-sized.
    "q72_inverted_index" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("cf"))),

    // §2.10: incremental inverted-index maintenance (rows-only; pinned
    // by IndexStreamSpec): q72's dictionary folded per micro-batch as
    // vocabulary-bounded per-term state — O(delta postings) per batch
    // vs the full corpus re-aggregation. The entry streams the corpus
    // in a REAL two-batch split (doc_id parity) through an isolated
    // RocksDB session and REQUIRES the final index to equal batch q72
    // exactly (integer counts → bitwise) before returning.
    "stream_index_inc" -> ((s0, d) => {
      val iso = s0.newSession()
      iso.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = iso.sqlContext
      implicit val docEnc: org.apache.spark.sql.Encoder[(Long, String)] =
        org.apache.spark.sql.Encoders.product[(Long, String)]
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val postings = stream.toDS().toDF("doc_id", "text")
        .select(explode(split(col("text"), " ")).as("term"), col("doc_id"))
        .as[(String, Long)](
          org.apache.spark.sql.Encoders.product[(String, Long)])
      val out = graft.streaming.IndexStream.maintained(postings)
        .toDF("term", "df", "cf")
      val q = out.writeStream.format("memory").queryName("stream_index_inc")
        .outputMode("update").start()
      val docs = graft.streaming.FeedGuard.collectFeed(
        graft.Tables(iso, d, "documents")
          .select(col("doc_id"), col("text"))
          .as[(Long, String)], "stream_index_inc")
      val (even, odd) = docs.partition(_._1 % 2 == 0)
      stream.addData(even); q.processAllAvailable()
      stream.addData(odd); q.processAllAvailable()
      q.stop()
      // counts are monotone, so the latest update per term is the max
      val got = iso.table("stream_index_inc")
        .groupBy(col("term"))
        .agg(max(col("df")).as("df"), max(col("cf")).as("cf"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val batch = queries("q72_inverted_index")(iso, d).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      require(got == batch,
        s"incremental index diverged from batch q72: " +
          s"${(got diff batch).take(3)} vs ${(batch diff got).take(3)}")
      import s0.implicits._
      got.toSeq.toDF("term", "df", "cf")
    }),

    // TF-IDF top terms per document — the doc-REPRESENTATION dual of
    // q73's query-scoring: the 3 most characteristic terms of every
    // document, the feature extraction behind keyword tagging and the
    // interpretable cousin of q94's hashed embeddings. tf from one
    // explode + (doc, term) aggregation, df shared from the same table
    // (vocabulary-sized, shuffle-joined on term — never broadcast: the
    // vocabulary grows with the corpus), N as a driver literal (IVF
    // pattern). Scores rounded to 6 dp BEFORE ranking and tie-broken by
    // term, so both engines' row_number agrees despite libm ln ULP
    // (q73's proven discipline). The rank window partitions by doc —
    // per-doc term lists are document-length-bounded.
    "q109_tfidf_topterms" -> ((s, d) => {
      val tk = Tables(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      val n = tk.count().toDouble
      val tf = tk.select(col("doc_id"), explode(col("t")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).cast("double").as("tf"))
      val df = tf.groupBy(col("term"))
        .agg(count(lit(1)).cast("double").as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(df.hint("shuffle_hash"), "term")
        .withColumn("score", round(col("tf") * log(lit(n) / col("df")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("score"))
    }),

    // BM25: tf per (doc, query-term) via one explode + filter (the term
    // IN-list prunes ~all tokens before the shuffle), df and corpus
    // stats broadcast, final score = one per-doc aggregation. Scores
    // rounded to 6 decimals on both engines before the top-20 cut;
    // doc_id tie-break pins the boundary.
    "q73_bm25" -> ((s, d) => {
      val tk = Tables(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      // N and avgdl are two scalars — driver-side metadata (the IVF-
      // centroid pattern), inlined as literals instead of a 1-row
      // cross-join that would plan as a BroadcastNestedLoop
      val st = tk.agg(count(lit(1)).cast("double"),
        avg(size(col("t")))).head()
      val n = st.getDouble(0); val avgdl = st.getDouble(1)
      val tf = tk
        .select(col("doc_id"), size(col("t")).cast("double").as("dl"),
          explode(col("t")).as("term"))
        .filter(col("term").isin(QueryTerms: _*))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).cast("double").as("tf"))
      val df = tf.groupBy(col("term"))
        .agg(count(lit(1)).cast("double").as("df"))
      tf.join(broadcast(df), "term")
        .withColumn("score_t",
          log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
            * col("tf") * (K1 + 1)
            / (col("tf") + lit(K1) * (lit(1 - B)
              + lit(B) * col("dl") / lit(avgdl))))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("score_t")), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // Phrase search over a POSITIONAL inverted index — the adjacency-join
    // form every phrase-capable search engine runs: postings are
    // (term, doc_id, position); a 2-token phrase is an equi-join of the
    // two terms' postings on (doc_id, pos+1). The per-term filters prune
    // the exploded token table to just the phrase terms' postings BEFORE
    // the join shuffle, so the joined volume is postings-of-the-rarer-
    // term, not the corpus — the standard intersection cost model.
    // Overlap-safe by construction (counts token adjacency, not string
    // replace), which a LIKE-based scan is not.
    "q90_phrase_search" -> ((s, d) => {
      val tok = Tables(s, d, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val t1 = tok.filter(col("w") === PhraseW1)
        .select(col("doc_id"), col("pos"))
      val t2 = tok.filter(col("w") === PhraseW2)
        .select(col("doc_id").as("d2"), col("pos").as("p2"))
      t1.join(t2, col("doc_id") === col("d2") && col("p2") === col("pos") + 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occ"))
    }),

    // q197 proximity (slop) search — q90's adjacency relaxed to
    // "w1 BEFORE w2 within `ProximitySlop` positions", the NEAR operator
    // of a retrieval engine — as a ZERO-SHUFFLE narrow scan: both terms'
    // position lists come from ONE pass over each doc's token array
    // (indexed transform+filter — no posexplode, no self-join), and the
    // pair enumeration stays inside the row as a bounded array
    // expression (|p1s| × slop membership probes, term-frequency
    // bounded). The q90-style positional-postings JOIN is the right
    // plan when an inverted index is ALREADY materialized (probe the
    // rare term's postings, never rescan); for an index-free corpus
    // pass this fused form does strictly less work — the measured swap
    // took 2.1 s → one filter-fused scan. Gap semantics: one row per
    // (p1, gap) hit == one per matched (p1, p2) pair; min_gap is the
    // tightest window seen.
    "q197_near_search" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"),
          expr(s"filter(transform(tk, (w, i) -> IF(w = '$PhraseW1', i, -1))," +
            " x -> x >= 0)").as("p1s"),
          expr(s"filter(transform(tk, (w, i) -> IF(w = '$PhraseW2', i, -1))," +
            " x -> x >= 0)").as("p2s"))
        .filter(size(col("p1s")) > 0 && size(col("p2s")) > 0)
        .select(col("doc_id"),
          expr(s"flatten(transform(p1s, p -> filter(" +
            s"sequence(1, $ProximitySlop), k -> array_contains(p2s, p + k))))")
            .as("gaps"))
        .filter(size(col("gaps")) > 0)
        .select(col("doc_id"), size(col("gaps")).cast("long").as("n_pairs"),
          array_min(col("gaps")).as("min_gap"))),

    // Word entropy, shuffle-free: array_sort → run boundaries → run
    // lengths → -Σ p ln p fold. Higher-order functions evaluate per-row
    // on the executor (no codegen, but no exchange either) — at 100 TB
    // this is a pure map pass fused behind the scan, same shape as q28
    // quality scoring.
    "q76_word_entropy" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .withColumn("n", size(col("t")))
        .withColumn("st", array_sort(col("t")))
        // indices where a new distinct token's run starts
        .withColumn("bounds", expr(
          "filter(sequence(0, n - 1), i -> i = 0 OR st[i] != st[i - 1])"))
        // run length j = next boundary (or n) - boundary j
        .withColumn("runs", expr(
          "transform(sequence(1, size(bounds))," + // 1-based element_at
            " j -> coalesce(try_element_at(bounds, j + 1), n)" +
            " - element_at(bounds, j))"))
        .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
          round(expr(
            "-aggregate(runs, 0D, (acc, c) ->" +
              " acc + (c / CAST(n AS DOUBLE))" +
              " * ln(c / CAST(n AS DOUBLE)))"), 6).as("entropy")))
  )

  def oracle: Map[String, String] = Map(
    "q246_rrf_fusion" -> {
      val cos = graft.queries.SimilarityQueries.cosSql("q", "e")
      s"""WITH toks AS (SELECT doc_id,
         |    unnest(list_distinct(string_split(text, ' '))) AS w
         |  FROM documents),
         |sizes AS (SELECT doc_id,
         |    len(list_distinct(string_split(text, ' '))) AS nd
         |  FROM documents),
         |inter AS (SELECT q.doc_id AS q_id, t.doc_id AS cand,
         |    COUNT(*) AS ni
         |  FROM toks t JOIN toks q USING (w)
         |  WHERE q.doc_id < $RrfQueries AND t.doc_id <> q.doc_id
         |  GROUP BY 1, 2),
         |lex AS (SELECT q_id, cand, lex_rk FROM (
         |  SELECT q_id, cand, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY (CAST(ni AS DOUBLE)
         |        / (sd.nd + sq.nd - ni)) DESC, cand) AS lex_rk
         |  FROM inter JOIN sizes sd ON sd.doc_id = cand
         |    JOIN sizes sq ON sq.doc_id = q_id) z
         |  WHERE lex_rk <= $RrfPool),
         |sem AS (SELECT q_id, cand, sem_rk FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id AS cand,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY $cos DESC, e.vec_id) AS sem_rk
         |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |  WHERE q.vec_id < $RrfQueries) z
         |  WHERE sem_rk <= $RrfPool),
         |f AS (SELECT COALESCE(lex.q_id, sem.q_id) AS q_id,
         |    COALESCE(lex.cand, sem.cand) AS cand, lex_rk, sem_rk,
         |    round(COALESCE(1.0 / ($RrfC + lex_rk), 0)
         |      + COALESCE(1.0 / ($RrfC + sem_rk), 0), 6) AS rrf
         |  FROM lex FULL OUTER JOIN sem
         |    ON lex.q_id = sem.q_id AND lex.cand = sem.cand)
         |SELECT q_id, cand, CAST(lex_rk AS INTEGER) AS lex_rk,
         |  CAST(sem_rk AS INTEGER) AS sem_rk, rrf, rk
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY rrf DESC, cand) AS rk FROM f) z
         |WHERE rk <= $RrfOut""".stripMargin
    },
    "q109_tfidf_topterms" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
        |            FROM documents),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tk),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |       FROM (SELECT doc_id, unnest(t) AS term FROM tk)
        |       GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
        |       GROUP BY term),
        |scored AS (SELECT doc_id, tf.term,
        |    round(tf * ln(n.n / df.df), 6) AS score
        |  FROM tf JOIN df ON tf.term = df.term, n),
        |ranked AS (SELECT doc_id, term, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, score FROM ranked WHERE rank <= 3"""
        .stripMargin,
    "q71_grep" ->
      s"""SELECT doc_id,
         | CAST(len(regexp_extract_all(text, '$GrepPattern')) AS INTEGER)
         |   AS n_matches,
         | regexp_extract(text, '$GrepPattern') AS first_match
         |FROM documents
         |WHERE regexp_matches(text, '$GrepPattern')""".stripMargin,
    "q72_inverted_index" ->
      """WITH posting AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents)
        |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |       CAST(count(*) AS BIGINT) AS cf
        |FROM posting GROUP BY term""".stripMargin,
    "q73_bm25" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
        |            FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(t)) AS avgdl
        |          FROM tk),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |       FROM (SELECT doc_id, unnest(t) AS term FROM tk)
        |       WHERE term IN ('key', 'scan', 'merge')
        |       GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        |       FROM tf GROUP BY term),
        |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM tk)
        |SELECT t.doc_id,
        |  round(sum( ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
        |    * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
        |  ), 6) AS score
        |FROM tf t, stats, df, dl
        |WHERE df.term = t.term AND dl.doc_id = t.doc_id
        |GROUP BY t.doc_id
        |ORDER BY score DESC, t.doc_id LIMIT 20""".stripMargin,
    "q90_phrase_search" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS sp
         |            FROM documents),
         |pos AS (SELECT doc_id, unnest(generate_series(1, len(sp))) AS i, sp
         |        FROM tk),
         |w AS (SELECT doc_id, i, sp[i] AS w FROM pos)
         |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occ
         |FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
         |WHERE a.w = '$PhraseW1' AND b.w = '$PhraseW2'
         |GROUP BY a.doc_id""".stripMargin,
    "q197_near_search" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS sp
         |            FROM documents),
         |pos AS (SELECT doc_id, unnest(generate_series(1, len(sp))) AS i, sp
         |        FROM tk),
         |w AS (SELECT doc_id, i, sp[i] AS w FROM pos)
         |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(MIN(b.i - a.i) AS INTEGER) AS min_gap
         |FROM w a JOIN w b ON a.doc_id = b.doc_id
         |  AND b.i > a.i AND b.i <= a.i + $ProximitySlop
         |WHERE a.w = '$PhraseW1' AND b.w = '$PhraseW2'
         |GROUP BY a.doc_id""".stripMargin,
    "q76_word_entropy" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |           FROM documents),
        |c AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS c
        |      FROM w GROUP BY doc_id, term),
        |n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id)
        |SELECT c.doc_id, CAST(n.n AS BIGINT) AS n_tokens,
        |  round(-sum((c.c / n.n) * ln(c.c / n.n)), 6) AS entropy
        |FROM c JOIN n ON c.doc_id = n.doc_id
        |GROUP BY c.doc_id, n.n""".stripMargin
  )
}
