package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Curation operators beyond the dedup/scoring family (SURVEY.md §2.11
  * [EXT]) — the remaining passes a production training-data pipeline
  * runs over a corpus:
  *
  *  - q57 benchmark decontamination: drop documents sharing any 3-token
  *    shingle with a probe (benchmark) set — the "don't train on the
  *    eval set" pass.
  *  - q58 PII scrub: regex redaction (emails, long digit runs) with
  *    per-document match counts and the redacted-text hash.
  *  - q59 text normalization: lowercase, strip non-alphanumerics,
  *    collapse whitespace — the canonicalization pass ahead of exact
  *    dedup.
  *  - q60 stratified sampling: per-language md5-threshold rates — the
  *    "rebalance the language mix" counterpart of q50's global sample.
  *
  * All four are oracle-checked (hash-compared against DuckDB).
  */
object CurationOps {

  /** Probe-set membership predicate: every 97th doc stands in for the
    * benchmark suite. Deterministic and engine-agnostic.
    */
  private def isProbe(c: Column): Column = pmod(c, lit(97)) === 0

  /** q230 homoglyph-confusable mapping (a UTS #39 "confusables"
    * SUBSET): visually-identical Cyrillic/Greek letters fold to their
    * Latin skeletons, and invisible joiners/width characters are
    * DELETED (both engines' `translate` drops source characters beyond
    * the replacement string's length). The pair of strings is the
    * single source of truth for the Spark plan AND the DuckDB oracle,
    * so the skeleton is bit-identical cross-engine. Deliberately
    * conservative: only unambiguous lookalikes — a full confusables
    * table is data, not code, and would ship as a broadcast lookup.
    */
  private[graft] val ConfusablesFrom: String =
    "аеорсхуіј" + // а е о р с х у і ј
    "АВЕКМНОРСТХ" + // А В Е К М Н О Р С Т Х
    "οαν" + // Greek ο α ν
    // ZWSP, ZWNJ, ZWJ, soft hyphen, BOM/ZWNBSP: deleted (no target)
    "\u200B\u200C\u200D\u00AD\uFEFF"
  private[graft] val ConfusablesTo: String =
    "aeopcxyij" + "ABEKMHOPCTX" + "oav"

  /** q212 chunking window (tokens) and stride: ~100-token docs yield
    * 4–5 overlapping chunks each (overlap = ChunkW − ChunkS = 8).
    */
  private val ChunkW = 32
  private val ChunkS = 24

  /** Sliding-window chunker shared by q212 (emission) and q215
    * (boilerplate audit): one narrow start-sequence explode per doc.
    */
  private[graft] def slidingChunks(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t != '')").as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
        posexplode(expr(s"transform(sequence(1, size(tk), $ChunkS), " +
          s"i -> struct(i AS start_tok, " +
          s"array_join(slice(tk, i, $ChunkW), ' ') AS chunk))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_no"),
        col("col.start_tok").cast("long").as("start_tok"),
        least(col("n_tokens") - col("col.start_tok") + 1,
          lit(ChunkW.toLong)).as("chunk_tokens"),
        md5(col("col.chunk")).as("chunk_hash"))

  /** q249 t-closeness over (quasi-ID = nation × segment, sensitive =
    * acctbal in four fixed buckets). See the queries-map entry for the
    * contract; factored out so CurationOpsSpec can drive crafted
    * distributions through the same plan.
    */
  private[graft] def tCloseness(cust: DataFrame): DataFrame = {
    val s = cust.sparkSession
    val m = 4
    val bucket = when(col("c_acctbal") < 0, 0)
      .when(col("c_acctbal") < 3000, 1)
      .when(col("c_acctbal") < 6000, 2).otherwise(3)
    val cell = cust
      .groupBy(col("c_nationkey").as("nation"),
        col("c_mktsegment").as("segment"), bucket.as("b"))
      .agg(count(lit(1)).as("cnt"))
    // dense |groups|×m grid so empty buckets still carry cumulatives
    val grid = cell.select(col("nation"), col("segment")).distinct()
      .crossJoin(s.range(0, m).select(col("id").cast("int").as("b")))
      .join(cell, Seq("nation", "segment", "b"), "left")
      .na.fill(0L, Seq("cnt"))
    val wg = Window.partitionBy(col("nation"), col("segment"))
      .orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val glob = grid.groupBy(col("b")).agg(sum(col("cnt")).as("gcnt"))
      .withColumn("gcum", sum(col("gcnt")).over(
        Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = glob.agg(sum(col("gcnt")).as("bigN"))
    grid
      .withColumn("cum", sum(col("cnt")).over(wg))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("nation"), col("segment"))))
      .join(glob.select(col("b"), col("gcum")), "b")
      .crossJoin(broadcast(tot))
      .filter(col("b") < m - 1) // EMD sums the first m−1 cumulatives
      .groupBy(col("nation"), col("segment"))
      .agg(max(col("n")).as("n"),
        round(sum(abs(col("cum") * col("bigN") - col("gcum") * col("n")))
          .cast("double") /
          (lit((m - 1).toDouble) * max(col("n")) * max(col("bigN"))), 6)
          .as("t_close"))
      .withColumn("at_risk", col("t_close") > 0.2)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q240 k-anonymity / l-diversity audit [Sweeney '02; Machanavajjhala
    // '07] — the privacy gate a dataset release runs BEFORE training:
    // group by the quasi-identifier tuple (nation × market segment),
    // flag groups smaller than k = 10 (re-identifiable), and measure
    // l-diversity of a sensitive attribute (account-balance sign)
    // within each group — a group whose sensitive value is uniform
    // leaks it even at k. One map-side-combined aggregation over
    // bounded quasi-ID keys (|nations| × |segments|) — the profiler
    // discipline: counts and one distinct, no corpus re-scan per
    // metric.
    // q269 differentially-private count release — the Laplace
    // mechanism [Dwork et al., TCC'06] over the (lang, source) doc
    // counts: disjoint cells have sensitivity 1, so noise ~ Lap(1/ε)
    // per cell (ε = 1), plus k-suppression of small cells (k = 5, the
    // q240 threshold) so the noise never has to carry tiny counts
    // alone. The noise here is DETERMINISTIC by design — inverse-CDF
    // over an md5-seeded uniform, u = (h + 0.5)/2²⁴ strictly inside
    // (0, 1) so ln never sees 0 — the same test-harness stand-in
    // discipline as the md5 feature buckets (q94/q209): a production
    // release swaps a CSPRNG for the hash, nothing else moves. The
    // true count is emitted for the gate; a production release drops
    // that column. One map-side-combined aggregation; noise is a
    // narrow expression on the |langs × sources|-row result.
    //
    // OUTPUT CONTRACT (round-9 ADVICE): as shipped this entry provides
    // ZERO actual privacy — the md5 seed is recomputable by anyone
    // from the public cell name, so n_released is exactly invertible
    // to n_true (which is also emitted). It is the PLUMBING of a DP
    // release (sensitivity bookkeeping, suppression, noise shape)
    // under a deterministic test-harness noise source, and MUST NOT be
    // copied into a real release without swapping in a CSPRNG and
    // dropping n_true. Mirrored in SURVEY §2.11's q269 row.
    "q269_dp_release" -> ((s, d) => {
      val k = 5
      val h = expr("cast(conv(substring(md5(concat(lang, '|', source))," +
        " 1, 6), 16, 10) as double)")
      val u = (h + lit(0.5)) / lit(16777216.0)
      val v = u - lit(0.5)
      val noise = -signum(v) * log(lit(1.0) - lit(2.0) * abs(v))
      Tables(s, d, "documents").groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_true"))
        .select(col("lang"), col("source"), col("n_true"),
          when(col("n_true") >= k, round(col("n_true") + noise, 4))
            .as("released"),
          (col("n_true") < k).as("suppressed"))
    }),

    "q240_k_anonymity" -> ((s, d) =>
      Tables(s, d, "customer")
        .groupBy(col("c_nationkey").as("nation"),
          col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"),
          (count(lit(1)) < 10).cast("long").as("at_risk"),
          countDistinct((col("c_acctbal") < 0).cast("int"))
            .as("l_div"))),

    // q249 t-closeness audit [Li, Li & Venkatasubramanian, ICDE'07] —
    // the distributional complement of q240: a group can pass k-anonymity
    // AND l-diversity yet still leak (its sensitive distribution skewed
    // far from the table's). t-closeness bounds the ordered-EMD between
    // each quasi-ID group's sensitive distribution (account balance in
    // four fixed buckets) and the global one:
    //   EMD = (1/(m−1)) · Σ_{i<m} |CumP_i − CumQ_i|
    // computed INTEGER-EXACTLY as |cumcnt_i·N − gcum_i·n| summed in
    // longs with ONE double division at the end — order-independent,
    // so both engines hash-agree without a float-summation contract.
    // Scale: one map-side-combined aggregation on (quasi-ID, bucket)
    // reduces the corpus; everything after runs on the bounded
    // |groups|×4 grid (the fold-grid discipline). Long bound: counts
    // fit 32 bits through ~2·10⁹ rows per side; beyond that the same
    // formula lifts to DECIMAL.
    "q249_t_closeness" -> ((s, d) => tCloseness(Tables(s, d, "customer"))),

    // q230 homoglyph-skeleton dedup — the adversarial-duplicate pass:
    // spam/SEO corpora evade exact dedup by swapping Latin letters for
    // Cyrillic/Greek lookalikes or injecting zero-width characters.
    // Folding every doc to its confusable SKELETON (builtin `translate`
    // — codegen'd, no UDF, chars beyond the replacement deleted) and
    // exact-grouping on the skeleton catches what q20 misses:
    // n_texts > 1 inside a cluster means visually-identical docs whose
    // raw bytes differ (planted and pinned in CurationOpsSpec; the
    // clean driver corpus yields all-singleton clusters, every skeleton
    // hash-checked). One map-side-combined shuffle on the 16-byte
    // skeleton hash — exactly q20's scale shape.
    "q230_homoglyph_dedup" -> ((s, d) => {
      val skel = md5(lower(translate(col("text"),
        ConfusablesFrom, ConfusablesTo)))
      Tables(s, d, "documents")
        .groupBy(skel.as("skel_key"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("text")).as("n_texts"),
          min(col("doc_id")).as("keeper"))
    }),

    // Decontamination via inverted shingle index: a document is
    // contaminated iff it shares ANY 3-token shingle with the probe set.
    // q212 sliding-window document chunking — the context-window prep
    // pass of a training/RAG pipeline: each doc becomes overlapping
    // token windows of ChunkW tokens at stride ChunkS (overlap
    // ChunkW − ChunkS). ENTIRELY NARROW — one explode of a per-row
    // start sequence, zero shuffles; at 100 TB this is map-only work
    // fused behind the scan. Chunk identity is an md5 over the joined
    // window (so downstream exact-dedup of chunks composes with q20),
    // start/count arithmetic is integer-exact — hash-compared per row.
    "q212_chunk_sliding" -> ((s, d) =>
      slidingChunks(Tables(s, d, "documents"))),

    // q215 boilerplate-chunk audit — the CCNet/RefinedWeb "repeated
    // paragraph" pass, composing the q212 chunker with the q20 dedup
    // shape: chunks whose hash recurs across ≥ 2 DISTINCT documents are
    // boilerplate candidates (headers, license blocks, nav text). One
    // map-side-combined aggregation on the 16-byte chunk hash — the
    // exact-dedup shuffle shape at chunk granularity; at 100 TB this is
    // the pass that feeds chunk-level span removal (q114's splice).
    "q215_boilerplate_chunks" -> ((s, d) =>
      slidingChunks(Tables(s, d, "documents"))
        .groupBy(col("chunk_hash"))
        .agg(count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)),

    // q213 repetition-ratio quality filter (the Gopher/RefinedWeb
    // repetition rules): per doc, the duplicate-3-gram fraction
    // (1 − distinct/total 3-grams) and the top-token fraction (most
    // frequent token's share). Both are PER-ROW higher-order-function
    // folds over the token array — zero shuffles, the q28/q76 narrow
    // shape; the O(distinct × len) top-token scan is bounded by doc
    // length, not corpus size. keep = both signals under the Gopher
    // thresholds (0.2 / 0.3).
    "q213_rep_ratio" -> ((s, d) => {
      val tk = expr("filter(split(text, ' '), t -> t != '')")
      Tables(s, d, "documents")
        .select(col("doc_id"), tk.as("tk"))
        .filter(size(col("tk")) > 0)
        .withColumn("g3", expr(
          """case when size(tk) >= 3 then
            |  transform(sequence(1, size(tk) - 2),
            |    i -> concat_ws(' ', element_at(tk, i), element_at(tk, i+1),
            |                   element_at(tk, i+2)))
            |else array() end""".stripMargin))
        .withColumn("top_cnt", expr(
          "array_max(transform(array_distinct(tk), " +
            "w -> size(filter(tk, x -> x = w))))"))
        .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
          size(col("g3")).cast("long").as("n_3grams"),
          when(size(col("g3")) > 0,
            round(lit(1.0) - size(array_distinct(col("g3")))
              / size(col("g3")).cast("double"), 6)).otherwise(lit(0.0))
            .as("dup3_frac"),
          round(col("top_cnt") / size(col("tk")).cast("double"), 6)
            .as("top_tok_frac"))
        .withColumn("keep",
          col("dup3_frac") < 0.2 && col("top_tok_frac") < 0.3)
    }),

    // The probe side is a benchmark suite — bounded by construction, so
    // its distinct shingles BROADCAST (the standard decontamination
    // shape); the corpus side streams through an exploded semi-join +
    // anti-join, never materializing pairs. Docs with < 3 tokens carry
    // no shingles and pass clean, in both engines.
    "q57_decontaminate" -> ((s, d) => {
      val sh = ShingleCache.arrays(s, d)
      val probeShingles = sh.filter(isProbe(col("doc_id")))
        .select(explode(col("sh")).as("ps")).distinct()
      val contaminated = sh.filter(!isProbe(col("doc_id")))
        .select(col("doc_id"), explode(col("sh")).as("ss"))
        .join(broadcast(probeShingles), col("ss") === col("ps"))
        .select(col("doc_id")).distinct()
      Tables(s, d, "documents").filter(!isProbe(col("doc_id")))
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // Decontamination, corpus-scale form: identical semantics to q57,
    // but the probe set is summarized into a ~16 KB Bloom filter instead
    // of broadcasting its distinct shingles — at 100 TB a benchmark
    // suite's shingle set is GBs (un-broadcastable) while its bloom
    // stays KBs at any probe-set size (bits scale with the PROBE count,
    // 10 bits/element). The corpus-side explode probes the bloom inside
    // WholeStageCodegen (a narrow pre-filter killing ~all clean
    // shingles); only surviving candidates reach the exact shingle
    // semi-join (no broadcast hint — the candidate side is now small, so
    // AQE owns the join strategy), whose verify removes bloom false
    // positives. Exact output == q57, so it shares that oracle. The
    // one-row `head` materializing the bloom is driver-side metadata,
    // same class as the IVF centroids.
    "q69_decontaminate_bloom" -> ((s, d) => {
      import graft.functions.bloom._
      val numBits = 1 << 17
      val k = 6
      val sh = ShingleCache.arrays(s, d)
      val probeShingles = sh.filter(isProbe(col("doc_id")))
        .select(explode(col("sh")).as("ps")).distinct()
      val bloomBytes = probeShingles
        .agg(bloom_agg(xxhash64(col("ps")), numBits, k).as("b"))
        .head().getAs[Array[Byte]](0)
      val contaminated = sh.filter(!isProbe(col("doc_id")))
        .select(col("doc_id"), explode(col("sh")).as("ss"))
        .filter(bloom_contains(bloomBytes, xxhash64(col("ss")), k))
        .join(probeShingles, col("ss") === col("ps"), "left_semi")
        .select(col("doc_id")).distinct()
      Tables(s, d, "documents").filter(!isProbe(col("doc_id")))
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // q175 contamination SCORE: where q57 makes the binary keep/drop
    // call, this emits the per-document overlap FRACTION — the share of
    // a doc's distinct 3-token shingles that appear anywhere in the
    // probe set (the graded contamination report a curation pipeline
    // reviews before choosing the q57 threshold). Probe shingles
    // broadcast (bounded by the benchmark suite); the corpus side is
    // one explode + left-semi-count + per-doc aggregate. Docs with no
    // shingles (< 3 tokens) carry no row, same contract as q57.
    "q175_overlap_score" -> ((s, d) => {
      val sh = ShingleCache.arrays(s, d)
      val probeShingles = sh.filter(isProbe(col("doc_id")))
        .select(explode(col("sh")).as("ps")).distinct()
      sh.filter(!isProbe(col("doc_id")))
        .select(col("doc_id"), explode(col("sh")).as("ss"))
        .join(broadcast(probeShingles), col("ss") === col("ps"),
          "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("ps").isNotNull, 1L).otherwise(0L)).as("n_hits"))
        .withColumn("overlap",
          round(col("n_hits").cast("double") / col("n_shingles"), 6))
    }),

    // q180 weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    // A-ES): each doc draws u from its md5 (60 bits → uniform [0,1)),
    // ranks by u^(1/w) with w = token count, and the top-k per language
    // win — exact weighted reservoir semantics, fully reproducible
    // across engines/runs/cluster sizes like the q50/q60/q84 md5
    // family (q84 is Bernoulli-by-weight; this is the fixed-size
    // no-replacement twin). Keys stay internal (floats never output),
    // so the oracle hash-compares the SELECTED SET. The per-language
    // rank window runs over the corpus: at 100 TB the same top-k comes
    // from the q6→q44 TopKAgg single-aggregation form.
    "q180_weighted_reservoir" -> ((s, d) => {
      val k = 3
      val t = Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("w"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 15),
            16, 10).cast("long").cast("double")
            / lit(1152921504606846976.0)).as("u"))
      val keyed = t.withColumn("es_key", pow(col("u"), lit(1.0) / col("w")))
      keyed.withColumn("rn", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("es_key").desc, col("doc_id"))))
        .filter(col("rn") <= k)
        .select(col("lang"), col("doc_id"), col("w"))
    }),

    // PII scrub: redact emails and 6+-digit runs (patterns chosen to
    // parse identically under Java regex and RE2), count matches, and
    // hash the redacted text — the hash pins byte-identical replacement
    // behavior cross-engine even on a corpus with no PII. Narrow
    // (per-row), codegen'd, no shuffle but the final small agg.
    // q203 group-mean imputation — the fill-don't-drop missing-value
    // treatment (q178 audits nulls; this REPAIRS them): values flagged
    // missing by a deterministic rule (event_id % 7 == 0, identical in
    // both engines) are replaced with their event-type's mean over the
    // PRESENT values. Two bounded passes: per-type decimal moments over
    // present rows (the q102 broadcast-scalar shape — means rounded to
    // 6 dp so both engines substitute identical constants), then one
    // narrow fill + per-type audit aggregation. Zero corpus shuffles
    // beyond the two grouped reductions.
    "q203_impute" -> ((s, d) => {
      val ev = Tables(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          (col("event_id") % 7 === 0).as("missing"))
      val means = ev.filter(!col("missing"))
        .groupBy(col("event_type"))
        .agg(round(sum(col("value").cast("decimal(18,4)")).cast("double")
          / count(lit(1)), 6).as("fill"))
      ev.join(broadcast(means), "event_type")
        .withColumn("v2", when(col("missing"), col("fill"))
          .otherwise(col("value")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("missing"), 1L).otherwise(0L)).as("n_imputed"),
          max(col("fill")).as("fill_value"),
          round(sum(col("v2").cast("decimal(18,4)")).cast("double"), 4)
            .as("sum_filled"))
    }),

    // q209 DSIR-style importance weights [Xie et al., NeurIPS'23] — the
    // data-SELECTION pass: score every corpus doc by how target-like it
    // is, log w(d) = Σ_f [ln p_target(f) − ln p_corpus(f)] over the
    // doc's hashed-bigram features. Feature space is 256 md5 buckets
    // (md5 so DuckDB mirrors the hash — the q94 discipline; swap
    // xxhash64 at production), so BOTH distributions are 256-row
    // BOUNDED tables broadcast over one corpus feature pass, and the
    // per-bucket log-ratios are precomputed there — the corpus join
    // carries one long per feature hit. Add-one smoothing; exact
    // log-MICROS sums (q189). Target = the 'en' slice; output = the
    // deterministic top-20 most-target-like non-target docs.
    "q209_dsir_weights" -> ((s, d) => {
      val feats = Tables(s, d, "documents")
        // guard 1-token docs: Spark's sequence(1, 0) DESCENDS (the
        // fuzzyPairs lesson) where DuckDB's range(1, 1) is empty.
        // explode_OUTER because the >= 2 filter already guarantees a
        // non-empty array: plain explode pushes its emptiness guard
        // into the scan filter, where the interpreted (non-codegen)
        // transform gets re-evaluated per conjunct — the q70 lesson.
        // split() is HOISTED out of the lambda: referenced inline it is
        // re-evaluated on every element_at, i.e. ~184 full-text splits
        // per doc instead of 1 (CollapseProject keeps the hoist because
        // tk is non-cheap and multiply referenced)
        .withColumn("tk", split(col("text"), " "))
        .filter(size(col("tk")) >= 2)
        .select(col("doc_id"), col("lang"), explode_outer(expr(
          """transform(sequence(1, size(tk) - 1),
            |  i -> cast(conv(substring(md5(concat_ws(' ',
            |    element_at(tk, i),
            |    element_at(tk, i + 1))), 1, 4), 16, 10)
            |    as int) % 256)""".stripMargin)).as("f"))
      val lnM = (c: org.apache.spark.sql.Column) =>
        round(log(c) * lit(1e6), 0).cast("long")
      val dist = feats
        .groupBy(col("f"))
        .agg(count(lit(1)).as("cc"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      // distribution totals via a window over the 256-row table — a
      // driver head() here would trigger a THIRD corpus tokenize+md5
      // pass at plan-build time (measured: 6.4 s → 4.4 s without it)
      val wAll = Window.partitionBy()
      val ratios = dist
        .withColumn("tc", sum(col("cc")).over(wAll))
        .withColumn("tt", sum(col("ct")).over(wAll))
        .select(col("f"),
          (lnM(col("ct") + 1) - lnM(col("tt") + 256.0)
            - lnM(col("cc") + 1) + lnM(col("tc") + 256.0)).as("lr"))
      feats.filter(col("lang") =!= "en")
        .join(broadcast(ratios), "f")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("w_micros"))
        .orderBy(col("w_micros").desc, col("doc_id"))
        .limit(20)
    }),

    // q208 NFC canonicalization audit — the Unicode-normalization pass
    // ahead of exact-hash dedup (composed vs decomposed code points
    // hash apart), via the codegen'd NfcNormalize kernel; DuckDB's
    // nfc_normalize implements the same UAX#15 form, so the audit
    // (how many docs change, net length delta) is oracle-checkable.
    // Entirely narrow; the synthetic corpus is ASCII so the corpus
    // numbers are the identity case — TextKernelsSpec pins the real
    // composed/decomposed behavior on unicode fixtures.
    "q208_nfc_audit" -> ((s, d) => {
      val n = graft.functions.textkernels.nfc_normalize(col("text"))
      Tables(s, d, "documents")
        .select(col("text"), n.as("norm"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("norm") =!= col("text"), 1L).otherwise(0L))
            .as("n_changed"),
          sum((length(col("norm")) - length(col("text"))).cast("long"))
            .as("len_delta"))
    }),

    "q58_pii_scrub" -> ((s, d) => {
      val email = "[a-z0-9.]+@[a-z0-9.]+"
      val longNum = "[0-9]{6,}"
      Tables(s, d, "documents")
        .select(col("doc_id"), col("source"),
          regexp_count(col("text"), lit(email)).as("n_emails"),
          regexp_count(col("text"), lit(longNum)).as("n_nums"),
          md5(regexp_replace(regexp_replace(col("text"), email, "<email>"),
            longNum, "<num>")).as("redacted_md5"))
    }),

    // Normalization: lowercase → strip non-[a-z0-9 ] → collapse runs of
    // spaces → trim. Output lengths + token counts of the canonical
    // form (the text ahead of exact dedup / tokenization).
    "q59_normalize" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"),
          trim(regexp_replace(regexp_replace(lower(col("text")),
            "[^a-z0-9 ]", ""), "  +", " ")).as("norm"))
        .select(col("doc_id"), md5(col("norm")).as("norm_md5"),
          length(col("norm")).as("n_chars"),
          size(split(col("norm"), " ")).as("n_tokens"))),

    // Stratified deterministic sampling: per-language keep rates via the
    // q50 md5-threshold primitive (en 50%, de/es 25%, others 12.5%) —
    // reproducible across engines/runs/cluster sizes, no RNG state, and
    // the rate table is a literal CASE (bounded metadata, no join).
    "q60_stratified_sample" -> ((s, d) =>
      Tables(s, d, "documents")
        .withColumn("thr",
          when(col("lang") === "en", "80")
            .when(col("lang").isin("de", "es"), "40")
            .otherwise("20"))
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2)
          < col("thr"))
        .select(col("doc_id"), col("lang"), col("source"))),

    // Weighted deterministic sampling (expected-size k per language,
    // weight = token count): keep doc iff u · W_lang < k · w, with
    // u = Knuth-multiplicative-hash(doc_id) — INTEGER arithmetic end to
    // end, so both engines agree bit-for-bit and no per-group sort or
    // reservoir state exists at all: one tiny per-lang total broadcast
    // back over a narrow filter pass, the weighted analogue of q50.
    // (At extreme corpus scale u·W_lang can outgrow BIGINT — widen the
    // product to DECIMAL(38,0); same plan shape.)
    "q84_weighted_sample" -> ((s, d) => {
      val k = 50L
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("w"))
      val tot = docs.groupBy("lang").agg(sum(col("w")).as("wtot"))
      docs.join(broadcast(tot), Seq("lang"))
        .filter(pmod(col("doc_id") * 2654435761L, lit(4294967296L))
          * col("wtot") < lit(k) * col("w") * lit(4294967296L))
        .select(col("doc_id"), col("lang"), col("w"))
    })
  )

  /** Shared by q57 and q69: the bloom is a pure pre-filter (no false
    * negatives; false positives die in the exact verify), so both forms
    * produce the identical clean set.
    */
  private val decontaminateSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
      |           FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
      |          FOR i IN range(1, len(tk) - 1)])) AS s FROM t),
      |probe AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
      |bad AS (SELECT DISTINCT x.doc_id FROM sh x JOIN probe p ON x.s = p.s
      |        WHERE x.doc_id % 97 != 0)
      |SELECT d.doc_id, d.lang, d.source FROM documents d
      |WHERE d.doc_id % 97 != 0
      |  AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id)"""
      .stripMargin

  def oracle: Map[String, String] = Map(
    "q249_t_closeness" ->
      """WITH cell AS (
        |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
        |    CASE WHEN c_acctbal < 0 THEN 0 WHEN c_acctbal < 3000 THEN 1
        |         WHEN c_acctbal < 6000 THEN 2 ELSE 3 END AS b,
        |    COUNT(*) AS cnt
        |  FROM customer GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT g.nation, g.segment, bb.b,
        |    COALESCE(c.cnt, 0) AS cnt
        |  FROM (SELECT DISTINCT nation, segment FROM cell) g
        |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) bb
        |  LEFT JOIN cell c ON c.nation = g.nation
        |    AND c.segment = g.segment AND c.b = bb.b),
        |gdist AS (
        |  SELECT b, SUM(cnt) AS gcnt,
        |    SUM(SUM(cnt)) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum
        |  FROM grid GROUP BY b),
        |tot AS (SELECT SUM(gcnt) AS bigN FROM gdist),
        |cums AS (
        |  SELECT nation, segment, b,
        |    SUM(cnt) OVER (PARTITION BY nation, segment ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY nation, segment) AS n
        |  FROM grid),
        |emd AS (
        |  SELECT nation, segment, CAST(MAX(n) AS BIGINT) AS n,
        |    round(CAST(SUM(ABS(cum * bigN - gcum * n)) AS DOUBLE)
        |      / (3.0 * MAX(n) * MAX(bigN)), 6) AS t_close
        |  FROM cums JOIN gdist USING (b), tot
        |  WHERE b < 3
        |  GROUP BY nation, segment)
        |SELECT nation, segment, n, t_close, t_close > 0.2 AS at_risk
        |FROM emd""".stripMargin,
    "q269_dp_release" ->
      """WITH g AS (SELECT lang, source, CAST(count(*) AS BIGINT)
        |    AS n_true FROM documents GROUP BY 1, 2),
        |n AS (SELECT *,
        |    (CAST(('0x' || substr(md5(lang || '|' || source), 1, 6))
        |       AS INTEGER) + 0.5) / 16777216.0 - 0.5 AS v
        |  FROM g)
        |SELECT lang, source, n_true,
        |  CASE WHEN n_true >= 5 THEN
        |    round(n_true + -sign(v) * ln(1.0 - 2.0 * abs(v)), 4) END
        |    AS released,
        |  n_true < 5 AS suppressed
        |FROM n""".stripMargin,
    "q240_k_anonymity" ->
      """SELECT c_nationkey AS nation, c_mktsegment AS segment,
        |  count(*) AS n,
        |  CAST(count(*) < 10 AS BIGINT) AS at_risk,
        |  CAST(count(DISTINCT CAST(c_acctbal < 0 AS INT)) AS BIGINT)
        |    AS l_div
        |FROM customer GROUP BY 1, 2""".stripMargin,
    // the mapping strings interpolate from the SAME Scala constants the
    // Spark plan uses — one source of truth for the skeleton
    "q230_homoglyph_dedup" ->
      s"""SELECT md5(lower(translate(text, '$ConfusablesFrom',
         |    '$ConfusablesTo'))) AS skel_key,
         |  COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_texts,
         |  MIN(doc_id) AS keeper
         |FROM documents
         |GROUP BY 1""".stripMargin,
    "q212_chunk_sliding" ->
      s"""WITH t AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), x -> x != '') AS tk
         |  FROM documents),
         |f AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0),
         |s AS (SELECT doc_id, tk, n, unnest(range(1, n + 1, $ChunkS))
         |    AS start_tok FROM f)
         |SELECT doc_id,
         |  CAST((start_tok - 1) / $ChunkS + 1 AS BIGINT) AS chunk_no,
         |  CAST(start_tok AS BIGINT) AS start_tok,
         |  CAST(least(n - start_tok + 1, $ChunkW) AS BIGINT)
         |    AS chunk_tokens,
         |  md5(array_to_string(list_slice(tk, start_tok,
         |    least(start_tok + ${ChunkW - 1}, n)), ' ')) AS chunk_hash
         |FROM s""".stripMargin,
    "q215_boilerplate_chunks" ->
      s"""WITH t AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), x -> x != '') AS tk
         |  FROM documents),
         |f AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0),
         |s AS (SELECT doc_id, tk, n, unnest(range(1, n + 1, $ChunkS))
         |    AS start_tok FROM f),
         |c AS (SELECT doc_id, md5(array_to_string(list_slice(tk,
         |    start_tok, least(start_tok + ${ChunkW - 1}, n)), ' '))
         |    AS chunk_hash FROM s)
         |SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs,
         |  COUNT(*) AS n_occurrences, MIN(doc_id) AS first_doc
         |FROM c GROUP BY chunk_hash
         |HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin,
    "q213_rep_ratio" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x != '') AS tk
        |  FROM documents),
        |f AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0),
        |g AS (SELECT doc_id, tk, n,
        |    CASE WHEN n >= 3 THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                           FOR i IN range(1, n - 1)]
        |         ELSE [] END AS g3 FROM f),
        |m AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |    CAST(len(g3) AS BIGINT) AS n_3grams,
        |    CASE WHEN len(g3) > 0
        |      THEN round(1.0 - len(list_distinct(g3))
        |                   / CAST(len(g3) AS DOUBLE), 6)
        |      ELSE 0.0 END AS dup3_frac,
        |    round(list_max(list_transform(list_distinct(tk),
        |        w -> len(list_filter(tk, x -> x = w))))
        |      / CAST(n AS DOUBLE), 6) AS top_tok_frac
        |  FROM g)
        |SELECT doc_id, n_tokens, n_3grams, dup3_frac, top_tok_frac,
        |  dup3_frac < 0.2 AND top_tok_frac < 0.3 AS keep
        |FROM m""".stripMargin,
    "q209_dsir_weights" ->
      """WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS sp
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |ft AS (SELECT doc_id, lang,
        |    unnest([CAST(('0x' || substr(md5(sp[i] || ' ' || sp[i+1]),
        |      1, 4)) AS INTEGER) % 256 FOR i IN range(1, len(sp))]) AS f
        |  FROM tk),
        |dist AS (SELECT f, COUNT(*) AS cc,
        |    COUNT(*) FILTER (lang = 'en') AS ct FROM ft GROUP BY f),
        |tot AS (SELECT SUM(cc) AS tc, SUM(ct) AS tt FROM dist),
        |r AS (SELECT f,
        |    CAST(round(ln(ct + 1) * 1000000, 0) AS BIGINT)
        |    - CAST(round(ln(tt + 256.0) * 1000000, 0) AS BIGINT)
        |    - CAST(round(ln(cc + 1) * 1000000, 0) AS BIGINT)
        |    + CAST(round(ln(tc + 256.0) * 1000000, 0) AS BIGINT) AS lr
        |  FROM dist, tot)
        |SELECT ft.doc_id, ft.lang, COUNT(*) AS n_feats,
        |  CAST(SUM(r.lr) AS BIGINT) AS w_micros
        |FROM ft JOIN r ON ft.f = r.f
        |WHERE ft.lang <> 'en'
        |GROUP BY ft.doc_id, ft.lang
        |ORDER BY w_micros DESC, doc_id LIMIT 20""".stripMargin,
    "q208_nfc_audit" ->
      """SELECT COUNT(*) AS n_docs,
        |  CAST(COUNT(*) FILTER (nfc_normalize(text) <> text) AS BIGINT)
        |    AS n_changed,
        |  CAST(COALESCE(SUM(len(nfc_normalize(text)) - len(text)), 0)
        |    AS BIGINT) AS len_delta
        |FROM documents""".stripMargin,
    "q203_impute" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |    event_id % 7 = 0 AS missing FROM events),
        |m AS (SELECT event_type,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |      / COUNT(*), 6) AS fill
        |  FROM e WHERE NOT missing GROUP BY event_type)
        |SELECT e.event_type, COUNT(*) AS n,
        |  CAST(COUNT(*) FILTER (missing) AS BIGINT) AS n_imputed,
        |  MAX(m.fill) AS fill_value,
        |  round(CAST(SUM(CAST(CASE WHEN missing THEN m.fill ELSE value END
        |    AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_filled
        |FROM e JOIN m ON e.event_type = m.event_type
        |GROUP BY e.event_type""".stripMargin,
    "q180_weighted_reservoir" ->
      """WITH t AS (SELECT doc_id, lang,
        |    len(string_split(text, ' ')) AS w,
        |    CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
        |        1, 15) AS UBIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |k AS (SELECT doc_id, lang, w, pow(u, 1.0 / w) AS es_key FROM t),
        |r AS (SELECT doc_id, lang, w,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY es_key DESC, doc_id) AS rn FROM k)
        |SELECT lang, doc_id, CAST(w AS INTEGER) AS w
        |FROM r WHERE rn <= 3""".stripMargin,
    "q175_overlap_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |          FOR i IN range(1, len(tk) - 1)])) AS s FROM t),
        |probe AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
        |SELECT x.doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN p.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hits,
        |  round(CAST(SUM(CASE WHEN p.s IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*), 6) AS overlap
        |FROM sh x LEFT JOIN probe p ON x.s = p.s
        |WHERE x.doc_id % 97 != 0
        |GROUP BY x.doc_id""".stripMargin,
    "q84_weighted_sample" ->
      """WITH t AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS w
        |  FROM documents),
        |tot AS (SELECT lang, CAST(SUM(w) AS BIGINT) AS wtot FROM t
        |        GROUP BY lang)
        |SELECT doc_id, lang, w FROM t JOIN tot USING (lang)
        |WHERE ((doc_id * 2654435761) % 4294967296) * wtot
        |      < 50 * w * 4294967296""".stripMargin,
    "q57_decontaminate" -> decontaminateSql,
    "q69_decontaminate_bloom" -> decontaminateSql,
    "q58_pii_scrub" ->
      """SELECT doc_id, source,
        | CAST(len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
        |   AS INTEGER) AS n_emails,
        | CAST(len(regexp_extract_all(text, '[0-9]{6,}'))
        |   AS INTEGER) AS n_nums,
        | md5(regexp_replace(regexp_replace(text,
        |   '[a-z0-9.]+@[a-z0-9.]+', '<email>', 'g'),
        |   '[0-9]{6,}', '<num>', 'g')) AS redacted_md5
        |FROM documents""".stripMargin,
    "q59_normalize" ->
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), '  +', ' ', 'g')) AS norm
        | FROM documents)
        |SELECT doc_id, md5(norm) AS norm_md5,
        | CAST(length(norm) AS INTEGER) AS n_chars,
        | CAST(len(string_split(norm, ' ')) AS INTEGER) AS n_tokens
        |FROM n""".stripMargin,
    "q60_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE WHEN lang = 'en' THEN '80'
        |       WHEN lang IN ('de', 'es') THEN '40'
        |       ELSE '20' END""".stripMargin
  )
}
