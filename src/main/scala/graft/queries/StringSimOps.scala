package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.stringdistances.{dam_lev, jaro_winkler}
import graft.operators.GlobalRank

/** Record-linkage string similarity (SURVEY.md §2.11 [EXT]) — the fuzzy
  * matching layer the reference's text pipeline implies but cannot
  * express (its records are opaque lines): Damerau-Levenshtein and
  * Jaro-Winkler as custom codegen kernels (see
  * [[graft.functions.StringDistance]]), applied in the two standard
  * shapes:
  *
  *  - q139 blocked fuzzy pair join: candidate pairs come from an equi-
  *    join on a blocking key (p_brand) — never an all-pairs cross join —
  *    then the O(n·m) distance kernel verifies only within-block pairs.
  *    At 100 TB the blocking key bounds per-task work exactly like the
  *    q91 deletion-neighborhood and q23 inverted-index joins; the kernel
  *    is integer-exact so the oracle hash-compares with no rounding.
  *  - q140 per-row metric columns: a narrow scan computing all three
  *    measures (builtin levenshtein + the two custom kernels) — the
  *    profiling pass a linkage pipeline runs before choosing thresholds.
  *
  * Both oracle-checked: DuckDB ships the same textbook definitions
  * (unrestricted DL; Jaro-Winkler with boost threshold 0.7, p=0.1,
  * prefix<=4 — verified constants, see StringDistances.scala).
  */
object StringSimOps {

  /** Max Damerau-Levenshtein distance for a q139 fuzzy match. */
  private val MaxDist = 2

  /** q160 sorted-neighborhood window: each record pairs with its next
    * `SnmWindow` successors in global sort order.
    */
  private val SnmWindow = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_fuzzy_pairs" -> ((s, d) => {
      // KERNEL WORK RUNS ON THE NAME VOCABULARY, NOT THE ROW COUNT: a
      // duplicate-heavy key column (the norm for product/entity names)
      // makes row-level pairing quadratic in block population — the 10x
      // scale smoke measured the row-pair form at 100x the work for 0
      // new DISTINCT names. So: dedupe to (brand, name), pair + verify
      // THERE, and expand winners back to part keys by two equi-joins.
      // Kernel cost is now vocabulary-bounded; only the expansion scales
      // with the output.
      // per-NAME char-class histogram: an edit moves the 4-bucket
      // histogram by at most 2 (substitution), 1 (indel) or 0
      // (transposition), so dl <= MaxDist implies pairwise L1 distance
      // <= 2*MaxDist — a SOUND prune costing 8 integer ops per pair
      def sig(i: Int, lo: String, hi: String) =
        size(filter(split(col("name"), ""),
          x => x >= lit(lo) && x <= lit(hi))).as(s"s$i")
      val p = Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      val dn = p.select(col("p_brand").as("brand"), col("p_name").as("name"))
        .distinct()
        .select(col("brand"), col("name"), sig(1, "a", "g"),
          sig(2, "h", "n"), sig(3, "o", "t"), sig(4, "u", "z"))
      val cand = dn.as("a").join(dn.as("b"),
        col("a.brand") === col("b.brand")
          && col("a.name") <= col("b.name"))
      val l1 = (1 to 4).map(i =>
        abs(col(s"a.s$i") - col(s"b.s$i"))).reduce(_ + _)
      // filter ladder, cheapest first, each SOUND for dl <= MaxDist:
      // length gap (dl >= |len gap|), histogram L1, banded builtin
      // levenshtein (dl >= lev/2 — a transposition costs 1 in DL, 2 in
      // lev — and the 3-arg form early-exits at the threshold), then
      // the exact kernel on the near-miss survivors only
      val namePairs = cand
        .filter(abs(length(col("a.name")) - length(col("b.name")))
          <= MaxDist)
        .filter(l1 <= 2 * MaxDist)
        .filter(levenshtein(col("a.name"), col("b.name"),
          2 * MaxDist) >= 0)
        .select(col("a.brand").as("brand"),
          col("a.name").as("name_a"), col("b.name").as("name_b"),
          dam_lev(col("a.name"), col("b.name")).as("dl_dist"),
          round(jaro_winkler(col("a.name"), col("b.name")), 6).as("jw_sim"))
        .filter(col("dl_dist") <= MaxDist)
      // expand: each unordered part pair materializes exactly once —
      // name_a < name_b pairs once per (pa, pb) combo, the diagonal
      // (identical names, dl = 0) once per key-ordered combo
      namePairs
        .join(p.as("pa"), col("brand") === col("pa.p_brand")
          && col("name_a") === col("pa.p_name"))
        .join(p.as("pb"), col("brand") === col("pb.p_brand")
          && col("name_b") === col("pb.p_name"))
        .filter(col("name_a") < col("name_b")
          || col("pa.p_partkey") < col("pb.p_partkey"))
        .select(least(col("pa.p_partkey"), col("pb.p_partkey")).as("key_a"),
          greatest(col("pa.p_partkey"), col("pb.p_partkey")).as("key_b"),
          col("dl_dist"), col("jw_sim"))
    }),

    "q140_string_metrics" -> ((s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"),
          levenshtein(col("p_name"), col("p_type")).as("lev_dist"),
          dam_lev(col("p_name"), col("p_type")).as("dl_dist"),
          round(jaro_winkler(col("p_name"), col("p_type")), 6).as("jw_sim"))),

    // q160 sorted-neighborhood linkage (Hernández & Stolfo SIGMOD'95):
    // the OTHER classic record-linkage blocking — where q139 blocks on a
    // key, SNM sorts the whole relation and pairs each record with its
    // next `SnmWindow` neighbors, catching near-dups whose blocking key
    // itself is dirty. The global sort position comes from
    // [[graft.operators.GlobalRank]] (range partition + local rank +
    // prefix offsets — NO single-partition window), the neighbor pairing
    // is an equi-join on rank (a-side exploded to rn+1..rn+w, never a
    // non-equi join), and the DL kernel verifies only the w·n candidate
    // pairs — linear in the corpus.
    "q160_sorted_neighborhood" -> ((s, d) => {
      val c = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_name"))
      val r = GlobalRank.withRank(c, "rn", col("c_name"), col("c_custkey"))
      val probes = r.select(col("c_custkey").as("key_a"),
          col("c_name").as("name_a"),
          explode(array((1 to SnmWindow).map(k => col("rn") + k): _*))
            .as("nbr"))
      probes.join(r.as("b"), col("nbr") === col("b.rn"))
        .select(col("key_a"), col("b.c_custkey").as("key_b"),
          dam_lev(col("name_a"), col("b.c_name")).as("dl_dist"))
        .filter(col("dl_dist") <= 1)
    })
  )

  def oracle: Map[String, String] = Map(
    "q139_fuzzy_pairs" ->
      s"""SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
         |  CAST(damerau_levenshtein(a.p_name, b.p_name) AS INTEGER)
         |    AS dl_dist,
         |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim
         |FROM part a JOIN part b
         |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
         |WHERE damerau_levenshtein(a.p_name, b.p_name) <= $MaxDist"""
        .stripMargin,
    "q160_sorted_neighborhood" ->
      s"""WITH r AS (SELECT c_custkey, c_name,
         |  row_number() OVER (ORDER BY c_name, c_custkey) AS rn
         | FROM customer)
         |SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
         |  CAST(damerau_levenshtein(a.c_name, b.c_name) AS INTEGER)
         |    AS dl_dist
         |FROM r a JOIN r b
         |  ON b.rn - a.rn BETWEEN 1 AND $SnmWindow
         |WHERE damerau_levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,
    "q140_string_metrics" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_name, p_type) AS INTEGER) AS lev_dist,
        |  CAST(damerau_levenshtein(p_name, p_type) AS INTEGER) AS dl_dist,
        |  round(jaro_winkler_similarity(p_name, p_type), 6) AS jw_sim
        |FROM part""".stripMargin
  )
}
