package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit runtime-filter join: build a bloom filter over the SMALL
  * side's join keys and prune the LARGE side's scan BEFORE its shuffle.
  *
  * At 100 TB the win is shuffle bytes: a selective dimension predicate
  * (say 1% of orders) means 99% of the fact side's shuffle write is
  * wasted on rows the join will drop. Spark 3.3+ can inject this
  * itself (`spark.sql.optimizer.runtime.bloomFilter.enabled`) but only
  * when column stats make the selectivity visible; this operator is the
  * guaranteed form — the bloom is KB-scale driver metadata (the q69
  * decontamination precedent) embedded as a codegen literal, so the
  * prune runs inside the fact scan's WholeStageCodegen span with zero
  * extra exchanges.
  *
  * Sound for inner joins (the only mode offered): blooms have no false
  * negatives, so no matching row is dropped, and false positives are
  * removed by the real join that follows — the result is EXACTLY the
  * plain join, which is what RuntimeFilterSpec pins and what lets the
  * driver oracle-check q130 against unhinted SQL.
  */
object RuntimeFilter {

  /** Inner equi-join of `large` and `small` with a bloom pre-filter on
    * the large side. Default 2^17 bits / 6 hashes ≈ 1% false positives
    * at 10k keys — 16 KB of driver metadata regardless of corpus size.
    */
  def bloomPrunedJoin(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      numBits: Int = 1 << 17, numHashes: Int = 6): DataFrame = {
    import graft.functions.bloom._
    val row = small.agg(
      bloom_agg(xxhash64(col(smallKey)), numBits, numHashes).as("b"))
      .head()
    val joined = (l: DataFrame) =>
      l.join(small, l(largeKey) === small(smallKey))
    if (row.isNullAt(0)) joined(large.filter(lit(false)))
    else joined(large.filter(
      bloom_contains(row.getAs[Array[Byte]](0),
        xxhash64(col(largeKey)), numHashes)))
  }
}
