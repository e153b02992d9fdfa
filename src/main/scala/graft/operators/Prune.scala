package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomExprs
import graft.functions.Exact._
import graft.sources.Tables._

/** Semi-join pruning with a Bloom filter — the "runtime filter" pattern
  * every warehouse engine applies to selective fact⋈dim joins, done here
  * as an explicit operator (Spark's own AQE variant,
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, injects the same
  * shape automatically when thresholds allow; PlanSpec exercises that
  * path too).
  *
  * Why it matters at 100 TB: a selective dim predicate (say 2% of orders)
  * still forces the FULL fact table through the join shuffle — the
  * fact-side scan has no predicate to push. Building a bloom filter over
  * the dim keys (distributed, mergeable, fixed-size result) and probing
  * it on the fact side BEFORE the exchange turns ~98% of the fact rows
  * around at the scan, shrinking the shuffle by the dim predicate's
  * selectivity at the cost of one extra dim pass + a codegen'd probe.
  * False positives are removed by the exact join that follows, so results
  * are bit-identical to the plain join — which is what lets the DuckDB
  * oracle gate this query.
  */
object Prune {
  type Q = (SparkSession, String) => DataFrame

  /** Exact equi-join `fact ⋈ dim` on long keys, with the fact side
    * pre-pruned by a bloom filter built from `dim(dimKey)`.
    *
    * `expectedItems` is the build-side cardinality ESTIMATE a production
    * caller takes from table stats — oversizing costs bits (1.2 MB per
    * 10⁶ keys at 1% fpp), undersizing costs false-positive rate, never
    * correctness.
    */
  def bloomPruneJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    fact.filter(BloomExprs.mightContainLong(bf, col(factKey)))
      .join(dim, col(factKey) === dim(dimKey))
  }

  val queries: Map[String, Q] = Map(
    // Urgent-order line revenue by month: the order predicate keeps ~20%
    // of orders, so 80% of lineitem never enters the join exchange — the
    // bloom probe turns it around at the scan. Output is exact (the
    // equi-join drops bloom false positives), hence DuckDB-gated.
    "prune_bloom_join" -> ((s, d) => {
      val urgent = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      bloomPruneJoin(lineitem(s, d), urgent, "l_orderkey", "o_orderkey",
          expectedItems = 1L << 20)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("order_month"))
        .agg(decSum(revenueTerm(col("l_extendedprice"), col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("order_month"))
    }))

  val oracles: Map[String, String] = Map(
    "prune_bloom_join" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY 1 ORDER BY order_month""")
}
