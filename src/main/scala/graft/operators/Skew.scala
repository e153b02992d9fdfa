package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the manual guard for the cases AQE's
  * runtime skew-join split can't reach (first shuffle of a stage, or state
  * kept across many stages).
  *
  * [[saltedJoin]] implements the classic salt/replicate pattern: the skewed
  * (fact) side gets a uniform random-free salt derived from a stable row
  * hash, the small (dim) side is replicated `salts` times, and the join key
  * becomes (key, salt) — splitting each hot key's rows across `salts`
  * reducers instead of one. Results are identical to the plain equi-join
  * (the salt is an internal column, dropped on output).
  *
  * At 100 TB: use for fact⋈dim where the dim is too big to broadcast and
  * the fact key is Zipfian (the CDC `table_name` key, a hot user id). The
  * salt count trades replication (dim × salts rows) against reducer fanout.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `salts` ways on the fact side.
    * `dim` must be the smaller side (it is replicated `salts` times).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer would emit each unmatched dim row `salts` times
    // (the replicas have no fact partner), breaking the identical-results
    // contract — only fact-side-preserving join types are sound here
    // same normalization as Spark's JoinType.apply: lowercase, drop '_'
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
        "leftanti", "anti")(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti, got $joinType")
    // unique internal column name — a fixed "__salt" would silently
    // REPLACE a user column of that name (and drop it on output), and
    // would break composing saltedJoin twice
    val saltName =
      s"__salt_${java.util.UUID.randomUUID().toString.take(8)}"
    // deterministic salt: stable row hash of all fact columns, not rand()
    // (re-execution of a task must salt identically for exactly-once sinks)
    val saltCol =
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(salts))
    val saltedFact = fact.withColumn(saltName, saltCol)
    val replicatedDim = dim
      .withColumn(saltName, explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(replicatedDim, Seq(key, saltName), joinType)
      .drop(saltName)
  }

  /** Two-stage (salted) aggregation for heavy-hitter group keys: first
    * aggregate on (key, salt), then merge partials on key. Only sensible
    * for algebraic aggregates; Spark's own partial aggregation already
    * covers the common case — this is for when the per-key partial state
    * itself is too hot for one task (e.g. huge collect-style state).
    *
    * The salt MUST vary WITHIN a key (here: the input partition id) — a
    * salt derived from the key alone is one constant per key, so stage 1
    * would still funnel every hot-key row through a single reducer and
    * the whole construction would be a no-op with an extra shuffle.
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame = {
    // unique internal name, same clobber hazard saltedJoin guards against
    val saltName =
      s"__salt_${java.util.UUID.randomUUID().toString.take(8)}"
    df.withColumn(saltName, pmod(spark_partition_id(), lit(salts)))
      .groupBy(key.as("k"), col(saltName))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_n")).as("n"))
  }
}
