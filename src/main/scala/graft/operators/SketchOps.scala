package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Mergeable-sketch pre-aggregation — the SURVEY §2.4 north-star option
  * ("custom TypedImperativeAggregate if mergeable sketch state must be
  * persisted"): Spark 4 ships Apache DataSketches HLL natively
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), so the
  * engine exposes the PATTERN — a persisted per-(group, day) sketch table
  * maintained incrementally and rolled up by union — without custom
  * aggregate code.
  *
  * Why this matters at 100 TB: COUNT(DISTINCT user) over a year of events
  * re-scans the year every time someone asks. The sketch table is the
  * scalable shape: one scan per day EVER (the day's events → a ~KB binary
  * sketch row), and every rollup — per type, per month, global, any
  * ad-hoc slice — is a union over KB-sized sketches, never a rescan.
  * Sketches are order-independent and mergeable, so late/backfilled days
  * just overwrite their partition and downstream unions stay correct;
  * `union(rollup(days 1..n−1), day n)` == `sketch(days 1..n)` (spec-pinned)
  * is exactly the invariant that makes incremental maintenance sound.
  *
  * Estimates are approximate (relative error ≈ 1.04/√2^lgK ≈ 2.3% at the
  * default lgK=12) → no SQL oracle, like the other approx operators;
  * SketchSpec bounds the error against exact distinct counts and pins the
  * merge invariants (order-independence, incremental == monolithic,
  * parquet round-trip).
  */
object SketchOps {
  type Q = (SparkSession, String) => DataFrame

  /** The persisted pre-aggregate: one row per (event_type, day) holding a
    * binary HLL sketch of that day's distinct users. This is the table a
    * production pipeline appends to once per day; everything else here
    * reads it. (lgK left at Spark's default 12 — union requires matching
    * or explicitly-allowed differing lgK, so one constant in one place.)
    */
  def dailyUserSketches(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))

  /** Roll the daily sketch table up to distinct-user estimates per
    * event_type — a union over KB-sized sketch rows, no event rescan.
    */
  def rollupByType(daily: DataFrame): DataFrame =
    daily.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"),
        count(lit(1)).as("n_sketches"))

  /** The quantile twin of [[dailyUserSketches]]: one row per
    * (event_type, day) holding a mergeable GK summary of that day's
    * values ([[graft.functions.QuantileSketch]]).
    */
  def dailyValueSketches(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(graft.functions.QuantileSketch.gkSketch(col("value")).as("sk"))

  /** Roll stored value sketches up to (p50, p95) per event_type. */
  def rollupValueQuantiles(daily: DataFrame): DataFrame =
    daily.groupBy(col("event_type"))
      .agg(graft.functions.QuantileSketch
        .gkQuantiles(Seq(0.5, 0.95))(col("sk")).as("qs"),
        count(lit(1)).as("n_sketches"))
      .select(col("event_type"), element_at(col("qs"), 1).as("p50"),
        element_at(col("qs"), 2).as("p95"), col("n_sketches"))

  val queries: Map[String, Q] = Map(
    // Approximate distinct users per event type via the daily-sketch
    // rollup, plus a global all-types row (grouping-sets style) unioned
    // from the SAME daily sketches — demonstrating that one persisted
    // sketch table serves every slice. Approximate → no SQL oracle
    // (driver rows-only); SketchSpec bounds error and merge semantics.
    "cdc_distinct_users_sketch" -> ((s, d) => {
      val daily = dailyUserSketches(events(s, d))
      val perType = rollupByType(daily)
        .select(col("event_type"), col("est_users"), col("n_sketches"))
      // groupBy on the constant (not a grand agg): an EMPTY daily table
      // then yields zero rows instead of one ("__all__", null, 0) row —
      // the empty-input contract every registry query keeps
      val global = daily
        .groupBy(lit("__all__").as("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"),
          count(lit(1)).as("n_sketches"))
      perType.unionByName(global).orderBy(col("event_type"))
    }),

    // Per-type value quantiles from the persisted daily GK sketch table —
    // p50/p95 over any slice without re-scanning events (the same
    // maintenance story as the HLL table). Approximate → no SQL oracle;
    // SketchSpec asserts the ε-rank guarantee against exact sorted data.
    "cdc_value_quantile_sketch" -> ((s, d) => {
      rollupValueQuantiles(dailyValueSketches(events(s, d)))
        .orderBy(col("event_type"))
    }),
  )

  /** Approximate-by-design: no SQL twins (driver records rows-only). */
  val oracles: Map[String, String] = Map.empty
}
