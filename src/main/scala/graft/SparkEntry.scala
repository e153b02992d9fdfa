package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Ann, CdcEnvelope, CurationOps, DedupOps, EventOps, MultimodalOps, Pq, Prune, Relational, RetrievalOps, SimilarityOps, SketchOps, TemporalOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (SURVEY.md §2 inventory plus the
  * north-star training-data operators); `oracleSql` carries the DuckDB twin
  * for every SQL-expressible query. Registries live next to their operators
  * (graft.operators.*) and are concatenated here.
  */
object SparkEntry {
  /** Flagship: the engine's reason to exist — the CDC envelope chain
    * (Debezium JSON → unwrap → soft-delete rewrite → unified union →
    * latest state by WAL LSN), oracle-gated end to end. Driver
    * smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    pinSessionDefaults(spark)
    CdcEnvelope.queries("cdc_unified_latest")(spark, "/root/testdata/sf0.001")
  }

  /** Registry results are defined under a UTC session zone (the oracle's
    * timestamps are timezone-naive), and legacy TIMESTAMP(NANOS) events
    * files need the nanos-as-long parquet flag before their schema can
    * even be read (current driver testdata is timestamp[us] and needs
    * neither — Tables.events dispatches on the schema it finds). Pinned
    * here — the documented driver contract — rather than silently inside
    * every table read, so library users composing graft.operators.*
    * directly keep their own session settings.
    */
  private def pinSessionDefaults(s: SparkSession): Unit = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Relational.queries ++ EventOps.queries ++ TextOps.queries ++
      SimilarityOps.queries ++ DedupOps.queries ++ Ann.queries ++
      TemporalOps.queries ++ MultimodalOps.queries ++ CdcEnvelope.queries ++
      CurationOps.queries ++ SketchOps.queries ++ Prune.queries ++
      Pq.queries ++ RetrievalOps.queries)
      .map { case (name, fn) =>
      name -> ((s: SparkSession, d: String) =>
        { pinSessionDefaults(s); fn(s, d) })
    }

  /** GATE-class registry entries: correctness devices for the
    * approximate production queries — exact-mode twins that probe every
    * cell / disable the sketch, and truth-table gates that recompute the
    * full exact answer an approximation is scored against. They stay in
    * the registry (the driver hash-checks them — that is their job), but
    * they are MAINTENANCE-shaped computations, not serving queries:
    * `dedup_minhash_lsh_gate` alone is a 13 s exact-similarity truth
    * table at sf0.1. [[Bench]] reports their time as a separate
    * `gate_total` so the serving total tracks what a user-facing query
    * mix costs — the same split `pair_table_build` already has.
    */
  def gateQueries: Set[String] =
    queries.keySet.filter(_.endsWith("_gate")) ++
      Set("dedup_semantic_exact", "dedup_semantic_incremental_exact",
        "ann_ivf_exact_topk", "ann_ivf_exact_batch")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventOps.oracles ++ TextOps.oracles ++
      SimilarityOps.oracles ++ DedupOps.oracles ++ Ann.oracles ++
      TemporalOps.oracles ++ MultimodalOps.oracles ++ CdcEnvelope.oracles ++
      CurationOps.oracles ++ SketchOps.oracles ++ Prune.oracles ++
      Pq.oracles ++ RetrievalOps.oracles
}
