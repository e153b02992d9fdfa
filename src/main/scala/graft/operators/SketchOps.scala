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

    // ORACLE GATE for the HLL sketch table: per type (plus the __all__
    // rollup), the EXACT distinct-user count — SQL-expressible, so the
    // oracle hash-gates it — alongside a within-tolerance flag comparing
    // the sketch estimate to that exact count (|est − exact| ≤
    // max(1, 5%·exact), the same engineering bound SketchSpec asserts;
    // lgConfigK=12 HLL has ~1.6% standard error, so 5% ≈ 3σ). The
    // oracle states the flag as the constant `true` — a red row here
    // means the sketch pipeline's error left its documented envelope.
    // The estimate itself stays out of the output on purpose: it is the
    // one value DuckDB cannot replay.
    "cdc_distinct_users_sketch_gate" -> ((s, d) => {
      val ev = events(s, d)
      val daily = dailyUserSketches(ev)
      val est = rollupByType(daily)
        .select(col("event_type"), col("est_users"))
        .unionByName(daily
          .groupBy(lit("__all__").as("event_type"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
            .as("est_users")))
      val exact = ev
        .groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
        .unionByName(ev
          .groupBy(lit("__all__").as("event_type"))
          .agg(count_distinct(col("user_id")).as("exact_users")))
      exact.join(est, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("est_users") - col("exact_users")) <=
            greatest(lit(1.0), col("exact_users") * 0.05)).as("within_tol"))
        .orderBy(col("event_type"))
    }),

    // ORACLE GATE for the GK quantile table: per type, the ε-rank
    // guarantee checked against the raw data — rank(reported p50) must
    // sit within 3ε·n+1 of 0.5·n (same bound as SketchSpec, merged-
    // sketch slack included), likewise p95. The per-type quantile rows
    // broadcast (types × 2 doubles); one conditional-count pass over
    // events computes both ranks. Oracle: both flags are `true`.
    "cdc_value_quantile_sketch_gate" -> ((s, d) => {
      val ev = events(s, d)
      val eps = graft.functions.QuantileSketch.RelativeError
      val q = rollupValueQuantiles(dailyValueSketches(ev))
        .select(col("event_type"), col("p50"), col("p95"))
      // rank bound over NON-NULL values only: the sketch (and the exact
      // percentile machinery) excludes nulls, so the n the ε·n bound is
      // stated against must too — counting null rows both inflates n and
      // contributes 0 to the conditional rank sums, which on a corpus
      // with >~6% nulls in one type would flip the gate red even though
      // the sketch met its guarantee (this sf's events carry no nulls;
      // the schema allows them). The isNotNull filter also drops an
      // all-null type from BOTH engines symmetrically (the oracle's
      // WHERE mirrors it) — such a type has no sketch row to gate.
      ev.filter(col("value").isNotNull)
        .join(broadcast(q), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("value") <= col("p95"), 1L).otherwise(0L)).as("r95"))
        .select(col("event_type"),
          (abs(col("r50") - lit(0.5) * col("n")) <=
            lit(3 * eps) * col("n") + 1).as("p50_ok"),
          (abs(col("r95") - lit(0.95) * col("n")) <=
            lit(3 * eps) * col("n") + 1).as("p95_ok"))
        .orderBy(col("event_type"))
    }),

    // Sketch-based inter-source EXACT-CONTENT overlap matrix — the
    // 100 TB twin of `dedup_source_overlap` (which measures NEAR-dup
    // mass through the materialized pair table). The provenance
    // question here is mirror/re-crawl detection on exact content: for
    // every unordered source pair, how many distinct documents (by
    // sha256(text), the dedup_exact key) appear in BOTH. Exactly, that
    // is a distinct-hash self-join — at 100 TB a corpus-sized shuffle
    // re-paid for every pair. The sketch shape is one scan EVER: per
    // source, a Theta sketch over the content hashes (Spark 4 ships
    // DataSketches Theta natively — unlike HLL, Theta supports set
    // INTERSECTION, which this query is for); the matrix is then a
    // driver-small triangle join over #sources KB-sized sketch rows —
    // estimates for |A∩B|, |A∪B| and the content Jaccard per pair,
    // with no second corpus scan at any scale. Sketches are exact
    // below 2^lgK (=4096) distinct hashes per source and estimation-
    // mode above; estimates are deterministic (fixed hash seed, min-θ
    // set union is order-independent — partitioning invariance is
    // spec-pinned). Approximate → rows-only; the _gate twin bounds the
    // error against the exact self-join, and SketchSpec drives the
    // estimation regime the testdata never reaches.
    "dedup_source_overlap_sketch" -> ((s, d) => {
      val sk = sourceContentSketches(documents(s, d))
      val a = sk.select(col("source").as("source_lo"), col("sk").as("ska"),
        col("n_distinct").as("na"))
      val b = sk.select(col("source").as("source_hi"), col("sk").as("skb"),
        col("n_distinct").as("nb"))
      // triangle join over #sources rows — broadcast nested loop on a
      // tiny side, the same class as the one-row aggregate crossJoins
      a.join(b, col("source_lo") < col("source_hi"))
        .select(col("source_lo"), col("source_hi"),
          // theta_sketch_estimate returns a rounded LONG
          theta_sketch_estimate(theta_intersection(col("ska"), col("skb")))
            .as("est_common"),
          theta_sketch_estimate(theta_union(col("ska"), col("skb")))
            .as("est_union"))
        .withColumn("est_jaccard",
          round(col("est_common") /
            greatest(col("est_union"), lit(1.0)), 4))
        .orderBy(col("source_lo"), col("source_hi"))
    }),

    // ORACLE GATE for the Theta overlap matrix: the exact per-pair
    // common/union counts (SQL-expressible — the distinct-hash
    // self-join the sketch exists to avoid, affordable at gate scale)
    // alongside within-tolerance flags for the sketch estimates. The
    // bound is stated against the UNION size — Theta intersection
    // error scales with √(|A∩B|·|A∪B|)/√k ≤ |A∪B|/√k, so a
    // common-relative bound would be meaningless for near-disjoint
    // pairs: |est − exact| ≤ max(3, 7.5%·|A∪B|) ≈ 4.7σ at lgK=12 —
    // wide enough that 190 pairs × 2 flags stay green at sf10's
    // estimation regime (verified there), tight enough that a broken
    // sketch pipeline (wrong key, dropped partial, mis-merged θ)
    // cannot hide. Below 4096 distinct hashes per source the sketches
    // are exact and the flags degenerate to equality.
    "dedup_source_overlap_sketch_gate" -> ((s, d) => {
      val docs = documents(s, d)
      val h = docs.select(col("source"), sha2(col("text"), 256).as("th"))
        .distinct()
      val sizes = h.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val pairs = sizes.select(col("source").as("source_lo"), col("n").as("na"))
        .join(sizes.select(col("source").as("source_hi"), col("n").as("nb")),
          col("source_lo") < col("source_hi"))
      val common = h.select(col("source").as("source_lo"), col("th"))
        .join(h.select(col("source").as("source_hi"), col("th")),
          Seq("th"))
        .filter(col("source_lo") < col("source_hi"))
        .groupBy(col("source_lo"), col("source_hi"))
        .agg(count(lit(1)).as("c"))
      val exact = pairs.join(common, Seq("source_lo", "source_hi"), "left")
        .select(col("source_lo"), col("source_hi"),
          coalesce(col("c"), lit(0L)).as("exact_common"),
          (col("na") + col("nb") - coalesce(col("c"), lit(0L)))
            .as("exact_union"))
      val est = queries("dedup_source_overlap_sketch")(s, d)
        .select(col("source_lo"), col("source_hi"),
          col("est_common"), col("est_union"))
      val tol = greatest(lit(3.0), col("exact_union") * 0.075)
      exact.join(est, Seq("source_lo", "source_hi"))
        .select(col("source_lo"), col("source_hi"),
          col("exact_common"), col("exact_union"),
          (abs(col("est_common") - col("exact_common")) <= tol)
            .as("common_ok"),
          (abs(col("est_union") - col("exact_union")) <= tol)
            .as("union_ok"))
        .orderBy(col("source_lo"), col("source_hi"))
    }),
  )

  /** Per-source Theta sketch over distinct content hashes — the one-pass
    * pre-aggregate behind [[queries dedup_source_overlap_sketch]]. One
    * ~KB sketch row per source; `n_distinct` is the sketch's own
    * estimate (exact below 2^12 per source), carried for occupancy
    * visibility, not used by the gate (which recomputes exactly).
    */
  def sourceContentSketches(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(theta_sketch_agg(sha2(col("text"), 256)).as("sk"))
      .withColumn("n_distinct", theta_sketch_estimate(col("sk")))

  /** The sketch TABLES stay approximate-by-design (no SQL twins — the
    * driver records rows-only and SketchSpec bounds error and merge
    * semantics); their `_gate` companions re-state the spec bounds as
    * DuckDB-checkable rows, so the driver gate goes green on the same
    * guarantees.
    */
  val oracles: Map[String, String] = Map(
    // the '__all__' branch groups by its CONSTANT select item (GROUP BY
    // 1 = the '__all__' literal): a grouped aggregate over an empty
    // table emits zero groups, exactly like Spark's groupBy(lit) — the
    // empty-input contract both engines must agree on. (A WHERE guard
    // cannot provide this: a GLOBAL aggregate still returns its one row
    // after WHERE filters all input, so the earlier EXISTS guard was
    // ineffective. sim_quantized_topk_gate's EXISTS is different — a
    // FROM-less SELECT has no aggregate, so its WHERE really filters.)
    "cdc_distinct_users_sketch_gate" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS within_tol
         FROM events GROUP BY event_type
         UNION ALL
         SELECT '__all__' AS event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT), true
         FROM events GROUP BY 1
         ORDER BY event_type""",
    // WHERE mirrors the Spark side's isNotNull rank filter (see the gate
    // query): null values are outside the sketch's population, and an
    // all-null type must drop from both engines symmetrically
    "cdc_value_quantile_sketch_gate" ->
      """SELECT event_type, true AS p50_ok, true AS p95_ok
         FROM events WHERE value IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",
    // exact common/union replayed over the same sha256 content key; the
    // flags are the constant true — a red row means a sketch estimate
    // left its documented error envelope
    "dedup_source_overlap_sketch_gate" ->
      """WITH h AS (SELECT DISTINCT source, sha256(text) AS th FROM documents),
           sizes AS (SELECT source, count(*) AS n FROM h GROUP BY source),
           pairs AS (SELECT a.source AS source_lo, b.source AS source_hi,
                       a.n AS na, b.n AS nb
                     FROM sizes a JOIN sizes b ON a.source < b.source),
           com AS (SELECT a.source AS source_lo, b.source AS source_hi,
                     count(*) AS c
                   FROM h a JOIN h b
                     ON a.th = b.th AND a.source < b.source
                   GROUP BY 1, 2)
         SELECT p.source_lo, p.source_hi,
           CAST(COALESCE(com.c, 0) AS BIGINT) AS exact_common,
           CAST(p.na + p.nb - COALESCE(com.c, 0) AS BIGINT) AS exact_union,
           true AS common_ok, true AS union_ok
         FROM pairs p
         LEFT JOIN com ON p.source_lo = com.source_lo
                      AND p.source_hi = com.source_hi
         ORDER BY p.source_lo, p.source_hi""",
  )
}
