package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables._

/** Temporal operators over the `events` stream table — the north-star
  * additions SURVEY.md §2.3/§2.5 calls out as deliberately absent from the
  * reference (no theta/temporal join anywhere in
  * airflow/dags/cdc_pipeline_dag.py): as-of join, range (interval) join,
  * and gap-based sessionization. These are the state-at-time queries CDC
  * consumers actually run against a change log.
  *
  * Scale design (100 TB):
  *  - As-of is NOT implemented as a join at all: both sides are union-tagged
  *    into one stream and resolved with a single `last(_, ignoreNulls)`
  *    running window — one shuffle on the key, linear merge-scan per
  *    partition, no candidate blow-up. This is the plan a hand-written
  *    engine would pick, and Catalyst pipelines the filter+project after
  *    the sort.
  *  - The range join is BANDED: timestamps are binned to the range width,
  *    the probe side explodes to its two candidate bins, and the join is a
  *    plain equi-join on (key, bin) + exact residual filter. Catalyst turns
  *    the would-be O(n·m) theta join into a shuffled hash join whose
  *    fan-out is bounded by events-per-bin; skew is handled by AQE.
  *  - Sessionization is lag + running-sum over (key, time) — the same
  *    single shuffle as latest-state compaction; comparisons are exact
  *    microsecond integers (`unix_micros`) so engine results are
  *    bit-identical to the oracle.
  */
object TemporalOps {
  type Q = (SparkSession, String) => DataFrame

  private val SessionGapUs = 1800L * 1000000L // 30 min
  private val RangeUs = 300L * 1000000L       // 5 min band width

  val queries: Map[String, Q] = Map(
    // As-of join: for each 'error' event, the most recent click of the same
    // user at-or-before it (left semantics: errors with no prior click keep
    // NULLs). Merge-scan formulation — no join operator at all.
    "asof_last_click" -> ((s, d) => {
      // secondary sort key `kind` puts clicks BEFORE other events at equal
      // (user_id, ts): ASOF semantics are ts-inclusive (click.ts <=
      // error.ts matches), so an equal-ts click must be visible to the
      // error row regardless of event-id order. Multiple clicks at the
      // same ts resolve to the max event_id (frame order) — the oracle's
      // row_number formulation pins the same tie-break.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .withColumn("kind",
          when(col("event_type") === "click", 0).otherwise(1))
        .withColumn("click_id",
          when(col("event_type") === "click", col("event_id")))
        .withColumn("click_ts",
          when(col("event_type") === "click", col("ts")))
        .withColumn("last_click_id",
          last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          col("last_click_id"),
          (col("ts").cast("long") - col("last_click_ts").cast("long"))
            .as("gap_s"))
        .orderBy(col("error_id"))
    }),

    // FORWARD as-of join: for each 'error', the next purchase of the same
    // user at-or-after it (time-to-resolution shape). Same merge-scan as
    // the backward variant with the frame mirrored — first(ignoreNulls)
    // over [current, following). Purchases sort AFTER errors at equal ts
    // (kind 1 vs 0) so an equal-timestamp purchase is inside the forward
    // frame, mirroring the backward variant's inclusive semantics.
    "asof_next_purchase" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .withColumn("kind",
          when(col("event_type") === "purchase", 1).otherwise(0))
        .withColumn("purchase_id",
          when(col("event_type") === "purchase", col("event_id")))
        .withColumn("purchase_ts",
          when(col("event_type") === "purchase", col("ts")))
        .withColumn("next_purchase_id",
          first(col("purchase_id"), ignoreNulls = true).over(w))
        .withColumn("next_purchase_ts",
          first(col("purchase_ts"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          col("next_purchase_id"),
          (col("next_purchase_ts").cast("long") - col("ts").cast("long"))
            .as("wait_s"))
        .orderBy(col("error_id"))
    }),

    // Range (interval) join: all (error, click) pairs of the same user with
    // the click in [error.ts - 5 min, error.ts]. Banded equi-join: bin to
    // 5-min cells, probe side explodes its 2 candidate cells, exact
    // residual filter keeps correctness independent of the banding.
    "range_join_error_clicks" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .withColumn("us", unix_micros(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("bin", expr(s"us div $RangeUs"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("click_us"), col("bin"))
      val errors = ev.filter(col("event_type") === "error")
        .withColumn("bin0", expr(s"us div $RangeUs"))
        .select(col("event_id").as("error_id"), col("user_id"),
          col("us").as("error_us"),
          explode(array(col("bin0") - 1, col("bin0"))).as("bin"))
      errors.join(clicks, Seq("user_id", "bin"))
        .filter(col("click_us") <= col("error_us") &&
          col("click_us") >= col("error_us") - RangeUs)
        .select(col("error_id"), col("click_id"), col("user_id"),
          ((col("error_us") - col("click_us")) / 1000000L).cast("long")
            .as("gap_s"))
        .orderBy(col("error_id"), col("click_id"))
    }),

    // Gap-based sessionization: per user, a >30-min silence starts a new
    // session; emit per-session event count, bounds, and exact duration.
    "sessionize" -> ((s, d) => {
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("new_s",
          when(col("us") - lag(col("us"), 1).over(wOrd) > SessionGapUs, 1)
            .when(lag(col("us"), 1).over(wOrd).isNull, 1)
            .otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(wRun))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n"),
          min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
          (max(col("us")) - min(col("us"))).as("dur_us"))
        .orderBy(col("user_id"), col("sid"))
    }),
  )

  val oracles: Map[String, String] = Map(
    // Explicit window formulations instead of DuckDB's ASOF JOIN: ASOF
    // picks an ARBITRARY row among matches tied on ts, so the gate could
    // flake on data with duplicate (user_id, ts) per event type. The
    // row_number pins the tie-break the engine implements — backward
    // takes the LATEST (ts, event_id) click at-or-before, forward the
    // EARLIEST (ts, event_id) purchase at-or-after.
    "asof_last_click" ->
      """SELECT error_id, user_id, last_click_id, gap_s FROM (
           SELECT e.event_id AS error_id, e.user_id,
             c.event_id AS last_click_id,
             CAST(date_diff('second', c.ts, e.ts) AS BIGINT) AS gap_s,
             row_number() OVER (PARTITION BY e.event_id
               ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST)
               AS rn
           FROM (SELECT * FROM events WHERE event_type = 'error') e
           LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             ON e.user_id = c.user_id AND c.ts <= e.ts) t
         WHERE rn = 1 ORDER BY error_id""",
    "asof_next_purchase" ->
      """SELECT error_id, user_id, next_purchase_id, wait_s FROM (
           SELECT e.event_id AS error_id, e.user_id,
             p.event_id AS next_purchase_id,
             CAST(date_diff('second', e.ts, p.ts) AS BIGINT) AS wait_s,
             row_number() OVER (PARTITION BY e.event_id
               ORDER BY p.ts NULLS LAST, p.event_id NULLS LAST) AS rn
           FROM (SELECT * FROM events WHERE event_type = 'error') e
           LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             ON e.user_id = p.user_id AND p.ts >= e.ts) t
         WHERE rn = 1 ORDER BY error_id""",
    "range_join_error_clicks" ->
      """SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id,
           CAST((epoch_us(e.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT) AS gap_s
         FROM events e JOIN events c
           ON e.user_id = c.user_id
          AND e.event_type = 'error' AND c.event_type = 'click'
          AND c.ts <= e.ts
          AND epoch_us(c.ts) >= epoch_us(e.ts) - 300000000
         ORDER BY error_id, click_id""",
    "sessionize" ->
      """WITH t AS (
           SELECT user_id, event_id, ts, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS sid
           FROM t)
         SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n,
           min(ts) AS start_ts, max(ts) AS end_ts,
           CAST(max(us) - min(us) AS BIGINT) AS dur_us
         FROM s GROUP BY user_id, sid ORDER BY user_id, sid""",
  )
}
