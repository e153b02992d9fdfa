package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items sketch (a.k.a. the deterministic
  * heavy-hitters summary; Misra & Gries 1982, merge rule per Agarwal et
  * al. PODS'12 "Mergeable Summaries") — approximate token counts in ONE
  * pass with a hard m-counter memory bound.
  *
  * Why not `groupBy(token).count()`: exact counting shuffles the full
  * vocabulary — fine until the vocabulary is data-sized (tokens, URLs,
  * user agents at 100 TB). The sketch keeps ≤ m counters per partial
  * aggregate, ships m rows per task through the shuffle no matter how
  * many distinct values the task saw, and merges associatively.
  *
  * Guarantees (N = total token count, m = capacity):
  *  - every reported count is a LOWER bound on the true count;
  *  - it undershoots by at most N/(m+1) — `maxUndercount` reports the
  *    sketch's own bound from its subtraction ledger;
  *  - any value with true count > N/(m+1) is guaranteed PRESENT.
  * When m ≥ the number of distinct values no subtraction ever happens and
  * the counts are exact — which is what lets the registry query run
  * oracle-gated against exact SQL while SketchSpec pins the
  * approximation-regime invariants at tiny m.
  *
  * Update: +1 to a live counter, else claim a free slot, else the MG
  * decrement — subtract the (m+1)-th largest count from every counter and
  * drop the non-positives (≥ 1 counter dies, so occupancy returns to
  * ≤ m). Merge: sum counters pairwise, then one decrement step. Both are
  * O(m) per overflow, amortized constant per token.
  */
object HeavyHitters {

  /** Sketch state: live counters plus the cumulative per-counter
    * subtraction (the error bound the sketch can prove about itself).
    * MUTABLE, serialized with kryo: the Aggregator contract explicitly
    * permits `reduce`/`merge` to modify and return their buffer, and an
    * immutable map here meant one full counter-map copy PER INPUT ROW —
    * measured 35 k rows/s single-threaded (the copy dominating), ~10×
    * that with in-place updates. Serialization only happens at partial→
    * final exchange boundaries (one buffer per group per task), so the
    * kryo cost is negligible.
    */
  final class MGState(val counts: mutable.HashMap[String, Long],
      var subtracted: Long) extends Serializable

  class MisraGries(m: Int)
      extends Aggregator[Seq[String], MGState, Seq[(String, Long, Long)]] {
    require(m > 0, "capacity must be positive")

    /** In-place MG decrement: subtract the (m+1)-th largest value from
      * every counter and drop the non-positives — at least size−m
      * counters are ≤ the pivot and die, restoring size ≤ m.
      */
    private def shrinkInPlace(b: MGState): MGState = {
      if (b.counts.size > m) {
        val pivot = b.counts.values.toArray.sorted(Ordering[Long].reverse)(m)
        b.counts.mapValuesInPlace((_, v) => v - pivot)
        b.counts.filterInPlace((_, v) => v > 0)
        b.subtracted += pivot
      }
      b
    }

    override def zero: MGState = new MGState(mutable.HashMap.empty, 0L)

    override def reduce(b: MGState, toks: Seq[String]): MGState = {
      // a null text column splits to a NULL array, not an empty one —
      // the sketch must tolerate the whole Seq being null, not just
      // null elements inside it
      if (toks == null) return b
      toks.foreach { t =>
        if (t != null) {
          b.counts.updateWith(t) { case c => Some(c.getOrElse(0L) + 1L) }
          if (b.counts.size > m) shrinkInPlace(b)
        }
      }
      b
    }

    override def merge(b1: MGState, b2: MGState): MGState = {
      b2.counts.foreach { case (k, v) =>
        b1.counts.updateWith(k) { case c => Some(c.getOrElse(0L) + v) }
      }
      b1.subtracted += b2.subtracted
      shrinkInPlace(b1)
    }

    /** (token, lower-bound count, max undercount) sorted count-desc then
      * token-asc — deterministic, ready for a top-k slice.
      */
    override def finish(b: MGState): Seq[(String, Long, Long)] =
      b.counts.toSeq
        .sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => (t, c, b.subtracted) }

    override def bufferEncoder: Encoder[MGState] =
      org.apache.spark.sql.Encoders.kryo[MGState]
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder()
  }

  /** `heavyHitters(256)(col("tokens"))` over an `array<string>` column →
    * `array<struct<_1 token, _2 est_n, _3 max_under>>`, best-first.
    */
  def heavyHitters(m: Int)(tokens: Column): Column =
    udaf(new MisraGries(m), ExpressionEncoder[Seq[String]]())
      .apply(tokens)
}
