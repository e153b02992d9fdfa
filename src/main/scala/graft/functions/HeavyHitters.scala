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
    */
  case class MGState(counts: Map[String, Long], subtracted: Long)

  class MisraGries(m: Int)
      extends Aggregator[Seq[String], MGState, Seq[(String, Long, Long)]] {
    require(m > 0, "capacity must be positive")

    private def shrink(b: mutable.HashMap[String, Long],
        subtractedSoFar: Long): MGState = {
      if (b.size <= m) MGState(b.toMap, subtractedSoFar)
      else {
        // subtract the (m+1)-th largest value from all counters: at
        // least size-m counters are ≤ it and die, restoring size ≤ m
        val pivot = b.values.toArray.sorted(Ordering[Long].reverse)(m)
        val kept = b.iterator.collect {
          case (k, v) if v > pivot => k -> (v - pivot)
        }.toMap
        MGState(kept, subtractedSoFar + pivot)
      }
    }

    override def zero: MGState = MGState(Map.empty, 0L)

    override def reduce(b: MGState, toks: Seq[String]): MGState = {
      // a null text column splits to a NULL array, not an empty one —
      // the sketch must tolerate the whole Seq being null, not just
      // null elements inside it
      if (toks == null) return b
      val acc = mutable.HashMap.from(b.counts)
      var sub = b.subtracted
      toks.foreach { t =>
        if (t != null) {
          acc.updateWith(t) { case c => Some(c.getOrElse(0L) + 1L) }
          if (acc.size > m) {
            val s = shrink(acc, sub)
            acc.clear(); acc ++= s.counts; sub = s.subtracted
          }
        }
      }
      MGState(acc.toMap, sub)
    }

    override def merge(b1: MGState, b2: MGState): MGState = {
      val acc = mutable.HashMap.from(b1.counts)
      b2.counts.foreach { case (k, v) =>
        acc.updateWith(k) { case c => Some(c.getOrElse(0L) + v) }
      }
      shrink(acc, b1.subtracted + b2.subtracted)
    }

    /** (token, lower-bound count, max undercount) sorted count-desc then
      * token-asc — deterministic, ready for a top-k slice.
      */
    override def finish(b: MGState): Seq[(String, Long, Long)] =
      b.counts.toSeq
        .sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => (t, c, b.subtracted) }

    override def bufferEncoder: Encoder[MGState] = ExpressionEncoder()
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
