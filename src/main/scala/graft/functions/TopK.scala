package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state per-group top-k — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(group))` + `filter(rk <= k)`.
  *
  * The window formulation shuffles EVERY input row into |groups| reducer
  * tasks and sorts there: with a handful of groups (batched similarity
  * queries, per-tenant leaderboards) that is a skew wall — all n_base ×
  * n_query rows funnel through 3 tasks. This [[Aggregator]] instead keeps a
  * k-bounded buffer per group: Spark plans it as a partial
  * ObjectHashAggregate before the shuffle, so each task ships at most
  * k rows per group and the final merge sees |partitions| × k rows, not n.
  *
  * Ordering contract: best = highest `sim`, ties broken by lowest `id` —
  * identical to `row_number() OVER (ORDER BY sim DESC, id)`, so results are
  * deterministic and oracle-comparable. k is small (≤ hundreds); the
  * sort-on-insert buffer is O(k log k) per row, which whole-stage codegen'd
  * arithmetic upstream dominates anyway.
  */
object TopK {

  /** One scored row; field order (sim, id) is the struct layout consumers
    * see after `posexplode`.
    */
  case class Hit(sim: Double, vec_id: Long)

  class TopKBySim(k: Int)
      extends Aggregator[(Double, Long), Seq[Hit], Seq[Hit]] {
    require(k > 0, "k must be positive")
    // Double.compare semantics, descending: NaN sorts FIRST (Spark's sort
    // treats NaN as the largest double), ties by lowest id — the naive
    // sortBy(-sim) would instead rank NaN last and drop it, diverging
    // from the row_number window this aggregator must mirror. −0.0 is
    // canonicalized to +0.0 inside the COMPARISON only (Spark sort keys
    // equate them) — the stored Hit keeps the raw input bits, so the
    // EMITTED sim stays identical to the window twin / the oracle.
    private val ord: Ordering[Hit] = new Ordering[Hit] {
      private def canon(x: Double): Double = if (x == 0.0) 0.0 else x
      def compare(a: Hit, b: Hit): Int = {
        val c = java.lang.Double.compare(canon(b.sim), canon(a.sim))
        if (c != 0) c else java.lang.Long.compare(a.vec_id, b.vec_id)
      }
    }
    private def prune(xs: Seq[Hit]): Seq[Hit] = xs.sorted(ord).take(k)
    override def zero: Seq[Hit] = Nil
    override def reduce(b: Seq[Hit], a: (Double, Long)): Seq[Hit] =
      prune(b :+ Hit(a._1, a._2))
    override def merge(b1: Seq[Hit], b2: Seq[Hit]): Seq[Hit] =
      prune(b1 ++ b2)
    override def finish(r: Seq[Hit]): Seq[Hit] = prune(r)
    override def bufferEncoder: Encoder[Seq[Hit]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Hit]] = ExpressionEncoder()
  }

  /** `topK(5)(col("sim"), col("vec_id"))` → `array<struct<sim,vec_id>>`
    * sorted best-first, at most k elements per group.
    */
  def topK(k: Int)(sim: Column, id: Column): Column =
    udaf(new TopKBySim(k), ExpressionEncoder[(Double, Long)]())
      .apply(sim, id)

  /** [[Hit]] plus the row's partition cell — so a k-bounded shortlist
    * can carry WHERE its survivors live and the consumer can
    * partition-prune its follow-up scan to exactly those cells
    * ([[graft.operators.Pq]]'s batched re-rank). Ordering contract
    * identical to [[TopKBySim]]; the cell rides as payload, never as a
    * sort key.
    */
  case class CellHit(sim: Double, vec_id: Long, cell: Int)

  class TopKBySimWithCell(k: Int)
      extends Aggregator[(Double, Long, Int), Seq[CellHit], Seq[CellHit]] {
    require(k > 0, "k must be positive")
    private val ord: Ordering[CellHit] = new Ordering[CellHit] {
      private def canon(x: Double): Double = if (x == 0.0) 0.0 else x
      def compare(a: CellHit, b: CellHit): Int = {
        val c = java.lang.Double.compare(canon(b.sim), canon(a.sim))
        if (c != 0) c else java.lang.Long.compare(a.vec_id, b.vec_id)
      }
    }
    private def prune(xs: Seq[CellHit]): Seq[CellHit] = xs.sorted(ord).take(k)
    override def zero: Seq[CellHit] = Nil
    override def reduce(b: Seq[CellHit], a: (Double, Long, Int)): Seq[CellHit] =
      prune(b :+ CellHit(a._1, a._2, a._3))
    override def merge(b1: Seq[CellHit], b2: Seq[CellHit]): Seq[CellHit] =
      prune(b1 ++ b2)
    override def finish(r: Seq[CellHit]): Seq[CellHit] = prune(r)
    override def bufferEncoder: Encoder[Seq[CellHit]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[CellHit]] = ExpressionEncoder()
  }

  /** `topKCell(5)(col("sim"), col("vec_id"), col("cell"))` →
    * `array<struct<sim,vec_id,cell>>` sorted best-first, at most k per
    * group.
    */
  def topKCell(k: Int)(sim: Column, id: Column, cell: Column): Column =
    udaf(new TopKBySimWithCell(k), ExpressionEncoder[(Double, Long, Int)]())
      .apply(sim, id, cell)
}
