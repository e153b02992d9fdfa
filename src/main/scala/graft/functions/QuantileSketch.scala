package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketches (Greenwald–Khanna summaries — the same
  * structure behind Spark's `approx_percentile`) as PERSISTABLE state:
  * one aggregator sketches raw values into a binary summary, a second
  * merges stored summaries and answers quantile queries. Together with
  * the HLL distinct table ([[graft.operators.SketchOps]]) and the
  * Misra–Gries frequency sketch ([[HeavyHitters]]) this completes the
  * sketch triad — distinct counts, frequent items, quantiles — each with
  * bounded per-task state and associative merges.
  *
  * GK guarantees RANK error ≤ ε·n (ε = [[RelativeError]]): the value
  * returned for quantile q has true rank within (q ± ε)·n. That is the
  * bound SketchSpec asserts — in rank space, where it is exact and
  * engine-independent, not value space.
  *
  * The binary payload is the java-serialized compressed summary — engine
  * state like a checkpoint, not an interchange format; ε is pinned here
  * so every producer and consumer of a sketch table agrees.
  */
object QuantileSketch {

  val RelativeError = 0.01

  private[graft] def toBytes(qs: QuantileSummaries): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(qs.compress())
    oos.close()
    bos.toByteArray
  }

  private[graft] def fromBytes(b: Array[Byte]): QuantileSummaries =
    new ObjectInputStream(new ByteArrayInputStream(b)).readObject()
      .asInstanceOf[QuantileSummaries]

  private def empty: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      RelativeError)

  /** Values → serialized compressed summary. `insert` buffers into the
    * summary's head array and self-compresses past its threshold, so the
    * partial state each task holds is bounded by O(1/ε · log(εn)).
    */
  class GkSketchAgg extends Aggregator[Double, QuantileSummaries, Array[Byte]] {
    override def zero: QuantileSummaries = empty
    override def reduce(b: QuantileSummaries, x: Double): QuantileSummaries =
      b.insert(x)
    // ALWAYS compress before inspecting or merging: `count` stays 0 while
    // values sit in the un-flushed head buffer (it only updates on
    // flush), so a count==0 shortcut taken on an uncompressed summary
    // would silently drop buffered values; merge itself also requires
    // flushed inputs
    override def merge(b1: QuantileSummaries,
        b2: QuantileSummaries): QuantileSummaries = {
      val c1 = b1.compress(); val c2 = b2.compress()
      if (c2.count == 0) c1 else if (c1.count == 0) c2 else c1.merge(c2)
    }
    override def finish(r: QuantileSummaries): Array[Byte] = toBytes(r)
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Stored summaries → quantile estimates at `probs` (null until any
    * non-empty sketch arrives — a merge of empty days has no quantiles).
    */
  class GkMergeAgg(probs: Seq[Double])
      extends Aggregator[Array[Byte], QuantileSummaries, Seq[Double]] {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    override def zero: QuantileSummaries = empty
    // stored payloads are compressed by construction (toBytes), and the
    // buffer is only ever a (compressed) merge result or zero — but
    // compress() is a cheap no-op on an already-flushed summary, so the
    // same compress-before-inspect discipline applies throughout
    override def reduce(b: QuantileSummaries,
        bytes: Array[Byte]): QuantileSummaries = {
      val s = fromBytes(bytes)
      val c = b.compress()
      if (s.count == 0) c else if (c.count == 0) s else c.merge(s)
    }
    override def merge(b1: QuantileSummaries,
        b2: QuantileSummaries): QuantileSummaries = {
      val c1 = b1.compress(); val c2 = b2.compress()
      if (c2.count == 0) c1 else if (c1.count == 0) c2 else c1.merge(c2)
    }
    override def finish(r: QuantileSummaries): Seq[Double] = {
      val c = r.compress()
      if (c.count == 0) null else probs.map(p => c.query(p).get)
    }
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** `gkSketch(col("value"))` → binary summary per group. */
  def gkSketch(value: Column): Column =
    udaf(new GkSketchAgg, Encoders.scalaDouble).apply(value)

  /** `gkQuantiles(Seq(0.5, 0.95))(col("sk"))` → array of estimates. */
  def gkQuantiles(probs: Seq[Double])(sketch: Column): Column =
    udaf(new GkMergeAgg(probs), Encoders.BINARY).apply(sketch)
}
