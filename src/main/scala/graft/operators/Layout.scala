package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.LayoutExprs

/** Multi-dimensional data layout for file skipping — the at-rest
  * optimization that decides how much of 100 TB a selective scan must
  * read. Parquet keeps per-file (and per-row-group) min/max stats; a scan
  * with a pushed predicate skips files whose stats exclude it. Sorting by
  * ONE key makes that key's ranges narrow per file but leaves every other
  * key's range full-width — a predicate on the second key still reads
  * everything. Writing in Z-order (Morton-interleaved bits of both keys,
  * [[graft.functions.LayoutExprs.ZValue]]) bounds BOTH dimensions' per-file
  * ranges, so either predicate — or their conjunction — skips most files.
  *
  * This is the same mechanism behind Delta/Iceberg `ZORDER BY`; here it is
  * an explicit operator: range-partition on the z-key (contiguous curve
  * segments per file, one shuffle), sort within partitions (row-group-level
  * stats inside each file), write. LayoutSpec measures the per-file spans
  * directly from the written files.
  */
object Layout {

  /** Bits per dimension on the curve lattice. 21+21 interleaved bits fit
    * a long with headroom; 2M cells per dimension is far finer than any
    * file count, so normalization granularity never limits skipping.
    */
  private val LatticeBits = 21

  /** Write `df` into `numFiles` parquet files z-ordered on two numeric
    * keys.
    *
    * The curve interleaves BIT positions, so both keys must occupy the
    * same bit width or the wider key's high bits dominate the sort and
    * the narrower dimension degenerates to a secondary key. Each key is
    * linearly mapped onto a 2²¹-cell lattice from its own min/max (one
    * tiny agg job — 4 driver-side values, data-size-independent). Linear
    * scaling is right for roughly uniform keys; heavily skewed keys want
    * rank normalization (approx-quantile boundaries → bucket index)
    * with the same curve downstream.
    */
  def writeZOrdered(df: DataFrame, keyA: String, keyB: String, dir: String,
      numFiles: Int): Unit = {
    val Array(loA, hiA, loB, hiB) = df
      .agg(min(col(keyA)).cast("double"), max(col(keyA)).cast("double"),
        min(col(keyB)).cast("double"), max(col(keyB)).cast("double"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    val cells = (1L << LatticeBits) - 1
    def lattice(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      if (hi == lo) lit(0L)
      else least(lit(cells),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * cells))
        .cast("long")
    val z = s"__z_${java.util.UUID.randomUUID().toString.take(8)}"
    df.withColumn(z, LayoutExprs.zValue(lattice(col(keyA), loA, hiA),
        lattice(col(keyB), loB, hiB)))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Z-ordered write with RANK normalization — the heavy-tailed-key
    * variant [[writeZOrdered]]'s doc points at. Linear min/max scaling
    * maps a Zipfian key's mass into a handful of lattice cells (one hot
    * value can own 99% of rows), so the curve degenerates to a sort on
    * the OTHER key and skipping dies on the skewed dimension. Instead:
    * approx-quantile boundaries (distributed GK sketch — bounded memory
    * and a boundary array of `buckets` doubles on the driver, never
    * data-sized) give equi-DEPTH buckets; the codegen'd binary-search
    * [[LayoutExprs.bucketIndex]] maps each key to its bucket, and the
    * same Morton curve interleaves the bucket indexes. Duplicate
    * boundaries (a single value spanning many quantiles) are collapsed —
    * rows of one hot value share a cell, which is the best any
    * order-preserving map can do.
    *
    * `buckets` bounds the lattice resolution per dimension (≤ 2²¹); a
    * few thousand is plenty — resolution only needs to exceed the file
    * count by enough that curve segments tile both dimensions.
    */
  def writeZOrderedRanked(df: DataFrame, keyA: String, keyB: String,
      dir: String, numFiles: Int, buckets: Int = 4096): Unit = {
    require(buckets > 1 && buckets <= (1 << LatticeBits),
      s"buckets must be in (1, 2^$LatticeBits]")
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    // one GK-sketch scan computes BOTH keys' boundaries (the
    // single-column overload would read the table twice)
    val both = df.stat.approxQuantile(Array(keyA, keyB), probes,
      1.0 / (4 * buckets))
    def cleaned(b: Array[Double]): Array[Double] = {
      val d = b.distinct.sorted
      if (d.isEmpty) Array(0.0) else d
    }
    val (bA, bB) = (cleaned(both(0)), cleaned(both(1)))
    // same-bit-width requirement as the linear path: raw bucket indexes
    // span [0, |bounds|], and |bounds| differs per key after duplicate
    // collapse — interleaving them directly lets the key with more
    // surviving boundaries dominate the curve's top bits (measured: the
    // skewed dim got at most one split). Stretch each index uniformly
    // onto the shared lattice instead.
    val cells = (1L << LatticeBits) - 1
    def onLattice(c: org.apache.spark.sql.Column, nBuckets: Int) =
      least(lit(cells), floor(c.cast("double") *
        ((cells + 1).toDouble / nBuckets)).cast("long"))
    val z = s"__z_${java.util.UUID.randomUUID().toString.take(8)}"
    df.withColumn(z, LayoutExprs.zValue(
        onLattice(LayoutExprs.bucketIndex(col(keyA).cast("double"), bA),
          bA.length + 1),
        onLattice(LayoutExprs.bucketIndex(col(keyB).cast("double"), bB),
          bB.length + 1)))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Per-file min/max spans of a key in a written dataset — the stats a
    * file-skipping scan consults, surfaced as a frame for inspection and
    * for LayoutSpec's locality assertions. One job; reads only the key
    * column.
    */
  def fileSpans(df: DataFrame, key: String): DataFrame =
    df.withColumn("__file", input_file_name())
      .groupBy(col("__file"))
      .agg(min(col(key)).as("lo"), max(col(key)).as("hi"))
      .select(col("__file").as("file"), col("lo"), col("hi"))
}
