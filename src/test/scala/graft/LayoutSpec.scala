package graft

import org.apache.spark.sql.functions._

import graft.functions.LayoutExprs
import graft.operators.Layout
import graft.sources.Tables

/** Z-order layout: curve correctness and the file-skipping property it
  * exists for — per-file min/max spans bounded in BOTH dimensions, where
  * a single-key sort bounds one and leaves the other full-width.
  */
class LayoutSpec extends SparkSpec {

  test("z_value interleaves bits (a even, b odd)") {
    import spark.implicits._
    // spread(3)=0b0101, spread(5)=0b010001 → 5 | (17<<1) = 39; inputs
    // are masked to 31 bits (bit 31 of the odd-position key would land
    // on the sign bit), so 32 ones spread like 31 ones
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (3L, 5L, 39L),
        (0xFFFFFFFFL, 0L, 0x1555555555555555L),
        (0x7FFFFFFFL, 0x7FFFFFFFL, 0x3FFFFFFFFFFFFFFFL))
      .toDF("a", "b", "want")
      .select(LayoutExprs.zValue($"a", $"b").as("z"), $"want")
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("z_value stays non-negative for full-width keys (signed sort order holds)") {
    import spark.implicits._
    // the regression this pins: an unmasked 32-bit odd-position key put
    // its bit 31 on bit 63, flipping the z-key's sign and breaking curve
    // monotonicity under the signed long sort
    val keys = Seq(0L, 1L, (1L << 31) - 1, 1L << 31, 0xFFFFFFFFL, Long.MaxValue)
    val zs = keys.flatMap(a => keys.map(b => (a, b))).toDF("a", "b")
      .select(LayoutExprs.zValue($"a", $"b").as("z")).collect()
    zs.foreach(r => assert(r.getLong(0) >= 0L, r.toString))
  }

  test("z-order write bounds per-file spans in both dimensions") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val Array(loO, hiO, loP, hiP) = li
      .agg(min("l_orderkey"), max("l_orderkey"),
        min("l_partkey"), max("l_partkey"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    val zdir = java.nio.file.Files
      .createTempDirectory("graft-zorder-").toString
    val sdir = java.nio.file.Files
      .createTempDirectory("graft-sorted-").toString
    Layout.writeZOrdered(li, "l_orderkey", "l_partkey", zdir, 8)
    // the single-key baseline: same file count, sorted on orderkey only
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(sdir)

    def avgSpan(dir: String, key: String, lo: Double, hi: Double): Double = {
      val spans = Layout.fileSpans(spark.read.parquet(dir), key)
        .collect()
        .map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
      assert(spans.length >= 6, s"expected ~8 files, got ${spans.length}")
      spans.map { case (l, h) => (h - l) / (hi - lo) }.sum / spans.length
    }

    // no data loss through the layout shuffle
    assert(spark.read.parquet(zdir).count() == li.count())

    val zOrd = avgSpan(zdir, "l_orderkey", loO, hiO)
    val zPart = avgSpan(zdir, "l_partkey", loP, hiP)
    val sOrd = avgSpan(sdir, "l_orderkey", loO, hiO)
    val sPart = avgSpan(sdir, "l_partkey", loP, hiP)
    // single-key layout: sorted dim tight, other dim full-width — a
    // partkey predicate skips nothing
    assert(sOrd < 0.3, s"sorted layout orderkey span $sOrd")
    assert(sPart > 0.8, s"sorted layout partkey span $sPart")
    // z-order: BOTH dims bounded (8 files = 3 curve bits → spans of
    // roughly 1/4 and 1/2; generous bounds absorb range-sampling noise)
    assert(zOrd < 0.75, s"z-order orderkey span $zOrd")
    assert(zPart < 0.75, s"z-order partkey span $zPart")
    // and strictly better than the single-key layout where it matters
    assert(zPart < sPart / 2, s"z partkey $zPart vs sorted $sPart")
  }

  test("rank-normalized z-order keeps skipping on a Zipfian key") {
    // heavy-tailed key: 90% of rows share 100 small values; the tail
    // reaches ~1e9. The linear lattice maps the hot mass into ONE cell,
    // the curve degenerates to a partkey sort, and every file's span
    // covers the hot values — a point predicate on the skewed key reads
    // every file. Equi-depth buckets (approx quantiles) spread the mass.
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .withColumn("skew",
        when(pmod(col("l_orderkey"), lit(10)) < 9,
          pmod(col("l_orderkey"), lit(100)))
          .otherwise(pmod(col("l_orderkey") * 7919L + col("l_partkey"),
            lit(1000000000L))))
      .select(col("skew"), col("l_partkey"))
    val linDir = java.nio.file.Files
      .createTempDirectory("graft-zlin-").toString
    val rnkDir = java.nio.file.Files
      .createTempDirectory("graft-zrnk-").toString
    // 16 files = 4 curve bits = two splits per dimension (8 files would
    // split the skew dim only once, capping its best span near 1/2)
    Layout.writeZOrdered(li, "skew", "l_partkey", linDir, 16)
    Layout.writeZOrderedRanked(li, "skew", "l_partkey", rnkDir, 16,
      buckets = 256)
    assert(spark.read.parquet(rnkDir).count() == li.count())

    // metric: expected fraction of ROW MASS a file's [lo, hi] span
    // covers — i.e. how much of the table a point query on a random row
    // fails to skip. (Value-space spans are meaningless under skew.)
    val (values, cum) = {
      val vc = li.groupBy(col("skew")).count().orderBy(col("skew"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val cums = vc.map(_._2).scanLeft(0L)(_ + _)
      (vc.map(_._1), cums) // cum(i) = rows with value < values(i)
    }
    val total = cum.last.toDouble
    def massSpan(dir: String): Double = {
      val spans = Layout.fileSpans(spark.read.parquet(dir), "skew")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(spans.length >= 12)
      spans.map { case (lo, hi) =>
        val i = java.util.Arrays.binarySearch(values, lo)
        val j = java.util.Arrays.binarySearch(values, hi)
        assert(i >= 0 && j >= 0) // spans come from actual data values
        (cum(j + 1) - cum(i)) / total
      }.sum / spans.length
    }
    val linMass = massSpan(linDir)
    val rnkMass = massSpan(rnkDir)
    info(s"per-file row-mass span: linear=$linMass ranked=$rnkMass")
    // linear: the hot cell's rows land in most files → spans swallow the
    // table; ranked: equi-depth cells bound per-file mass near the
    // curve's geometric limit (two splits → ~1/4, plus equi-depth cut
    // raggedness and hot-value granularity)
    assert(linMass > 0.5, s"linear lattice unexpectedly fine: $linMass")
    assert(rnkMass < linMass * 0.6, s"ranked $rnkMass vs linear $linMass")
    assert(rnkMass < 0.55, s"ranked layout mass span $rnkMass")
  }
}
