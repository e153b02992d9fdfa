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
}
