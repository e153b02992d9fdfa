package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, SimilarityOps}
import graft.sources.Tables

/** Incremental IVF ingest ([[Ann.appendToIndex]]): appended rows must be
  * indistinguishable from rows the build had seen — same assignment
  * kernel output, same at-rest layout — and the append must never touch
  * the base index's files. The registry gate (`ann_ivf_append_gate`)
  * hash-checks full-probe serving against the brute-force oracle; this
  * spec covers what the hash can't see (file-level non-destruction,
  * assignment parity, the default-probe recall floor, no-op appends).
  */
class AnnAppendSpec extends SparkSpec {

  private def indexFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getPath.contains("_centroids"))
      .map(f => f.getPath -> f.length()).toMap
  }

  private lazy val idx = Ann.appendedIndex(spark, sf)

  test("appended rows carry the exact cell/soft_cells the build kernel assigns") {
    val m = math.min(Ann.SoftIndexWidth, idx.cents.length)
    val want = {
      val base = Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 2 === 1)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("vec"))
      base
        .withColumn("nrm", SimilarityOps.l2norm(col("vec")))
        .withColumn("uvec", when(col("nrm") === 0, col("vec"))
          .otherwise(transform(col("vec"), x => x / col("nrm"))))
        .select(col("vec_id"),
          Ann.softCellsOf(col("uvec"), idx.cents, m).as("sc"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    }
    val got = Ann.physicalRows(spark, idx.dir)
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("soft_cells"), col("cell"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2)))
    assert(got.length === want.size)
    got.foreach { case (id, sc, cell) =>
      assert(sc === want(id), s"vec_id=$id soft_cells mismatch")
      assert(cell === sc.head, s"vec_id=$id cell != soft_cells[0]")
    }
  }

  test("append adds only batch rows and leaves base index files untouched") {
    val t = java.nio.file.Files
      .createTempDirectory("graft-append-spec-").toString
    val ev = Tables.embeddings(spark, sf)
    val base = ev.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val built = Ann.buildFrom(spark, base, Ann.Cells, t)
    val before = indexFiles(t)
    val nBase = spark.read.parquet(t).count()
    Ann.appendToIndex(spark, built, ev.filter(col("vec_id") % 2 === 1))
    val after = indexFiles(t)
    // every pre-append file still present, byte-identical in length
    before.foreach { case (p, len) =>
      assert(after.get(p).contains(len), s"base file changed: $p")
    }
    assert(after.size > before.size, "append wrote no new files")
    // the epoch landed in the DELTA tier, not the partitioned base
    assert((after.keySet -- before.keySet)
      .forall(_.contains("_delta")),
      "append must land in the delta tier, never the base cells")
    val total = Ann.physicalRows(spark, t).count()
    assert(total === ev.count(), s"base=$nBase after=$total")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))
  }

  test("full-probe serving over the appended index == brute force") {
    // the gate's device, asserted frame-level here: all cells probed →
    // IVF exact → must equal the oracle-gated brute-force baseline
    val got = SparkEntry.queries("ann_ivf_append_gate")(spark, sf)
    val want = SparkEntry.queries("sim_cosine_topk")(spark, sf)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("default-probe recall@20 on the appended index >= 0.9") {
    // centroids trained on HALF the corpus, the continuous-ingest
    // worst case for the recall floor — the same 0.9 bar the normal
    // index holds
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0)
    val probed = idx.probeCells(qv, Ann.nprobeOf(spark, sf))
    val ann = Ann.physicalRows(spark, idx.dir)
      .filter(col("cell").isin(probed: _*))
      .withColumn("sim", round(
        SimilarityOps.cosine(col("vec"), typedlit(qv)), 4))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(20).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("sim_cosine_topk")(spark, sf)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@20 = $recall")
  }

  test("empty-batch append is a no-op") {
    val before = Ann.physicalRows(spark, idx.dir).count()
    Ann.appendToIndex(spark, idx,
      Tables.embeddings(spark, sf).limit(0))
    assert(Ann.physicalRows(spark, idx.dir).count() === before)
  }

  test("compaction is a pure layout move: contents bit-equal, files per cell back to one") {
    // source: the built+appended fixture — every appended cell carries
    // the build's file plus the append's, the layout drift compaction
    // exists to undo
    val dst = java.nio.file.Files
      .createTempDirectory("graft-compact-spec-").toString
    val out = Ann.compactIndex(spark, idx, dst)
    assert(out.cents === idx.cents, "centroids must carry over verbatim")
    val cols = Seq("vec_id", "label", "vec", "soft_cells", "cell")
    val src = Ann.physicalRows(spark, idx.dir).select(cols.map(col): _*)
    val cmp = spark.read.parquet(dst).select(cols.map(col): _*)
    assert(cmp.exceptAll(src).isEmpty && src.exceptAll(cmp).isEmpty,
      "compaction changed index contents")
    // at-rest shape: at most one data file per occupied cell (the
    // build's shape), strictly fewer files than the appended source
    val cells = cmp.select(col("cell")).distinct().count()
    assert(indexFiles(dst).size <= cells,
      s"expected <= $cells files, got ${indexFiles(dst).size}")
    assert(indexFiles(dst).size < indexFiles(idx.dir).size,
      "compaction did not reduce file count")
    // the new generation is committed: ready marker + loadable centroids
    assert(new java.io.File(dst, "_GRAFT_INDEX_READY").exists())
    assert(spark.read.parquet(s"$dst/_centroids").count() ===
      idx.cents.length.toLong)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
  }

  test("randomized splits: build/append/delete composition == brute force over survivors") {
    // generalizes the even/odd gates: three seeded random partitions of
    // the corpus into (base, batch, doomed) — build on base, append
    // batch, tombstone doomed — full-probe serving must equal brute
    // force over base ∪ batch ∖ doomed for EVERY split, not just the
    // parity the gates use
    val ev = Tables.embeddings(spark, sf)
    val qv = ev.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0)
    for (seed <- Seq(11L, 42L, 97L)) {
      val t = java.nio.file.Files
        .createTempDirectory(s"graft-random-split-$seed-").toString
      // deterministic 3-way split on a seeded hash: ~60% base,
      // ~30% batch, ~10% doomed (doomed ⊂ base ∪ batch)
      val bucket = pmod(xxhash64(col("vec_id"), lit(seed)), lit(10))
      val base = ev.filter(bucket < 6)
      val batch = ev.filter(bucket >= 6)
      val doomed = ev.filter(pmod(xxhash64(col("vec_id"), lit(seed + 1)),
        lit(10)) === 0)
      val idx = Ann.buildFrom(spark,
        base.select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("vec")),
        Ann.Cells, t)
      Ann.appendToIndex(spark, idx, batch)
      Ann.deleteFromIndex(spark, idx, doomed)
      val probed = idx.probeCells(qv, idx.cents.length)
      val got = Ann.indexData(spark, idx)
        .filter(col("cell").isin(probed: _*))
        .withColumn("sim", round(
          SimilarityOps.cosine(col("vec"), typedlit(qv)), 4))
        .select(col("vec_id"), col("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = ev
        .join(doomed.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("vec"))
        .withColumn("sim", round(
          SimilarityOps.cosine(col("vec"), typedlit(qv)), 4))
        .select(col("vec_id"), col("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === want, s"seed $seed: lifecycle serving != brute force")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))
    }
  }

  test("compacted generation serves the identical full-probe answer") {
    val dst = java.nio.file.Files
      .createTempDirectory("graft-compact-serve-").toString
    val out = Ann.compactIndex(spark, idx, dst)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0)
    def top20(i: Ann.IvfIndex) = Ann.physicalRows(spark, i.dir)
      .filter(col("cell").isin(i.probeCells(qv, i.cents.length): _*))
      .withColumn("sim", round(
        SimilarityOps.cosine(col("vec"), typedlit(qv)), 4))
      .select(col("vec_id"), col("label"), col("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(20).collect().toSeq
    assert(top20(out) === top20(idx))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
  }
}
