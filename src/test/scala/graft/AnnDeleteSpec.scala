package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, SimilarityOps}
import graft.sources.Tables

/** Tombstone deletes ([[Ann.deleteFromIndex]] / [[Ann.indexData]] /
  * physical apply in [[Ann.compactIndex]]): a delete must be LOGICAL
  * until compaction (no data file touched — concurrent readers are
  * safe), invisible to every serving consumer immediately, idempotent,
  * and PHYSICALLY erased from the next generation (the
  * retention/takedown requirement: after compaction the bytes are
  * gone, not just filtered). The registry gate (`ann_ivf_delete_gate`)
  * hash-checks serving against the restricted brute-force oracle; this
  * spec covers what the hash can't see.
  */
class AnnDeleteSpec extends SparkSpec {

  private def dataFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getPath.contains("_centroids") &&
        !f.getPath.contains("_deletes"))
      .map(f => f.getPath -> f.length()).toMap
  }

  private lazy val idx = Ann.deletedIndex(spark, sf)
  private lazy val evenCount =
    Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 0).count()
  private lazy val allCount = Tables.embeddings(spark, sf).count()

  test("delete is logical: data files untouched, tombstoned ids invisible to indexData") {
    // the fixture indexed ALL rows then tombstoned the odd half — the
    // raw scan must still hold everything, the live view only the evens
    val raw = spark.read.parquet(idx.dir)
    assert(raw.count() === allCount, "delete rewrote data files")
    val live = Ann.indexData(spark, idx)
    assert(live.count() === evenCount)
    assert(live.filter(col("vec_id") % 2 === 1).count() === 0L,
      "tombstoned ids leak into the live view")
  }

  test("deletes are idempotent and unknown ids are a no-op") {
    val ev = Tables.embeddings(spark, sf)
    // re-tombstone an already-deleted slice + ids far past the corpus
    Ann.deleteFromIndex(spark, idx, ev.filter(col("vec_id") % 4 === 1))
    Ann.deleteFromIndex(spark, idx,
      spark.range(10).select((col("id") + 1000000000L).as("vec_id")))
    assert(Ann.indexData(spark, idx).count() === evenCount)
  }

  test("no-delete index plans a bare scan — the anti-join only appears once tombstones exist") {
    val t = java.nio.file.Files
      .createTempDirectory("graft-delete-plan-").toString
    val ev = Tables.embeddings(spark, sf)
    val clean = Ann.buildFrom(spark,
      ev.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("vec")),
      Ann.Cells, t)
    val planClean = Ann.indexData(spark, clean)
      .queryExecution.executedPlan.toString
    assert(!planClean.contains("Join"),
      s"no-delete read path must be a bare scan, got:\n$planClean")
    Ann.deleteFromIndex(spark, clean, ev.filter(col("vec_id") === 0))
    val planDel = Ann.indexData(spark, clean)
      .queryExecution.executedPlan.toString
    assert(planDel.contains("BroadcastHashJoin") &&
      planDel.contains("LeftAnti"),
      s"tombstone subtraction must be a broadcast anti-join, got:\n$planDel")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))
  }

  test("compaction applies tombstones physically and clears the delete set") {
    val dst = java.nio.file.Files
      .createTempDirectory("graft-delete-compact-").toString
    val out = Ann.compactIndex(spark, idx, dst)
    // the new generation's RAW bytes no longer contain the tombstoned
    // rows, and it starts with no _deletes dir at all
    val raw = spark.read.parquet(dst)
    assert(raw.count() === evenCount, "compaction kept tombstoned rows")
    assert(raw.filter(col("vec_id") % 2 === 1).count() === 0L)
    assert(!new java.io.File(dst, "_deletes").exists(),
      "tombstones must not carry into the new generation")
    // and serving the new generation == serving the old live view
    val cols = Seq("vec_id", "label", "vec", "soft_cells", "cell")
    val live = Ann.indexData(spark, idx).select(cols.map(col): _*)
    val comp = Ann.indexData(spark, out).select(cols.map(col): _*)
    assert(comp.exceptAll(live).isEmpty && live.exceptAll(comp).isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
  }

  test("re-ingest WINS over a pending tombstone — row still physically present") {
    // delete(id) then ingest(id) BEFORE any compaction: the row is still
    // in the data files, so the presence probe skips the append — but the
    // tombstone must be cleared so the id serves again (the old
    // "undefined" behavior silently kept it hidden)
    val t = java.nio.file.Files
      .createTempDirectory("graft-reingest-").toString
    val ev = Tables.embeddings(spark, sf)
    val asVec = ev.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    val idx = Ann.buildFrom(spark, asVec, Ann.Cells, t)
    val total = ev.count()
    Ann.deleteFromIndex(spark, idx, ev.filter(col("vec_id") < 4))
    assert(Ann.indexData(spark, idx).filter(col("vec_id") < 4).count() === 0L)
    // re-ingest two of the four tombstoned ids as a new epoch
    assert(!Ann.appendToIndexIdempotent(spark, idx,
      ev.filter(col("vec_id") < 2), 1L),
      "physically-present re-ingest must skip the append")
    val live = Ann.indexData(spark, idx)
    assert(live.filter(col("vec_id") < 2).count() === 2L,
      "re-ingested ids must serve again")
    assert(live.filter(col("vec_id") >= 2 && col("vec_id") < 4).count() === 0L,
      "non-re-ingested tombstones must survive the rewrite")
    assert(live.count() === total - 2)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))
  }

  test("re-ingest WINS after compaction erased the row: appended and served") {
    // delete(id) -> compact (bytes gone) -> ingest(id): the probe finds
    // nothing, the append lands the fresh row, and no stale tombstone
    // can hide it (compaction cleared the set)
    val t = java.nio.file.Files
      .createTempDirectory("graft-reingest2-").toString
    val dst = java.nio.file.Files
      .createTempDirectory("graft-reingest2-gen2-").toString
    val ev = Tables.embeddings(spark, sf)
    val asVec = ev.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    val idx = Ann.buildFrom(spark, asVec, Ann.Cells, t)
    val total = ev.count()
    Ann.deleteFromIndex(spark, idx, ev.filter(col("vec_id") === 0))
    val gen2 = Ann.compactIndex(spark, idx, dst)
    assert(spark.read.parquet(dst).count() === total - 1)
    assert(Ann.appendToIndexIdempotent(spark, gen2,
      ev.filter(col("vec_id") === 0), 1L),
      "post-compaction re-ingest must append")
    assert(Ann.indexData(spark, gen2).count() === total)
    assert(Ann.indexData(spark, gen2)
      .filter(col("vec_id") === 0).count() === 1L)
    Seq(t, dst).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("compacting an all-tombstoned index refuses instead of committing an unservable generation") {
    val t = java.nio.file.Files
      .createTempDirectory("graft-empty-compact-").toString
    val ev = Tables.embeddings(spark, sf)
    val idx = Ann.buildFrom(spark,
      ev.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec")),
      Ann.Cells, t)
    Ann.deleteFromIndex(spark, idx, ev.select(col("vec_id")))
    val dst = java.nio.file.Files
      .createTempDirectory("graft-empty-compact-dst-").toString
    val e = intercept[IllegalArgumentException] {
      Ann.compactIndex(spark, idx, dst)
    }
    assert(e.getMessage.contains("no live rows"))
    // nothing was committed: no ready marker in the refused generation
    assert(!new java.io.File(dst, "_GRAFT_INDEX_READY").exists())
    Seq(t, dst).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  test("served top-20 over the deleted index == brute force over survivors") {
    val got = SparkEntry.queries("ann_ivf_delete_gate")(spark, sf)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0)
    val want = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      .withColumn("sim", round(
        SimilarityOps.cosine(col("vec"), typedlit(qv)), 4))
      .select(col("vec_id"), col("label"), col("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(20)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
