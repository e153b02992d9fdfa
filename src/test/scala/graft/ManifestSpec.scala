package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, CellManifest, Pq}
import graft.sources.Tables

/** The commit-time cell manifest ([[CellManifest]]): the writer-side
  * answer to the decade-scale listing walk. Contract pinned here:
  * after EVERY lifecycle op (build, append, idempotent ingest,
  * compact, codes build, codes append) the manifest lists exactly the
  * files a fresh tree walk finds; the manifest-backed read plans the
  * same rows as the walking read and still partition-prunes; the
  * exactly-once machinery never trusts a possibly-stale manifest
  * (crash-window replay heals instead of duplicating); and a dir
  * without a manifest keeps the walk fallback (updateCells must not
  * publish a partial view).
  */
class ManifestSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def evAll = Tables.embeddings(spark, sf)

  private def asVec(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))

  private def halfIndex(): Ann.IvfIndex = {
    val t = tmp("graft-manifest-idx-")
    Ann.buildFrom(spark, asVec(evAll.filter(col("vec_id") % 2 === 0)),
      Ann.Cells, t)
  }

  /** The data files a fresh tree walk finds (cell-relative paths). */
  private def walkFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .flatMap { cd =>
        cd.listFiles().toSeq.filter(f => f.isFile &&
            !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .map(f => s"${cd.getName}/${f.getName}")
      }.toSet
  }

  /** The files the manifest lists (parsed straight off the artifact). */
  private def manifestFiles(dir: String): Set[String] = {
    val p = java.nio.file.Paths.get(dir, "_cell_manifest")
    assert(java.nio.file.Files.exists(p), s"no manifest at $dir")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala
      .filter(_.nonEmpty).drop(1)
      .map(_.split("\t")(1)).toSet
  }

  /** Manifest entries as (relPath → recorded length). */
  private def manifestLengths(dir: String): Map[String, Long] =
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(dir, "_cell_manifest"))).asScala
      .filter(_.nonEmpty).drop(1)
      .map { ln => val p = ln.split("\t"); p(1) -> p(2).toLong }.toMap

  test("build commits a manifest matching the fresh listing; manifest read == walk read") {
    val idx = halfIndex()
    assert(manifestFiles(idx.dir) === walkFiles(idx.dir))
    // the stat facts the reader serves WITHOUT re-statting must be true
    manifestLengths(idx.dir).foreach { case (rel, len) =>
      assert(new java.io.File(idx.dir, rel).length() === len,
        s"manifest length lies for $rel")
    }
    val viaManifest = CellManifest.readAsDf(spark, idx.dir)
    assert(viaManifest.isDefined, "committed index must carry a manifest")
    val m = viaManifest.get
    val w = spark.read.parquet(idx.dir)
    assert(m.columns.sorted.toSeq === w.columns.sorted.toSeq)
    assert(m.schema("cell").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(m.exceptAll(w.select(m.columns.map(col).toSeq: _*)).isEmpty &&
      w.select(m.columns.map(col).toSeq: _*).exceptAll(m).isEmpty,
      "manifest-planned rows diverge from the walking read")
  }

  test("the manifest-backed scan still partition-prunes on cell") {
    val idx = halfIndex()
    val plan = CellManifest.readAsDf(spark, idx.dir).get
      .filter(col("cell") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected a cell partition filter on the manifest-planned scan:\n$plan")
  }

  test("append refreshes the manifest: touched cells re-listed, others kept") {
    val idx = halfIndex()
    Ann.appendToIndex(spark, idx, evAll.filter(col("vec_id") % 2 === 1))
    assert(manifestFiles(idx.dir) === walkFiles(idx.dir))
    // and the refreshed manifest serves the full row set
    assert(CellManifest.readAsDf(spark, idx.dir).get.count() ===
      evAll.count())
  }

  test("idempotent ingest keeps the manifest in step and heals a stale one without duplicating") {
    val idx = halfIndex()
    val batch = evAll.filter(col("vec_id") % 4 === 1)
    assert(Ann.appendToIndexIdempotent(spark, idx, batch, 12L))
    assert(manifestFiles(idx.dir) === walkFiles(idx.dir))
    // crash window: an epoch's files landed but the manifest update was
    // lost — regress the manifest to the pre-epoch state by hand
    val manifest = java.nio.file.Paths.get(idx.dir, "_cell_manifest")
    val preEpoch = java.nio.file.Files.readAllLines(manifest)
    val batch2 = evAll.filter(col("vec_id") % 4 === 3)
    assert(Ann.appendToIndexIdempotent(spark, idx, batch2, 13L))
    java.nio.file.Files.write(manifest, preEpoch) // stale: misses batch2
    // the direct rewrite invalidates hadoop-local's checksum sidecar —
    // drop it (object stores have no sidecar; this is test plumbing)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idx.dir, "._cell_manifest.crc"))
    assert(manifestFiles(idx.dir) !== walkFiles(idx.dir),
      "fixture must actually be stale")
    // replay of the SAME epoch against the stale manifest: the truthful
    // cell-bounded probe sees the rows, appends nothing, heals manifest
    new java.io.File(idx.dir, "_ingest_commits/batch-13").delete()
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch2, 13L),
      "probe must recognize the already-committed rows")
    assert(manifestFiles(idx.dir) === walkFiles(idx.dir),
      "replay must heal the stale manifest")
    val got = spark.read.parquet(idx.dir)
    assert(got.count() === got.select(col("vec_id")).distinct().count(),
      "stale-manifest replay duplicated rows")
  }

  test("compacted generation commits its own complete manifest") {
    val idx = halfIndex()
    Ann.appendToIndex(spark, idx, evAll.filter(col("vec_id") % 2 === 1))
    val dst = tmp("graft-manifest-compact-")
    Ann.compactIndex(spark, idx, dst)
    assert(manifestFiles(dst) === walkFiles(dst))
    assert(CellManifest.readAsDf(spark, dst).get.count() === evAll.count())
  }

  test("codes build and codes append keep the codes-dir manifest in step") {
    val idx = halfIndex()
    val books = Pq.trainBooks(
      Pq.normedOf(evAll.filter(col("vec_id") % 2 === 0)), "manifest-fixture")
    val codesDir = Pq.buildPqCodesFor(spark, idx, books)
    assert(manifestFiles(codesDir) === walkFiles(codesDir))
    Ann.appendToIndex(spark, idx, evAll.filter(col("vec_id") % 2 === 1))
    assert(manifestFiles(codesDir) === walkFiles(codesDir))
    // the codes artifact covers the appended rows exactly
    val codeIds = Pq.codesAt(spark, idx.dir).select(col("vec_id"))
    val idxIds = spark.read.parquet(idx.dir).select(col("vec_id"))
    assert(codeIds.exceptAll(idxIds).isEmpty &&
      idxIds.exceptAll(codeIds).isEmpty,
      "codes rows diverge from index rows after the append")
  }

  test("a malformed manifest parses to None — walk fallback, never a propagated parse error") {
    val idx = halfIndex()
    val manifest = java.nio.file.Paths.get(idx.dir, "_cell_manifest")
    val lines = java.nio.file.Files.readAllLines(manifest)
    // 4 columns, but non-numeric cell/length fields — a foreign manifest
    val bad = new java.util.ArrayList[String](lines)
    bad.add("not-a-cell\tsome/file\tlong?\t12")
    java.nio.file.Files.write(manifest, bad)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idx.dir, "._cell_manifest.crc"))
    assert(CellManifest.readAsDf(spark, idx.dir).isEmpty,
      "a half-understood manifest must yield the walk fallback, not throw")
    // and the walking read still serves everything
    assert(spark.newSession().read.parquet(idx.dir).count() ===
      evAll.filter(col("vec_id") % 2 === 0).count())
  }

  test("append crash window: pending sidecar keeps appended rows visible until healed") {
    val idx = halfIndex()
    val baseCount = evAll.filter(col("vec_id") % 2 === 0).count()
    // simulate the crash: data lands + pending is down, but the
    // updateCells that would refresh the manifest never ran
    val batch = evAll.filter(col("vec_id") % 2 === 1)
    val cells = (0 until Ann.Cells).toSeq
    CellManifest.markPending(spark, idx.dir, cells)
    Ann.appendToIndex(spark, idx, batch) // full append (heals + clears)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(idx.dir, "_cell_manifest.pending")),
      "a completed append must clear the pending record")
    // now regress: strip batch files from the manifest AND restore a
    // pending record naming their cells — the reader must fold a fresh
    // relist of those cells and still see every row
    val manifest = java.nio.file.Paths.get(idx.dir, "_cell_manifest")
    val all = java.nio.file.Files.readAllLines(manifest)
    val regressed = new java.util.ArrayList[String]()
    all.forEach { ln =>
      if (ln.startsWith("schema\t") || regressed.size < 4) regressed.add(ln)
    }
    java.nio.file.Files.write(manifest, regressed)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idx.dir, "._cell_manifest.crc"))
    CellManifest.markPending(spark, idx.dir, cells)
    assert(CellManifest.readAsDf(spark, idx.dir).get.count() ===
      evAll.count(),
      "pending-marked cells must be fresh-listed, not trusted stale")
    // the next completed update heals the manifest and clears pending
    CellManifest.updateCells(spark, idx.dir, cells)
    assert(manifestFiles(idx.dir) === walkFiles(idx.dir))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(idx.dir, "_cell_manifest.pending")))
    assert(baseCount > 0)
  }

  test("an abandoned writer lock is broken; a live one is respected") {
    val idx = halfIndex()
    val lock = new java.io.File(idx.dir, "_cell_manifest.lock")
    assert(lock.createNewFile())
    assert(lock.setLastModified(System.currentTimeMillis() - 600000L))
    // stale lock (10 min old) must be broken, the update must land
    Ann.appendToIndex(spark, idx, evAll.filter(col("vec_id") % 2 === 1))
    assert(manifestFiles(idx.dir) === walkFiles(idx.dir))
    assert(!lock.exists(), "the completed update must release the lock")
  }

  test("updateCells without a manifest is a no-op — legacy dirs keep the walk fallback") {
    val idx = halfIndex()
    val manifest = java.nio.file.Paths.get(idx.dir, "_cell_manifest")
    java.nio.file.Files.delete(manifest)
    Ann.appendToIndex(spark, idx, evAll.filter(col("vec_id") % 2 === 1))
    assert(!java.nio.file.Files.exists(manifest),
      "a partial manifest would hide every untouched cell")
    assert(CellManifest.readAsDf(spark, idx.dir).isEmpty)
    // the walking fallback still serves the full appended row set
    val s2 = spark.newSession()
    assert(Ann.indexData(s2, idx).count() === evAll.count())
  }
}
