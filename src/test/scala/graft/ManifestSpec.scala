package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, CellManifest, Pq}
import graft.sources.Tables

/** The commit-time cell manifest ([[CellManifest]]): the writer-side
  * answer to the decade-scale listing walk. Contract pinned here:
  * every GENERATION writer (build, compact, codes build) commits a
  * manifest listing exactly the files a fresh tree walk finds, while
  * EPOCH appends land in the delta tier and leave the base manifest
  * untouched (it stays exactly true of the base tree); the
  * manifest-backed read plans the same base rows as the walking read
  * and still partition-prunes; the exactly-once machinery never
  * trusts a possibly-stale view (the truthful probe reads both
  * tiers fresh — crash-window replay heals instead of duplicating);
  * and a dir without a manifest keeps the walk fallback (updateCells
  * must not publish a partial view).
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

  test("append leaves the base manifest untouched; serving unions the delta tier") {
    val idx = halfIndex()
    val baseManifest = manifestFiles(idx.dir)
    Ann.appendToIndex(spark, idx, evAll.filter(col("vec_id") % 2 === 1))
    // the epoch landed in the delta tier: the partitioned base — and so
    // its manifest — are untouched, and the manifest still tells the
    // exact truth about the base tree
    assert(manifestFiles(idx.dir) === baseManifest)
    assert(manifestFiles(idx.dir) === walkFiles(idx.dir))
    assert(new java.io.File(idx.dir, "_delta").isDirectory,
      "appended rows must land under _delta")
    // the manifest-backed read plans the BASE tier only; the serving
    // read (indexData) unions the delta and covers every row
    assert(CellManifest.readAsDf(spark, idx.dir).get.count() ===
      evAll.filter(col("vec_id") % 2 === 0).count())
    assert(Ann.indexData(spark, idx).count() === evAll.count())
  }

  test("idempotent ingest dedups against the delta tier: crash-window replay appends nothing") {
    val idx = halfIndex()
    val baseManifest = manifestFiles(idx.dir)
    val batch = evAll.filter(col("vec_id") % 4 === 1)
    assert(Ann.appendToIndexIdempotent(spark, idx, batch, 12L))
    // the epoch never touches the base manifest
    assert(manifestFiles(idx.dir) === baseManifest)
    def dataEpochs(): Set[String] = {
      val d = new java.io.File(idx.dir, "_delta")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("e-"))
        .map(_.getName).toSet
    }
    val epochs = dataEpochs()
    assert(epochs.nonEmpty, "the epoch must have landed as delta")
    // crash window: data landed, marker missing — the replay must find
    // the rows in the DELTA tier (the truthful probe reads both tiers),
    // append nothing, and heal only the marker
    new java.io.File(idx.dir, "_ingest_commits/batch-12").delete()
    assert(!Ann.appendToIndexIdempotent(spark, idx, batch, 12L),
      "probe must recognize the delta-tier rows")
    assert(dataEpochs() === epochs,
      "a fully-landed replay must not write another delta epoch")
    val got = Ann.physicalRows(spark, idx.dir)
    assert(got.count() === got.select(col("vec_id")).distinct().count(),
      "crash-window replay duplicated rows")
  }

  test("compacted generation commits its own complete manifest") {
    val idx = halfIndex()
    Ann.appendToIndex(spark, idx, evAll.filter(col("vec_id") % 2 === 1))
    val dst = tmp("graft-manifest-compact-")
    Ann.compactIndex(spark, idx, dst)
    assert(manifestFiles(dst) === walkFiles(dst))
    assert(CellManifest.readAsDf(spark, dst).get.count() === evAll.count())
  }

  test("codes build and codes append keep the codes-dir manifest in step (partitioned layout)") {
    // the codes manifest protocol belongs to the big-cell PARTITIONED
    // base (tiny-cell geometry shards the base and needs no manifest —
    // IvfPqSpec pins that layout choice); force it here
    val s = spark.newSession()
    s.conf.set("spark.graft.pq.codesShardBytes", "1")
    val t = tmp("graft-manifest-codes-")
    val idx = Ann.buildFrom(s,
      asVec(evAll.filter(col("vec_id") % 2 === 0)), Ann.Cells, t)
    val books = Pq.trainBooks(
      Pq.normedOf(evAll.filter(col("vec_id") % 2 === 0)), "manifest-fixture")
    val codesDir = Pq.buildPqCodesFor(s, idx, books)
    assert(manifestFiles(codesDir) === walkFiles(codesDir))
    Ann.appendToIndex(s, idx, evAll.filter(col("vec_id") % 2 === 1))
    assert(manifestFiles(codesDir) === walkFiles(codesDir))
    // the codes artifact covers the appended rows exactly
    val codeIds = Pq.codesAt(s, idx.dir).select(col("vec_id"))
    val idxIds = Ann.physicalRows(s, idx.dir).select(col("vec_id"))
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

  test("pending sidecar keeps marked cells fresh-listed until a completed update heals them") {
    // the markPending/updateCells protocol is the PARTITIONED-append
    // manifest contract (delta-tier epochs never touch the manifest);
    // it stays pinned here because readAsDf still honors any sidecar a
    // foreign or legacy writer leaves behind
    val idx = halfIndex()
    val baseCount = evAll.filter(col("vec_id") % 2 === 0).count()
    val cells = (0 until Ann.Cells).toSeq
    // regress: strip most base files from the manifest AND leave a
    // pending record naming their cells — the reader must fold a fresh
    // relist of those cells and still see every base row
    val manifest = java.nio.file.Paths.get(idx.dir, "_cell_manifest")
    val all = java.nio.file.Files.readAllLines(manifest)
    val regressed = new java.util.ArrayList[String]()
    all.forEach { ln =>
      if (ln.startsWith("schema\t") || regressed.size < 4) regressed.add(ln)
    }
    java.nio.file.Files.write(manifest, regressed)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idx.dir, "._cell_manifest.crc"))
    assert(manifestFiles(idx.dir) !== walkFiles(idx.dir),
      "fixture must actually be stale")
    CellManifest.markPending(spark, idx.dir, cells)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(idx.dir, "_cell_manifest.pending")))
    assert(CellManifest.readAsDf(spark, idx.dir).get.count() === baseCount,
      "pending-marked cells must be fresh-listed, not trusted stale")
    // the next completed update heals the manifest and clears pending
    CellManifest.updateCells(spark, idx.dir, cells)
    assert(manifestFiles(idx.dir) === walkFiles(idx.dir))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(idx.dir, "_cell_manifest.pending")))
  }

  test("an abandoned writer lock is broken (by rename, not delete); the update lands") {
    val idx = halfIndex()
    val lock = new java.io.File(idx.dir, "_cell_manifest.lock")
    assert(lock.createNewFile())
    assert(lock.setLastModified(System.currentTimeMillis() - 600000L))
    // stale lock (10 min old) must be broken, the update must land
    CellManifest.updateCells(spark, idx.dir, (0 until Ann.Cells).toSeq)
    assert(manifestFiles(idx.dir) === walkFiles(idx.dir))
    assert(!lock.exists(), "the completed update must release the lock")
    // no breaker tombstone may linger
    assert(!new java.io.File(idx.dir).listFiles()
      .exists(_.getName.startsWith("_cell_manifest.lock.broken-")),
      "stale-lock breaking left a tombstone behind")
  }

  test("updateCells without a manifest is a no-op — legacy dirs keep the walk fallback") {
    val idx = halfIndex()
    val manifest = java.nio.file.Paths.get(idx.dir, "_cell_manifest")
    java.nio.file.Files.delete(manifest)
    CellManifest.updateCells(spark, idx.dir, (0 until Ann.Cells).toSeq)
    assert(!java.nio.file.Files.exists(manifest),
      "a partial manifest would hide every untouched cell")
    assert(CellManifest.readAsDf(spark, idx.dir).isEmpty)
    // the walking fallback (∪ delta) still serves appended rows
    Ann.appendToIndex(spark, idx, evAll.filter(col("vec_id") % 2 === 1))
    val s2 = spark.newSession()
    assert(Ann.indexData(s2, idx).count() === evAll.count())
  }
}
