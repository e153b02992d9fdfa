package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann
import graft.sources.Tables

/** The listing memo's cross-PROCESS contract, pinned with a real fork
  * (the StreamRehearsalForked harness pattern): a separate JVM appends
  * into a committed index dir while a session here has already
  * memoized the listing.
  *
  * With a cell manifest, the memo is VERSIONED on the manifest's file
  * status (Ann.indexRead → SessionCache.memoVersioned over
  * CellManifest.stateToken), so the child's committed append — which
  * republishes the manifest — is visible to the parent's SAME open
  * session at its very next query: bounded staleness, one
  * driver-side stat pair per query construction. A manifest-LESS
  * (legacy) dir keeps the old generation-scoped contract: the open
  * session serves its memoized walking read until newSession(), and
  * the next session's fresh walk sees the appended rows.
  */
class CrossProcessSpec extends SparkSpec {

  private def evAll = Tables.embeddings(spark, sf)

  private def buildHalf(dir: String): Ann.IvfIndex =
    Ann.buildFrom(spark,
      evAll.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("vec")),
      Ann.Cells, dir)

  /** Fork graft.tools.CrossProcessAppend against `dir` and wait. */
  private def forkAppend(dir: String): Unit = {
    val javaBin = ProcessHandle.current().info().command().orElse("java")
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val args = scala.jdk.CollectionConverters
      .ListHasAsScala(jvmArgs).asScala.toSeq
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms"))
    val cmd = Seq(javaBin) ++ args ++ Seq("-Xmx4g",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.CrossProcessAppend", dir, sf)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val rd = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val out = new StringBuilder
    var line = rd.readLine()
    while (line != null) { out.append(line).append('\n'); line = rd.readLine() }
    assert(p.waitFor() == 0, s"child appender failed:\n$out")
  }

  test("a sibling process's append is visible to the SAME open session within one query") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-xproc-idx-").toString
    val idx = buildHalf(dir)
    val evenCount = Ann.indexData(spark, idx).count() // memoize the listing
    assert(evenCount < evAll.count())

    forkAppend(dir)

    // the child's committed epoch landed in the delta tier; the
    // version token (manifest token + delta token) mismatches and the
    // open session re-plans — NO newSession() required (bounded
    // staleness)
    assert(Ann.indexData(spark, idx).count() === evAll.count(),
      "open session must see the sibling process's appended rows " +
        "through the delta token")
  }

  test("even a manifest-less dir gets bounded staleness: the delta epoch carries its own token") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-xproc-legacy-").toString
    val idx = buildHalf(dir)
    // strip the manifest: the walking-read path (constant manifest
    // token) — visibility must now come from the DELTA tier's token
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, "_cell_manifest"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._cell_manifest.crc"))
    val evenCount = Ann.indexData(spark, idx).count() // memoize the walk
    assert(evenCount < evAll.count())

    forkAppend(dir)

    // the child's epoch landed as a delta dir, and DeltaTier.token is
    // part of the listing memo's version — so even without a manifest
    // the open session re-plans at its next query (the round-14 delta
    // tier upgraded legacy dirs from generation-scoped staleness to the
    // same bounded staleness manifest-backed dirs get)
    assert(Ann.indexData(spark, idx).count() === evAll.count(),
      "open session must see the sibling process's delta epoch " +
        "through the delta token")
    val s2 = spark.newSession()
    assert(Ann.indexData(s2, idx).count() === evAll.count(),
      "next-open session must see the sibling process's appended rows")
  }
}
