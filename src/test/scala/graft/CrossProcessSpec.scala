package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann
import graft.sources.Tables

/** The listing memo's cross-PROCESS contract, pinned with a real fork
  * (the StreamRehearsalForked harness pattern): a separate JVM appends
  * into a committed index dir; the session here that had already
  * memoized the listing keeps its pre-append view (documented
  * staleness — serving sessions are generation-scoped), and a NEW
  * session opened afterwards sees the appended rows ("visible on their
  * next open", Ann.indexRead). With the cell manifest, the new session
  * gets there by reading the manifest the CHILD's writer updated —
  * cross-process manifest maintenance is exercised too.
  */
class CrossProcessSpec extends SparkSpec {

  private def evAll = Tables.embeddings(spark, sf)

  test("a sibling process's append: invisible to the open session, visible to the next") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-xproc-idx-").toString
    val idx = Ann.buildFrom(spark,
      evAll.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("vec")),
      Ann.Cells, dir)
    val evenCount = Ann.indexData(spark, idx).count() // memoize the listing

    // fork the appender: same JVM binary and module args, small heap
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

    // the open session's memoized listing predates the child's append —
    // the documented generation-scoped staleness, quiet by design
    assert(Ann.indexData(spark, idx).count() === evenCount,
      "memoized session unexpectedly re-listed mid-generation")
    // a NEW session re-plans (manifest or walk) and sees the append
    val s2 = spark.newSession()
    assert(Ann.indexData(s2, idx).count() === evAll.count(),
      "next-open session must see the sibling process's appended rows")
  }
}
