package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Isolated timing for the maintenance compaction fold
  * ([[Ann.compactIndex]]) at the rehearsal decade — the churn
  * rehearsal's dominant parent-side block (measured 62.6 s inside a
  * 412 s churn wall, `bench/ingest_rehearsal_r16_churn_base.json`)
  * timed on its own so optimization work measures the fold, not the
  * stream around it.
  *
  * Stages the churn rehearsal's pre-compaction index shape ONCE into a
  * kept fixture dir (build on the even half, append the odd half in 4
  * epoch-sized batches, tombstone vec_id % 40 == 0) and reuses it when
  * its ready marker is present — the fixture is a MEASUREMENT input
  * derived deterministically from the corpus argument, rebuilt by any
  * JVM that finds it missing, never an engine cache. Each rep compacts
  * into a FRESH dst dir (deleted after timing) with
  * `spark.graft.maintenance.timing` on, so per-phase walls land on
  * stderr and the json carries per-rep totals + min.
  *
  *   tools/javamain.sh graft.tools.CompactProbe <outJson> <corpusDir> [reps]
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CompactProbe <outJson> <corpusDir> [reps]")
    val outFile = args(0)
    val corpus = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.maintenance.timing", "true")

    val fixture = s"/tmp/graft-compactprobe-${new java.io.File(corpus).getName}"
    val ready = new java.io.File(fixture, "_GRAFT_INDEX_READY")
    val ev = spark.read.parquet(s"$corpus/embeddings.parquet")
    val k = Ann.cellCount(spark, corpus)
    if (!ready.exists()) {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(fixture))
      System.err.println(s"[compact-probe] staging fixture at $fixture")
      val t0 = System.nanoTime()
      val idx = Ann.buildFrom(spark,
        ev.filter(col("vec_id") % 2 === 0)
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), x => x.cast("double")).as("vec")),
        k, fixture)
      // a committed codes generation on the base half (the rehearsal's
      // staged shape) so the probe's compaction pays the codes carry too
      graft.operators.Pq.buildPqCodesFor(spark, idx,
        graft.operators.Pq.trainBooks(
          graft.operators.Pq.normedOf(
            ev.filter(col("vec_id") % 2 === 0)), "compact probe base half"))
      // the odd half in 4 epoch-sized appends — the at-kill delta shape
      (0 until 4).foreach { i =>
        Ann.appendToIndex(spark, idx,
          ev.filter(col("vec_id") % 2 === 1 && col("vec_id") % 8 === 2 * i + 1))
      }
      Ann.deleteFromIndex(spark, idx,
        ev.filter(col("vec_id") % 40 === 0).select(col("vec_id")))
      System.err.println(
        f"[compact-probe] staged in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else System.err.println(s"[compact-probe] reusing fixture $fixture")

    val idx = Ann.openIndex(spark, fixture)
    val secs = (1 to reps).map { r =>
      val dst = java.nio.file.Files
        .createTempDirectory("graft-compactprobe-dst-").toString
      val t0 = System.nanoTime()
      Ann.compactIndex(spark, idx, dst)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[compact-probe] rep $r: $dt%.1f s")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
      dt
    }
    val json =
      s"""{"corpus":"$corpus","fixture":"$fixture","reps":$reps,
         |"sec":[${secs.map(x => f"$x%.3f").mkString(",")}],
         |"min_sec":${f"${secs.min}%.3f"}}"""
        .stripMargin.replace("\n", "")
    val out = java.nio.file.Paths.get(outFile)
    if (out.getParent != null)
      java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[compact-probe] wrote $outFile")
    spark.stop()
  }
}
