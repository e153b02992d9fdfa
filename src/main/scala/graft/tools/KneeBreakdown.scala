package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Pq}
import graft.sources.Tables

/** Decomposes the composed IVF-PQ serve at a pinned decade index into
  * its stages, with REAL task-input bytes per stage (listener-drained):
  *
  *   - `adc_only`: the pruned ADC shortlist scan + top-width collect —
  *     the stage the round-15 byte-sharded codes base exists to fix;
  *   - `rerank_only`: the probed-cells exact re-rank against a
  *     pre-materialized shortlist (what plain IVF pays, plus the join);
  *   - `plain`: `ann_ivf_topk` (the comparison floor);
  *   - `composed`: `ann_ivfpq_topk` end to end.
  *
  * Steady-state (session-warm listings), min of SPARK_GRAFT_REPS.
  *
  *   SPARK_GRAFT_OPTS="-Dspark.graft.ann.nprobe=200 ..." \
  *     tools/javamain.sh graft.tools.KneeBreakdown <corpus> <indexBase> <outJson>
  */
object KneeBreakdown {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: KneeBreakdown <corpusDir> <indexBaseDir> <outJson>")
    val Array(corpus, indexBase, outFile) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val root = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    root.sparkContext.setLogLevel("WARN")
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    root.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) { bytes.addAndGet(m.inputMetrics.bytesRead); () }
        }
      })
    val s = root.newSession()
    s.conf.set("spark.graft.ann.indexDir", indexBase)
    val idx = Ann.buildIndex(s, corpus)
    val codesDir = Pq.buildIvfPqCodes(s, corpus)
    val books = Pq.loadBooks(s, codesDir)
    val qv = Tables.embeddings(s, corpus).filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0).toArray
    val nprobe = Ann.nprobeOf(s, corpus)
    def measure(what: String)(f: => Unit): (Double, Long) = {
      // warm once, then min-of-reps with drained byte counts
      f
      val walls = (1 to reps).map { _ =>
        org.apache.spark.graft.ListenerBusDrain.drain(root.sparkContext)
        val b0 = bytes.get()
        val t0 = System.nanoTime()
        f
        val w = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerBusDrain.drain(root.sparkContext)
        (w, bytes.get() - b0)
      }
      val best = walls.minBy(_._1)
      println(f"[knee] $what%-14s min=${best._1}%7.3f s " +
        f"bytes=${best._2 / 1048576.0}%8.2f MB " +
        f"(all: ${walls.map(w => f"${w._1}%.3f").mkString(",")})")
      best
    }
    // fixed per-query floor: plan+schedule+collect of a trivial job —
    // what any extra stage costs at this geometry before it reads a byte
    val noop = measure("noop_job") {
      s.range(32).repartition(32).count(); ()
    }
    val plain = measure("plain") {
      Ann.queries("ann_ivf_topk")(s, corpus).collect(); ()
    }
    val composed = measure("composed") {
      Pq.queries("ann_ivfpq_topk")(s, corpus).collect(); ()
    }
    val adc = measure("adc_only") {
      Pq.adcShortlistProbe(s, idx, codesDir, books, qv, nprobe); ()
    }
    val json =
      s"""{"corpus":"$corpus","nprobe":$nprobe,
         |"plain_sec":${plain._1},"plain_mb":${plain._2 / 1048576.0},
         |"composed_sec":${composed._1},
         |"composed_mb":${composed._2 / 1048576.0},
         |"adc_only_sec":${adc._1},"adc_only_mb":${adc._2 / 1048576.0},
         |"noop_job_sec":${noop._1},
         |"composed_over_plain":${composed._1 / plain._1}}"""
        .stripMargin.replace("\n", "")
    val out = java.nio.file.Paths.get(outFile)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[knee] wrote $outFile")
    root.stop()
  }
}
