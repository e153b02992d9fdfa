package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-session serving probe for a PINNED decade-scale index — the
  * measurement behind the cell manifest ([[graft.operators
  * .CellManifest]]): before it, a session's FIRST index query paid the
  * 15–17 s driver-side listing walk of the 10⁴-cell tree
  * (ProbeWallBreakdown, r11) that the session memo only amortizes
  * WITHIN a session; every cold session re-paid it. With the
  * commit-time manifest, a cold session plans from one small file.
  *
  * Protocol: build (or load) the pinned index once, then `reps` times:
  * open a FRESH session (same context — the memo is session-keyed, so
  * every first query re-resolves the listing path cold) and time the
  * first `ann_ivf_topk` (cold: centroids + manifest + probed scan) and
  * a second call (steady state, memoized listing). Writes a JSON
  * ledger.
  *
  *   sbt "runMain graft.tools.ColdServeProbe bench/cold_serve.json \
  *        /tmp/clustered2m /tmp/graft-pinned-index"
  */
object ColdServeProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: ColdServeProbe <outJson> <corpusDir> <indexBaseDir>")
    val Array(outFile, corpusDir, indexBase) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val root = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    root.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // maintenance: ensure the pinned index + codes are committed
    val builder = root.newSession()
    builder.conf.set("spark.graft.ann.indexDir", indexBase)
    val buildWall = timed(graft.operators.Ann.buildIndex(builder, corpusDir))
    val codesWall = timed(
      graft.operators.Pq.buildIvfPqCodes(builder, corpusDir))
    println(f"[coldserve] pinned build/load       $buildWall%8.3f s " +
      f"(codes $codesWall%.3f s)")
    val measured = (1 to reps).map { i =>
      val s = root.newSession() // fresh memo space = cold listing path
      s.conf.set("spark.graft.ann.indexDir", indexBase)
      val cold = timed(
        graft.operators.Ann.queries("ann_ivf_topk")(s, corpusDir).collect())
      val steady = timed(
        graft.operators.Ann.queries("ann_ivf_topk")(s, corpusDir).collect())
      // the COMPOSED path's cold open adds the codes manifest + the
      // `_books` sidecar load (no per-session codebook retrain)
      val coldPq = timed(
        graft.operators.Pq.queries("ann_ivfpq_topk")(s, corpusDir)
          .collect())
      val steadyPq = timed(
        graft.operators.Pq.queries("ann_ivfpq_topk")(s, corpusDir)
          .collect())
      println(f"[coldserve] session $i cold=$cold%.3f s steady=$steady%.3f" +
        f" s ivfpq_cold=$coldPq%.3f s ivfpq_steady=$steadyPq%.3f s")
      (cold, steady, coldPq, steadyPq)
    }
    val json =
      s"""{"corpus":"$corpusDir","index_base":"$indexBase",
         |"build_or_load_sec":$buildWall,"codes_build_sec":$codesWall,
         |"cold_first_query_sec":[${measured.map(_._1).mkString(",")}],
         |"steady_query_sec":[${measured.map(_._2).mkString(",")}],
         |"ivfpq_cold_first_query_sec":[${measured.map(_._3).mkString(",")}],
         |"ivfpq_steady_query_sec":[${measured.map(_._4).mkString(",")}],
         |"cold_min_sec":${measured.map(_._1).min},
         |"steady_min_sec":${measured.map(_._2).min},
         |"ivfpq_cold_min_sec":${measured.map(_._3).min},
         |"ivfpq_steady_min_sec":${measured.map(_._4).min}}"""
        .stripMargin.replace("\n", "")
    val out = java.nio.file.Paths.get(outFile)
    if (out.getParent != null)
      java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[coldserve] wrote $outFile")
    root.stop()
  }
}
