package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated A/B for the centroid-assignment kernel (the ingest
  * rehearsal's dominant `assign` stage): open a committed index, run the
  * SAME top-[[graft.operators.Ann.SoftIndexWidth]] assignment pass the
  * streamed epochs pay ([[graft.operators.Ann]] assignedRows shape,
  * without the PQ encode / persist / write costs that ride along in the
  * rehearsal) over a bounded slice of the corpus, with the pruned kernel
  * ON and OFF in one JVM — so the comparison shares every environmental
  * condition, steal included.
  *
  *   tools/javamain.sh graft.tools.AssignProbe <outJson> <corpusDir> \
  *     <indexDir> [rows] [reps]
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: AssignProbe <outJson> <corpusDir> <indexDir> [rows] [reps]")
    val outFile = args(0)
    val corpus = args(1)
    val indexDir = args(2)
    val rows = if (args.length > 3) args(3).toLong else 250000L
    val reps = if (args.length > 4) args(4).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // self-staging: build the index once into indexDir (even-half rows,
    // derived geometry) when no committed one is there — later probe
    // invocations reuse it
    val ready = new org.apache.hadoop.fs.Path(indexDir, "_GRAFT_INDEX_READY")
    val fs = ready.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(ready)) {
      val base = spark.read.parquet(s"$corpus/embeddings.parquet")
        .filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("vec"))
      val k = math.max(graft.operators.Ann.Cells,
        (base.count() / graft.operators.Ann.TargetCellRows).toInt)
      System.err.println(s"[assign-probe] staging index k=$k into $indexDir")
      graft.operators.Ann.buildFrom(spark, base, k, indexDir)
    }
    val idx = graft.operators.Ann.openIndex(spark, indexDir)
    val cents = idx.cents
    val batch = spark.read.parquet(s"$corpus/embeddings.parquet")
      .filter(col("vec_id") % 2 === 1).limit(rows.toInt)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    val n = batch.count() // materialize the input outside every window
    def stealTicks(): Long =
      try {
        val f = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/stat")).get(0).trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } catch { case _: Throwable => 0L }
    def assignOnce(kernel: String): Double = {
      val t0 = System.nanoTime()
      val m = math.min(graft.operators.Ann.SoftIndexWidth, cents.length)
      val normed = batch
        .withColumn("nrm", graft.operators.SimilarityOps.l2norm(col("vec")))
        .withColumn("uvec", when(col("nrm") === 0, col("vec"))
          .otherwise(transform(col("vec"), x => x / col("nrm"))))
      val out = kernel match {
        case "expr" =>
          normed.withColumn("soft_cells",
            graft.functions.VectorExprs.nearestCentroids(col("uvec"),
              cents, m))
        case "blocked" =>
          graft.operators.BlockedAssign.withSoftCells(normed, "uvec",
            "soft_cells", cents, m)
        case _ =>
          // kernel replaced by a cheap stand-in over the same input —
          // isolates the pipeline's non-kernel cost (cache read, norm
          // HOFs, row shaping, noop sink)
          normed.withColumn("soft_cells",
            array(element_at(col("uvec"), 1).cast("int")))
      }
      out.select(col("soft_cells"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def arm(label: String, disable: Boolean, kernel: String = "expr")
        : (Seq[Double], Long) = {
      if (disable) System.setProperty("graft.prune.disable", "true")
      else System.clearProperty("graft.prune.disable")
      val st0 = stealTicks()
      val times = (1 to reps).map { r =>
        spark.sparkContext.setJobDescription(s"assign-probe $label rep $r")
        val dt = assignOnce(kernel)
        System.err.println(f"[assign-probe] $label rep $r: $dt%.3f s")
        dt
      }
      (times, stealTicks() - st0)
    }
    // diagnose the gate's centroid-proxy assumption: the measured scan
    // fraction on REAL (normalized) corpus queries vs the gate's own
    // centroid-sampled simulation
    val realQs = batch.limit(256)
      .select(col("vec")).collect().map { r =>
        val v = r.getSeq[Double](0).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0) v else v.map(_ / n)
      }
    val realFrac = graft.functions.CentroidPruning.scanFractionFor(
      cents.map(_.toArray).toArray,
      math.min(graft.operators.Ann.SoftIndexWidth, cents.length), realQs)
    System.err.println(f"[assign-probe] real-query scan_frac=$realFrac%.3f")
    System.err.println("[assign-probe] " +
      graft.functions.CentroidPruning.debugStats(
        cents.map(_.toArray).toArray,
        math.min(graft.operators.Ann.SoftIndexWidth, cents.length),
        realQs.take(3)).replace("\n", "\n[assign-probe] "))
    val (base1, _) = arm("nokernel", disable = true, kernel = "none")
    // interleave arms so a steal burst cannot land wholly in one
    val (plain1, stP1) = arm("plain", disable = true)
    val (pruned1, stQ1) = arm("pruned", disable = false)
    val (plain2, stP2) = arm("plain", disable = true)
    val (pruned2, stQ2) = arm("pruned", disable = false)
    val (blocked1, _) = arm("blocked", disable = true, kernel = "blocked")
    val (blocked2, _) = arm("blocked", disable = true, kernel = "blocked")
    val plain = plain1 ++ plain2
    val pruned = pruned1 ++ pruned2
    val blocked = blocked1 ++ blocked2
    val base = base1
    val json =
      s"""{"corpus":"$corpus","index":"$indexDir","rows":$n,
         |"cells":${cents.length},"reps_per_arm":${plain.size},
         |"nokernel_sec":[${base.map(t => f"$t%.3f").mkString(",")}],
         |"nokernel_min":${f"${base.min}%.3f"},
         |"blocked_sec":[${blocked.map(t => f"$t%.3f").mkString(",")}],
         |"blocked_min":${f"${blocked.min}%.3f"},
         |"plain_sec":[${plain.map(t => f"$t%.3f").mkString(",")}],
         |"pruned_sec":[${pruned.map(t => f"$t%.3f").mkString(",")}],
         |"plain_min":${f"${plain.min}%.3f"},
         |"pruned_min":${f"${pruned.min}%.3f"},
         |"steal_ticks":{"plain":${stP1 + stP2},"pruned":${stQ1 + stQ2}}}"""
        .stripMargin.replace("\n", "")
    val out = java.nio.file.Paths.get(outFile)
    if (out.getParent != null)
      java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[assign-probe] wrote $outFile: plain_min=${plain.min} " +
      s"pruned_min=${pruned.min}")
    spark.stop()
  }
}
