package graft.tools

import org.apache.spark.sql.SparkSession

/** Embeddings-surface decade probe: per scale directory, the
  * maintenance/serving split the events surface already has three
  * decades of — index build wall (cold in this session), IVF top-k /
  * batch serving, semantic dedup, and the ROUTED cosine path under a
  * forced cap (the same cap at every scale, so the decade ratio
  * measures the routed kernel, not a routing-threshold change).
  * Fixtures come from [[ClusteredCorpus]] (deterministic), which is not
  * subject to ScaleUp's 312-bijection cap — this is how the
  * embeddings surface gets a third decade (20 k → 200 k → 2 M).
  *
  * Prints one summary line per dir and appends a JSON object per dir
  * to the ledger file (arg 1).
  *
  *   sbt "runMain graft.tools.EmbDecade bench/emb_decade_r9.json \
  *        /tmp/clustered20k /tmp/clustered200k /tmp/clustered2m"
  */
object EmbDecade {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EmbDecade <outJson> <dir>...")
    val outFile = args(0)
    val dirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val root = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    root.sparkContext.setLogLevel("WARN")
    val results = dirs.map { d =>
      // fresh session per scale (shared context): the index memo is
      // session-keyed, so this keeps every build COLD and the serving
      // numbers free of cross-scale cache effects
      val spark = root.newSession()
      val n = spark.read.parquet(s"$d/embeddings.parquet").count()
      val cells = graft.operators.Ann.cellCount(spark, d)
      val trainTarget = math.max(graft.operators.Ann.SampleTarget,
        graft.operators.Ann.TrainPerCell * cells.toLong)
      val trainPath =
        if (trainTarget <= graft.operators.Ann.DriverTrainCap) "local"
        else "distributed"
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def best(name: String, f: => Unit): Double = {
        val ts = (1 to reps).map(_ => timed(f))
        println(f"[embdecade] $d $name%-22s " +
          f"reps=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f s")
        ts.min
      }
      val build = timed(graft.operators.Ann.buildIndex(spark, d))
      println(f"[embdecade] $d ann_index_build        $build%.2f s " +
        f"(n=$n cells=$cells train=$trainPath)")
      val topk = best("ann_ivf_topk",
        graft.operators.Ann.queries("ann_ivf_topk")(spark, d).collect())
      val batch = best("ann_ivf_batch",
        graft.operators.Ann.queries("ann_ivf_batch")(spark, d).collect())
      val sem = best("dedup_semantic", graft.operators.DedupOps
        .queries("dedup_semantic")(spark, d)
        .write.format("noop").mode("overwrite").save())
      // serving at the CLUSTERED-corpus knee (r8 calibration: recall
      // 1.000 from a ~2% probe fraction on this shape, vs the 0.6
      // default that covers the rotated worst case) — the deployment
      // story RecallCheck licenses, here with wall AND an inline
      // recall@20 against the exact brute-force twin so the down-tuned
      // number carries its own evidence at every decade
      val knee = math.max(1, math.ceil(cells * 0.02).toInt)
      spark.conf.set("spark.graft.ann.nprobe", knee.toString)
      val kneeWall = best(s"ann_ivf_topk@$knee",
        graft.operators.Ann.queries("ann_ivf_topk")(spark, d).collect())
      val kneeIds = graft.operators.Ann.queries("ann_ivf_topk")(spark, d)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      spark.conf.unset("spark.graft.ann.nprobe")
      val exactIds = graft.operators.SimilarityOps
        .queries("sim_cosine_topk")(spark, d)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val kneeRecall = (kneeIds intersect exactIds).size.toDouble /
        math.max(1, exactIds.size)
      println(f"[embdecade] $d knee nprobe=$knee recall@20=$kneeRecall%.3f")
      // routed path: same cap at every scale so every label block
      // routes and the ratio tracks the kernel
      spark.conf.set("spark.graft.dedup.maxCosineBlockRows", "1000")
      val routed = best("routed_cosine", graft.operators.DedupOps
        .queries("dedup_embedding_cosine")(spark, d)
        .write.format("noop").mode("overwrite").save())
      spark.conf.unset("spark.graft.dedup.maxCosineBlockRows")
      s"""{"dir":"$d","n_vectors":$n,"cells":$cells,
         |"train_path":"$trainPath","ann_index_build_sec":$build,
         |"ann_ivf_topk_sec":$topk,"ann_ivf_batch_sec":$batch,
         |"knee_nprobe":$knee,"ann_ivf_topk_knee_sec":$kneeWall,
         |"knee_recall20":$kneeRecall,
         |"dedup_semantic_sec":$sem,
         |"routed_cosine_cap1000_sec":$routed}"""
        .stripMargin.replace("\n", "")
    }
    val json = "[" + results.mkString(",\n ") + "]"
    val out = java.nio.file.Paths.get(outFile)
    if (out.getParent != null)
      java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[embdecade] wrote $outFile")
    root.stop()
  }
}
