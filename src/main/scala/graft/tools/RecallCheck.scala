package graft.tools

import org.apache.spark.sql.SparkSession

/** Operational recall probe for the IVF index at ANY scale directory —
  * the same recall@20-vs-brute-force methodology DedupAnnSpec gates at
  * test scale, runnable against a production-sized corpus after a
  * geometry change (the auto-derived cell count grows with the corpus;
  * recall under a FIXED nprobe is an empirical property of the corpus
  * distribution, so re-measure rather than assume).
  *
  * Usage: `runMain graft.tools.RecallCheck <sfDir> [nprobe ...]`
  * Prints recall@20 for ann_ivf_topk vs sim_cosine_topk at each nprobe
  * (default: the session default).
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RecallCheck <sfDir> [nprobe ...]")
    val sfDir = args(0)
    val probes: Seq[Option[Int]] =
      if (args.length > 1) args.drop(1).toSeq.map(p => Some(p.toInt))
      else Seq(None)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val exact = graft.operators.SimilarityOps
      .queries("sim_cosine_topk")(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    probes.foreach { p =>
      p.foreach(v => spark.conf.set("spark.graft.ann.nprobe", v.toString))
      val cells = graft.operators.Ann.cellCount(spark, sfDir)
      val nprobe = graft.operators.Ann.nprobeOf(spark, sfDir)
      val ann = graft.operators.Ann.queries("ann_ivf_topk")(spark, sfDir)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = (ann intersect exact).size.toDouble / exact.size
      println(f"[recall] cells=$cells nprobe=$nprobe recall@20=$recall%.3f")
    }
    spark.stop()
  }
}
