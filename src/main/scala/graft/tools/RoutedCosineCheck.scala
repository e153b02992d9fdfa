package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale evidence for `dedup_embedding_cosine`'s block routing: runs the
  * query twice on the same corpus — once with the default cap (at
  * rehearsal scales every label block fits, so this is the exact
  * all-pairs kernel) and once with a forced cap that routes every
  * block through the k-means cells — and reports wall seconds, pair
  * counts, routed-path recall vs the exact pairs, and precision
  * (every routed pair must BE an exact pair with the same cosine —
  * the routing contract: cells gate WHICH pairs surface, never the
  * arithmetic).
  *
  * Optional args widen the measurement: `cells` pins
  * `spark.graft.ann.cells` (a boundary-mode ClusteredCorpus fixture
  * names the cell count its pods were built for), and a comma list of
  * probe widths sweeps `spark.graft.dedup.semanticProbes`, reporting
  * recall overall AND on the NEAR-THRESHOLD pairs (cosine < 0.5) —
  * on the adversarial fixture those are exactly the
  * boundary-straddling pairs whose partner cell sits below the decoys
  * in the probe ranking, so this is the measured worst case behind the
  * DedupAnnSpec ≥0.6 floor.
  *
  *   sbt "runMain graft.tools.RoutedCosineCheck /tmp/sf1 1000"
  *   sbt "runMain graft.tools.RoutedCosineCheck /tmp/boundary 500 50 1,3,5"
  */
object RoutedCosineCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RoutedCosineCheck <sfDir> <cap> [cells] [probes,probes,...]")
    val sfDir = args(0)
    val cap = args(1).toLong
    val cells = if (args.length > 2) Some(args(2).toInt) else None
    val probeSweep: Seq[Int] =
      if (args.length > 3) args(3).split(",").toSeq.map(_.trim.toInt)
      else Seq(graft.operators.DedupOps.SemDedupProbes)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(): (Double, Map[(Long, Long), Double]) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.DedupOps
        .queries("dedup_embedding_cosine")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    cells.foreach(c => spark.conf.set("spark.graft.ann.cells", c.toString))
    val (exactWall, exact) = run()
    require(exact.nonEmpty,
      s"$sfDir yields zero exact pairs — recall against an empty truth " +
        "set is meaningless; pick a corpus with within-label near-dups")
    val hardTruth = exact.count { case (_, c) => c < 0.5 }
    println(f"[routed] exact (default cap): ${exact.size} pairs " +
      f"($hardTruth near-threshold cos<0.5) in $exactWall%.1f s")
    spark.conf.set("spark.graft.dedup.maxCosineBlockRows", cap.toString)
    try probeSweep.foreach { probes =>
      spark.conf.set("spark.graft.dedup.semanticProbes", probes.toString)
      val (routedWall, routed) =
        try run()
        finally spark.conf.unset("spark.graft.dedup.semanticProbes")
      val wrong = routed.collect {
        case (p, c) if !exact.get(p).contains(c) => p
      }
      require(wrong.isEmpty,
        s"routing changed arithmetic or invented pairs: ${wrong.take(5)}")
      val recall = routed.size.toDouble / exact.size
      val hardHit = routed.count { case (_, c) => c < 0.5 }
      val hardRecall =
        if (hardTruth == 0) 1.0 else hardHit.toDouble / hardTruth
      println(f"[routed] cap=$cap probes=$probes: ${routed.size} of " +
        f"${exact.size} pairs (recall $recall%.3f, near-threshold " +
        f"$hardHit/$hardTruth = $hardRecall%.3f, precision exact) in " +
        f"$routedWall%.1f s (speedup ${exactWall / routedWall}%.1f x vs " +
        "all-pairs; the routed run also pays the shared IVF index build " +
        "once per session)")
    } finally spark.conf.unset("spark.graft.dedup.maxCosineBlockRows")
    spark.stop()
  }
}
