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
  *   sbt "runMain graft.tools.RoutedCosineCheck /tmp/sf1 1000"
  */
object RoutedCosineCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RoutedCosineCheck <sfDir> <cap>")
    val sfDir = args(0)
    val cap = args(1).toLong
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
    val (exactWall, exact) = run()
    require(exact.nonEmpty,
      s"$sfDir yields zero exact pairs — recall against an empty truth " +
        "set is meaningless; pick a corpus with within-label near-dups")
    println(f"[routed] exact (default cap): ${exact.size} pairs " +
      f"in $exactWall%.1f s")
    spark.conf.set("spark.graft.dedup.maxCosineBlockRows", cap.toString)
    val (routedWall, routed) =
      try run()
      finally spark.conf.unset("spark.graft.dedup.maxCosineBlockRows")
    val wrong = routed.collect {
      case (p, c) if !exact.get(p).contains(c) => p
    }
    require(wrong.isEmpty,
      s"routing changed arithmetic or invented pairs: ${wrong.take(5)}")
    val recall = routed.size.toDouble / exact.size
    println(f"[routed] cap=$cap: ${routed.size} of ${exact.size} pairs " +
      f"(recall $recall%.3f, precision exact) in $routedWall%.1f s " +
      f"(speedup ${exactWall / routedWall}%.1f x vs all-pairs; the " +
      "routed run also pays the shared IVF index build once per session)")
    spark.stop()
  }
}
