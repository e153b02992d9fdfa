package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Numeric evidence behind `dedup_minhash_lsh_gate`'s booleans: truth
  * pair count (engine-side exact prefix-filter kernel on the same
  * char-5-gram sets the LSH hashes), LSH pair count, hits, measured
  * recall, and the banding floor the gate enforces — per scale dir.
  *
  *   sbt "runMain graft.tools.LshGateReport /root/testdata/sf0.1 ..."
  */
object LshGateReport {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LshGateReport <sfDir>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.foreach { d =>
      val t0 = System.nanoTime()
      // the gate's own sides — subset-bounded past LshGateTargetDocs,
      // so the report stays feasible at any scale and prints exactly
      // what the gate's booleans summarize
      val (truth, lsh) = graft.operators.DedupOps.lshGateSides(spark, d)
      val m = graft.operators.DedupOps.lshGateModulus(spark, d)
      val r = truth
        .join(lsh.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_hit"))
        .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
        .collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      val (nTruth, nHit, nLsh) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (nb, nr) =
        (graft.operators.DedupOps.bandGeometry(spark, d)._1,
          graft.operators.DedupOps.bandGeometry(spark, d)._2)
      val floor = 1.0 - math.pow(1.0 - math.pow(0.8, nr), nb)
      println(f"[lshgate] $d: truth=$nTruth lsh=$nLsh hits=$nHit " +
        f"recall=${if (nTruth == 0) 1.0 else nHit.toDouble / nTruth}%.4f " +
        f"floor(b=$nb,r=$nr)=$floor%.4f extra=${nLsh - nHit} " +
        f"subset_modulus=$m wall=$wall%.1f s")
    }
    spark.stop()
  }
}
