package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic mixture-of-clusters embeddings fixture — the OTHER
  * corpus shape for recall calibration. The ScaleUp rehearsal corpora
  * are isometry-rotated near-uniform vectors (IVF's recall worst case:
  * cell assignment carries minimal signal), so the ProbeFraction
  * default is calibrated against them; real embedding corpora cluster.
  * This tool writes a corpus with explicit cluster structure so
  * [[RecallCheck]] can measure the recall/nprobe curve on BOTH shapes
  * (see `Ann.ProbeFraction`'s scaladoc for the tune-DOWN loop).
  *
  * Construction (fully deterministic — no RNG state leaks into the
  * data, reruns are byte-stable): `nClusters` unit centers from a
  * seeded Gaussian; vector v belongs to cluster `v % nClusters` and is
  * its center plus per-coordinate uniform noise in
  * `±spread/2` derived from `xxhash64(vec_id, coord)`. At the default
  * spread the within-cluster cosine is far above the cross-cluster
  * noise floor — the shape where IVF probing concentrates.
  *
  *   sbt "runMain graft.tools.ClusteredCorpus /tmp/clustered 20000"
  */
object ClusteredCorpus {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ClusteredCorpus <dstDir> <nVecs> [dim] [nClusters] [spread]")
    val dst = args(0)
    val n = args(1).toLong
    val dim = if (args.length > 2) args(2).toInt else 64
    val k = if (args.length > 3) args(3).toInt else 50
    val spread = if (args.length > 4) args(4).toDouble else 0.3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rnd = new scala.util.Random(42)
    val centers = Array.fill(k) {
      val c = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / nrm)
    }
    val centersLit = array(centers.map(c =>
      array(c.map(x => lit(x)): _*)): _*)

    spark.range(n).toDF("vec_id")
      .repartition(cpus.toInt)
      .withColumn("c", (col("vec_id") % k).cast("int"))
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
        j => (element_at(element_at(centersLit, col("c") + 1), j + 1) +
          lit(spread) *
            (pmod(xxhash64(col("vec_id"), j), lit(1000003L))
              .cast("double") / lit(1000003.0) - lit(0.5)))
          .cast("float")))
      .withColumn("label", (col("vec_id") % 10).cast("int"))
      .select(col("vec_id"), col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    println(s"[clustered] wrote $n vectors (dim=$dim, clusters=$k, " +
      s"spread=$spread) to $dst/embeddings.parquet")
    spark.stop()
  }
}
