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
  /** Orthonormalize `m` seeded Gaussian vectors via Gram-Schmidt. */
  private def orthonormal(rnd: scala.util.Random, dim: Int, m: Int)
      : Array[Array[Double]] = {
    val out = Array.ofDim[Array[Double]](m)
    var i = 0
    while (i < m) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      var j = 0
      while (j < i) {
        val d = v.zip(out(j)).map { case (a, b) => a * b }.sum
        var c = 0
        while (c < dim) { v(c) -= d * out(j)(c); c += 1 }
        j += 1
      }
      val nrm = math.sqrt(v.map(x => x * x).sum)
      out(i) = v.map(_ / nrm)
      i += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ClusteredCorpus <dstDir> <nVecs> [dim] [nClusters] " +
        "[spread] [boundary]")
    val dst = args(0)
    val n = args(1).toLong
    val dim = if (args.length > 2) args(2).toInt else 64
    val k = if (args.length > 3) args(3).toInt else 50
    val spread = if (args.length > 4) args(4).toDouble else 0.3
    val boundary = args.length > 5 && args(5) == "boundary"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!boundary) writeClustered(spark, dst, n, dim, k, spread)
    else writeBoundary(spark, dst, n, dim, k, spread)
    spark.stop()
  }

  /** The clustered (easy) shape — see class doc. Deterministic for a
    * given geometry; callable from specs/tools as well as [[main]].
    */
  def writeClustered(spark: SparkSession, dst: String, n: Long,
      dim: Int = 64, k: Int = 50, spread: Double = 0.3): Unit = {
    val rnd: scala.util.Random = new scala.util.Random(42)
      val centers = Array.fill(k) {
        val c = Array.fill(dim)(rnd.nextGaussian())
        val nrm = math.sqrt(c.map(x => x * x).sum)
        c.map(_ / nrm)
      }
      val centersLit = array(centers.map(c =>
        array(c.map(x => lit(x)): _*)): _*)

      spark.range(n).toDF("vec_id")
        .repartition(spark.sparkContext.defaultParallelism)
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
  }

  /** The boundary (adversarial) shape — see the construction note in
    * the body. Deterministic; callable from specs (DedupAnnSpec gates
    * the default probe width's floor on it) as well as [[main]].
    */
  def writeBoundary(spark: SparkSession, dst: String, n: Long,
      dim: Int = 64, k: Int = 50, spread: Double = 0.3): Unit = {
    val rnd: scala.util.Random = new scala.util.Random(42)
      // BOUNDARY mode — the routed-cosine ADVERSARY. The clustered
      // default is the easy shape (near-dup pairs share probed cells);
      // this one is built so a measurable slice of true pairs
      // STRADDLES cells with decoys crowding the probe ranking:
      //
      //  k/5 "pods", each 5 unit centers in a private orthonormal
      //  frame (u, v, w1..w3): poles A=u and B at Ω=85° along v, and 3
      //  decoys at 40° polar from the A–B geodesic midpoint, one per
      //  w_m. 90% of vectors are regular members of those centers.
      //  10% are BOUNDARY PAIRS: one member at 7.5° from A along the
      //  geodesic, one at 7.5° from B — pair cosine cos(70°) ≈ 0.34
      //  (just above dedup_embedding_cosine's 0.30), both members
      //  deep in their own pole cells, and each member's next-nearest
      //  centers are the pod's decoys (≈51°) BEFORE the partner's
      //  pole (70°): with cells ≈ the 5·(k/5) built centers, the
      //  partner's cell enters the soft-probe ranking only at width
      //  ~5, so the default 3-probe routing MISSES the pair by
      //  construction — the worst case the ≥0.6 recall floor must be
      //  measured against. Pair members share label = pairId % 10;
      //  regular members label = vec_id % 10 (every label block routes
      //  once the check forces the cap down).
      require(k % 5 == 0, s"boundary mode needs nClusters % 5 == 0, got $k")
      val pods = k / 5
      val omega = math.toRadians(85)
      val off = math.toRadians(7.5)
      val polar = math.toRadians(40)
      def onGeo(u: Array[Double], v: Array[Double], th: Double) =
        u.zip(v).map { case (a, b) => math.cos(th) * a + math.sin(th) * b }
      // per pod: centers A, B, D1..D3 (k-means targets) + the 2
      // boundary anchors (NOT centers — their mass rides inside the
      // pole cells)
      val podFrames = Array.fill(pods)(orthonormal(rnd, dim, 5))
      val centers = podFrames.flatMap { f =>
        val (u, v) = (f(0), f(1))
        val mid = onGeo(u, v, omega / 2)
        Array(u, onGeo(u, v, omega)) ++
          (2 to 4).map(m => mid.zip(f(m)).map { case (a, b) =>
            math.cos(polar) * a + math.sin(polar) * b })
      }
      val anchors = centers ++ podFrames.flatMap { f =>
        val (u, v) = (f(0), f(1))
        Array(onGeo(u, v, off), onGeo(u, v, omega - off))
      }
      val anchorsLit = array(anchors.map(c =>
        array(c.map(x => lit(x)): _*)): _*)
      val nBoundary = (n / 10 / 2) * 2 // even — whole pairs
      val nReg = n - nBoundary
      val pairOrd = col("vec_id") - nReg
      val pairId = (pairOrd / 2).cast("long")
      val base = spark.range(n).toDF("vec_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("reg", col("vec_id") < nReg)
        .withColumn("a", when(col("reg"),
            (col("vec_id") % k).cast("int"))
          .otherwise((lit(k) + (pairId % pods) * 2 + pairOrd % 2)
            .cast("int")))
        .withColumn("sp", when(col("reg"), lit(spread)).otherwise(lit(0.04)))
        .withColumn("label", when(col("reg"),
            (col("vec_id") % 10).cast("int"))
          .otherwise((pairId % 10).cast("int")))
      base
        .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
          j => (element_at(element_at(anchorsLit, col("a") + 1), j + 1) +
            col("sp") *
              (pmod(xxhash64(col("vec_id"), j), lit(1000003L))
                .cast("double") / lit(1000003.0) - lit(0.5)))
            .cast("float")))
        .select(col("vec_id"), col("embedding"), col("label"))
        .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      println(s"[clustered] BOUNDARY mode: wrote $n vectors (dim=$dim, " +
        s"$pods pods = $k centers, ${nBoundary / 2} straddling pairs) to " +
        s"$dst/embeddings.parquet — run RoutedCosineCheck with " +
        s"cells=$k to measure the probe-width recall curve")
  }
}
