package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the minhash gate's exact truth table
  * (`lsh_truth_build` — the registry's heaviest prepare shuffle): time
  * each pipeline stage of [[graft.operators.DedupOps.shingleTruthPairs]]
  * in isolation with the noop sink, so the optimization target inside
  * the build is measured, not guessed.
  *
  *   tools/javamain.sh graft.tools.LshTruthProbe <outJson> <sfDir>
  */
object LshTruthProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LshTruthProbe <outJson> <sfDir>")
    val outFile = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.DedupOps
    def timed(label: String)(f: => Long): (Double, Long) = {
      spark.sparkContext.setJobDescription(s"lsh-truth-probe $label")
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[lsh-probe] $label%-18s $dt%8.2f s  rows=$n")
      (dt, n)
    }
    val docs = DedupOps.probeShingleDocSets(spark, sfDir).persist()
    val (tDocs, nDocs) = timed("doc_sets")(docs.count())
    val posts = docs.select(col("doc_id"), explode(col("gs")).as("g"))
    val (tPosts, nPosts) = timed("postings")(posts.count())
    val prefix = DedupOps.prefixPosts(posts, 0.8).persist()
    val (tPrefix, nPrefix) = timed("prefix_posts")(prefix.count())
    val cand = DedupOps.probePrefixCandidatesFrom(prefix).persist()
    val (tCand, nCand) = timed("candidates")(cand.count())
    val (tVerify, nVerify) = timed("verify")(
      DedupOps.probeVerify(cand, docs, 0.8).count())
    val (tAll, nAll) = timed("end_to_end")(
      DedupOps.shingleTruthPairs(spark, sfDir).count())
    val json =
      s"""{"sf":"$sfDir","docs":$nDocs,"postings":$nPosts,
         |"prefix_posts":$nPrefix,"candidates":$nCand,"pairs":$nVerify,
         |"pairs_e2e":$nAll,
         |"sec":{"doc_sets":$tDocs,"postings":$tPosts,
         |"prefix_posts":$tPrefix,"candidates":$tCand,
         |"verify":$tVerify,"end_to_end":$tAll}}"""
        .stripMargin.replace("\n", "")
    val out = java.nio.file.Paths.get(outFile)
    if (out.getParent != null)
      java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[lsh-probe] wrote $outFile")
    spark.stop()
  }
}
