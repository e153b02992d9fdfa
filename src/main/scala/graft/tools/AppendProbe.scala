package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ann
import graft.sources.Tables

/** Ingest-lifecycle decade probe for the IVF index: per scale directory,
  * measure the full build (the REBUILD alternative), three successive
  * 0.1%-of-corpus appends against the frozen centroids
  * ([[Ann.appendToIndex]]), and the generation-swap compaction
  * ([[Ann.compactIndex]]) that undoes the appends' file-count drift —
  * plus the evidence that the lifecycle is safe: row conservation after
  * every step and full-probe serving equality across the compaction
  * swap. This is the measurement behind the append scaladoc's claim
  * that a daily 0.1% ingest costs ~0.1% of a corpus pass, not a
  * rebuild: if append wall scaled with the CORPUS instead of the batch,
  * the ratio would sit near 1.0 and grow with n; batch-shaped cost
  * shows up as a small, roughly scale-flat ratio (floored by per-job
  * fixed overhead at the small decades).
  *
  * Fixtures come from [[ClusteredCorpus]] (deterministic), same as
  * [[EmbDecade]] — this is the embeddings surface's third decade
  * (20 k → 200 k → 2 M). Prints one summary line per step and appends a
  * JSON object per dir to the ledger file (arg 1).
  *
  *   tools/javamain.sh graft.tools.AppendProbe \
  *     bench/append_decade_r10.json /tmp/clustered20k /tmp/clustered200k
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AppendProbe <outJson> <dir>...")
    val outFile = args(0)
    val dirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    def dataFiles(dir: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(dir)).count(f =>
        f.getName.endsWith(".parquet") && !f.getPath.contains("_centroids"))
    }
    def rm(dir: String): Unit =
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

    val results = dirs.map { d =>
      // fresh session per scale (shared context): keeps memo state and
      // conf from bleeding across decades, same as EmbDecade
      val spark = root.newSession()
      val ev = Tables.embeddings(spark, d)
      val n = ev.count()
      val k = Ann.cellCount(spark, d)
      // base = 99.7% of the corpus; three disjoint 0.1% ingest batches
      val base = ev.filter(col("vec_id") % 1000 >= 3)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("vec"))
      val batchRows = ev.filter(col("vec_id") % 1000 === 0).count()
      val t = java.nio.file.Files
        .createTempDirectory("graft-append-probe-").toString
      val buildSec = {
        var idx: Ann.IvfIndex = null
        val s = timed { idx = Ann.buildFrom(spark, base, k, t) }
        println(f"[appendprobe] $d build        $s%7.2f s " +
          f"(n=$n cells=$k base=${n - 3 * batchRows})")
        (idx, s)
      }
      val (idx, build) = buildSec
      val filesBuild = dataFiles(t)
      val appendSecs = (0 until 3).map { i =>
        val s = timed(Ann.appendToIndex(spark, idx,
          ev.filter(col("vec_id") % 1000 === i)))
        println(f"[appendprobe] $d append#$i     $s%7.2f s " +
          f"(~$batchRows rows)")
        s
      }
      val filesAppended = dataFiles(t)
      val total = Ann.physicalRows(spark, t).count()
      require(total == n, s"row conservation broke: $total != $n")
      def top20(i: Ann.IvfIndex): Seq[(Long, Double)] = {
        val qv = ev.filter(col("vec_id") === 0)
          .select(transform(col("embedding"), x => x.cast("double")))
          .first().getSeq[Double](0)
        Ann.physicalRows(spark, i.dir)
          .filter(col("cell").isin(i.probeCells(qv, i.cents.length): _*))
          .withColumn("sim", round(
            graft.operators.SimilarityOps.cosine(col("vec"), typedlit(qv)),
            4))
          .select(col("vec_id"), col("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(20).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
      val servedBefore = top20(idx)
      val dst = java.nio.file.Files
        .createTempDirectory("graft-append-probe-compact-").toString
      var out: Ann.IvfIndex = null
      val compactSec = timed { out = Ann.compactIndex(spark, idx, dst) }
      val filesCompacted = dataFiles(dst)
      val compTotal = Ann.physicalRows(spark, dst).count()
      require(compTotal == n, s"compaction lost rows: $compTotal != $n")
      val serveEqual = top20(out) == servedBefore
      require(serveEqual, "full-probe serving changed across compaction")
      println(f"[appendprobe] $d compact      $compactSec%7.2f s " +
        f"(files $filesAppended -> $filesCompacted, serveEqual=$serveEqual)")
      rm(t); rm(dst)
      val aMin = appendSecs.min
      s"""{"dir":"$d","n_vectors":$n,"cells":$k,
         |"batch_rows":$batchRows,
         |"build_sec":$build,
         |"append_secs":[${appendSecs.mkString(",")}],
         |"append_min_sec":$aMin,
         |"append_over_build":${aMin / build},
         |"files_build":$filesBuild,"files_appended":$filesAppended,
         |"files_compacted":$filesCompacted,
         |"compact_sec":$compactSec,
         |"rows_conserved":true,"serve_equal_across_compact":$serveEqual}"""
        .stripMargin.replace("\n", "")
    }
    val json = "[" + results.mkString(",\n ") + "]"
    val out = java.nio.file.Paths.get(outFile)
    if (out.getParent != null)
      java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[appendprobe] wrote $outFile")
    root.stop()
  }
}
