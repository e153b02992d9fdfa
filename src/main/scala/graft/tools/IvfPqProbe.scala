package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Pq}
import graft.sources.Tables

/** Measures what the IVF-PQ composition buys at a given corpus decade:
  * serving wall (min-of-N) and CODE BYTES SCANNED for the flat-PQ path
  * (`sim_pq_topk` — every code row) vs the composed path
  * (`ann_ivfpq_topk` — only the probed cells' code files), plus the
  * composed path's recall@20 against brute force. The bytes are real
  * at-rest file sizes from the cell-partitioned codes dir, so the
  * scan-bytes ratio is the partition-pruning arithmetic a 100 TB
  * deployment would see (≈ nprobe/cells of 4·dim/m×-smaller rows).
  *
  *   tools/javamain.sh graft.tools.IvfPqProbe <sfDir> <outJson> [reps]
  */
object IvfPqProbe {
  private def dirBytes(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).toSeq.flatten.map(dirBytes).sum
    else if (f.getName.endsWith(".parquet")) f.length()
    else 0L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IvfPqProbe <sfDir> <outJson> [reps]")
    val sfDir = args(0)
    val outPath = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // maintenance outside the timed window, each tracked
    val tI = System.nanoTime()
    val idx = Ann.buildIndex(spark, sfDir)
    val buildIdx = (System.nanoTime() - tI) / 1e9
    val tC = System.nanoTime()
    Pq.buildCodes(spark, sfDir).count()
    val buildCodes = (System.nanoTime() - tC) / 1e9
    val tP = System.nanoTime()
    val codesDir = Pq.buildIvfPqCodes(spark, sfDir)
    val buildIvfPq = (System.nanoTime() - tP) / 1e9

    def wall(name: String): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        System.gc()
        dt
      }.min
    val pqWall = wall("sim_pq_topk")
    val ivfPqWall = wall("ann_ivfpq_topk")
    val ivfWall = wall("ann_ivf_topk")

    // at-rest code bytes: total vs the probed cells' partitions
    val qv = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0)
    val probed = idx.probeCells(qv, Ann.nprobeOf(spark, sfDir)).toSet
    val root = new java.io.File(codesDir)
    val totalBytes = dirBytes(root)
    val probedBytes = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("cell=") &&
        probed(f.getName.stripPrefix("cell=").toInt))
      .map(dirBytes).sum
    // full-vector index bytes for the same probed cells — the 32× row
    // story beside the pruning story
    val idxRoot = new java.io.File(idx.dir)
    val probedVecBytes = Option(idxRoot.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("cell=") &&
        probed(f.getName.stripPrefix("cell=").toInt))
      .map(dirBytes).sum

    // composed-path recall@20 vs brute force (shared id overlap)
    val got = graft.SparkEntry.queries("ann_ivfpq_topk")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val want = graft.SparkEntry.queries("sim_cosine_topk")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val recall = got.count(want).toDouble / want.size

    val n = Tables.embeddings(spark, sfDir).count()
    val json =
      f"""{"corpus":"$sfDir","n_vectors":$n,"cells":${idx.cents.length},
         |"nprobe":${Ann.nprobeOf(spark, sfDir)},"reps":$reps,
         |"ann_index_build_sec":$buildIdx%.1f,
         |"pq_code_build_sec":$buildCodes%.1f,
         |"ivfpq_code_build_sec":$buildIvfPq%.1f,
         |"wall_sim_pq_topk_sec":$pqWall%.3f,
         |"wall_ann_ivfpq_topk_sec":$ivfPqWall%.3f,
         |"wall_ann_ivf_topk_sec":$ivfWall%.3f,
         |"codes_bytes_total":$totalBytes,
         |"codes_bytes_probed":$probedBytes,
         |"index_bytes_probed_cells":$probedVecBytes,
         |"scan_bytes_ratio_vs_flat_pq":${probedBytes.toDouble / totalBytes}%.4f,
         |"scan_bytes_ratio_vs_ivf":${probedBytes.toDouble / math.max(1L, probedVecBytes)}%.4f,
         |"recall_at_20_vs_exact":$recall%.3f}"""
        .stripMargin.replace("\n", "")
    println(s"[ivfpq-probe] $json")
    val out = java.nio.file.Paths.get(outPath)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[ivfpq-probe] wrote $outPath")
    spark.stop()
  }
}
