package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Ann, SimilarityOps}
import graft.sources.Tables

/** One-off diagnostic: where does the IVF probe's wall go at decade
  * scale? Times, separately and repeatedly: (a) the `s.read.parquet`
  * DataFrame creation (file listing + partition discovery + schema),
  * (b) planning+executing a probed-cells count, (c) the full
  * ann_ivf_topk serving query. Prints per-rep seconds.
  *
  *   tools/javamain.sh graft.tools.ProbeWallBreakdown <sfDir>
  */
object ProbeWallBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[breakdown] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val idx = t("buildIndex (memoized)") { Ann.buildIndex(spark, sfDir) }
    val qv = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0)
    val probed = t("probeCells (driver)") {
      idx.probeCells(qv, Ann.nprobeOf(spark, sfDir))
    }
    println(s"[breakdown] nprobe=${probed.length} of ${idx.cents.length}")
    (1 to 3).foreach { i =>
      val df = t(s"read.parquet #$i (listing+infer)") {
        spark.read.parquet(idx.dir)
      }
      t(s"probed count #$i (plan+exec)") {
        df.filter(col("cell").isin(probed: _*)).count()
      }
    }
    (1 to 3).foreach { i =>
      t(s"ann_ivf_topk #$i (full serving)") {
        graft.SparkEntry.queries("ann_ivf_topk")(spark, sfDir).collect()
      }
    }
    // isolate the isin-literal planning cost from the scan
    val df = spark.read.parquet(idx.dir)
    (1 to 2).foreach { i =>
      t(s"isin(${probed.length}) count #$i") {
        df.filter(col("cell").isin(probed: _*)).count()
      }
      t(s"cell===const count #$i") {
        df.filter(col("cell") === probed.head).count()
      }
    }
    spark.stop()
  }
}
