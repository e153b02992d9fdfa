package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.TextOps
import graft.sources.Tables

/** Measures what `spark.graft.text.lmMinCount` buys at scale: for each
  * requested minCount it reports the vocabulary the model actually keys
  * on (kept + OOV), the c2/c1 model-table row counts, and the end-to-end
  * `text_lm_perplexity` wall seconds (min of SPARK_GRAFT_REPS, default 2,
  * per the noisy-box bench protocol). minCount=1 is the exact
  * (oracle-gated) mode — the baseline the pruned rows are read against.
  *
  *   sbt "runMain graft.tools.LmScale /tmp/sf10 1 2 5"
  *
  * The interesting number is c2 rows vs corpus scale: ScaleUp inflates
  * vocabulary ~10×/decade by construction (distinct alphabet per copy —
  * adversarial vs Heaps' law), so the EXACT model grows ~linearly with
  * data while a minCount ≥ 2 model folds every inflation-minted
  * singleton into ⟨unk⟩ and stays sub-vocab.
  */
object LmScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LmScale <sfDir> <minCount>...")
    val sfDir = args(0)
    val minCounts = args.drop(1).map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val results = minCounts.map { mc =>
      val m = TextOps.lmModel(docs, mc)
      val c2Rows = m.c2.count()
      val c1Rows = m.c1.count()
      val v = m.vocab.collect()(0).getLong(0)
      spark.conf.set("spark.graft.text.lmMinCount", mc.toString)
      val wall = try (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        TextOps.lmPerplexity(docs).collect()
        (System.nanoTime() - t0) / 1e9
      }.min finally spark.conf.unset("spark.graft.text.lmMinCount")
      println(f"minCount=$mc%-3d V=$v%-9d c2=$c2Rows%-10d c1=$c1Rows%-9d " +
        f"wall=$wall%.3f s")
      (mc, v, c2Rows, c1Rows, wall)
    }
    val q = results.map { case (mc, v, c2, c1, w) =>
      s"""{"min_count":$mc,"v":$v,"c2_rows":$c2,"c1_rows":$c1,""" +
        f""""wall_sec":$w%.3f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"lm_scale","sf_dir":"$sfDir","n_docs":$nDocs,""" +
      s""""reps":$reps,"modes":$q}""")
    spark.stop()
  }
}
