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
  *   sbt "runMain graft.tools.LmScale /tmp/sf10 1 2 5 k200"
  *
  * Plain integer args are minCount floors; `k<N>` args are top-K caps
  * (run with floor 1).
  *
  * The interesting number is c2 rows vs corpus scale, and the two
  * corpus shapes answer differently (measured, round 8):
  *  - ScaleUp rehearsal corpora: vocabulary ×10/decade but every minted
  *    token keeps its source's HEAD-sized count, so no frequency floor
  *    prunes anything (minCount 2 and 5: zero tokens pruned at sf1 and
  *    sf10) — there, only the top-K cap bounds the model.
  *  - ZipfCorpus (real-shaped rare tail): the floor bites (minCount=5
  *    keeps 20% of vocab / 50% of c2 keys) but the kept set still grows
  *    with the tail across a decade; the top-K cap is what holds model
  *    rows FLAT while the raw vocabulary grows 10×.
  */
object LmScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LmScale <sfDir> <minCount>...")
    val sfDir = args(0)
    val modes: Seq[(Int, Int)] = args.drop(1).toSeq.map {
      case k if k.startsWith("k") => (1, k.drop(1).toInt)
      case m => (m.toInt, 0)
    }
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
    val results = modes.map { case (mc, k) =>
      val m = TextOps.lmModel(docs, mc, k)
      val c2Rows = m.c2.count()
      val c1Rows = m.c1.count()
      val v = m.vocab.collect()(0).getLong(0)
      spark.conf.set("spark.graft.text.lmMinCount", mc.toString)
      spark.conf.set("spark.graft.text.lmTopK", k.toString)
      val wall = try (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        TextOps.lmPerplexity(docs).collect()
        (System.nanoTime() - t0) / 1e9
      }.min finally {
        spark.conf.unset("spark.graft.text.lmMinCount")
        spark.conf.unset("spark.graft.text.lmTopK")
      }
      println(f"minCount=$mc%-3d topK=$k%-7d V=$v%-9d c2=$c2Rows%-10d " +
        f"c1=$c1Rows%-9d wall=$wall%.3f s")
      (mc, k, v, c2Rows, c1Rows, wall)
    }
    val q = results.map { case (mc, k, v, c2, c1, w) =>
      s"""{"min_count":$mc,"top_k":$k,"v":$v,"c2_rows":$c2,"c1_rows":$c1,""" +
        f""""wall_sec":$w%.3f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"lm_scale","sf_dir":"$sfDir","n_docs":$nDocs,""" +
      s""""reps":$reps,"modes":$q}""")
    spark.stop()
  }
}
