package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Pq, SimilarityOps}
import graft.sources.Tables

/** Measures the PQ shortlist→recall@20 curve on a corpus and writes the
  * calibration artifact [[graft.operators.Pq.shortlistWidth]] consumes
  * (`spark.graft.pq.shortlistCalibration`) — the measurement that closes
  * the shortlist-knob loop, exactly as RoutedCosineCheck does for
  * `semanticProbes`: run the sweep on YOUR corpus, point the conf at the
  * artifact, and the serving default becomes the smallest width clearing
  * the recall floor.
  *
  *   tools/javamain.sh graft.tools.PqRecallSweep <sfDir> <outJson> \
  *     [widths-csv] [nQueries]
  *
  * Cost: ONE widest-width ADC scan per query vector (recall at every
  * smaller width derives from the prefix — ADC order is
  * width-independent), one bounded exact-sims join per query (≤ widest
  * width rows on the driver), one brute-force top-20 per query. The
  * published-pipeline arithmetic is reproduced exactly (round(sim,4),
  * (sim DESC, vec_id) order), so the measured recall is the recall of
  * the rows `sim_pq_topk` would publish.
  */
object PqRecallSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PqRecallSweep <sfDir> <outJson> [widths-csv] [nQueries]")
    val sfDir = args(0)
    val outPath = args(1)
    val widths =
      if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq.sorted
      else Seq(200, 1000, 4000, 16000)
    val nq = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    // deterministic query panel: the nq smallest vec_ids
    val qids = ev.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(nq).collect().map(_.getLong(0)).toSeq
    val books = Pq.codebooks(spark, sfDir)
    val codes = Pq.buildCodes(spark, sfDir)
    val wMax = widths.max
    val perWidth = scala.collection.mutable.Map(
      widths.map(_ -> List.empty[Double]): _*)

    qids.foreach { qid =>
      val qRaw = ev.filter(col("vec_id") === qid)
        .select(col("vec")).first().getSeq[Double](0).toArray
      val nrm = math.sqrt(qRaw.map(x => x * x).sum)
      val qUnit = if (nrm == 0.0) qRaw else qRaw.map(_ / nrm)
      val lut = Pq.adcLut(qUnit, books)
      // one widest ADC scan: the ordered top-wMax shortlist
      val shortIds = codes
        .select(col("vec_id"),
          graft.functions.PqExprs.pqAdcDot(col("codes"),
            typedlit(lut.toSeq)).as("adc"))
        .orderBy(col("adc").desc, col("vec_id"))
        .limit(wMax)
        .select(col("vec_id")).collect().map(_.getLong(0))
      // exact published sims for every shortlisted id (bounded: ≤ wMax)
      import spark.implicits._
      val simOf = ev
        .join(broadcast(shortIds.toSeq.toDF("vec_id")), "vec_id")
        .select(col("vec_id"), round(SimilarityOps.cosine(
          col("vec"), typedlit(qRaw.toSeq)), 4).as("sim"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // the truth: brute-force top-20 with the same published arithmetic
      val exactTop = ev
        .select(col("vec_id"), round(SimilarityOps.cosine(
          col("vec"), typedlit(qRaw.toSeq)), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(20).collect().map(_.getLong(0)).toSet
      widths.foreach { w =>
        val published = shortIds.take(w)
          .sortBy(id => (-simOf(id), id)).take(20).toSet
        val recall = published.count(exactTop).toDouble / exactTop.size
        perWidth(w) = recall :: perWidth(w)
      }
    }

    val corpusN = ev.count()
    val dim = books.length * books(0)(0).length
    val sweep = widths.map { w =>
      val rs = perWidth(w)
      val mean = rs.sum / rs.size
      println(f"[pq-sweep] shortlist=$w%-6d recall@20=$mean%.4f " +
        f"(min ${rs.min}%.4f over ${rs.size} queries)")
      f"""  {"shortlist": $w, "recall": $mean%.4f, "min_recall": ${rs.min}%.4f}"""
    }.mkString(",\n")
    val json =
      s"""{
         | "metric": "pq_recall_at_20_vs_shortlist",
         | "corpus": "$sfDir",
         | "n_vectors": $corpusN,
         | "geometry": "m=${books.length} ks=${books(0).length} dim=$dim",
         | "n_queries": ${qids.size},
         | "sweep": [
         |$sweep
         | ]
         |}
         |""".stripMargin
    val out = java.nio.file.Paths.get(outPath)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[pq-sweep] artifact written to $out")
    spark.stop()
  }
}
