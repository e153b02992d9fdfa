package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Pq, SimilarityOps}
import graft.sources.Tables

/** Measures the PQ shortlist→recall@20 curve on a corpus — per GEOMETRY
  * (m ∈ ms-csv) — and writes the calibration artifact
  * [[graft.operators.Pq.shortlistWidth]] and
  * [[graft.operators.Pq.subspacesCap]] consume
  * (`spark.graft.pq.shortlistCalibration`): the measurement that closes
  * BOTH knobs' loops, exactly as RoutedCosineCheck does for
  * `semanticProbes`. Run the sweep on YOUR corpus, point the conf at
  * the artifact, and the serving defaults become (a) the smallest m
  * whose calibrated width stays under the target corpus fraction —
  * the shortlist is the one driver-side materialization that grows
  * with corpus size at fixed recall, so m, not width, is the scale
  * lever — and (b) the smallest width clearing the recall floor at
  * that m.
  *
  *   tools/javamain.sh graft.tools.PqRecallSweep <sfDir> <outJson> \
  *     [widths-csv] [nQueries] [ms-csv] [targetFrac] [floor]
  *
  * Defaults: widths 200,1000,4000,16000; 8 queries; ms = the session
  * default geometry only (single-m sweep, the pre-round-14 shape);
  * targetFrac 0.005; floor 0.9. The artifact keeps a top-level `sweep`
  * = the chosen m's curve, so [[Pq.shortlistWidth]]'s reader is
  * unchanged; `chosen_m` + `per_m` are the round-14 additions.
  *
  * Cost per geometry: ONE widest-width ADC scan per query vector
  * (recall at every smaller width derives from the prefix — ADC order
  * is width-independent), one bounded exact-sims join per query
  * (≤ widest width rows on the driver), one brute-force top-20 per
  * query. The published-pipeline arithmetic is reproduced exactly
  * (round(sim,4), (sim DESC, vec_id) order), so the measured recall is
  * the recall of the rows `sim_pq_topk` would publish.
  */
object PqRecallSweep {

  /** Mean recall@20 per width for ONE geometry's codes. */
  private def sweepGeometry(s: SparkSession, sfDir: String,
      ev: DataFrame, qids: Seq[Long], widths: Seq[Int])
      : (String, Seq[(Int, Double, Double)]) = {
    val books = Pq.codebooks(s, sfDir)
    val codes = Pq.buildCodes(s, sfDir)
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
      import s.implicits._
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
    val dim = books.length * books(0)(0).length
    val geometry = s"m=${books.length} ks=${books(0).length} dim=$dim"
    (geometry, widths.map { w =>
      val rs = perWidth(w)
      (w, rs.sum / rs.size, rs.min)
    })
  }

  private def sweepJson(rows: Seq[(Int, Double, Double)]): String =
    rows.map { case (w, mean, mn) =>
      f"""  {"shortlist": $w, "recall": $mean%.4f, "min_recall": $mn%.4f}"""
    }.mkString("[\n", ",\n", "\n ]")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PqRecallSweep <sfDir> <outJson> [widths-csv] [nQueries] " +
        "[ms-csv] [targetFrac] [floor]")
    val sfDir = args(0)
    val outPath = args(1)
    val widths =
      if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq.sorted
      else Seq(200, 1000, 4000, 16000)
    val nq = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    root.sparkContext.setLogLevel("WARN")
    val ms =
      if (args.length > 4) args(4).split(",").map(_.trim.toInt).toSeq.sorted
      else Seq(Pq.subspacesCap(root))
    val targetFrac = if (args.length > 5) args(5).toDouble else 0.005
    val floor = if (args.length > 6) args(6).toDouble else 0.9

    val ev = Tables.embeddings(root, sfDir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    // deterministic query panel: the nq smallest vec_ids
    val qids = ev.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(nq).collect().map(_.getLong(0)).toSeq
    val corpusN = ev.count()

    // one sweep per geometry, each in its own session so the m-keyed
    // codebook/codes memos never collide
    val perM = ms.map { m =>
      val s = root.newSession()
      s.conf.set("spark.graft.pq.m", m.toString)
      val (geom, rows) = sweepGeometry(s, sfDir, ev, qids, widths)
      val knee = rows.find(_._2 >= floor).map(_._1)
      rows.foreach { case (w, mean, mn) =>
        println(f"[pq-sweep] m=$m%-3d shortlist=$w%-6d " +
          f"recall@20=$mean%.4f (min $mn%.4f over ${qids.size} queries)")
      }
      println(s"[pq-sweep] m=$m knee=" +
        knee.map(w => f"$w (${w.toDouble / corpusN}%.5f of corpus)")
          .getOrElse("UNREACHED"))
      (m, geom, rows, knee)
    }
    // the M-SELECTION: smallest m whose calibrated width stays under
    // the target corpus fraction (the driver-side shortlist is the one
    // materialization that grows with corpus size at fixed recall);
    // fall back to the m with the narrowest reachable knee
    val reached = perM.filter(_._4.isDefined)
    require(reached.nonEmpty,
      s"no swept geometry reaches recall ≥ $floor at any width — " +
        "re-sweep wider or lower the floor")
    val chosen = reached
      .find(_._4.get <= targetFrac * corpusN)
      .getOrElse(reached.minBy(_._4.get))
    val (chosenM, _, chosenRows, chosenKnee) = chosen
    println(f"[pq-sweep] CHOSEN m=$chosenM width=${chosenKnee.get} " +
      f"(${chosenKnee.get.toDouble / corpusN}%.5f of corpus, " +
      f"target $targetFrac%.5f)")

    val perMJson = perM.map { case (m, geom, rows, knee) =>
      s"""  {"m": $m, "geometry": "$geom", """ +
        s""""knee_width": ${knee.map(_.toString).getOrElse("null")}, """ +
        s""""sweep": ${sweepJson(rows).replace("\n", "\n  ")}}"""
    }.mkString("[\n", ",\n", "\n ]")
    val json =
      s"""{
         | "metric": "pq_recall_at_20_vs_shortlist",
         | "corpus": "$sfDir",
         | "n_vectors": $corpusN,
         | "n_queries": ${qids.size},
         | "recall_floor": $floor,
         | "target_fraction": $targetFrac,
         | "chosen_m": $chosenM,
         | "chosen_width": ${chosenKnee.get},
         | "chosen_width_fraction": ${chosenKnee.get.toDouble / corpusN},
         | "per_m": $perMJson,
         | "sweep": ${sweepJson(chosenRows)}
         |}
         |""".stripMargin
    val out = java.nio.file.Paths.get(outPath)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[pq-sweep] artifact written to $out")
    root.stop()
  }
}
