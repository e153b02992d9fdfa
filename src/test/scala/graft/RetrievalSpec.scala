package graft

import org.apache.spark.sql.functions._

import graft.operators.RetrievalOps
import graft.sources.Tables

/** Hybrid retrieval (RRF fusion of the BM25 and cosine arms): the
  * DuckDB oracle hash-gates the values; this spec pins the fusion
  * SEMANTICS the hash can't articulate — closed-form RRF arithmetic,
  * arm consistency with the standalone registry queries, the
  * outside-arm-contributes-zero rule, and the scale shape (arm
  * reduction via top-N, never a corpus-wide rank).
  */
class RetrievalSpec extends SparkSpec {

  private lazy val fused =
    SparkEntry.queries("retrieval_hybrid_rrf")(spark, sf).collect()

  test("rrf is exactly the closed form over the carried ranks") {
    assert(fused.nonEmpty && fused.length <= 20)
    fused.foreach { r =>
      val lex = Option(r.get(1)).map(_.asInstanceOf[Int])
      val sem = Option(r.get(2)).map(_.asInstanceOf[Int])
      val want = BigDecimal(
        lex.map(x => 1.0 / (RetrievalOps.RrfK + x)).getOrElse(0.0) +
          sem.map(x => 1.0 / (RetrievalOps.RrfK + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === want,
        s"doc ${r.getLong(0)}: rrf ${r.getDouble(3)} != $want")
      assert(lex.isDefined || sem.isDefined,
        "a fused row must come from at least one arm")
      (lex ++ sem).foreach(x =>
        assert(x >= 1 && x <= RetrievalOps.ArmDepth))
    }
  }

  test("the lexical arm's ranks agree with the standalone text_bm25_top") {
    // the registry's BM25 top-20 IS the lexical arm's top-20 prefix:
    // same scoring frame, same (score desc, id) total order
    val bmTop = SparkEntry.queries("text_bm25_top")(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val lexByRank = fused.filter(!_.isNullAt(1))
      .map(r => r.getInt(1) -> r.getLong(0)).toMap
    // every fused row with lex_rank <= 20 must be bm25's doc at that rank
    lexByRank.filter(_._1 <= 20).foreach { case (rk, doc) =>
      assert(bmTop(rk - 1) === doc,
        s"lex_rank $rk carries doc $doc but bm25 top-20 has ${bmTop(rk - 1)}")
    }
  }

  test("the semantic arm's ranks agree with the standalone sim_cosine_topk") {
    val simTop = SparkEntry.queries("sim_cosine_topk")(spark, sf)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val semByRank = fused.filter(!_.isNullAt(2))
      .map(r => r.getInt(2) -> r.getLong(0)).toMap
    semByRank.filter(_._1 <= 20).foreach { case (rk, doc) =>
      assert(simTop(rk - 1) === doc,
        s"sem_rank $rk carries doc $doc but cosine top-20 has ${simTop(rk - 1)}")
    }
  }

  test("fusion ranks docs present in both arms above equal single-arm ranks") {
    // structural property of 1/(K+r): a doc with both ranks defined
    // always outscores a doc whose single rank ties its worse rank
    val both = fused.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = fused.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    for (b <- both; s <- single) {
      val bWorst = math.max(b.getInt(1), b.getInt(2))
      val sRank = if (s.isNullAt(1)) s.getInt(2) else s.getInt(1)
      if (sRank >= bWorst)
        assert(b.getDouble(3) > s.getDouble(3),
          s"doc ${b.getLong(0)} (both arms) must outscore " +
            s"doc ${s.getLong(0)} (one arm at rank $sRank)")
    }
  }

  test("the plan reduces each arm with a top-N, never a corpus-wide rank") {
    val plan = SparkEntry.queries("retrieval_hybrid_rrf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"arms must reduce via TakeOrderedAndProject, got:\n$plan")
    // the only Window (row_number) operators run on the ArmDepth-row
    // frames BELOW the final fusion join — assert none sits on a scan
    // without an intervening top-N by bounding the fused input sizes
    val lexRows = fused.count(!_.isNullAt(1))
    val semRows = fused.count(!_.isNullAt(2))
    assert(lexRows <= RetrievalOps.ArmDepth &&
      semRows <= RetrievalOps.ArmDepth)
  }
}
