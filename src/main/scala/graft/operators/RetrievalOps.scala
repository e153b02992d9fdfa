package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Hybrid retrieval — the corpus-search/hard-negative-mining shape a
  * training-data pipeline runs constantly: fuse a LEXICAL ranking
  * (Okapi BM25 over the `documents` text, [[TextOps]]' exact scoring)
  * with a SEMANTIC ranking (exact cosine over the `embeddings` vectors,
  * [[SimilarityOps]]' scoring; `doc_id` and `vec_id` are the same key)
  * by reciprocal-rank fusion:
  *
  *   rrf(d) = Σ_arms 1 / (K + rank_arm(d)),  K = 60 (the Cormack/
  *   Clarke/Buettcher constant), rank only defined inside an arm's
  *   top-N — a document outside it contributes nothing from that arm.
  *
  * Scale shape: each arm reduces the corpus with its own
  * TakeOrderedAndProject (the distributed top-N — never a global sort
  * or a corpus-wide window), the rank window then runs over N=50 rows,
  * and the fusion is a 50×50 full-outer join on tiny frames. At 100 TB
  * the only corpus-sized work is the two scoring scans, both
  * single-pass and shuffle-free (BM25's global stats frame is ONE row;
  * the cosine arm is a broadcast-literal scan).
  *
  * Determinism across engines: both arms order by (rounded score DESC,
  * id) before ranking — the same total order DuckDB's `row_number`
  * replays — and the fused score is a two-term sum of exact binary
  * rationals 1/(60+r) rounded at 6, so no accumulation-order drift
  * exists anywhere in the plan.
  */
object RetrievalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Arm depth. 50 is deep enough that the fused top-20 is stable to
    * tail perturbations (a doc must rank ≥ 31 in BOTH arms to be
    * excludable from a top-20 it belongs in) and small enough that the
    * fusion frames are always driver-trivial.
    */
  val ArmDepth = 50

  /** RRF smoothing constant. */
  val RrfK = 60

  private def rrfTerm(rank: org.apache.spark.sql.Column) =
    when(rank.isNotNull, lit(1.0) / (lit(RrfK) + rank)).otherwise(lit(0.0))

  /** The fused query: lexical arm = BM25 of [[TextOps.Bm25Query]]
    * (the registry's standing lexical query), semantic arm = cosine
    * against the vec_id=0 embedding (the registry's standing query
    * vector). Output: top-20 by fused score with both arm ranks
    * carried (null = outside that arm's top-[[ArmDepth]]).
    */
  val queries: Map[String, Q] = Map(
    "retrieval_hybrid_rrf" -> ((s, d) => {
      val lexTop = TextOps.bm25Scores(documents(s, d), TextOps.Bm25Query)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(ArmDepth)
        .withColumn("lex_rank", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))))
        .select(col("doc_id"), col("lex_rank"))
      val qv = embeddings(s, d).filter(col("vec_id") === 0)
        .select(transform(col("embedding"), x => x.cast("double")))
        .first().getSeq[Double](0)
      val semTop = embeddings(s, d)
        .select(col("vec_id").as("doc_id"),
          round(SimilarityOps.cosine(
            transform(col("embedding"), x => x.cast("double")),
            typedlit(qv)), 4).as("sim"))
        .orderBy(col("sim").desc, col("doc_id"))
        .limit(ArmDepth)
        .withColumn("sem_rank", row_number().over(
          Window.orderBy(col("sim").desc, col("doc_id"))))
        .select(col("doc_id"), col("sem_rank"))
      lexTop.join(semTop, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          col("lex_rank").cast("int").as("lex_rank"),
          col("sem_rank").cast("int").as("sem_rank"),
          round(rrfTerm(col("lex_rank")) + rrfTerm(col("sem_rank")), 6)
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)
    }),
  )

  /** DuckDB twin: the lexical CTEs are [[TextOps.bm25OracleCore]]'s
    * generated text verbatim, the semantic CTE is sim_cosine_topk's
    * arithmetic, both ranked by the same (rounded score DESC, id)
    * total order, fused with the same two-term sum.
    */
  val oracles: Map[String, String] = {
    val (ctes, parts) = TextOps.bm25OracleCore(TextOps.Bm25Query)
    Map(
      "retrieval_hybrid_rrf" ->
        s"""WITH $ctes,
           lexall AS (SELECT doc_id, round($parts, 4) AS bm25 FROM t, g),
           lextop AS (SELECT doc_id FROM lexall
                      ORDER BY bm25 DESC, doc_id LIMIT $ArmDepth),
           lex AS (SELECT l.doc_id, CAST(row_number() OVER (
                     ORDER BY a.bm25 DESC, a.doc_id) AS INT) AS lex_rank
                   FROM lextop l JOIN lexall a USING (doc_id)),
           q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id = 0),
           semall AS (SELECT vec_id AS doc_id,
               round(list_sum(list_transform(
                   list_zip(CAST(embedding AS DOUBLE[]), qv), p -> p[1] * p[2]))
                 / (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))
                    * sqrt(list_sum(list_transform(qv, x -> x*x)))), 4) AS sim
               FROM embeddings, q),
           semtop AS (SELECT doc_id FROM semall
                      ORDER BY sim DESC, doc_id LIMIT $ArmDepth),
           sem AS (SELECT st.doc_id, CAST(row_number() OVER (
                     ORDER BY a.sim DESC, a.doc_id) AS INT) AS sem_rank
                   FROM semtop st JOIN semall a USING (doc_id))
           SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex.lex_rank, sem.sem_rank,
             round(COALESCE(1.0 / ($RrfK + lex.lex_rank), 0.0)
                 + COALESCE(1.0 / ($RrfK + sem.sem_rank), 0.0), 6) AS rrf
           FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
           ORDER BY rrf DESC, doc_id LIMIT 20""",
    )
  }
}
