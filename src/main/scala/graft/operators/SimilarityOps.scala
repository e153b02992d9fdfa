package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Similarity search over the `embeddings` table (north star).
  *
  * Brute-force cosine top-k is the correctness baseline: broadcast the query
  * vector, compute cosine as a codegen'd higher-order-function expression
  * (`aggregate` over `zip_with` — no UDF), `TakeOrderedAndProject` for the
  * top-k. At 100 TB this scans once with zero shuffles (the top-k is a
  * per-partition heap + driver merge).
  *
  * The scale path (LSH-bucketed ANN) lives in [[graft.operators.Ann]]; this
  * file holds the oracle-checkable exact variants.
  *
  * Determinism: embeddings are float32; both sides are cast to double before
  * any arithmetic, products/sums run in array order (sequential fold), and
  * the published similarity is rounded to 4 decimals, which also makes the
  * top-k cutoff stable across engines.
  */
object SimilarityOps {
  type Q = (SparkSession, String) => DataFrame

  /** Σ aᵢ·bᵢ over two array<double> columns, sequential fold (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine as a composition of built-in higher-order functions — the
    * reference formulation [[graft.functions.VectorExprs.CosineSimilarity]]
    * is spec-checked against (HOFs evaluate interpreted, so the hot paths
    * use the fused codegen'd expression instead).
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Fused single-traversal codegen'd cosine (bit-identical to
    * [[cosineHof]]; see VectorExprsSpec).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosineSim(a, b)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Per-(label, 0-based position) centroid components — the
    * determinism-critical device shared by `sim_label_centroids` (the
    * published table) and `sim_outlier_docs` (the distance base), so the
    * two can never silently disagree on what a centroid is: elements are
    * rounded to 6 decimals in double FIRST (float→decimal cast rules
    * differ across engines at the 9th digit), then summed as exact
    * DECIMAL(18,6) — order-independent, safe under any partitioning —
    * and divided by the count in double.
    */
  private def labelCentroidComponents(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("p", "x")))
      .groupBy(col("label"), col("p"))
      .agg((sum(round(col("x").cast("double"), 6).cast("decimal(18,6)"))
        .cast("double") / count(lit(1))).as("c"))

  /** Symmetric per-vector int8 quantization — the embedding STORAGE path
    * at 100 TB (4× smaller than float32 at rest; a 100 TB float corpus
    * becomes 25 TB of tinyint + one float scale per vector). scale =
    * max|x|/127 ([[int8Scale]], the single definition), q =
    * round(x/scale) ∈ [−127, 127]. For COSINE the scale cancels
    * (cos(s·q) = cos(q)), so similarity search runs on the int8 arrays
    * directly — only ranking error from rounding remains, bounded in
    * DedupAnnSpec (recall@20 vs exact, max sim deviation).
    *
    * Implemented as the fused codegen'd
    * [[graft.functions.VectorExprs.Int8Quantize]] — a `transform` lambda
    * would re-evaluate the scale subtree per ELEMENT (CollapseProject
    * re-inlines even a hoisted alias), paying an O(dim) scan dim times
    * per row.
    */
  def quantizeInt8(v: Column): Column =
    graft.functions.VectorExprs.int8Quantize(v)

  /** The per-vector scale for [[quantizeInt8]]/[[dequantizeInt8]] —
    * compute once per row with `withColumn` and store beside the codes.
    */
  def int8Scale(v: Column): Column =
    greatest(array_max(transform(v, x => abs(x))), lit(1e-12)) / 127.0

  /** Inverse of [[quantizeInt8]] given the stored scale — for
    * magnitude-sensitive consumers (L2, dot); cosine needs no
    * dequantization.
    */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  val queries: Map[String, Q] = Map(
    // Cosine top-20 on int8-QUANTIZED embeddings (per-vector scales
    // cancel in cosine): the storage-scale twin of sim_cosine_topk.
    // Approximate by construction (rounding) → rows-only driver check;
    // DedupAnnSpec bounds recall and similarity deviation vs exact.
    "sim_quantized_topk" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"),
          quantizeInt8(asDouble(col("embedding"))).as("q8"))
      val qv = e.filter(col("vec_id") === 0)
        .select(transform(col("q8"), x => x.cast("double")).as("qv"))
      e.crossJoin(broadcast(qv))
        .withColumn("sim", round(
          cosine(transform(col("q8"), x => x.cast("double")), col("qv")), 4))
        .select(col("vec_id"), col("label"), col("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(20)
    }),
    // Brute-force cosine top-20 against the vec_id=0 embedding.
    "sim_cosine_topk" -> ((s, d) => {
      val e = embeddings(s, d)
      val q = e.filter(col("vec_id") === 0)
        .select(asDouble(col("embedding")).as("qv"))
      e.select(col("vec_id"), col("label"),
          asDouble(col("embedding")).as("ev"))
        .crossJoin(broadcast(q))
        .withColumn("sim", round(cosine(col("ev"), col("qv")), 4))
        .select(col("vec_id"), col("label"), col("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(20)
    }),

    // Vector stats: dimension + rounded L2 norm per vector (scan-only).
    "sim_vector_norms" -> ((s, d) => {
      embeddings(s, d)
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          round(l2norm(asDouble(col("embedding"))), 4).as("norm"))
        .orderBy(col("vec_id"))
    }),

    // Batched top-k: all query vectors at once (the realistic serving
    // shape). Queries broadcast against one base scan; per-query top-5 via
    // the k-bounded [[graft.functions.TopK]] aggregator — the partial
    // aggregate prunes to k rows per (partition, qid) BEFORE the shuffle,
    // so the final merge sees |partitions|·k rows per query instead of
    // funneling all n_base × n_query similarity rows through |queries|
    // window reducers (the skew wall the window formulation hits at scale).
    "sim_batch_topk" -> ((s, d) => {
      val e = embeddings(s, d)
      val qs = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      e.select(col("vec_id"), asDouble(col("embedding")).as("ev"))
        .crossJoin(broadcast(qs))
        .withColumn("sim", round(cosine(col("ev"), col("qv")), 4))
        .groupBy(col("qid"))
        .agg(graft.functions.TopK.topK(5)(col("sim"), col("vec_id")).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("p", "t")))
        .select(col("qid"), (col("p") + 1).cast("int").as("rk"),
          col("t.vec_id").as("vec_id"), col("t.sim").as("sim"))
        .orderBy(col("qid"), col("rk"))
    }),

    // ORACLE GATE for the quantized path: DedupAnnSpec's bounds —
    // recall@20 ≥ 0.9 vs the exact brute-force top-20 and |sim_q −
    // sim_exact| ≤ 0.02 on the overlap — restated as one
    // DuckDB-checkable row (the oracle states both flags `true`; the
    // constant-group groupBy keeps the empty-input → zero-rows
    // contract). The quantized estimates themselves stay approximate
    // and out of any oracle.
    "sim_quantized_topk_gate" -> ((s, d) => {
      val quant = queries("sim_quantized_topk")(s, d)
        .select(col("vec_id"), col("sim").as("qsim"))
      val exact = queries("sim_cosine_topk")(s, d)
        .select(col("vec_id"), col("sim").as("esim"))
      quant.join(exact, Seq("vec_id"))
        .groupBy(lit(20).as("k"))
        .agg(count(lit(1)).as("n_overlap"),
          max(abs(col("qsim") - col("esim"))).as("max_err"))
        .select(col("k"), (col("n_overlap") >= 18).as("recall_ok"),
          (col("max_err") <= 0.02).as("sim_err_ok"))
    }),

    // Per-label centroids: posexplode to (label, pos, x), one shuffle on
    // (label, pos) — see [[labelCentroidComponents]] for the
    // cross-engine determinism device.
    "sim_label_centroids" -> ((s, d) => {
      labelCentroidComponents(embeddings(s, d))
        .withColumn("pos", (col("p") + 1).cast("int"))
        .select(col("label"), col("pos"), col("c"))
        .orderBy(col("label"), col("pos"))
    }),

    // Embedding outlier detection (mislabel / junk pruning — the
    // NearestCentroid curation pass): squared L2 distance of every vector
    // to ITS OWN label centroid, top-20 farthest. The centroid table is
    // labels × dim (tiny at any corpus size) and broadcasts as per-label
    // arrays; the distance is a row-local ordered fold over zip_with —
    // the base table never shuffles, and the top-k is
    // TakeOrderedAndProject (per-partition heap + driver merge). At
    // 100 TB this is one scan + one broadcast, full stop.
    // Determinism: centroids via the sim_label_centroids device (round-6
    // decimal sums / count); per-position terms rounded to 12 decimals,
    // then a STRICT position-ordered left fold — the lm_perplexity
    // device, replayed by DuckDB's list_reduce in the same order.
    "sim_outlier_docs" -> ((s, d) => {
      val cent = labelCentroidComponents(embeddings(s, d))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("p"), col("c")))),
          e => e.getField("c")).as("cv"))
      embeddings(s, d)
        .join(broadcast(cent), "label")
        .withColumn("dist2", aggregate(
          zip_with(asDouble(col("embedding")), col("cv"),
            (x, c) => round((round(x, 6) - c) * (round(x, 6) - c), 12)),
          lit(0.0), (acc, t) => acc + t))
        .select(col("vec_id"), col("label"), round(col("dist2"), 6).as("dist2"))
        .orderBy(col("dist2").desc, col("vec_id"))
        .limit(20)
    }),
  )

  val oracles: Map[String, String] = Map(
    "sim_quantized_topk_gate" ->
      """SELECT CAST(20 AS INT) AS k, true AS recall_ok, true AS sim_err_ok
         WHERE EXISTS (SELECT 1 FROM embeddings)""",
    "sim_cosine_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id = 0)
         SELECT vec_id, label,
           round(list_sum(list_transform(list_zip(CAST(embedding AS DOUBLE[]), qv),
                   p -> p[1] * p[2]))
             / (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))
                * sqrt(list_sum(list_transform(qv, x -> x*x)))), 4) AS sim
         FROM embeddings, q
         ORDER BY sim DESC, vec_id LIMIT 20""",
    "sim_vector_norms" ->
      """SELECT vec_id, CAST(length(embedding) AS INT) AS dim,
         round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))), 4) AS norm
         FROM embeddings ORDER BY vec_id""",
    "sim_batch_topk" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 3),
         sims AS (
           SELECT q.qid, e.vec_id,
             round(list_sum(list_transform(
                 list_zip(CAST(e.embedding AS DOUBLE[]), q.qv), p -> p[1]*p[2]))
               / (sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x*x)))
                  * sqrt(list_sum(list_transform(q.qv, x -> x*x)))), 4) AS sim
           FROM embeddings e CROSS JOIN q),
         ranked AS (
           SELECT qid, vec_id, sim, row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
           FROM sims)
         SELECT qid, CAST(rk AS INT) AS rk, vec_id, sim FROM ranked
         WHERE rk <= 5 ORDER BY qid, rk""",
    "sim_label_centroids" -> (centroidCtes +
      " SELECT label, pos, c FROM cent ORDER BY label, pos"),
    "sim_outlier_docs" -> (centroidCtes +
      """,
         cv AS (SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label)
         SELECT v.vec_id, v.label,
           round(list_reduce(list_prepend(0.0,
             list_transform(list_zip(CAST(v.embedding AS DOUBLE[]), cv.cv),
               p -> round((round(p[1], 6) - p[2]) * (round(p[1], 6) - p[2]), 12))),
             (a, b) -> a + b), 6) AS dist2
         FROM embeddings v JOIN cv USING (label)
         ORDER BY dist2 DESC, vec_id LIMIT 20"""),
  )

  /** Shared centroid CTE prefix of both centroid-based oracles — the SQL
    * replay of [[labelCentroidComponents]] (1-based `pos`).
    */
  private def centroidCtes: String =
    """WITH e AS (SELECT label, embedding,
                    unnest(range(1, len(embedding) + 1)) AS pos
                  FROM embeddings),
       cent AS (SELECT label, CAST(pos AS INT) AS pos,
           CAST(sum(CAST(round(CAST(embedding[CAST(pos AS INT)] AS DOUBLE), 6)
             AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS c
         FROM e GROUP BY label, pos)"""
}
