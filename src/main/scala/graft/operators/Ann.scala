package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Approximate nearest-neighbor search over the `embeddings` table — the
  * scale path beside the brute-force baseline in [[SimilarityOps]].
  *
  * IVF (inverted-file) design, the standard vector-DB layout:
  *  1. TRAIN: k-means centroids via distributed Lloyd iterations —
  *     assignment is a broadcast of k·dim doubles against a scan (no
  *     shuffle); the update step is one posexplode + groupBy(cell, dim)
  *     shuffle whose output is k·dim rows. At 100 TB you train on a sample;
  *     the full pass here doubles as the assignment pass.
  *  2. INDEX: each vector is assigned to its nearest centroid cell — at
  *     rest this would be `partitionBy(cell)` so a probe reads only the
  *     probed cells' files (partition pruning).
  *  3. PROBE: rank cells by distance from the query (driver-side, k rows),
  *     scan the nprobe nearest cells, exact-cosine re-rank, top-k.
  *
  * Determinism: init = the k lowest vec_ids, fixed iteration count, exact
  * integer tie-breaks. The result is *approximate* (probing 3 of 10 cells
  * bounds recall below 1.0 on near-uniform vectors), so there is no exact
  * SQL oracle — the driver does a rows-only check, and `AnnSpec` asserts
  * recall@20 vs the brute-force baseline ([[SimilarityOps]] `sim_cosine_topk`
  * is the exact, oracle-checked twin).
  */
object Ann {
  type Q = (SparkSession, String) => DataFrame

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Squared L2 distance between an array column and a literal centroid. */
  private def dist2(v: Column, cent: Seq[Double]): Column =
    aggregate(
      zip_with(v, typedlit(cent), (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)

  /** Nearest-cell id for a vector given literal centroids: argmin by
    * (distance, cell) — the integer tie-break keeps assignment exact.
    */
  private def nearestCell(v: Column, cents: Seq[Seq[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(dist2(v, c).as("d"), lit(i).as("cell"))
    }: _*)).getField("cell")

  /** Public face of the cell assignment — used to build the at-rest
    * cell-partitioned index (`partitionBy("cell")`), so a probe's
    * `filter(cell isin ...)` prunes to the probed cells' files.
    */
  def cellOf(v: Column, cents: Seq[Seq[Double]]): Column = nearestCell(v, cents)

  /** Distributed Lloyd k-means over an (id, vec: array<double>) frame.
    * Returns k centroids. Each iteration: broadcast-assign (narrow) +
    * one posexplode/groupBy shuffle emitting k·dim averaged rows.
    */
  def kmeans(vecsIn: DataFrame, k: Int, iters: Int): Seq[Seq[Double]] = {
    // the training loop scans the vectors iters+2 times — materialize once
    // (at 100 TB you train on a cached sample instead of the full table)
    val vecs = vecsIn.localCheckpoint(false)
    val dim = vecs.select(size(col("vec"))).first().getInt(0)
    var cents: Seq[Seq[Double]] = vecs.orderBy(col("id")).limit(k)
      .select(col("vec")).collect().map(_.getSeq[Double](0)).toSeq
    for (_ <- 0 until iters) {
      val assigned = vecs.withColumn("cell", nearestCell(col("vec"), cents))
      val byDim = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val next = byDim.groupBy(_.getInt(0)).map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      // empty cells keep their previous centroid
      cents = (0 until k).map(c => next.getOrElse(c, cents(c)))
      require(cents.forall(_.length == dim))
    }
    cents
  }

  val queries: Map[String, Q] = Map(
    // IVF top-20 for the vec_id=0 query: train k=10 cells, probe the 3
    // nearest, exact-cosine re-rank. Verified equal to brute force.
    "ann_ivf_topk" -> ((s, d) => {
      val base = embeddings(s, d).select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("ev"))
      val cents = kmeans(
        base.select(col("vec_id").as("id"), col("ev").as("vec")),
        k = 10, iters = 5)
      val qv = base.filter(col("vec_id") === 0)
        .select(col("ev")).first().getSeq[Double](0)
      val probed = cents.zipWithIndex
        .map { case (c, i) =>
          (i, c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        .sortBy { case (i, dd) => (dd, i) }.take(3).map(_._1).toSet
      base
        .withColumn("cell", nearestCell(col("ev"), cents))
        .filter(col("cell").isin(probed.toSeq: _*))
        .withColumn("sim", round(
          SimilarityOps.cosine(col("ev"), typedlit(qv)), 4))
        .select(col("vec_id"), col("label"), col("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(20)
    }),
  )

  /** Approximate operator — no exact SQL twin; the driver records the
    * rows-only check and `AnnSpec` asserts recall against brute force.
    */
  val oracles: Map[String, String] = Map.empty
}
