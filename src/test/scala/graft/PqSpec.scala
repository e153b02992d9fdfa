package graft

import org.apache.spark.sql.functions._

import graft.functions.PqExprs
import graft.operators.{Pq, SimilarityOps}
import graft.sources.Tables

/** Product quantization: geometry derivation, kernel semantics (ties,
  * nulls, geometry mismatches), ADC arithmetic against a driver-side
  * replay, the structural re-rank contract (shortlist ≥ corpus ⇒ the
  * pipeline IS sim_cosine_topk), and the gate's floors at the default
  * shortlist.
  */
class PqSpec extends SparkSpec {

  test("subspace count is the largest divisor of dim ≤ the cap") {
    assert(Pq.SubspacesMax == 16) // the measured recall-per-byte default
    assert(Pq.subspaces(64) == 16)
    assert(Pq.subspaces(60) == 15)
    assert(Pq.subspaces(7) == 7)
    assert(Pq.subspaces(13) == 13)
    assert(Pq.subspaces(17) == 1) // prime beyond the cap → one subspace
    assert(Pq.subspaces(1) == 1)
    // the session cap override (a BUILD-time knob)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.pq.m", "8")
    assert(Pq.subspacesOf(s2, 64) == 8)
    s2.conf.set("spark.graft.pq.m", "32")
    assert(Pq.subspacesOf(s2, 64) == 32)
    assert(Pq.subspacesOf(spark, 64) == 16)
  }

  test("codebook geometry: m subspaces, ks ≤ 256 entries, dsub dims") {
    val books = Pq.codebooks(spark, sf)
    val dim = 64
    val m = Pq.subspaces(dim)
    assert(books.length == m)
    assert(books.forall(_.length == books(0).length))
    assert(books(0).length <= Pq.CodebookSize && books(0).nonEmpty)
    assert(books.forall(_.forall(_.length == dim / m)))
  }

  test("pq_adc_dot matches a driver-side replay bit for bit") {
    val books = Pq.codebooks(spark, sf)
    val m = books.length
    val ks = books(0).length
    // an arbitrary deterministic LUT (values ≠ any codebook dot) so the
    // check exercises pure lookup arithmetic, not training
    val lut = Array.tabulate(m * ks)(i => math.sin(i.toDouble) * 3.0)
    val rows = Pq.codes(spark, sf)
      .select(col("vec_id"), col("codes"),
        PqExprs.pqAdcDot(col("codes"), typedlit(lut.toSeq)).as("adc"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Byte](1)
      assert(codes.length == m, s"codes must be m=$m bytes, got $codes")
      var expect = 0.0
      codes.zipWithIndex.foreach { case (c, j) =>
        expect += lut(j * ks + (c & 0xFF))
      }
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(expect), r)
    }
  }

  test("pq_encode snaps each subvector to its nearest entry, ties low") {
    import spark.implicits._
    // two subspaces of 2 dims; codebook 0 has DUPLICATE nearest entries
    // at codes 0 and 1 → the tie must break to code 0 (strict < argmin)
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(0.0, 0.0), Array(9.0, 9.0)),
      Array(Array(1.0, 1.0), Array(5.0, 5.0), Array(0.0, 0.0)))
    val r = Seq(Tuple1(Seq(0.1, -0.1, 4.9, 5.1)))
      .toDF("v")
      .select(PqExprs.pqEncode(col("v"), books).as("codes"))
      .collect()(0).getSeq[Byte](0)
    assert(r == Seq(0.toByte, 1.toByte), s"got $r")
  }

  test("null and geometry-mismatch semantics of both kernels") {
    import spark.implicits._
    val books: Array[Array[Array[Double]]] =
      Array(Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val df = Seq(
      (Some(Seq(0.0, 1.0)), "fits"),
      (Some(Seq(0.0, 1.0, 2.0)), "wrong length"),
      (None: Option[Seq[Double]], "null vec"))
      .toDF("v", "why")
      .select(col("why"), PqExprs.pqEncode(col("v"), books).as("codes"))
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(!df("fits") && df("wrong length") && df("null vec"))

    // adc: lut not divisible by m → null; code id ≥ ks → null;
    // empty codes → null; null lut → null
    val adc = Seq(
      (Seq(0.toByte, 1.toByte), Some(Seq(1.0, 2.0, 3.0, 4.0)), "ok"),
      (Seq(0.toByte, 1.toByte), Some(Seq(1.0, 2.0, 3.0)), "indivisible"),
      (Seq(0.toByte, 3.toByte), Some(Seq(1.0, 2.0, 3.0, 4.0)), "code ≥ ks"),
      (Seq.empty[Byte], Some(Seq(1.0, 2.0)), "empty codes"),
      (Seq(0.toByte), None: Option[Seq[Double]], "null lut"))
      .toDF("codes", "lut", "why")
      .select(col("why"), PqExprs.pqAdcDot(col("codes"), col("lut")).as("d"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(adc("ok") == 1.0 + 4.0) // lut[0·2+0] + lut[1·2+1]
    assert(adc("indivisible").isNaN && adc("code ≥ ks").isNaN &&
      adc("empty codes").isNaN && adc("null lut").isNaN)
  }

  test("shortlist ≥ corpus ⇒ sim_pq_topk IS sim_cosine_topk (re-rank pin)") {
    val n = Tables.embeddings(spark, sf).count().toInt
    spark.conf.set("spark.graft.pq.shortlist", n.toString)
    try {
      val pq = SparkEntry.queries("sim_pq_topk")(spark, sf).collect().toSeq
      val exact =
        SparkEntry.queries("sim_cosine_topk")(spark, sf).collect().toSeq
      assert(pq == exact,
        s"full-shortlist PQ must equal the exact query\npq=$pq\nexact=$exact")
    } finally spark.conf.unset("spark.graft.pq.shortlist")
  }

  test("gate holds at the DEFAULT shortlist: recall ≥ 18/20, sims exact") {
    val r = SparkEntry.queries("sim_pq_topk_gate")(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getInt(0) == 20)
    assert(r(0).getBoolean(1), "recall_ok=false at the default shortlist")
    assert(r(0).getBoolean(2), "published sims must be exact (re-rank)")
  }

  test("codes are m bytes per vector — the 4·dim/m at-rest claim at dim 64") {
    val m = Pq.subspaces(64)
    val sizes = Pq.codes(spark, sf)
      .select(size(col("codes"))).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq == Seq(m), s"got ${sizes.toSeq}")
  }

  test("codebook training on an empty corpus fails with its named error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-empty")
      .toString
    Tables.embeddings(spark, sf).limit(0)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[Exception] { Pq.codebooks(spark, dir) }
    assert(e.getMessage.contains("non-empty"),
      s"expected the named training error, got: ${e.getMessage}")
  }
}
