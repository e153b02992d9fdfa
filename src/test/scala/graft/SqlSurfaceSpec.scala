package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The SQL face: Tables.registerAll gives a reference-style SQL surface
  * (views over every table + the custom function registry) that plans
  * identically to the DataFrame path.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views answer SQL identically to the DataFrame path") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
      .collect().toSeq
    val viaDf = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
      .collect().toSeq
    assert(viaSql.nonEmpty)
    assert(viaSql === viaDf)
  }

  test("cosine_sim is callable from SQL over the embeddings view") {
    Tables.registerAll(spark, sf)
    val rows = spark.sql(
      """SELECT vec_id,
           cosine_sim(CAST(embedding AS ARRAY<DOUBLE>),
                      CAST(embedding AS ARRAY<DOUBLE>)) AS self_sim
         FROM embeddings ORDER BY vec_id LIMIT 5""").collect()
    assert(rows.length === 5)
    // a vector's cosine with itself is 1 (non-degenerate test vectors)
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("the text kernels are callable from SQL with literal widths") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT doc_id,
           token_entropy(text) AS h,
           simhash_signature(text) AS sh,
           poly_fingerprint(text) AS fp,
           size(minhash_signature(
             sorted_distinct_longs(shingle_hashes(text, 5)), 16)) AS k,
           sorted_intersect_size(array(1L, 3L), array(3L, 9L)) AS c,
           z_value(1L, 3L) AS z,
           bucket_index(CAST(1.0 AS DOUBLE), array(0.5, 1.5)) AS bk,
           mix64(5L) AS mx
         FROM documents ORDER BY doc_id LIMIT 3""").collect()
    assert(r.length === 3)
    r.foreach { row =>
      assert(row.getDouble(1) >= 0.0)
      assert(row.getInt(4) === 16)
      assert(row.getInt(5) === 1)
      assert(row.getLong(6) === 11L) // spread(1) | spread(3)<<1
      assert(row.getLong(7) === 1L) // one boundary <= 1.0
      assert(row.getLong(8) === graft.functions.TextExprs.fmix64(5L))
    }
    // SQL result == Column-API result for the same kernel
    val viaDf = Tables.documents(spark, sf)
      .select(graft.functions.TextExprs.tokenEntropy(col("text")).as("h"))
      .orderBy(col("doc_id")).limit(3).collect().map(_.getDouble(0)).toSeq
    assert(r.map(_.getDouble(1)).toSeq === viaDf)
    // a non-literal width must fail loudly, not silently misparse
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(text, doc_id) FROM documents LIMIT 1")
        .collect()
    }
    assert(e.getMessage.contains("INT literal"), e.getMessage)
  }

  test("pq_adc_dot is callable from SQL (codes column × LUT literal)") {
    Tables.registerAll(spark, sf)
    // codes (1, 0) over a 2-subspace, 2-entry LUT: lut[0·2+1] + lut[1·2+0]
    val r = spark.sql(
      """SELECT pq_adc_dot(CAST(array(1, 0) AS ARRAY<TINYINT>),
                           array(10.0D, 20.0D, 30.0D, 40.0D)) AS d""")
      .collect()
    assert(r.length === 1 && r(0).getDouble(0) === 50.0)
  }

  test("filters push down through a registered view to the parquet scan") {
    Tables.registerAll(spark, sf)
    val df = spark.sql("SELECT o_orderkey FROM orders WHERE o_orderkey = 7")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("IsNotNull(o_orderkey)"),
      s"no pushdown through the view:\n$scan")
  }
}
