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

  test("filters push down through a registered view to the parquet scan") {
    Tables.registerAll(spark, sf)
    val df = spark.sql("SELECT o_orderkey FROM orders WHERE o_orderkey = 7")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("IsNotNull(o_orderkey)"),
      s"no pushdown through the view:\n$scan")
  }
}
