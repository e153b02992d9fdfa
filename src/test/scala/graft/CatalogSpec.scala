package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.operators.Cdc
import graft.sources.{CdcSchemas, Tables}

/** Persistent catalog surface — the reference's query face is a
  * metastore-backed EXTERNAL table any session can query
  * (cdc_pipeline_dag.py:360-387), not a per-session registration. These
  * specs pin the Spark twin: `CREATE TABLE ... USING JSON|parquet
  * LOCATION` in the shared catalog, queryable from a brand-new session
  * (`newSession()`: fresh temp-view namespace, same catalog) with zero
  * re-registration — exactly where temp views stop — with the
  * reference's fixed-on-read semantics (absent field → NULL, unknown
  * field dropped) and external-table lifecycle (DROP keeps the data).
  */
class CatalogSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("cdc_events catalog table: JSON lake, second-session query, " +
      "absent→NULL, external lifecycle") {
    val lake = tmpDir("graft-catalog-lake")
    // two events over the 22-col wire: one sparse (absent fields must
    // read NULL), one carrying a field OUTSIDE the declared schema
    // (must be dropped, never inferred in)
    Files.write(Paths.get(s"$lake/part-00000.json"), Seq(
      """{"id": 1, "name": "alice", "op": "c", "table_name": "customers",""" +
        """ "lsn": "0/1A", "__deleted": "false"}""",
      """{"id": 2, "price": 9.50, "stock": 3, "op": "u",""" +
        """ "table_name": "products", "lsn": "0/1B", "__deleted": "false",""" +
        """ "mystery_field": 7}""").asJava)
    try {
      val df = Cdc.createEventsTable(spark, lake, table = "cdc_events_spec")
      // the fixed 22-col (+__deleted) read schema, never inference
      assert(df.schema.map(f => (f.name, f.dataType)) ==
        CdcSchemas.unified.map(f => (f.name, f.dataType)))
      assert(!df.columns.contains("mystery_field"))
      val rows = df.orderBy("id").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[String]("name") == "alice")
      assert(rows(0).isNullAt(rows(0).fieldIndex("price")),
        "absent JSON field must read as NULL")
      assert(rows(1).getAs[java.math.BigDecimal]("price")
        .compareTo(new java.math.BigDecimal("9.50")) == 0)

      // THE parity point: a brand-new session (fresh temp-view
      // namespace, same catalog) queries it with no registration at all
      val s2 = spark.newSession()
      assert(s2.sql("SELECT count(*) FROM cdc_events_spec")
        .collect()(0).getLong(0) == 2L)
      // ...while a temp view does NOT cross the session boundary
      spark.range(1).createOrReplaceTempView("catalog_spec_tempview")
      intercept[Exception] {
        s2.sql("SELECT * FROM catalog_spec_tempview").collect()
      }
      // idempotent maintenance entry (IF NOT EXISTS)
      Cdc.createEventsTable(spark, lake, table = "cdc_events_spec")
      // ...but re-registering the same name against a DIFFERENT location
      // must fail loudly, never silently keep serving the old lake
      intercept[IllegalArgumentException] {
        Cdc.createEventsTable(spark, tmpDir("graft-catalog-other"),
          table = "cdc_events_spec")
      }

      // external lifecycle: DROP removes metadata, never the data
      spark.sql("DROP TABLE cdc_events_spec")
      assert(Files.list(Paths.get(lake)).iterator().asScala.nonEmpty,
        "DROP TABLE on a LOCATION-backed table must keep the files")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cdc_events_spec")
      spark.catalog.dropTempView("catalog_spec_tempview")
    }
  }

  test("cdc_events parquet variant serves the same rows") {
    val lake = tmpDir("graft-catalog-pq")
    // a real unified frame (fixture envelopes → unwrap → unify path
    // feeds production; here the shape is what matters)
    import spark.implicits._
    val part = Seq((10L, "bob", "c", "customers", "0/2A", "false"))
      .toDF("id", "name", "op", "table_name", "lsn", "__deleted")
    Cdc.unify(Seq(part)).write.mode("overwrite").parquet(lake)
    try {
      Cdc.createEventsTable(spark, lake, table = "cdc_events_pq_spec",
        format = "parquet")
      val s2 = spark.newSession()
      val got = s2.sql(
        "SELECT id, name, op FROM cdc_events_pq_spec").collect()
      assert(got.length == 1 && got(0).getLong(0) == 10L &&
        got(0).getString(1) == "bob" && got(0).getString(2) == "c")
    } finally spark.sql("DROP TABLE IF EXISTS cdc_events_pq_spec")
  }

  test("registerAll(persistent=true): whole surface queryable from a " +
      "second session, events view applies the exact nanos conversion") {
    try {
      Tables.registerAll(spark, sf, persistent = true)
      val s2 = spark.newSession()
      // per-session confs (the catalog carries tables, not session conf)
      s2.conf.set("spark.sql.session.timeZone", "UTC")
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      assert(s2.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0)
        == Tables.lineitem(spark, sf).count())
      // the events catalog VIEW must reproduce Tables.events exactly —
      // timestamp type and value (micros DIV conversion, not a cast)
      val viaCatalog = s2.sql(
        "SELECT max(ts) AS m, count(*) AS n FROM events").collect()(0)
      val viaLoader = Tables.events(spark, sf)
        .agg(max(col("ts")).as("m"), count(lit(1)).as("n")).collect()(0)
      assert(viaCatalog.getTimestamp(0) == viaLoader.getTimestamp(0))
      assert(viaCatalog.getLong(1) == viaLoader.getLong(1))
    } finally {
      // fully-qualified drops: an unqualified DROP VIEW would hit a
      // sibling suite's TEMP view of the same name (temp shadows catalog
      // in the shared session) and then DROP TABLE would trip over the
      // still-present catalog view
      spark.sql("DROP VIEW IF EXISTS spark_catalog.default.events")
      (Tables.all.keys.toSeq.filterNot(_ == "events") :+ "events_raw")
        .foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS spark_catalog.default.`$t`")
        }
    }
  }
}
