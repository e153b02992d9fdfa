package graft.sources

import org.apache.spark.sql.types._

/** Explicit schemas for the CDC domain — the engine never schema-infers
  * untrusted input (SURVEY.md §1.2: dynamic on the wire, fixed-on-read).
  *
  * Column sets mirror the reference's source tables
  * (reference postgres/init/init.sql:5-44) and its unified Hive DDL
  * (reference airflow/dags/cdc_pipeline_dag.py:360-383): 22 columns, all
  * nullable, absent fields null-padded — plus the soft-delete marker
  * `__deleted` produced by Debezium's delete-rewrite mode
  * (cdc_pipeline_dag.py:145).
  *
  * Money is exact decimal (init.sql:18,30,41); timestamps are UTC
  * (reference postgres/postgresql.conf:18-20).
  */
object CdcSchemas {
  private def f(n: String, t: DataType) = StructField(n, t, nullable = true)

  val customer: StructType = StructType(Seq(
    f("id", LongType), f("name", StringType), f("email", StringType),
    f("address", StringType), f("created_at", TimestampType),
    f("updated_at", TimestampType)))

  val product: StructType = StructType(Seq(
    f("id", LongType), f("name", StringType), f("description", StringType),
    f("price", DecimalType(10, 2)), f("stock", IntegerType),
    f("category", StringType), f("created_at", TimestampType),
    f("updated_at", TimestampType)))

  val order: StructType = StructType(Seq(
    f("id", LongType), f("customer_id", LongType),
    f("order_date", TimestampType), f("status", StringType),
    f("total_amount", DecimalType(12, 2)), f("shipping_address", StringType),
    f("created_at", TimestampType), f("updated_at", TimestampType)))

  val orderItem: StructType = StructType(Seq(
    f("id", LongType), f("order_id", LongType), f("product_id", LongType),
    f("quantity", IntegerType), f("unit_price", DecimalType(10, 2)),
    f("created_at", TimestampType), f("updated_at", TimestampType)))

  /** CDC metadata added by the unwrap SMT chain
    * (cdc_pipeline_dag.py:142-147): op ∈ {c,u,d,r}, source table name,
    * WAL LSN (the per-key ordering key), soft-delete marker.
    */
  val metadata: StructType = StructType(Seq(
    f("op", StringType), f("table_name", StringType), f("lsn", StringType),
    f("__deleted", StringType)))

  /** The unified 22-column event-lake schema (+ __deleted): the
    * union-by-name of all four tables' columns plus metadata, exactly the
    * Hive DDL at cdc_pipeline_dag.py:360-383.
    */
  val unified: StructType = StructType(Seq(
    f("id", LongType), f("name", StringType), f("email", StringType),
    f("address", StringType), f("created_at", TimestampType),
    f("updated_at", TimestampType), f("description", StringType),
    f("price", DecimalType(10, 2)), f("stock", IntegerType),
    f("category", StringType), f("status", StringType),
    f("customer_id", LongType), f("order_date", TimestampType),
    f("total_amount", DecimalType(12, 2)), f("shipping_address", StringType),
    f("product_id", LongType), f("quantity", IntegerType),
    f("unit_price", DecimalType(10, 2)), f("order_id", LongType)) ++
    metadata.fields)

  /** The full Debezium envelope before unwrap: {before, after, source, op,
    * ts_ms} (Debezium's change-event contract; the reference flattens it at
    * ingest with ExtractNewRecordState, cdc_pipeline_dag.py:142-143).
    * Parameterized by the row schema of the captured table.
    */
  def envelope(row: StructType): StructType = StructType(Seq(
    f("before", row), f("after", row),
    f("source", StructType(Seq(
      f("table", StringType), f("lsn", StringType), f("ts_ms", LongType)))),
    f("op", StringType), f("ts_ms", LongType)))
}
