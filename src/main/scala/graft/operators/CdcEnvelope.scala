package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.CdcSchemas

/** Oracle-gated CDC-envelope path — the engine's flagship pipeline run end
  * to end over a deterministic Debezium-shaped JSON fixture
  * (the jsonl files under `fixtures/cdc`: 4 tables,
  * snapshot/insert/update/delete, LSNs
  * that cross the hi/lo word boundary AND order differently lexically than
  * numerically — "0/F0" < "0/100" and "2/20" < "10/30" only under numeric
  * WAL order, so a lexical-ordering regression flips winners and fails the
  * oracle).
  *
  * The chain is exactly the reference's reason to exist
  * (SMT unwrap/rewrite chain cdc_pipeline_dag.py:142-147 feeding the
  * unified Hive DDL cdc_pipeline_dag.py:360-383):
  *
  *   readJsonEvents → unwrap → softDeleteRewrite → unify → latestState
  *
  * The DuckDB twins reconstruct the same semantics from the same JSON via
  * `read_json` with explicit columns (never inference), struct carving,
  * null-padded union, and a hex-parsed numeric LSN sort key — so every
  * operator in the chain is value-checked, not just spec-asserted.
  *
  * The fixture is a fixed input (independent of the scale directory): this
  * gate checks OPERATOR SEMANTICS; scale behavior of the same operators is
  * covered by the events-table queries and the streaming specs.
  */
object CdcEnvelope {
  type Q = (SparkSession, String) => DataFrame

  /** Committed fixture path — referenced by absolute path from the oracle
    * SQL too, so both engines read the identical bytes.
    */
  val FixtureDir = "/root/repo/fixtures/cdc"

  private val tables = Seq(
    "customers" -> CdcSchemas.customer,
    "products" -> CdcSchemas.product,
    "orders" -> CdcSchemas.order,
    "order_items" -> CdcSchemas.orderItem)

  /** The unified 22-column change log: per-table envelope decode + unwrap
    * + delete rewrite, unioned by name with null padding.
    */
  def unified(s: SparkSession, dir: String = FixtureDir): DataFrame =
    Cdc.unify(tables.map { case (t, sch) =>
      Cdc.softDeleteRewrite(Cdc.unwrap(
        Cdc.readJsonEvents(s, CdcSchemas.envelope(sch), s"$dir/$t.jsonl")))
    })

  val queries: Map[String, Q] = Map(
    // W1 over the real envelope: latest surviving row per (table, key),
    // ordered by numeric WAL LSN, soft-deletes dropped. Decimals emitted
    // as double (the driver's hash is type-sensitive and DuckDB's JSON
    // numbers are doubles).
    "cdc_unified_latest" -> ((s, _) => {
      Cdc.latestState(unified(s), Seq("table_name", "id"),
          Seq(Cdc.lsnOrd(col("lsn"))))
        .select(col("table_name"), col("id"), col("name"), col("email"),
          col("category"), col("price").cast("double").as("price"),
          col("stock"), col("status"), col("customer_id"),
          col("total_amount").cast("double").as("total_amount"),
          col("order_id"), col("product_id"), col("quantity"),
          col("unit_price").cast("double").as("unit_price"),
          col("op"), col("lsn"))
        .orderBy(col("table_name"), col("id"))
    }),

    // W1 time travel over the real envelope: table state AS OF WAL
    // position 0/100 (numeric 256) — before customer 3's delete and every
    // later mutation, so the reconstructed state differs from
    // cdc_unified_latest on all four tables.
    "cdc_unified_state_at" -> ((s, _) => {
      Cdc.stateAt(unified(s), Seq("table_name", "id"), col("lsn"), 0x100L)
        .select(col("table_name"), col("id"), col("name"), col("email"),
          col("category"), col("price").cast("double").as("price"),
          col("status"), col("quantity"), col("op"), col("lsn"))
        .orderBy(col("table_name"), col("id"))
    }),

    // A3 over the real envelope: change-volume per (table, op) — the
    // count-conservation face of monitor-pipeline.sh:55-58.
    "cdc_unified_counts" -> ((s, _) => {
      unified(s)
        .groupBy(col("table_name"), col("op"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("table_name"), col("op"))
    }),
  )

  /** DuckDB hex→BIGINT for a SQL string expression (no conv() in DuckDB;
    * same list_reduce fold the text_fingerprint oracle uses).
    */
  private def hexSql(e: String): String =
    s"""list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length($e)+1),
              i -> CAST(strpos('0123456789ABCDEF',
                     upper(substr($e, CAST(i AS INT), 1))) - 1 AS BIGINT))),
          (a, c) -> a * 16 + c)"""

  /** read_json CTE for one table: explicit envelope columns, image pick,
    * soft-delete marker.
    */
  private def tableCte(name: String, rowCols: String): String =
    s"""SELECT (CASE WHEN op = 'd' THEN before ELSE after END) AS r, op,
           source['table'] AS table_name, source['lsn'] AS lsn,
           CASE WHEN op = 'd' THEN 'true' ELSE 'false' END AS __deleted
         FROM read_json('$FixtureDir/$name.jsonl',
           format = 'newline_delimited',
           columns = {before: 'STRUCT($rowCols)', after: 'STRUCT($rowCols)',
                      source: 'STRUCT("table" VARCHAR, lsn VARCHAR, ts_ms BIGINT)',
                      op: 'VARCHAR', ts_ms: 'BIGINT'})"""

  private val customersCols =
    """id BIGINT, "name" VARCHAR, email VARCHAR, address VARCHAR"""
  private val productsCols =
    """id BIGINT, "name" VARCHAR, description VARCHAR, price DOUBLE,
       stock INT, category VARCHAR"""
  private val ordersCols =
    """id BIGINT, customer_id BIGINT, status VARCHAR, total_amount DOUBLE,
       shipping_address VARCHAR"""
  private val orderItemsCols =
    """id BIGINT, order_id BIGINT, product_id BIGINT, quantity INT,
       unit_price DOUBLE"""

  /** Null-padded projection to the unified column set (order fixed). */
  private val unifiedSelects = Seq(
    ("cu", """r['id'] AS id, r['name'] AS name, r['email'] AS email,
       CAST(NULL AS VARCHAR) AS category, CAST(NULL AS DOUBLE) AS price,
       CAST(NULL AS INT) AS stock, CAST(NULL AS VARCHAR) AS status,
       CAST(NULL AS BIGINT) AS customer_id,
       CAST(NULL AS DOUBLE) AS total_amount,
       CAST(NULL AS BIGINT) AS order_id, CAST(NULL AS BIGINT) AS product_id,
       CAST(NULL AS INT) AS quantity, CAST(NULL AS DOUBLE) AS unit_price"""),
    ("pr", """r['id'] AS id, r['name'] AS name, CAST(NULL AS VARCHAR) AS email,
       r['category'] AS category, r['price'] AS price, r['stock'] AS stock,
       CAST(NULL AS VARCHAR) AS status, CAST(NULL AS BIGINT) AS customer_id,
       CAST(NULL AS DOUBLE) AS total_amount,
       CAST(NULL AS BIGINT) AS order_id, CAST(NULL AS BIGINT) AS product_id,
       CAST(NULL AS INT) AS quantity, CAST(NULL AS DOUBLE) AS unit_price"""),
    ("od", """r['id'] AS id, CAST(NULL AS VARCHAR) AS name,
       CAST(NULL AS VARCHAR) AS email, CAST(NULL AS VARCHAR) AS category,
       CAST(NULL AS DOUBLE) AS price, CAST(NULL AS INT) AS stock,
       r['status'] AS status, r['customer_id'] AS customer_id,
       r['total_amount'] AS total_amount,
       CAST(NULL AS BIGINT) AS order_id, CAST(NULL AS BIGINT) AS product_id,
       CAST(NULL AS INT) AS quantity, CAST(NULL AS DOUBLE) AS unit_price"""),
    ("oi", """r['id'] AS id, CAST(NULL AS VARCHAR) AS name,
       CAST(NULL AS VARCHAR) AS email, CAST(NULL AS VARCHAR) AS category,
       CAST(NULL AS DOUBLE) AS price, CAST(NULL AS INT) AS stock,
       CAST(NULL AS VARCHAR) AS status, CAST(NULL AS BIGINT) AS customer_id,
       CAST(NULL AS DOUBLE) AS total_amount,
       r['order_id'] AS order_id, r['product_id'] AS product_id,
       r['quantity'] AS quantity, r['unit_price'] AS unit_price"""))

  private val unifiedCte: String = {
    val ctes = Seq(
      s"cu AS (${tableCte("customers", customersCols)})",
      s"pr AS (${tableCte("products", productsCols)})",
      s"od AS (${tableCte("orders", ordersCols)})",
      s"oi AS (${tableCte("order_items", orderItemsCols)})")
    val unions = unifiedSelects.map { case (cte, sel) =>
      s"SELECT $sel, op, table_name, lsn, __deleted FROM $cte"
    }.mkString("\n UNION ALL\n ")
    s"""WITH ${ctes.mkString(",\n ")},
        u AS (\n $unions\n )"""
  }

  val oracles: Map[String, String] = Map(
    "cdc_unified_latest" ->
      s"""$unifiedCte,
          o AS (SELECT *,
            ${hexSql("split_part(lsn, '/', 1)")} * 4294967296
              + ${hexSql("split_part(lsn, '/', 2)")} AS lsn_ord
          FROM u),
          ranked AS (SELECT *, row_number() OVER (
            PARTITION BY table_name, id ORDER BY lsn_ord DESC) AS rn
          FROM o)
          SELECT table_name, id, name, email, category, price, stock,
                 status, customer_id, total_amount, order_id, product_id,
                 quantity, unit_price, op, lsn
          FROM ranked WHERE rn = 1 AND __deleted <> 'true'
          ORDER BY table_name, id""",
    "cdc_unified_counts" ->
      s"""$unifiedCte
          SELECT table_name, op, count(*) AS n FROM u
          GROUP BY table_name, op ORDER BY table_name, op""",
    "cdc_unified_state_at" ->
      s"""$unifiedCte,
          o AS (SELECT *,
            ${hexSql("split_part(lsn, '/', 1)")} * 4294967296
              + ${hexSql("split_part(lsn, '/', 2)")} AS lsn_ord
          FROM u),
          ranked AS (SELECT *, row_number() OVER (
            PARTITION BY table_name, id ORDER BY lsn_ord DESC) AS rn
          FROM o WHERE lsn_ord <= 256)
          SELECT table_name, id, name, email, category, price, status,
                 quantity, op, lsn
          FROM ranked WHERE rn = 1 AND __deleted <> 'true'
          ORDER BY table_name, id""",
  )
}
