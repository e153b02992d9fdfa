package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Cdc
import graft.sources.CdcSchemas
import graft.streaming.CdcStream

/** End-to-end integration of the reference pipeline's semantics
  * (SURVEY.md §3.1): Debezium-shaped envelope JSON for all four source
  * tables → tombstone filter → schema-checked decode → unwrap →
  * soft-delete rewrite → unified 22-column union → time partitions →
  * checkpointed partitioned streaming sink → read back → per-table
  * latest-state == the expected current rows.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def env(table: String, op: String, lsn: String,
      after: String, before: String = "null"): String =
    s"""{"before":$before,"after":$after,""" +
      s""""source":{"table":"$table","lsn":"$lsn","ts_ms":0},""" +
      s""""op":"$op","ts_ms":0}"""

  test("reference-shaped CDC pipeline end to end") {
    val srcDir = Files.createTempDirectory("graft-e2e-src").toString
    val outDir = Files.createTempDirectory("graft-e2e-out").toString
    val chkDir = Files.createTempDirectory("graft-e2e-chk").toString

    // the change log: inserts, an update, a delete, across 4 tables
    val lines = Seq(
      env("customer", "r", "0/10",
        """{"id":1,"name":"ada","email":"a@x","address":"A","created_at":"2024-01-01T01:00:00.000Z","updated_at":"2024-01-01T01:00:00.000Z"}"""),
      env("customer", "u", "0/20",
        """{"id":1,"name":"ada2","email":"a@x","address":"A","created_at":"2024-01-01T01:00:00.000Z","updated_at":"2024-01-01T02:00:00.000Z"}"""),
      env("product", "c", "0/30",
        """{"id":7,"name":"p","description":"d","price":9.99,"stock":3,"category":"c","created_at":"2024-01-01T03:00:00.000Z","updated_at":"2024-01-01T03:00:00.000Z"}"""),
      env("order", "c", "0/40",
        """{"id":5,"customer_id":1,"order_date":"2024-01-01T04:00:00.000Z","status":"pending","total_amount":19.98,"shipping_address":"A","created_at":"2024-01-01T04:00:00.000Z","updated_at":"2024-01-01T04:00:00.000Z"}"""),
      env("order_item", "c", "0/50",
        """{"id":9,"order_id":5,"product_id":7,"quantity":2,"unit_price":9.99,"created_at":"2024-01-01T04:00:00.000Z","updated_at":"2024-01-01T04:00:00.000Z"}"""),
      // delete arrives with the last row image in `before` (rewrite mode)
      env("product", "d", "0/60", "null",
        """{"id":7,"name":"p","description":"d","price":9.99,"stock":3,"category":"c","created_at":"2024-01-01T03:00:00.000Z","updated_at":"2024-01-01T03:00:00.000Z"}"""))
    Files.write(java.nio.file.Paths.get(srcDir, "log.json"),
      String.join("\n", lines: _*).getBytes)
    // a Kafka tombstone (null value) that must be filtered before decode
    val raw = spark.read.text(srcDir).select($"value")
      .union(Seq[String](null).toDF("value"))

    // batch path: tombstone filter → decode per table → unwrap → rewrite
    val perTable = Seq(
      "customer" -> CdcSchemas.customer, "product" -> CdcSchemas.product,
      "order" -> CdcSchemas.order, "order_item" -> CdcSchemas.orderItem
    ).map { case (t, rowSchema) =>
      val decoded = Cdc.dropTombstones(raw)
        .select(Cdc.decodeJson($"value", CdcSchemas.envelope(rowSchema))
          .as("e"))
        .select("e.*")
        .filter($"source.table" === t)
      Cdc.softDeleteRewrite(Cdc.unwrap(decoded))
    }
    val unified = Cdc.unify(perTable)
    assert(unified.count() === lines.size)

    // time-partitioned checkpointed sink (streaming face), then read back
    val stream = CdcStream.jsonEventStream(spark,
      unified.schema, writeUnifiedAsJson(unified), maxFilesPerTrigger = 2)
    val q = CdcStream.startPartitionedSink(
      Cdc.withTimePartitions(stream, $"created_at"), outDir, chkDir,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    val back = spark.read.parquet(outDir)
    assert(back.count() === lines.size) // count conservation across the hop

    // latest state per (table, pk): update applied, delete excluded
    val state = Cdc.latestState(back, Seq("table_name", "id"),
      Seq(Cdc.lsnOrd($"lsn")))
      .select($"table_name", $"id", $"name", $"status")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3))).toMap
    assert(state.keySet === Set(("customer", 1L), ("order", 5L),
      ("order_item", 9L))) // product 7 deleted
    assert(state(("customer", 1L))._1 === "ada2") // update won
    assert(state(("order", 5L))._2 === "pending")
  }

  private def writeUnifiedAsJson(unified: org.apache.spark.sql.DataFrame)
      : String = {
    val dir = Files.createTempDirectory("graft-e2e-unified").toString
    unified.coalesce(1).write.mode("overwrite").json(dir)
    dir
  }
}
