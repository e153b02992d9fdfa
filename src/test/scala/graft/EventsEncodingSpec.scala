package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Round-5 regression: the driver regenerated `events.parquet` with `ts`
  * as parquet timestamp[us] (read as TIMESTAMP_NTZ) where earlier
  * generations stored TIMESTAMP(NANOS) (read as nanos-long under the
  * legacy flag). The unconditional nanos rewrite in the loader then failed
  * analysis for every events-reading query. [[Tables.events]] now
  * dispatches on the schema it actually read; this spec pins all three
  * encodings of the SAME instants through the one loader and asserts
  * identical TimestampType results.
  */
class EventsEncodingSpec extends SparkSpec {
  import spark.implicits._

  // two instants with microsecond precision, as epoch micros
  private val micros = Seq(1700000000123456L, 1700003600654321L)

  private def loaderRows(dir: String): Seq[(Long, Long)] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must normalize to TimestampType, got ${df.schema("ts")}")
    df.select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
  }

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-events-enc-$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("legacy nanos-as-long events read identically to NTZ micros") {
    // legacy shape: ts stored as long nanos (what nanosAsLong=true yields
    // from a TIMESTAMP(NANOS) file — schema-identical on re-read)
    val legacyDir = tmpDir("legacy")
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$legacyDir/events.parquet")

    // current driver shape: TIMESTAMP_NTZ micros
    val ntzDir = tmpDir("ntz")
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    // plain TimestampType passthrough
    val tzDir = tmpDir("tz")
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$tzDir/events.parquet")

    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    assert(loaderRows(legacyDir) == expected, "legacy nanos-long path")
    assert(loaderRows(ntzDir) == expected, "TIMESTAMP_NTZ path")
    assert(loaderRows(tzDir) == expected, "TimestampType passthrough")
  }

  test("driver testdata loads and filters by timestamp literal") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    val n = ev.count()
    assert(n > 0)
    // a ts predicate must analyze and prune (the round-5 failure mode was
    // an AnalysisException before any job ran)
    val windowed = ev.filter(col("ts") >= lit("2024-01-01").cast("timestamp"))
    assert(windowed.count() <= n)
  }

  test("unsupported ts type fails with instructions") {
    val badDir = tmpDir("bad")
    Seq((1L, "oops")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$badDir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, badDir))
    assert(e.getMessage.contains("unsupported type"))
  }
}
