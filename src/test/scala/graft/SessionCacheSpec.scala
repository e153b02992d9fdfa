package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, SessionCache}
import graft.sources.Tables

/** [[SessionCache.drop]]'s cross-session contract: a writer invalidates
  * the memoized artifact key for EVERY session sharing its SparkContext,
  * not just its own — the newSession()-per-verify pattern means a
  * sibling session can hold the same path-keyed memo, and a writer-local
  * drop would leave it serving the pre-write view (appended index rows
  * silently invisible within one JVM).
  */
class SessionCacheSpec extends SparkSpec {

  test("drop removes the key from every session on the writer's context") {
    val a = spark.newSession()
    val b = spark.newSession()
    var builds = 0
    def build(): Int = { builds += 1; builds }
    assert(SessionCache.memo(a, "xsess-test", build()) === 1)
    assert(SessionCache.memo(b, "xsess-test", build()) === 2)
    // memoized: no rebuild on re-read
    assert(SessionCache.memo(a, "xsess-test", build()) === 1)
    // B drops — A's entry must go too (same context)
    SessionCache.drop[Int](b, "xsess-test")
    assert(SessionCache.memo(a, "xsess-test", build()) === 3,
      "sibling session kept serving a dropped key")
    assert(SessionCache.memo(b, "xsess-test", build()) === 4)
  }

  test("a sibling session's index append is visible to the memoizing session") {
    val a = spark.newSession()
    val b = spark.newSession()
    val t = java.nio.file.Files
      .createTempDirectory("graft-xsess-idx-").toString
    val ev = Tables.embeddings(spark, sf)
    def asVec(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val idx = Ann.buildFrom(a, asVec(ev.filter(col("vec_id") % 2 === 0)),
      Ann.Cells, t)
    // A memoizes the listing
    val before = Ann.indexData(a, idx).count()
    // B (sibling session, same context) appends
    Ann.appendToIndex(b, idx, ev.filter(col("vec_id") % 2 === 1))
    val appended = ev.filter(col("vec_id") % 2 === 1).count()
    assert(Ann.indexData(a, idx).count() === before + appended,
      "session A served its pre-append listing after a sibling append")
  }
}
