package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Cdc

/** Property test (SURVEY.md §5): for any random CDC log of
  * insert/update/delete events per key, distributed latest-state compaction
  * equals a naive sequential fold of the log — including idempotence under
  * duplicated delivery (at-least-once, T2).
  */
case class Ev(table_name: String, id: Long, name: String, seq: Long, op: String)

class CdcPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genLog: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 60)
    evs <- Gen.listOfN(n, for {
      id <- Gen.choose(1L, 8L)
      op <- Gen.oneOf("c", "u", "d")
      nm <- Gen.alphaStr.map(_.take(6))
    } yield (id, op, nm))
  } yield evs.zipWithIndex.map { case ((id, op, nm), i) =>
    Ev("t", id, nm, i.toLong, op)
  }

  private def naiveFold(log: Seq[Ev]): Map[Long, String] =
    log.sortBy(_.seq).foldLeft(Map.empty[Long, Ev]) { (st, e) =>
      if (e.op == "d") st - e.id else st + (e.id -> e)
    }.map { case (k, e) => k -> e.name }

  test("compaction == naive fold, idempotent under duplicate delivery") {
    val prop = Prop.forAll(genLog) { log =>
      log.isEmpty || {
        // duplicate a prefix to model at-least-once redelivery
        val delivered = log ++ log.take(log.length / 2)
        val df = delivered.toDF()
          .withColumn("__deleted",
            when($"op" === "d", "true").otherwise("false"))
        val got = Cdc.latestState(df, Seq("table_name", "id"), Seq($"seq"))
          .select($"id", $"name").as[(Long, String)].collect().toMap
        got == naiveFold(log)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("stateAt(maxSeq prefix) == compaction of the prefix, for any cut") {
    val prop = Prop.forAll(genLog, Gen.choose(0, 59)) { (log, cut) =>
      log.isEmpty || {
        val df = Cdc.softDeleteRewrite(log.toDF())
        // stateAt orders by numeric LSN; reuse seq as an X/Y-format lsn 0/<hex>
        val withLsn = df.withColumn("lsn", concat(lit("0/"), hex($"seq")))
        val got = Cdc.stateAt(withLsn, Seq("id"), $"lsn", cut.toLong)
          .select($"id", $"name").as[(Long, String)].collect().toMap
        got == naiveFold(log.filter(_.seq <= cut))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("salted join == plain join for any salt count") {
    import graft.operators.Skew
    val genRows: Gen[List[(Long, String)]] = Gen.listOfN(40, for {
      k <- Gen.choose(1L, 5L) // few hot keys
      v <- Gen.alphaStr.map(_.take(4))
    } yield (k, v))
    val prop = Prop.forAll(genRows, Gen.choose(1, 7)) { (rows, salts) =>
      rows.isEmpty || {
        val fact = rows.toDF("k", "v")
        val dim = rows.map(_._1).distinct.map(k => (k, s"dim$k"))
          .toDF("k", "label")
        val plain = fact.join(dim, Seq("k"))
          .select($"k", $"v", $"label").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .sorted.toSeq
        val salted = Skew.saltedJoin(fact, dim, "k", salts)
          .select($"k", $"v", $"label").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .sorted.toSeq
        plain == salted
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
