package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchOps
import graft.sources.Tables

/** Mergeable HLL sketch pre-aggregation: error bound vs exact distinct,
  * and the merge invariants that make a persisted per-day sketch table
  * sound under incremental maintenance.
  */
class SketchSpec extends SparkSpec {

  private lazy val ev = Tables.events(spark, sf)
  private lazy val daily = SketchOps.dailyUserSketches(ev)

  test("sketch rollup estimates within 5% of exact distinct users") {
    val est = SketchOps.queries("cdc_distinct_users_sketch")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap +
      ("__all__" -> ev.select(col("user_id")).distinct().count())
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n) <= math.max(1L, (0.05 * n).toLong),
        s"$k: est=$e exact=$n")
    }
  }

  test("incremental maintenance: union(rollup(old days), new day) == monolithic") {
    // split the log at a date: the "already maintained" days vs the
    // "newly arrived" day(s); merging the new sketches into the old
    // rollup must estimate the same as sketching everything at once
    val cut = to_date(lit("2024-01-20"))
    val oldDaily = SketchOps.dailyUserSketches(ev.filter(to_date(col("ts")) < cut))
    val newDaily = SketchOps.dailyUserSketches(ev.filter(to_date(col("ts")) >= cut))
    // both sides non-trivial, else the test proves nothing
    assert(oldDaily.count() > 0 && newDaily.count() > 0)
    def estimates(d: org.apache.spark.sql.DataFrame) =
      SketchOps.rollupByType(d)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estimates(oldDaily.unionByName(newDaily)) === estimates(daily))
  }

  test("sketches survive a parquet round-trip (the persisted table shape)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sketch-").toString
    daily.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val got = SketchOps.rollupByType(back)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = SketchOps.rollupByType(daily)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("order-independence: sketching a shuffled log estimates identically") {
    val shuffled = SketchOps.dailyUserSketches(
      ev.repartition(7, pmod(col("event_id"), lit(7))))
    val a = SketchOps.rollupByType(shuffled)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = SketchOps.rollupByType(daily)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a === b)
  }

  // --- GK quantile sketches --------------------------------------------

  /** Rank of `v` in the sorted values of `typ` (count of values ≤ v) —
    * the space where GK's ε-guarantee is stated.
    */
  private def rankWithin(typ: String, v: Double): Long =
    ev.filter(col("event_type") === typ && col("value") <= v).count()

  test("GK rollup quantiles honor the ε-rank guarantee per type") {
    val eps = graft.functions.QuantileSketch.RelativeError
    val got = SketchOps.queries("cdc_value_quantile_sketch")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (typ, (p50, p95)) =>
      val n = ev.filter(col("event_type") === typ).count().toDouble
      // merged daily sketches: each contributes ε·n_day ≤ ε·n of rank
      // slack, plus merge slack — 3ε·n is a safe engineering bound for
      // the guarantee this table must actually deliver
      for ((q, v) <- Seq(0.5 -> p50, 0.95 -> p95)) {
        val rank = rankWithin(typ, v)
        assert(math.abs(rank - q * n) <= 3 * eps * n + 1,
          s"$typ q=$q: rank $rank of $n for value $v")
      }
    }
  }

  test("GK incremental maintenance: merging old+new day sketches stays in bounds") {
    val cut = to_date(lit("2024-01-20"))
    val oldD = SketchOps.dailyValueSketches(ev.filter(to_date(col("ts")) < cut))
    val newD = SketchOps.dailyValueSketches(ev.filter(to_date(col("ts")) >= cut))
    assert(oldD.count() > 0 && newD.count() > 0)
    val eps = graft.functions.QuantileSketch.RelativeError
    SketchOps.rollupValueQuantiles(oldD.unionByName(newD))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .foreach { case (typ, p50) =>
        val n = ev.filter(col("event_type") === typ).count().toDouble
        val rank = rankWithin(typ, p50)
        assert(math.abs(rank - 0.5 * n) <= 3 * eps * n + 1,
          s"$typ: p50 rank $rank of $n")
      }
  }

  test("GK sketches survive a parquet round-trip; empty input yields no rows") {
    val dailyV = SketchOps.dailyValueSketches(ev)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gk-").toString
    dailyV.write.mode("overwrite").parquet(dir)
    val got = SketchOps.rollupValueQuantiles(spark.read.parquet(dir))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    val want = SketchOps.rollupValueQuantiles(dailyV)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    assert(got === want)
    assert(SketchOps.queries("cdc_value_quantile_sketch")(
      spark, sf) != null) // registry wiring
    assert(SketchOps.rollupValueQuantiles(
      SketchOps.dailyValueSketches(ev.limit(0))).count() === 0)
  }

  // --- Misra–Gries heavy hitters ---------------------------------------

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val exactCounts: Map[String, Long] = docs
    .select(explode(split(col("text"), " ")).as("t"))
    .groupBy(col("t")).count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def mg(m: Int, df: org.apache.spark.sql.DataFrame = docs) = df
    .agg(graft.functions.HeavyHitters.heavyHitters(m)(
      split(col("text"), " ")).as("hh"))
    .select(explode(col("hh")).as("h"))
    .select(col("h._1"), col("h._2"), col("h._3"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("MG at capacity ≥ |vocab| is exact (the oracle-gated regime)") {
    assert(exactCounts.size <= 256, "fixture vocab outgrew the capacity")
    val got = mg(256).map { case (t, c, _) => t -> c }.toMap
    assert(got === exactCounts)
  }

  test("MG at tiny capacity: lower bounds, N/(m+1) undercount, heavy items present") {
    val n = exactCounts.values.sum
    val m = 4
    val out = mg(m)
    assert(out.length <= m)
    out.foreach { case (t, c, under) =>
      val truth = exactCounts(t)
      // every reported count is a lower bound that undershoots by at
      // most the sketch's own subtraction ledger, itself ≤ N/(m+1)
      assert(c <= truth, s"$t: reported $c above truth $truth")
      assert(truth - c <= under, s"$t: undercount ${truth - c} > ledger $under")
      assert(under <= n / (m + 1), s"ledger $under > N/(m+1)")
    }
    // any token with true count > N/(m+1) must appear
    val reported = out.map(_._1).toSet
    exactCounts.collect { case (t, c) if c > n / (m + 1) => t }
      .foreach(t => assert(reported(t), s"guaranteed heavy hitter $t missing"))
  }

  test("MG tolerates null token arrays (split of a null text column)") {
    import spark.implicits._
    // split(null) yields a NULL array, not an empty one — the rows must
    // be no-ops, not NPEs, and must not disturb the counts
    val withNulls = Seq(Some("a b a"), None, Some("b"), None)
      .toDF("text")
    val got = mg(16, withNulls).map { case (t, c, _) => t -> c }.toMap
    assert(got === Map("a" -> 2L, "b" -> 2L))
  }

  test("MG exact regime is partitioning-invariant (mergeable partials)") {
    val a = mg(256).toSeq
    val b = mg(256, docs.repartition(13, pmod(col("doc_id"), lit(13)))).toSeq
    assert(a === b)
  }

  test("MG algebra: bounds hold for any stream, capacity, and merge tree") {
    // drives the Aggregator's reduce/merge/finish directly (no Spark
    // jobs): for ANY token stream, capacity, and chunking into partial
    // sketches merged pairwise, the Misra–Gries guarantees must hold —
    // the partitioning-freedom Spark relies on when it splits and merges
    // partials however the cluster happens to schedule them
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      m <- Gen.choose(1, 8)
      n <- Gen.choose(0, 300)
      toks <- Gen.listOfN(n, Gen.choose('a', 'l').map(_.toString))
      cuts <- Gen.choose(1, 6)
    } yield (m, toks, cuts)
    val prop = Prop.forAll(gen) { case (m, toks, cuts) =>
      val agg = new graft.functions.HeavyHitters.MisraGries(m)
      val parts = toks.grouped(math.max(1, toks.length / cuts)).toList
      val merged = parts
        .map(chunk => agg.reduce(agg.zero, chunk))
        .foldLeft(agg.zero)(agg.merge)
      val out = agg.finish(merged)
      val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nTotal = toks.length.toLong
      out.length <= m &&
        out.forall { case (t, c, under) =>
          c <= truth(t) && truth(t) - c <= under &&
            under <= nTotal / (m + 1)
        } &&
        truth.forall { case (t, c) =>
          c <= nTotal / (m + 1) || out.exists(_._1 == t)
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // --- Theta source-overlap matrix -------------------------------------

  test("theta overlap: exact regime equals the distinct-hash self-join") {
    // every testdata source holds far fewer than 2^12 distinct hashes, so
    // the sketches are in exact mode and the matrix must EQUAL the exact
    // counts — the regime the sf0.01/sf0.1 oracle gate runs in
    val est = SketchOps.queries("dedup_source_overlap_sketch")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val gate = SketchOps.queries("dedup_source_overlap_sketch_gate")(spark, sf)
      .collect()
    assert(gate.nonEmpty)
    val nSources = Tables.documents(spark, sf)
      .select(col("source")).distinct().count().toInt
    assert(est.size === nSources * (nSources - 1) / 2)
    gate.foreach { r =>
      val (lo, hi) = (r.getString(0), r.getString(1))
      val (c, u) = (r.getLong(2), r.getLong(3))
      assert(est((lo, hi)) === ((c, u)),
        s"($lo,$hi): est=${est((lo, hi))} exact=($c,$u)")
      assert(r.getBoolean(4) && r.getBoolean(5))
    }
  }

  test("theta overlap: estimation regime honors the gate's error bound") {
    // the regime testdata never reaches (≤250 distinct/source): two
    // synthetic sources of 30k hashes overlapping in 10k — both sketches
    // well past 2^12 nominal entries, so θ < 1 and the estimates sample.
    // The gate bound (|est − exact| ≤ 7.5%·union) must hold, and the
    // derived Jaccard must land near 10k/50k = 0.2.
    import spark.implicits._
    val docs = ((0 until 30000).map(i => ("A", s"doc-$i")) ++
      (20000 until 50000).map(i => ("B", s"doc-$i")))
      .toDF("source", "text").repartition(8)
    val sk = SketchOps.sourceContentSketches(docs)
    val row = sk.filter(col("source") === "A")
      .select(col("sk").as("ska"))
      .crossJoin(sk.filter(col("source") === "B").select(col("sk").as("skb")))
      .select(
        theta_sketch_estimate(theta_intersection(col("ska"), col("skb")))
          .as("common"),
        theta_sketch_estimate(theta_union(col("ska"), col("skb")))
          .as("union"))
      .first()
    val (common, union) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(common - 10000.0) <= 0.075 * 50000,
      s"common=$common")
    assert(math.abs(union - 50000.0) <= 0.075 * 50000, s"union=$union")
    assert(math.abs(common / union - 0.2) <= 0.03,
      s"jaccard=${common / union}")
  }

  test("theta overlap: estimates are partitioning-invariant") {
    // min-θ union is a set union of retained hashes — merge order and
    // partial count must not change the estimate (the property that
    // makes the per-source sketch a sound mergeable pre-aggregate)
    import spark.implicits._
    val docs = (0 until 20000).map(i => (s"s${i % 3}", s"t-$i"))
      .toDF("source", "text")
    def ests(parts: Int): Map[String, Long] =
      SketchOps.sourceContentSketches(docs.repartition(parts))
        .select(col("source"), col("n_distinct"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ests(1) === ests(13))
  }

  test("MG composes per group: one sketch per lang == per-lang exact counts") {
    val got = docs.groupBy(col("lang"))
      .agg(graft.functions.HeavyHitters.heavyHitters(256)(
        split(col("text"), " ")).as("hh"))
      .select(col("lang"), explode(col("hh")).as("h"))
      .select(col("lang"), col("h._1").as("t"), col("h._2").as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val want = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("lang"), col("t")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === want)
  }
}
