package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Skew}
import graft.sources.Tables

/** Scale-technique specs: bucketed co-located joins (no exchange), salted
  * joins for skew (identical results), and CDC state-at-LSN time travel.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val db = "graft_buckets"
    // the in-memory catalog forgets tables between JVMs but their physical
    // locations survive — clear them or CTAS fails LOCATION_ALREADY_EXISTS
    spark.sql(s"DROP TABLE IF EXISTS $db.orders_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.customer_b")
    val warehouse = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      s"$db.db")
    if (warehouse.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(warehouse)
    }
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable(s"$db.orders_b")
    Tables.customer(spark, sf).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable(s"$db.customer_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(s"$db.orders_b")
        .join(spark.table(s"$db.customer_b"),
          $"o_custkey" === $"c_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the key: no Exchange in the plan
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() === Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
        .count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("salted join == plain join on a skewed key") {
    val events = Tables.events(spark, sf) // event_type: 5 hot values
    val dim = events.select($"event_type").distinct()
      .withColumn("weight", length($"event_type"))
    val plain = events.join(dim, Seq("event_type"))
      .groupBy($"event_type").agg(count(lit(1)).as("n"), sum($"weight").as("w"))
      .orderBy($"event_type").collect().toSeq
    val salted = Skew.saltedJoin(events, dim, "event_type", salts = 8)
      .groupBy($"event_type").agg(count(lit(1)).as("n"), sum($"weight").as("w"))
      .orderBy($"event_type").collect().toSeq
    assert(salted === plain)
  }

  test("salted two-stage count == plain groupBy count") {
    val events = Tables.events(spark, sf)
    val plain = events.groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(events, $"event_type", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("dynamic partition overwrite repairs one partition, leaves the rest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dyn").toString
    val events = Tables.events(spark, sf).limit(500)
    val parted = Cdc.withTimePartitions(events, $"ts")
    Cdc.writeTimePartitioned(parted, dir)
    val before = spark.read.parquet(dir)
    val total = before.count()
    // pick one (year,month,day,hour) cell and rewrite it with doubled value
    val cell = before.select($"year", $"month", $"day", $"hour").limit(1)
      .collect()(0)
    val repaired = parted
      .filter($"year" === cell.getInt(0) && $"month" === cell.getInt(1) &&
        $"day" === cell.getInt(2) && $"hour" === cell.getInt(3))
      .withColumn("value", $"value" * 2)
    Cdc.overwriteTimePartitions(repaired, dir)
    val after = spark.read.parquet(dir)
    assert(after.count() === total) // same rows: replaced, not appended
    val inCell = after.filter($"year" === cell.getInt(0) &&
      $"month" === cell.getInt(1) && $"day" === cell.getInt(2) &&
      $"hour" === cell.getInt(3))
    val origCell = parted.filter($"year" === cell.getInt(0) &&
      $"month" === cell.getInt(1) && $"day" === cell.getInt(2) &&
      $"hour" === cell.getInt(3))
    assert(inCell.agg(sum($"value")).collect()(0).getDouble(0) ===
      origCell.agg(sum($"value") * 2).collect()(0).getDouble(0))
  }

  test("compaction reduces file count and preserves content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val events = Tables.events(spark, sf).limit(300)
    // simulate the frequent-flush sink: many tiny files per partition
    Cdc.writeTimePartitioned(
      Cdc.withTimePartitions(events.repartition(8), $"ts"), dir)
    def files() = spark.read.parquet(dir).select(input_file_name())
      .distinct().count()
    val checksum = spark.read.parquet(dir)
      .agg(sum(hash($"event_id", $"value")).as("h"), count(lit(1)).as("n"))
      .collect()(0)
    val nBefore = files()
    Cdc.compactTimePartitions(spark, dir, filesPerPartition = 1)
    val nAfter = files()
    val checksumAfter = spark.read.parquet(dir)
      .agg(sum(hash($"event_id", $"value")).as("h"), count(lit(1)).as("n"))
      .collect()(0)
    assert(nAfter < nBefore, s"files $nBefore -> $nAfter")
    assert(checksum === checksumAfter)
  }

  test("prefix filtering prunes candidates yet loses no qualifying pair") {
    import graft.operators.DedupOps
    // the SAME postings the query uses — a copy here would silently stop
    // covering the production construction if tokenization ever changes
    val posts = DedupOps.ngramPosts(spark, sf).localCheckpoint(false)
    val naive = DedupOps.allPairs(posts)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = DedupOps.prefixCandidates(posts, 0.5)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // strictly fewer candidates than the Σdf² combination join generates…
    assert(pruned.size < naive.size,
      s"prefix=${pruned.size} naive=${naive.size}")
    // …and recall 1.0: every truly-qualifying pair is still a candidate
    val truth = DedupOps.queries("dedup_ngram_jaccard")(spark, sf)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(pruned), s"missing: ${truth -- pruned}")
    assert(truth.nonEmpty)
  }

  test("incremental dedup == full pair table restricted to the batch") {
    import graft.operators.DedupOps
    val posts = DedupOps.ngramPosts(spark, sf).localCheckpoint(false)
    val isNew = (id: org.apache.spark.sql.Column) => pmod(id, lit(10)) === 0
    // candidate volume: the batch-restricted join must generate strictly
    // fewer candidates than the full self-join (it skips corpus×corpus)
    val full = DedupOps.prefixCandidates(posts, 0.5)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = DedupOps.incrementalCandidates(posts, 0.5, isNew)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.size < full.size, s"inc=${inc.size} full=${full.size}")
    // every incremental candidate touches the batch and is a full candidate
    assert(inc.forall { case (a, b) => a % 10 == 0 || b % 10 == 0 })
    assert(inc.subsetOf(full), s"extra: ${inc -- full}")
    // verified output == the monolithic pair table filtered to the batch —
    // the invariant that makes batch-after-batch dedup converge to the
    // same decisions as a full recompute
    val got = DedupOps.queries("dedup_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = DedupOps.queries("dedup_ngram_jaccard")(spark, sf)
      .filter(isNew($"doc_a") || isNew($"doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("two-phase groupCumsum == window running sum; reproduces packing bins") {
    import graft.operators.{CurationOps, ScaleWindows}
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"source", $"doc_id",
        size(split($"text", " ")).cast("long").as("nt"))
    val cum = ScaleWindows.groupCumsum(docs,
      group = Seq("lang", "source"), order = Seq("doc_id"),
      valueCol = "nt", numPartitions = 8)
    val got = cum.select($"lang", $"source", $"doc_id", $"__cum_before")
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("cb", coalesce(sum($"nt").over(w), lit(0L)))
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)), r.getLong(4)))
      .toMap
    assert(got === want)
    // bins derived from the two-phase cum-before match the query's output
    val binsViaCumsum = cum
      .withColumn("bin",
        floor($"__cum_before" / lit(CurationOps.PackBudget.toDouble)))
      .groupBy($"lang", $"source", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"nt").as("bin_tokens"))
      .orderBy($"lang", $"source", $"bin").collect().toSeq
    val binsViaQuery = CurationOps.queries("curate_pack_sequences")(spark, sf)
      .collect().toSeq
    assert(binsViaCumsum === binsViaQuery)
  }

  test("two-phase groupRanks == window ranks, without the 1-task-per-group funnel") {
    import graft.operators.ScaleWindows
    import org.apache.spark.sql.expressions.Window
    val events = Tables.events(spark, sf)
      .select($"event_type", $"value", $"event_id")
    // scale path: range partitions + offset pass
    val ranked = ScaleWindows.groupRanks(events,
      group = Seq("event_type"), order = Seq("value", "event_id"),
      numPartitions = 8)
    val ntileUdfFree = ranked.select($"event_type", $"event_id",
        ($"__pos" + 1).as("rn"), $"__pos", $"__cnt")
      .collect()
      .map { r =>
        (r.getString(0), r.getLong(1), r.getLong(2),
          ScaleWindows.ntileOf(r.getLong(3), r.getLong(4), 4),
          if (r.getLong(4) == 1) 0.0
          else r.getLong(3).toDouble / (r.getLong(4) - 1))
      }.sortBy(t => (t._1, t._3))
    // reference: the window formulation
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    val win = events
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nt", ntile(4).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .select($"event_type", $"event_id", $"rn", $"nt", $"pr")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(t => (t._1, t._3))
    assert(ntileUdfFree.length == win.length)
    ntileUdfFree.zip(win).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // and the scale claim: each group's rows span MULTIPLE partitions
    // (the window form necessarily funnels each group through one task)
    val spread = events
      .repartitionByRange(8, $"event_type", $"value", $"event_id")
      .select(spark_partition_id().as("pid"), $"event_type")
      .distinct().groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spread.values.exists(_ > 1), spread.toString)
    // the Column closed forms (what the registered quartile query runs)
    // are bit-equal to the Scala reference forms
    val colForms = ranked.select(
        ScaleWindows.ntileCol($"__pos", $"__cnt", 4).as("nt"),
        ScaleWindows.percentRankCol($"__pos", $"__cnt").as("pr"),
        $"__pos", $"__cnt")
      .collect()
    assert(colForms.nonEmpty)
    colForms.foreach { r =>
      val (pos, cnt) = (r.getLong(2), r.getLong(3))
      assert(r.getLong(0) == ScaleWindows.ntileOf(pos, cnt, 4), r)
      val wantPr = if (cnt == 1) 0.0 else pos.toDouble / (cnt - 1)
      assert(r.getDouble(1) == wantPr, r)
    }
  }

  test("file metrics report every data file with its partition and size") {
    val dir = java.nio.file.Files.createTempDirectory("graft-metrics").toString
    val events = Tables.events(spark, sf).limit(400)
    Cdc.writeTimePartitioned(Cdc.withTimePartitions(events, $"ts"), dir)
    val m = Cdc.fileMetrics(spark, dir)
    val files = m.collect()
    assert(files.nonEmpty)
    // every row is a real parquet data file inside a year=/month=... dir
    files.foreach { r =>
      assert(r.getString(0).endsWith(".parquet"), r)
      assert(r.getString(1).startsWith("year="), r)
      assert(r.getLong(2) > 0, r)
    }
    // the listing agrees with what a scan actually reads
    val scanned = spark.read.parquet(dir).select(input_file_name())
      .distinct().count()
    assert(files.length.toLong === scanned)
  }

  test("blocked all-pairs dedup fails fast on an oversized block") {
    import graft.operators.DedupOps
    val v = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label",
        transform($"embedding", x => x.cast("double")).as("ev"))
    // under the cap: pass-through, query unchanged
    assert(DedupOps.requireBoundedBlocks(v, "label", 1000000L) eq v)
    // a cap below the hottest block: immediate named error, no join runs
    val e = intercept[IllegalArgumentException] {
      DedupOps.requireBoundedBlocks(v, "label", 3L)
    }
    assert(e.getMessage.contains("Ann"), e.getMessage)
  }

  test("connected components: chains converge, cliques collapse") {
    import graft.operators.DedupOps
    // chain 1-2-3-4 (needs multiple propagation rounds), a pair, a clique
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L), (21L, 22L)).toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("large-star/small-star CC == min-label propagation, in far fewer rounds") {
    import graft.operators.DedupOps
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // random graphs (fixed seed): identical labels on every node
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 4) {
      val n = 30 + trial * 10
      val es = (1 to n * 2).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val pairs = es.toDF("doc_a", "doc_b")
      val a = labelsOf(DedupOps.connectedComponents(pairs))
      val b = labelsOf(DedupOps.connectedComponentsStar(pairs))
      assert(a === b, s"trial $trial")
    }
    // the round claim: an 80-link chain needs ~80 propagation rounds
    // (labels travel one hop per iteration) but converges via star
    // contraction in ≤ 12 alternations. The appended self-loop pins the
    // node-set parity: a node whose only edge is (d, d) must still be
    // labeled (as its own singleton), exactly as propagation labels it.
    val chain = ((0L until 80L).map(i => (i, i + 1)) :+ (200L, 200L))
      .toDF("doc_a", "doc_b")
    val star = labelsOf(DedupOps.connectedComponentsStar(chain, maxIters = 12))
    assert(star.size == 82 && star(200L) == 200L &&
      star.removed(200L).values.forall(_ == 0L))
    assert(star === labelsOf(DedupOps.connectedComponents(chain,
      maxIters = 100)))
    intercept[IllegalArgumentException] {
      DedupOps.connectedComponents(chain, maxIters = 12)
    }
    // and on the real dedup pair graph: same clusters as the registered
    // propagation path (dedup_clusters' output is therefore unchanged)
    val pairs = DedupOps.ngramJaccardPairs(spark, sf)
      .select($"doc_a", $"doc_b")
    assert(labelsOf(DedupOps.connectedComponents(pairs)) ===
      labelsOf(DedupOps.connectedComponentsStar(pairs)))
  }

  test("incremental components == recompute over old ∪ new pairs") {
    import graft.operators.DedupOps
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // old graph: two chains and a singleton-ish pair; the new batch
    // BRIDGES the two chains (the case where stale labels would be
    // wrong without re-running contraction) and adds a fresh node
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val newPairs = Seq((3L, 10L), (30L, 31L)).toDF("doc_a", "doc_b")
    val incremental = labelsOf(DedupOps.incrementalComponents(
      DedupOps.connectedComponents(oldPairs), newPairs))
    val monolithic = labelsOf(
      DedupOps.connectedComponents(oldPairs.union(newPairs)))
    assert(incremental === monolithic)
    // the bridge actually merged: both chains now share root 1
    assert(incremental(12L) == 1L && incremental(30L) == 30L)
  }

  test("stateAt reconstructs table state as of an LSN") {
    val log = Seq(
      // (id, name, op, lsn)  — lsn in the reference's X/Y hex format
      (1L, "a0", "c", "0/10"), (2L, "b0", "c", "0/20"),
      (1L, "a1", "u", "0/30"), (2L, null, "d", "0/40"),
      (3L, "c0", "c", "1/00")) // 1/00 > 0/FF numerically
      .toDF("id", "name", "op", "lsn")
    val events = Cdc.softDeleteRewrite(log)
    def state(asOf: Long) =
      Cdc.stateAt(events, Seq("id"), $"lsn", asOf)
        .select($"id", $"name").collect().map(r =>
          r.getLong(0) -> r.getString(1)).toMap
    // after 0/20: both inserts visible
    assert(state(0x20L) === Map(1L -> "a0", 2L -> "b0"))
    // after 0/30: key 1 updated
    assert(state(0x30L) === Map(1L -> "a1", 2L -> "b0"))
    // after 0/40: key 2 deleted
    assert(state(0x40L) === Map(1L -> "a1"))
    // after 1/00 (hi word): key 3 exists
    assert(state((1L << 32)) === Map(1L -> "a1", 3L -> "c0"))
  }
}
