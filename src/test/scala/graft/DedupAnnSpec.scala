package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, DedupOps, SimilarityOps}

/** Specs for the approximate / engine-specific training-data operators that
  * have no exact DuckDB twin (ANN, SimHash), plus LSH-vs-exact agreement.
  */
class DedupAnnSpec extends SparkSpec {

  test("ann_ivf_topk has recall@20 >= 0.9 vs brute-force cosine") {
    val ann = Ann.queries("ann_ivf_topk")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = SimilarityOps.queries("sim_cosine_topk")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ann.size == 20)
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@20 = $recall")
  }

  test("ann_ivf_batch: per-query recall vs the brute-force batch twin") {
    val ann = Ann.queries("ann_ivf_batch")(spark, sf)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = SimilarityOps.queries("sim_batch_topk")(spark, sf)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ann.keySet === exact.keySet && ann.keySet.size == 3)
    // per-query recall@5 — the same nprobe geometry as the single-query
    // gate; 0.8 per query (one miss of five) on the near-uniform worst
    // case, and the batch must never be WORSE than 0.8 for any qid
    ann.foreach { case (q, ids) =>
      assert(ids.size == 5, s"qid=$q returned ${ids.size}")
      val recall = (ids intersect exact(q)).size.toDouble / 5
      assert(recall >= 0.8, s"qid=$q recall@5 = $recall")
    }
  }

  test("sim_outlier_docs matches a driver-side brute-force recompute") {
    // replay the exact published arithmetic (round-6 decimal centroid
    // sums / count; per-position terms rounded to 12; strict left fold;
    // final round-6) on collected rows — any drift in the distributed
    // plan's rounding or fold order fails bit-for-bit here
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(row => (row.getLong(0), row.getInt(1),
        row.getSeq[Float](2).map(_.toDouble).toArray))
    val cent = vecs.groupBy(_._2).map { case (l, vs) =>
      l -> Array.tabulate(vs.head._3.length) { i =>
        vs.map(v => BigDecimal(r(v._3(i), 6))).sum.toDouble / vs.length
      }
    }
    val expect = vecs.map { case (id, l, e) =>
      val c = cent(l)
      val d2 = e.indices.foldLeft(0.0) { (acc, i) =>
        val diff = r(e(i), 6) - c(i)
        acc + r(diff * diff, 12)
      }
      (id, l, r(d2, 6))
    }.sortBy { case (id, _, d2) => (-d2, id) }.take(20).toSeq
    val got = SimilarityOps.queries("sim_outlier_docs")(spark, sf)
      .collect().map(row => (row.getLong(0), row.getInt(1), row.getDouble(2)))
      .toSeq
    assert(got === expect)
  }

  test("dedup_semantic: exact pairs within cells, measured recall vs brute force") {
    import spark.implicits._
    val got = DedupOps.queries("dedup_semantic")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // canonical + deduped: multi-cell emission must not leak a pair twice
    assert(got.keys.forall { case (a, b) => a < b })
    // global brute-force truth at the same threshold
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("ev"))
    val a = vecs.toDF("vec_a", "ev_a")
    val b = vecs.toDF("vec_b", "ev_b")
    val brute = a.crossJoin(b).filter($"vec_a" < $"vec_b")
      .withColumn("cos", round(SimilarityOps.cosine($"ev_a", $"ev_b"), 4))
      .filter($"cos" >= 0.30)
      .select($"vec_a", $"vec_b", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision 1.0: every reported pair is a true pair with the exact
    // similarity (the within-cell compute is exact, only COVERAGE is
    // approximate)
    got.foreach { case (pair, cos) =>
      assert(brute.get(pair).contains(cos), s"$pair not exact: $cos")
    }
    // recall: this corpus is the documented IVF worst case (near-uniform
    // sphere — 0.30-cosine pairs sit ~72° apart and often straddle cell
    // boundaries). Single-cell assignment retained 0.31 here; the
    // registered top-3 soft-assignment (primary ⋈ soft, ≤3× join rows)
    // must clear 0.6. Clustered corpora retain far more at either width.
    assert(brute.nonEmpty)
    val recall = got.size.toDouble / brute.size
    info(s"semantic-dedup recall vs brute force: $recall (${got.size}/${brute.size})")
    assert(recall >= 0.6, s"recall $recall")
  }

  test("routed cosine floors on the adversarial boundary fixture") {
    // the measured worst case behind bench/routed_boundary_r9.json,
    // pinned as a GATE at the spec scale: a corpus whose near-threshold
    // pairs (cos ≈ 0.34) straddle two cells behind decoy cells that
    // outrank the partner in the probe order. The clustered shape's
    // 1.000 recall can hide a routed-path regression completely — this
    // fixture cannot: the default width must hold its documented
    // partial floor and the measured recovery width must restore the
    // near-threshold slice. Fresh session per run so the cap/probe
    // confs and the session-keyed index memo never leak.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-boundary-").toString
    graft.tools.ClusteredCorpus.writeBoundary(spark, dir, 1000, 64, 50)
    def run(cap: Option[String], probes: Option[String])
        : Map[(Long, Long), Double] = {
      val s = spark.newSession()
      s.conf.set("spark.graft.ann.cells", "50")
      cap.foreach(s.conf.set("spark.graft.dedup.maxCosineBlockRows", _))
      probes.foreach(s.conf.set("spark.graft.dedup.semanticProbes", _))
      DedupOps.queries("dedup_embedding_cosine")(s, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    }
    // default cap: every 100-row label block fits → exact truth
    val exact = run(None, None)
    val nearTruth = exact.filter { case (_, c) => c < 0.5 }
    assert(nearTruth.nonEmpty, "fixture yields no near-threshold pairs")
    def recalls(routed: Map[(Long, Long), Double]): (Double, Double) = {
      // precision is an invariant: routing gates WHICH pairs surface,
      // never the arithmetic — any invented pair or drifted cosine is
      // a bug, not a recall tradeoff
      routed.foreach { case (p, c) =>
        assert(exact.get(p).contains(c), s"routed pair $p not exact: $c")
      }
      val near = routed.count { case (_, c) => c < 0.5 }
      (routed.size.toDouble / exact.size,
        near.toDouble / nearTruth.size)
    }
    // cap 50 forces every label block through the cells
    val (all3, near3) = recalls(run(Some("50"), None))
    val (all7, near7) = recalls(run(Some("50"), Some("7")))
    info(f"boundary recall: default width $all3%.3f overall / " +
      f"$near3%.3f near-threshold; width 7 $all7%.3f / $near7%.3f " +
      f"(${nearTruth.size} near-threshold truth pairs)")
    // floors track the r9 20k-fixture curve (0.934/0.338 at width 3,
    // 0.989/0.885 at width 7) with slack for the smaller spec corpus
    assert(all3 >= 0.8, s"default-width overall recall $all3")
    assert(near3 >= 0.15, s"default-width near-threshold recall $near3")
    assert(all7 >= 0.9, s"width-7 overall recall $all7")
    assert(near7 >= 0.7, s"width-7 near-threshold recall $near7")
  }

  test("index-stored soft cells == live nearest-centroid recompute") {
    // the semantic family serves its soft assignment FROM the index
    // (soft_cells, computed once at build); the live kernel — unit
    // normalization + Ann.softCellsOf over the same centroids — is the
    // fallback for probe widths beyond the stored 8. Pin the two paths
    // bit-equal per (vec_id, cell) at every width up to the stored one:
    // a drift here (a changed tie-break, a normalization change on one
    // side only) would silently skew every semantic consumer's coverage.
    val idx = Ann.buildIndex(spark, sf)
    val frame = spark.read.parquet(idx.dir)
      .select(col("vec_id"), col("cell"), col("vec"), col("soft_cells"))
    assert(frame.columns.contains("soft_cells"))
    val width = math.min(Ann.SoftIndexWidth, idx.cents.length)
    for (probes <- Seq(1, 3, width)) {
      val stored = DedupOps.softAssign(frame, idx.cents, probes)
        .select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val live = DedupOps.softAssign(frame.drop("soft_cells"), idx.cents,
          probes)
        .select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(stored === live, s"probes=$probes")
      // element 1 of the stored soft cells IS the primary assignment
      if (probes == 1)
        assert(stored ===
          frame.select("vec_id", "cell").collect()
            .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq)
    }
  }

  test("dedup_embedding_cosine routes oversized label blocks instead of throwing") {
    def run(): Map[(Long, Long), (Int, Double)] =
      DedupOps.queries("dedup_embedding_cosine")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getInt(2), r.getDouble(3))).toMap
    // truth: under the default cap (20k) no sf0.001 block is hot — the
    // historical exact all-pairs kernel, which the DuckDB oracle gates
    val truth = run()
    assert(truth.nonEmpty)
    // cap below the two largest label blocks (63 and 56 rows here):
    // labels 9 and 0 must ROUTE through the k-means cells; the other
    // eight stay on the exact path. Pre-routing this configuration
    // THREW (requireBoundedBlocks) — completing at all is the fix.
    spark.conf.set("spark.graft.dedup.maxCosineBlockRows", "55")
    try {
      val routed = run()
      val hotLabels = Set(0, 9)
      def split(m: Map[(Long, Long), (Int, Double)], hot: Boolean) =
        m.filter { case (_, (l, _)) => hotLabels.contains(l) == hot }
      // (a) small blocks bit-identical to the unrouted run
      assert(split(routed, hot = false) === split(truth, hot = false))
      // (b) routed blocks: exact precision — every emitted pair is a
      // true ≥0.30 pair with the exact cosine (cells only gate WHICH
      // pairs meet, never the arithmetic)
      val routedHot = split(routed, hot = true)
      val truthHot = split(truth, hot = true)
      routedHot.foreach { case (pair, v) =>
        assert(truthHot.get(pair).contains(v), s"$pair not exact: $v")
      }
      // recall within routed blocks: same soft-assignment coverage
      // contract (and floor) as dedup_semantic on this near-uniform
      // worst-case corpus
      assert(truthHot.nonEmpty)
      val recall = routedHot.size.toDouble / truthHot.size
      info(s"routed-block recall vs exact: $recall " +
        s"(${routedHot.size}/${truthHot.size})")
      assert(recall >= 0.6, s"recall $recall")
    } finally spark.conf.unset("spark.graft.dedup.maxCosineBlockRows")
  }

  test("dedup_embedding_cosine: NULL labels form no block at any size or cap") {
    // the within-label equi-join is null-rejecting on BOTH engines, so
    // unlabeled rows pair with nothing — and must not trip hot-block
    // detection either (a "hot" null block routed through the cells
    // would invent pairs the exact semantics never produces)
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-nulllbl-").toString
    val labeled = (0L to 5L).map(i =>
      (i, Array.fill(4)(1.0f), if (i < 3) Some(1) else Some(2)))
    val unlabeled = (10L to 19L).map(i =>
      (i, Array.fill(4)(1.0f), None: Option[Int]))
    (labeled ++ unlabeled).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    def pairs(): Seq[(Long, Long)] =
      DedupOps.queries("dedup_embedding_cosine")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // labeled blocks pair within themselves only: 2 × C(3,2) = 6 pairs
    val want = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L))
    assert(pairs() === want)
    // cap below the 10-row null block: identical — nothing routes,
    // nothing throws, no pair involves an unlabeled vector
    spark.conf.set("spark.graft.dedup.maxCosineBlockRows", "5")
    try assert(pairs() === want)
    finally spark.conf.unset("spark.graft.dedup.maxCosineBlockRows")
  }

  test("dedup_semantic_incremental == monolithic restricted to the batch") {
    val mono = DedupOps.queries("dedup_semantic")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val inc = DedupOps.queries("dedup_semantic_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // both paths read the same memoized index/centroids, so the
    // incremental fold must reproduce the monolithic decisions EXACTLY
    // for every pair touching the batch — including corpus↔batch pairs
    // found through either orientation of the primary⋈soft join
    val expect = mono.filter { case (a, b, _) => a % 10 == 0 || b % 10 == 0 }
    assert(inc.nonEmpty, "batch formed no pairs — fixture too small")
    assert(inc.toSeq == expect.toSeq)
  }

  test("ann_ivf_topk query plan probes the prebuilt index, no k-means job") {
    val df = Ann.queries("ann_ivf_topk")(spark, sf)
    // the returned plan reads ONLY the cell-partitioned index path — the
    // sampled k-means training and index write happened once, offline
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("graft-ivf-index-"), p)
    assert(!p.contains("embeddings.parquet"), p)
    // and only the probed cells' files feed the probe scan (partition
    // pruning; input_file_name() read before the top-k shuffle)
    val idx = Ann.ivfIndex(spark, sf)
    val probed = idx.probeCells(
      graft.sources.Tables.embeddings(spark, sf)
        .filter(col("vec_id") === 0)
        .select(transform(col("embedding"), x => x.cast("double")))
        .first().getSeq[Double](0), Ann.Nprobe)
    val read = spark.read.parquet(idx.dir)
      .filter(col("cell").isin(probed: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(read.nonEmpty)
    assert(read.forall(f => probed.exists(c => f.contains(s"cell=$c"))),
      s"probed=$probed files=${read.mkString(",")}")
  }

  test("in-memory k-means training tracks the distributed twin") {
    import graft.sources.Tables
    val base = Tables.embeddings(spark, sf).select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    val dist = Ann.kmeans(base, k = 5, iters = 3)
    val local = Ann.kmeansLocal(
      base.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)),
      k = 5, iters = 3)
    // both are deterministic on fixed data; they differ only by the
    // distributed trainer's round(x,6)-then-decimal summation, so the
    // centroids must agree to well under any cell boundary
    assert(dist.length === local.length)
    dist.zip(local).foreach { case (dc, lc) =>
      dc.zip(lc).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-5, s"$a vs $b")
      }
    }
  }

  test("IVF at-rest layout: cell-partitioned index prunes probe reads") {
    import graft.sources.Tables
    val base = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("ev"))
    val cents = Ann.kmeans(
      base.select(col("vec_id").as("id"), col("ev").as("vec")), k = 10, iters = 2)
    val indexed = base.withColumn("cell", Ann.cellOf(col("ev"), cents))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    indexed.write.mode("overwrite").partitionBy("cell").parquet(dir)
    // probing 3 cells must read only those cells' files (partition pruning)
    val probed = spark.read.parquet(dir).filter(col("cell").isin(0, 1, 2))
    val files = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("cell=0") || f.contains("cell=1") ||
      f.contains("cell=2")), files.mkString("\n"))
    // and the index is complete: every vector is in exactly one cell
    assert(spark.read.parquet(dir).count() === base.count())
  }

  test("int8-quantized cosine: recall@20 >= 0.9, sim error <= 0.02, 4x smaller") {
    import graft.sources.Tables
    val quant = SimilarityOps.queries("sim_quantized_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val exact = SimilarityOps.queries("sim_cosine_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val recall = (quant.keySet intersect exact.keySet).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@20 = $recall")
    // rounding error bound on the overlapping hits
    (quant.keySet intersect exact.keySet).foreach { id =>
      assert(math.abs(quant(id) - exact(id)) <= 0.02,
        s"vec $id: quant=${quant(id)} exact=${exact(id)}")
    }
    // the storage claim: int8 codes round-trip through parquet at ~1/4
    // the float32 footprint
    val v = Tables.embeddings(spark, sf)
      .withColumn("ev", transform(col("embedding"), x => x.cast("double")))
      .select(col("vec_id"),
        SimilarityOps.quantizeInt8(col("ev")).as("q8"),
        SimilarityOps.int8Scale(col("ev")).as("scale"))
    val d8 = java.nio.file.Files.createTempDirectory("graft-q8").toString
    val d32 = java.nio.file.Files.createTempDirectory("graft-f32").toString
    v.write.mode("overwrite").parquet(d8)
    Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(d32)
    def bytes(p: String) = graft.operators.Cdc.fileMetrics(spark, p)
      .agg(sum(col("bytes"))).collect()(0).getLong(0)
    assert(bytes(d8) < bytes(d32) / 2, s"q8=${bytes(d8)} f32=${bytes(d32)}")
  }

  test("minhash LSH finds every pair that exact ngram-Jaccard>=0.8 finds") {
    // LSH candidates are verified with exact Jaccard, so precision is exact
    // by construction; this checks recall against the all-pairs truth.
    val lsh = DedupOps.queries("dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    import graft.functions.TextFeatures._
    import graft.sources.Tables
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), charShingles(col("text"), 5).as("sh"))
    val a = sets.toDF("doc_a", "sha")
    val b = sets.toDF("doc_b", "shb")
    val truth = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .filter(round(jaccard(col("sha"), col("shb")), 4) >= 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test corpus should contain near-duplicate pairs")
    assert(lsh == truth, s"missed=${truth -- lsh} extra=${lsh -- truth}")
  }

  test("simhash: identical docs share signatures; banding finds dup pairs") {
    val out = DedupOps.queries("dedup_simhash")(spark, sf)
    // exact duplicates (same text) have Hamming distance 0 and must appear
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf)
    val exactDupPairs = docs.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .toDF("doc_a", "h")
      .join(docs.select(col("doc_id").as("doc_b"), sha2(col("text"), 256).as("h")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = out.filter(col("hamming") === 0)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactDupPairs.subsetOf(found),
      s"missing exact dups: ${exactDupPairs -- found}")
  }
}
