package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, DedupOps}

/** Cross-query invariants for the curation operators — properties the
  * per-query DuckDB oracle cannot see because they relate DIFFERENT
  * queries' outputs (conservation across packing bins, sample-rate
  * consistency, dedup-apply vs dedup_clusters agreement).
  */
class CurationSpec extends SparkSpec {

  test("pack_sequences conserves docs and tokens per stream, bins start at 0") {
    val bins = CurationOps.queries("curate_pack_sequences")(spark, sf)
      .localCheckpoint(true)
    val perStream = bins.groupBy(col("lang"), col("source"))
      .agg(sum(col("n_docs")).as("d"), sum(col("bin_tokens")).as("t"),
        min(col("bin")).as("b0"))
    // every stream's first bin is 0 (cum-before of the first doc is 0)
    assert(perStream.filter(col("b0") =!= 0).count() === 0)
    // conservation: packed totals equal the raw corpus totals per stream
    val raw = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("rd"),
        sum(size(split(col("text"), " "))).as("rt"))
    val joined = perStream.join(raw, Seq("lang", "source"), "full_outer")
    assert(joined.filter(
      col("d") =!= col("rd") || col("t") =!= col("rt") ||
        col("d").isNull || col("rd").isNull).count() === 0)
  }

  test("epoch_shuffle is a seeded permutation: every doc once, dense " +
      "positions, epochs re-permute") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val n = docs.count()
    val out = CurationOps.queries("curate_epoch_shuffle")(spark, sf)
      .localCheckpoint(true)
    // a permutation of the corpus: every doc exactly once
    assert(out.count() === n)
    assert(out.select(col("doc_id")).distinct().count() === n)
    // positions are dense 0..cnt-1 within each shard (sum check), and
    // the shard is the key's pmod — the loader contract
    val perShard = out.groupBy(col("shard"))
      .agg(count(lit(1)).as("c"), min(col("pos")).as("lo"),
        max(col("pos")).as("hi"), sum(col("pos")).as("s"))
      .collect()
    assert(perShard.length === CurationOps.EpochShards) // mix spreads: none empty
    perShard.foreach { r =>
      val (c, lo, hi, s) =
        (r.getAs[Long]("c"), r.getAs[Long]("lo"), r.getAs[Long]("hi"),
          r.getAs[Long]("s"))
      assert(lo === 0L && hi === c - 1 && s === c * (c - 1) / 2)
    }
    assert(out.filter(
      pmod(col("ord_key"), lit(CurationOps.EpochShards.toLong))
        =!= col("shard")).count() === 0)
    // ord_key really is mix64(doc_id XOR seed) — one row spot-checked
    // against the JVM kernel the expression delegates to
    val r0 = out.orderBy(col("doc_id")).first()
    assert(r0.getAs[Long]("ord_key") ===
      graft.functions.TextExprs.fmix64(
        r0.getAs[Long]("doc_id") ^
          (CurationOps.EpochSeedBase * CurationOps.Epoch)))
    // a different epoch re-permutes: same doc set, different order
    val other = CurationOps.epochShuffle(docs,
      CurationOps.EpochSeedBase * (CurationOps.Epoch + 1),
      CurationOps.EpochShards, 8)
    val moved = out.select(col("doc_id"), col("shard"), col("pos"))
      .except(other.select(col("doc_id"), col("shard"), col("pos")))
      .count()
    assert(moved > n / 2, s"epoch change moved only $moved of $n docs")
  }

  test("epoch_batches conserves the corpus and cuts contiguous batches " +
      "per shard, consistent with epoch_shuffle's shards") {
    val out = CurationOps.queries("curate_epoch_batches")(spark, sf)
      .localCheckpoint(true)
    // conservation: every doc and every token lands in exactly one batch
    val docs = graft.sources.Tables.documents(spark, sf)
    val totals = docs.agg(count(lit(1)),
      sum(size(split(col("text"), " ")).cast("long"))).first()
    val got = out.agg(sum(col("n_docs")), sum(col("batch_tokens"))).first()
    assert(got.getLong(0) === totals.getLong(0))
    assert(got.getLong(1) === totals.getLong(1))
    // every shard starts at batch 0, and no batch index exceeds the
    // cumulative-token bound (index b needs some doc with cum-before ≥
    // b·budget, so b ≤ (shard_tokens − 1) / budget). Indexes CAN skip:
    // a single doc longer than the budget jumps the cumulative count —
    // so contiguity is deliberately not asserted.
    val perShard = out.groupBy(col("shard"))
      .agg(min(col("batch")).as("lo"), max(col("batch")).as("hi"),
        sum(col("batch_tokens")).as("t"))
      .collect()
    perShard.foreach { r =>
      assert(r.getAs[Long]("lo") === 0L)
      assert(r.getAs[Long]("hi") <=
        (r.getAs[Long]("t") - 1) / CurationOps.PackBudget)
    }
    // per-shard doc counts agree with the shuffle manifest
    val fromShuffle = CurationOps.queries("curate_epoch_shuffle")(spark, sf)
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
    val fromBatches = out.groupBy(col("shard"))
      .agg(sum(col("n_docs")).as("n"))
    assert(fromShuffle.except(fromBatches).count() === 0)
    assert(fromBatches.except(fromShuffle).count() === 0)
  }

  test("epoch_batches drops null-text docs instead of NPEing in the " +
      "cumsum weight pass") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, null.asInstanceOf[String]), (3L, "d e")
    ).toDF("doc_id", "text")
    val out = CurationOps.epochBatches(docs, seed = 7L, shards = 2,
      numPartitions = 2).collect()
    // the two non-null docs' 5 tokens all land; the null doc vanishes
    // (the corpus convention — docSets drops null text too)
    assert(out.map(_.getAs[Long]("n_docs")).sum === 2L)
    assert(out.map(_.getAs[Long]("batch_tokens")).sum === 5L)
  }

  test("dedup_weighted: every doc weighted, each cluster's mass sums to 1") {
    val out = CurationOps.queries("curate_dedup_weighted")(spark, sf)
      .localCheckpoint(true)
    val corpus = graft.sources.Tables.documents(spark, sf).count()
    assert(out.count() === corpus, "soft dedup must keep every doc")
    // frequency preservation: Σ 1/|c| over a cluster's members == 1
    // (within the published round-6 precision × cluster size)
    val bad = out.groupBy(col("cluster_id"))
      .agg(sum(col("weight")).as("w"))
      .filter(abs(col("w") - 1.0) > 1e-4)
    assert(bad.count() === 0, bad.collect().mkString(", "))
    // and the hard-drop twin agrees on what a representative is: weight
    // 1 exactly for docs outside any pair cluster
    val singles = out.filter(col("cluster_size") === 1)
      .filter(col("weight") =!= 1.0)
    assert(singles.count() === 0)
  }

  test("pipeline_report: monotone funnel anchored to the standalone stages") {
    val rep = CurationOps.queries("curate_pipeline_report")(spark, sf)
      .collect().sortBy(_.getAs[Int]("stage"))
    assert(rep.map(_.getAs[String]("stage_name")).toSeq ===
      Seq("raw", "quality", "dedup", "decontaminated"))
    // cumulative stages can only shrink
    rep.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_docs") <= a.getAs[Long]("n_docs"))
      assert(b.getAs[Long]("n_tokens") <= a.getAs[Long]("n_tokens"))
    }
    // raw == the corpus
    val docs = graft.sources.Tables.documents(spark, sf)
    val totals = docs.agg(count(lit(1)),
      sum(size(split(col("text"), " ")).cast("long"))).first()
    assert(rep(0).getAs[Long]("n_docs") === totals.getLong(0))
    assert(rep(0).getAs[Long]("n_tokens") === totals.getLong(1))
    // the quality stage is EXACTLY what curate_quality_filter reports
    val qKept = CurationOps.queries("curate_quality_filter")(spark, sf)
      .agg(sum(col("n_kept"))).first().getLong(0)
    assert(rep(1).getAs[Long]("n_docs") === qKept)
  }

  test("stratified sample keeps exactly the mod-class rows per lang") {
    val out = CurationOps.queries("curate_stratified_sample")(spark, sf)
    val kept = out.agg(sum(col("n_docs"))).first().getLong(0)
    val expected = graft.sources.Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(100)) <
        when(col("lang") === "en", 25).otherwise(100))
      .count()
    assert(kept === expected)
    // non-sampled langs survive in full
    val full = out.groupBy(col("lang")).agg(sum(col("n_docs")).as("n"))
      .filter(col("lang") =!= "en")
    val raw = graft.sources.Tables.documents(spark, sf)
      .filter(col("lang") =!= "en")
      .groupBy(col("lang")).agg(count(lit(1)).as("rn"))
    assert(full.join(raw, "lang").filter(col("n") =!= col("rn")).count() === 0)
  }

  test("dedup_apply drop count equals dedup_clusters non-representatives") {
    val applied = CurationOps.queries("curate_dedup_apply")(spark, sf)
      .agg(sum(col("n_docs") - col("n_kept"))).first().getLong(0)
    val nonRep = DedupOps.queries("dedup_clusters")(spark, sf)
      .filter(!col("keep")).count()
    assert(applied === nonRep)
  }

  test("split_by_cluster: no near-dup cluster straddles splits; doc-id split does") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"))
    val lbl = DedupOps.queries("dedup_clusters")(spark, sf)
      .select(col("doc_id"), col("cluster_id"))
    val assigned = docs.join(lbl, Seq("doc_id"), "left_outer")
      .withColumn("cid", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("by_cluster", pmod(col("cid"), lit(10)))
      .withColumn("by_doc", pmod(col("doc_id"), lit(10)))
      .localCheckpoint(true)
    // the leakage property: a cluster's members all share a split class
    val straddleCluster = assigned.groupBy(col("cid"))
      .agg(countDistinct(col("by_cluster")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddleCluster === 0)
    // ...and the naive doc-id split is NOT leakage-safe on this corpus:
    // at least one multi-doc cluster spans two doc-id split classes, so
    // the operator differs from curate_split for a real reason
    val straddleDoc = assigned.groupBy(col("cid"))
      .agg(countDistinct(col("by_doc")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddleDoc > 0)
    // conservation: the registered query partitions the whole corpus
    val out = CurationOps.queries("curate_split_by_cluster")(spark, sf)
      .agg(sum(col("n_docs"))).first().getLong(0)
    assert(out === docs.count())
  }

  test("quality_filter keeps at most the above-median half per lang") {
    val out = CurationOps.queries("curate_quality_filter")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val k = r.getAs[Long]("n_kept")
      assert(k >= 0 && k < n, // median threshold must drop SOMETHING
        s"lang ${r.getAs[String]("lang")}: kept $k of $n")
      assert(r.getAs[Double]("med_chars") > 0.0)
    }
    // the filter is non-degenerate on this corpus: some lang keeps docs
    assert(out.exists(_.getAs[Long]("n_kept") > 0))
  }

  test("corpus_mix rates are in (0,1] and head lang is downsampled") {
    val mix = CurationOps.queries("curate_corpus_mix")(spark, sf).collect()
    assert(mix.forall { r =>
      val rate = r.getAs[Double]("sample_rate")
      rate > 0.0 && rate <= 1.0
    })
    // 'en' carries ~45% of docs in the synthetic mix → below-1 rate
    val en = mix.find(_.getAs[String]("lang") == "en").get
    assert(en.getAs[Double]("sample_rate") < 1.0)
  }

  test("chunking covers every token: gapless spans, exact chunk counts") {
    // derived from (chunk_idx, n_tokens): start = 1 + 48·idx,
    // end = start + n_tokens − 1. The windows must tile each document —
    // first chunk at token 1, last chunk ending exactly at |tokens|,
    // every non-last chunk long enough (≥ 49) that stride 48 leaves no
    // gap — and the chunk count must be the closed form of the start
    // sequence, ⌊(max(n,1)−1)/48⌋ + 1.
    val chunks = CurationOps.queries("curate_chunk_documents")(spark, sf)
      .withColumn("start", lit(1) + lit(48) * col("chunk_idx"))
      .withColumn("end", col("start") + col("n_tokens") - 1)
      .localCheckpoint(true)
    val perDoc = chunks.groupBy(col("doc_id"))
      .agg(min(col("chunk_idx")).as("first_idx"), max(col("end")).as("last_end"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("n_tokens") < 49, 1L).otherwise(0L)).as("n_short"),
        max(when(col("n_tokens") < 49, col("chunk_idx"))).as("short_idx"),
        max(col("chunk_idx")).as("max_idx"))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val bad = perDoc.join(docs, "doc_id").filter(
      col("first_idx") =!= 0 ||
        col("last_end") =!= col("n") ||
        col("n_chunks") =!= col("max_idx") + 1 ||
        col("n_chunks") =!=
          floor((greatest(col("n"), lit(1)) - 1) / 48) + 1 ||
        // only the LAST chunk may be shorter than the gapless minimum
        (col("n_short") > 0 &&
          (col("n_short") > 1 || col("short_idx") =!= col("max_idx"))))
    assert(bad.count() === 0, bad.collect().take(3).mkString("; "))
    // every document is chunked
    assert(chunks.select(col("doc_id")).distinct().count() === docs.count())
  }
}
