package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Empty-corpus robustness: at 100 TB, empty tables and empty partitions
  * are routine (a new tenant, a filtered shard, a fresh day). Every
  * document-family query must return an empty result — not throw — and
  * the one operator that genuinely cannot run without data (IVF training)
  * must fail with its named, actionable error.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Seq("documents", "embeddings", "events").foreach { t =>
      Tables.table(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("sketch rollup returns empty (incl. the __all__ row) on empty events") {
    val rows = SparkEntry.queries("cdc_distinct_users_sketch")(spark, emptyDir)
      .collect()
    assert(rows.isEmpty, s"got ${rows.length} rows on empty events")
  }

  test("document/dedup/curation queries return empty on an empty corpus") {
    val names = Seq(
      "text_stats", "text_normalize", "text_quality_score",
      "text_pii_scrub",
      "text_repetition", "text_entropy", "dedup_exact",
      "dedup_ngram_jaccard", "dedup_simhash", "dedup_clusters",
      "dedup_minhash_lsh", "dedup_minhash_lsh_gate",
      "dedup_clusters_star",
      "dedup_contamination", "dedup_contamination_bloom",
      "dedup_incremental",
      "curate_corpus_mix", "curate_stratified_sample", "curate_split",
      "curate_split_by_cluster",
      "curate_pack_sequences", "curate_quality_filter",
      "curate_dedup_apply", "curate_temperature_sample",
      "curate_source_quality", "curate_chunk_documents",
      "curate_epoch_shuffle", "curate_epoch_batches",
      "text_heavy_hitters", "text_bm25_top", "text_lm_perplexity",
      "dedup_span_coverage", "dedup_span_excise",
      "sim_vector_norms", "sim_outlier_docs", "dedup_embedding_cosine",
      "sim_pq_topk", "sim_pq_topk_gate",
      "dedup_source_overlap_sketch", "dedup_source_overlap_sketch_gate",
      // events-family: per-row/per-group outputs must vanish with the
      // input (global aggregates like cdc_funnel legitimately keep their
      // one zero-row and are excluded)
      "asof_last_click", "asof_next_purchase", "sessionize",
      "cdc_value_quantile_sketch",
      // the two-phase groupRanks registrations and the round-4 additions
      "cdc_value_quartiles", "cdc_value_percentiles",
      "cdc_unpivot_stats", "cdc_user_trailing_1h",
      "cdc_value_histogram", "cdc_value_corr")
    names.foreach { n =>
      val rows = SparkEntry.queries(n)(spark, emptyDir).collect()
      assert(rows.isEmpty, s"$n returned ${rows.length} rows on empty input")
    }
  }

  test("LM pruning modes return empty on an empty corpus too") {
    // the pruned branch has its own plan (token-frequency pass + vocab
    // joins) — empty-input robustness must hold there as well, for both
    // the floor and the cap
    Seq("spark.graft.text.lmMinCount" -> "2",
        "spark.graft.text.lmTopK" -> "100").foreach { case (k, v) =>
      spark.conf.set(k, v)
      try {
        val rows =
          SparkEntry.queries("text_lm_perplexity")(spark, emptyDir).collect()
        assert(rows.isEmpty, s"$k=$v returned ${rows.length} rows")
      } finally spark.conf.unset(k)
    }
  }

  test("IVF training on an empty corpus fails with its named error") {
    val e = intercept[Exception] {
      SparkEntry.queries("ann_ivf_topk")(spark, emptyDir).collect()
    }
    assert(e.getMessage.contains("non-empty"),
      s"expected the named training-sample error, got: ${e.getMessage}")
  }
}
