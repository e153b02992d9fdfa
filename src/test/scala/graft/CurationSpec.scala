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
}
