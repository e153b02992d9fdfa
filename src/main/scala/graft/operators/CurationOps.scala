package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Training-corpus curation — the planning/apply operators a large-scale
  * data pipeline runs AFTER per-document analysis ([[TextOps]]) and
  * near-dup detection ([[DedupOps]]): decide a source mixture, sample
  * deterministically toward it, pack documents into fixed token budgets,
  * and apply dedup keep/drop decisions to the corpus.
  *
  * Scale design (100 TB):
  *  - Mixture planning is pure aggregation: one groupBy(lang) pass emits
  *    |langs| rows; the corpus-total join is a 1-row broadcast. Nothing
  *    data-sized ever reaches the driver.
  *  - Sampling is a deterministic FILTER (doc_id mod 100 vs a per-lang
  *    rate), not Bernoulli `sample()`: re-execution of a task keeps
  *    exactly the same rows (exactly-once sinks, reproducible corpora),
  *    and the predicate is codegen'd straight onto the scan. The rate
  *    table is a handful of rows — broadcast by size, not by hint.
  *  - Packing assigns each doc a bin = floor(cumulative-tokens-before /
  *    budget) within a (lang, source) stream — one window over the
  *    stream key. The partition key is the STREAM, never the whole
  *    corpus: a global pack order would funnel 100 TB through one task
  *    (the [[ScaleWindows]] two-phase rank exists for when even a stream
  *    outgrows a task).
  *  - Dedup-apply is a broadcast-sized join only at test scale; the pair
  *    table it consumes is the one [[DedupOps]] materializes once per
  *    session, and the join key is (doc_id) — longs, never text.
  */
object CurationOps {
  type Q = (SparkSession, String) => DataFrame

  /** Token budget per packed sequence (the context-window stand-in). */
  val PackBudget = 512

  /** Percent of docs kept per lang by the deterministic sampler; langs
    * absent from the map keep 100%. The 25% English rate mirrors the
    * usual "downsample the head language toward the target mixture" move.
    */
  val SampleRatePct: Map[String, Int] = Map("en" -> 25)

  private def nTokens = size(split(col("text"), " "))

  /** Epoch-shuffle geometry: the shard count must divide 2^64 (a power
    * of two) so the unsigned `h % shards` the oracle computes equals the
    * signed `pmod` the engine computes — any other modulus would make
    * the two differ on keys with the sign bit set.
    */
  val EpochShards = 8

  /** Weyl/golden-ratio odd multiplier: seed(epoch) = epoch · φ64 wraps
    * to a well-spread odd-multiple sequence, the standard seeded-stream
    * construction.
    */
  val EpochSeedBase = 0x9e3779b97f4a7c15L

  /** The epoch the registered query materializes (any value works; the
    * spec re-runs with other epochs to pin that the order re-permutes).
    */
  val Epoch = 3

  /** Deterministic epoch shuffle — the training-order operator: every
    * document gets a pseudorandom but REPRODUCIBLE position
    * (mix64(doc_id XOR seed(epoch))) and a shard (key mod
    * [[EpochShards]]), so a data loader can read shard s in `pos` order
    * and see a uniformly shuffled corpus that is a pure function of
    * (corpus, epoch) — identical across runs, engines, and task
    * re-execution, re-permuted every epoch. This is the distributed
    * replacement for "shuffle the dataset each epoch": no RNG state, no
    * global sort of text — the ORDER travels as an 8-byte key.
    *
    * Scale shape: shard is a LOW-cardinality key, so position-within-
    * shard is the [[ScaleWindows.groupRanks]] two-phase plan (each shard
    * spans many partitions; a window over 8 shards would funnel the
    * corpus through 8 reducers — the exact skew wall the EventOps
    * cardinality ledger documents). Emitting (shard, pos, doc_id) keeps
    * the result a slim manifest; the loader joins it back to the corpus
    * by doc_id or the writer bucket-sorts the full rows by (shard, pos).
    */
  /** The seeded key+shard projection both epoch queries start from:
    * ord_key = mix64(doc_id XOR seed), shard = ord_key pmod shards.
    * Row-local — the shuffle order travels as an 8-byte key.
    */
  private def epochKeys(docs: DataFrame, seed: Long,
      shards: Int): DataFrame = {
    require(shards > 0 && (shards & (shards - 1)) == 0,
      s"epoch shard count must be a power of two, got $shards")
    docs.withColumn("ord_key",
        graft.functions.LayoutExprs.mix64(
          col("doc_id").bitwiseXOR(lit(seed))))
      .withColumn("shard", pmod(col("ord_key"), lit(shards.toLong)))
  }

  private[graft] def epochShuffle(docs: DataFrame, seed: Long,
      shards: Int, numPartitions: Int): DataFrame = {
    val keyed = epochKeys(docs.select(col("doc_id")), seed, shards)
    ScaleWindows.groupRanks(keyed, group = Seq("shard"),
      order = Seq("ord_key", "doc_id"), numPartitions = numPartitions)
      .select(col("shard"), col("__pos").as("pos"), col("doc_id"),
        col("ord_key"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Token-budgeted micro-batches over the epoch-shuffled order — the
    * data-loader contract one level up from [[epochShuffle]]: within
    * each shard, walk the shuffled order and cut a new batch every
    * [[PackBudget]] tokens (batch = cumulative-tokens-before div
    * budget, the same greedy rule `curate_pack_sequences` applies per
    * (lang, source) stream). The plan is [[ScaleWindows.groupCumsum]] —
    * the two-phase running total, here over the 8-shard key where a
    * window cumsum would funnel the corpus through 8 reducers. Output
    * is the batch manifest (shard, batch, docs, tokens): what a trainer
    * needs to schedule reproducible token-budgeted steps.
    */
  private[graft] def epochBatches(docs: DataFrame, seed: Long,
      shards: Int, numPartitions: Int): DataFrame = {
    // null text → DROP the doc (the corpus convention — see
    // DedupOps.docSets): a null token count would otherwise NPE inside
    // groupCumsum's weight pass, and a trainer has nothing to schedule
    // for a text-less row anyway
    val keyed = epochKeys(
      docs.filter(col("text").isNotNull)
        .select(col("doc_id"), nTokens.cast("long").as("nt")),
      seed, shards)
    ScaleWindows.groupCumsum(keyed, group = Seq("shard"),
      order = Seq("ord_key", "doc_id"), valueCol = "nt",
      numPartitions = numPartitions)
      .withColumn("batch",
        floor(col("__cum_before") / lit(PackBudget.toDouble)))
      .groupBy(col("shard"), col("batch"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("batch_tokens"))
      .orderBy(col("shard"), col("batch"))
  }

  val queries: Map[String, Q] = Map(
    // Mixture planning: per-lang doc/token counts and the sampling rate
    // that would level every lang to a uniform 1/|langs| token share.
    // rate = min(1, target_tokens / lang_tokens); the corpus total is a
    // 1-row broadcast, so the plan is scan → partial agg → 5-row join.
    "curate_corpus_mix" -> ((s, d) => {
      val per = documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("n_tokens"))
      val tot = per.agg(sum(col("n_tokens")).as("t"),
        count(lit(1)).as("n_langs"))
      per.crossJoin(broadcast(tot))
        .withColumn("sample_rate", round(
          least(lit(1.0),
            (col("t") / col("n_langs")) / col("n_tokens")), 4))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          col("sample_rate"))
        .orderBy(col("lang"))
    }),

    // Deterministic stratified sampling: keep doc iff
    // doc_id mod 100 < rate(lang). Same rows on every run and every
    // re-executed task — reproducibility a rand()-based sampler cannot
    // give. Reports the surviving per-(lang, source) doc/token counts.
    "curate_stratified_sample" -> ((s, d) => {
      val rate = SampleRatePct.foldLeft(lit(100)) { case (acc, (l, p)) =>
        when(col("lang") === l, p).otherwise(acc)
      }
      documents(s, d)
        .filter(pmod(col("doc_id"), lit(100)) < rate)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("n_tokens"))
        .orderBy(col("lang"), col("source"))
    }),

    // Temperature-weighted language sampling (Conneau/Lample XLM;
    // Arivazhagan et al. massively-multilingual NMT): resample languages
    // toward q_l ∝ p_l^α (α = 0.5, i.e. T = 2 — α chosen so pow() is
    // sqrt, which IEEE rounds identically in every engine), flattening
    // the head without uniformizing. rate_l = min(1, q_l·T_total/n_l),
    // applied as the same deterministic doc_id-mod filter the stratified
    // sampler uses (reproducible; codegen'd onto the scan). The rate
    // table is |langs| rows — broadcast by construction. Reports the
    // plan AND the applied per-lang keep counts.
    "curate_temperature_sample" -> ((s, d) => {
      val per = documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("n_tokens"))
      val tot = per.agg(sum(col("n_tokens")).as("t"))
      val w = per.crossJoin(broadcast(tot))
        .withColumn("wgt",
          pow(col("n_tokens").cast("double") / col("t"), lit(0.5)))
      val sw = w.agg(sum(col("wgt")).as("sw"))
      val r = w.crossJoin(broadcast(sw))
        .withColumn("q", round(col("wgt") / col("sw"), 6))
        // pre-rounded integer keep threshold: the FILTER compares
        // integers on both engines, so a last-ulp pow/sum divergence
        // can only matter if rate·100 lands within an ulp of an exact
        // .5 boundary — and even then the divergence is LOUD (keep_mod
        // is an emitted, compared column), never a silent membership
        // flip. sqrt keeps pow exact; the 5-term sum(wgt) is the one
        // residual engine-order difference
        .withColumn("keep_mod",
          round(least(lit(1.0),
            col("wgt") / col("sw") * col("t") / col("n_tokens")) * 100, 0)
            .cast("long"))
      val kept = documents(s, d).select(col("lang"), col("doc_id"))
        .join(broadcast(r.select(col("lang"), col("keep_mod"))), "lang")
        .filter(pmod(col("doc_id"), lit(100)) < col("keep_mod"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      r.select(col("lang"), col("n_docs"), col("n_tokens"), col("q"),
          col("keep_mod"))
        .join(kept, "lang")
        .orderBy(col("lang"))
    }),

    // Sequence packing: within each (lang, source) stream ordered by
    // doc_id, a doc joins bin floor(tokens-before-it / budget) — the
    // streaming-concatenation layout (docs are chunked across a bin
    // boundary at training time; bin identity is what matters here).
    // Reports per-bin doc and token counts. The window form is right
    // while each stream fits a task; when a stream outgrows one,
    // [[ScaleWindows.groupCumsum]] computes the identical cum-before
    // with every stream spread across many partitions (spec-equal in
    // ScaleSpec).
    "curate_pack_sequences" -> ((s, d) => {
      val stream = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      documents(s, d)
        .select(col("lang"), col("source"), col("doc_id"),
          nTokens.as("nt"))
        .withColumn("bin",
          floor(coalesce(sum(col("nt")).over(stream), lit(0L)) /
            lit(PackBudget.toDouble)))
        .groupBy(col("lang"), col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("bin_tokens"))
        .orderBy(col("lang"), col("source"), col("bin"))
    }),

    // Deterministic train/val/test split: doc_id mod 10 → 8/1/1. The
    // modulus (not a Bernoulli sample) makes the split a pure function
    // of the stable key — reproducible across runs, engines, and task
    // re-execution; a production pipeline salts a hash of the same key.
    // Reports per-split doc/token/lang coverage.
    "curate_split" -> ((s, d) => {
      documents(s, d)
        .withColumn("split",
          when(pmod(col("doc_id"), lit(10)) < 8, "train")
            .when(pmod(col("doc_id"), lit(10)) === 8, "val")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("split"))
    }),

    // Leakage-safe split: the plain curate_split assigns by doc_id mod
    // 10, so two near-duplicate documents can land one in train and one
    // in test — the classic eval-contamination bug. Splitting on the
    // CLUSTER id (min reachable doc id from the dedup clustering;
    // singletons are their own cluster) puts every member of a near-dup
    // cluster in the SAME split by construction. Consumes the
    // session-materialized cluster labels from [[DedupOps]]; the label
    // table is |docs in a cluster| rows — broadcast-sized whenever the
    // dup fraction is small, and a plain long-key equi-join otherwise.
    // CurationSpec pins the zero-straddle property itself.
    "curate_split_by_cluster" -> ((s, d) => {
      val lbl = DedupOps.ngramClusterLabels(s, d)
        .select(col("id").as("doc_id"), col("lbl"))
      documents(s, d)
        .select(col("doc_id"), nTokens.as("nt"))
        .join(lbl, Seq("doc_id"), "left_outer")
        .withColumn("cluster_id", coalesce(col("lbl"), col("doc_id")))
        .withColumn("split",
          when(pmod(col("cluster_id"), lit(10)) < 8, "train")
            .when(pmod(col("cluster_id"), lit(10)) === 8, "val")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          sum(col("nt")).as("n_tokens"))
        .orderBy(col("split"))
    }),

    // Quantile-thresholded quality filter: keep a doc iff it passes the
    // static quality gate (text_quality_score's keep rule) AND its length
    // clears the per-lang exact median — the adaptive-threshold curation
    // move (absolute thresholds misfire across languages with different
    // length distributions). The per-lang medians are |langs| rows —
    // bounded by the language vocabulary, not the data — so the join is
    // a broadcast by construction. Exact percentile buffers each group's
    // values (fine for the oracle gate); the 100 TB path swaps in
    // approx_percentile exactly as cdc_value_percentiles_approx does.
    "curate_quality_filter" -> ((s, d) => {
      // the gate is TextOps.qualityGate — the same definition
      // text_quality_score scores with, so scorer and filter cannot drift
      val scored = TextOps.qualityGate(documents(s, d))
      val med = scored.groupBy(col("lang"))
        .agg(percentile(col("n_chars"), lit(0.5)).as("med_chars"))
      scored.join(broadcast(med), "lang")
        .withColumn("kept", col("q_keep") && col("n_chars") >= col("med_chars"))
        .groupBy(col("lang"), col("med_chars"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .select(col("lang"), col("med_chars"), col("n_docs"), col("n_kept"))
        .orderBy(col("lang"))
    }),

    // Apply the dedup decision: every document outside a near-dup
    // cluster survives; inside a cluster only the representative
    // (doc_id == cluster_id) does. Reports per-lang corpus shrinkage.
    // Consumes the session-materialized pair table from [[DedupOps]].
    "curate_dedup_apply" -> ((s, d) => {
      val keep = DedupOps.ngramClusterLabels(s, d)
        .select(col("id").as("doc_id"),
          (col("id") === col("lbl")).as("keep"))
      documents(s, d)
        .select(col("doc_id"), col("lang"), nTokens.as("nt"))
        .join(keep, Seq("doc_id"), "left_outer")
        .withColumn("kept", coalesce(col("keep"), lit(true)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("nt")).as("n_tokens"),
          sum(when(col("kept"), col("nt")).otherwise(0L)).as("kept_tokens"))
        .orderBy(col("lang"))
    }),

    // Soft dedup — down-weight, don't drop: every document survives, but
    // the members of a near-dup cluster share one document's worth of
    // sampling mass (weight = 1/|cluster|; singletons weigh 1). The
    // alternative to curate_dedup_apply's hard drop when the trainer
    // wants frequency-preserving sampling rather than a smaller corpus.
    // Cluster sizes are counted over the FULL corpus (labels cover only
    // docs that appear in a pair; everyone else is their own cluster).
    "curate_dedup_weighted" -> ((s, d) => {
      val labels = DedupOps.ngramClusterLabels(s, d)
        .select(col("id").as("doc_id"), col("lbl").as("cid"))
      // feeds the size count AND the final join — materialize once
      val full = documents(s, d).select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left_outer")
        .withColumn("cluster_id", coalesce(col("cid"), col("doc_id")))
        .select(col("doc_id"), col("cluster_id"))
        .localCheckpoint(false)
      val sizes = full.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      full.join(sizes, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          round(lit(1.0) / col("cluster_size"), 6).as("weight"))
        .orderBy(col("doc_id"))
    }),

    // The whole curation funnel in ONE declarative plan — the
    // end-to-end report every pipeline run publishes: raw → quality
    // gate (the curate_quality_filter rule: q_keep + per-lang median
    // length) → near-dup removal (the curate_dedup_apply rule: cluster
    // representatives survive) → benchmark decontamination (the
    // dedup_contamination rule). Stages are CUMULATIVE, and every
    // decision is computed corpus-wide exactly as its standalone query
    // computes it (shared helpers, not re-derivations), so this report
    // can never disagree with the operators it summarizes. One scan
    // carries all four stage masks; the output is 4 manifest rows.
    "curate_pipeline_report" -> ((s, d) => {
      val scored = TextOps.qualityGate(documents(s, d))
      val med = scored.groupBy(col("lang"))
        .agg(percentile(col("n_chars"), lit(0.5)).as("med_chars"))
      val q = scored.join(broadcast(med), "lang")
        .withColumn("q_kept",
          col("q_keep") && col("n_chars") >= col("med_chars"))
        .select(col("doc_id"), nTokens.cast("long").as("nt"), col("q_kept"))
      val rep = DedupOps.ngramClusterLabels(s, d)
        .select(col("id").as("doc_id"), (col("id") === col("lbl")).as("rep"))
      val contam = DedupOps.contaminationHits(s, d)
        .select(col("doc_id")).distinct().withColumn("hit", lit(true))
      val masks = q
        .join(rep, Seq("doc_id"), "left_outer")
        .withColumn("dedup_kept", coalesce(col("rep"), lit(true)))
        .join(contam, Seq("doc_id"), "left_outer")
        .withColumn("clean", col("hit").isNull)
      masks.agg(
          count(lit(1)).as("d0"), sum(col("nt")).as("t0"),
          sum(when(col("q_kept"), 1L).otherwise(0L)).as("d1"),
          sum(when(col("q_kept"), col("nt")).otherwise(0L)).as("t1"),
          sum(when(col("q_kept") && col("dedup_kept"), 1L).otherwise(0L))
            .as("d2"),
          sum(when(col("q_kept") && col("dedup_kept"), col("nt"))
            .otherwise(0L)).as("t2"),
          sum(when(col("q_kept") && col("dedup_kept") && col("clean"), 1L)
            .otherwise(0L)).as("d3"),
          sum(when(col("q_kept") && col("dedup_kept") && col("clean"),
            col("nt")).otherwise(0L)).as("t3"))
        .select(expr(
          """stack(4,
               0, 'raw', d0, t0,
               1, 'quality', d1, t1,
               2, 'dedup', d2, t2,
               3, 'decontaminated', d3, t3)
             AS (stage, stage_name, n_docs, n_tokens)"""))
        .orderBy(col("stage"))
    }),

    // Chunking for embedding/retrieval: overlapping token windows (64
    // tokens, stride 48) per document — the unit every embedding or
    // retrieval index actually stores. Purely row-local (explode of a
    // per-row sequence): zero shuffles at any scale, and what leaves the
    // row is the chunk's md5 fingerprint and token count, never the
    // chunk text. Chunk starts are 1, 1+stride, … ≤ |tokens|, so the
    // trailing window may be short — a fixed, engine-independent rule
    // both sides of the oracle compute identically.
    "curate_chunk_documents" -> ((s, d) => {
      val win = 64
      val stride = 48
      documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"), col("ts"),
          explode(sequence(lit(1), greatest(size(col("ts")), lit(1)),
            lit(stride))).as("start"))
        .select(col("doc_id"),
          ((col("start") - 1) / stride).cast("long").as("chunk_idx"),
          size(slice(col("ts"), col("start"), lit(win))).as("n_tokens"),
          md5(array_join(slice(col("ts"), col("start"), lit(win)), " "))
            .as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Per-source corpus profile: the provenance dashboard every curation
    // run starts from — doc/token volume, language spread, and the
    // quality gate's keep rate by source. One groupBy pass over the
    // scored scan; output is |sources|-bounded. The averaged ratios sum
    // exactly first (integer / decimal — order-independent) and divide
    // once, so the result is bit-deterministic at any parallelism (a
    // double avg() would be merge-order-dependent).
    "curate_source_quality" -> ((s, d) => {
      TextOps.qualityGate(documents(s, d))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(nTokens).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          round(sum(when(col("q_keep"), 1L).otherwise(0L)).cast("double") /
            count(lit(1)), 4).as("keep_rate"),
          round(sum(col("alpha_ratio")
              .cast(org.apache.spark.sql.types.DataTypes
                .createDecimalType(18, 4))).cast("double") /
            count(lit(1)), 4).as("mean_alpha"))
        .orderBy(col("source"))
    }),

    // Seeded deterministic training order + shard assignment — see
    // [[epochShuffle]]. Position-within-shard runs the two-phase
    // groupRanks plan (shard is low-cardinality by construction).
    "curate_epoch_shuffle" -> ((s, d) =>
      epochShuffle(documents(s, d), EpochSeedBase * Epoch, EpochShards,
        EventOps.shufflePartitions(s))),

    // Token-budgeted micro-batch manifest over the shuffled order — see
    // [[epochBatches]]. The registered consumer of the two-phase
    // groupCumsum machinery.
    "curate_epoch_batches" -> ((s, d) =>
      epochBatches(documents(s, d), EpochSeedBase * Epoch, EpochShards,
        EventOps.shufflePartitions(s))),
  )

  /** Shared CTE prefix of both epoch oracles — dedup_simhash's replay
    * device pointed at the shuffle key: the fmix64 avalanche in
    * 32-bit-split HUGEINT arithmetic ([[OracleHash]]), the
    * unsigned→signed reinterpretation for the ORDER BY, and
    * `h % shards` on the UNSIGNED value (equal to the engine's signed
    * pmod because [[EpochShards]] divides 2^64). Ends in
    * `keyed(doc_id, ord_key, shard)`.
    */
  private def epochKeyCtes: String = {
    val seedU = java.lang.Long.toUnsignedString(EpochSeedBase * Epoch)
    s"""WITH __k AS (SELECT doc_id,
           xor(CAST(doc_id AS HUGEINT), $seedU::HUGEINT) AS __x
         FROM documents),
       ${OracleHash.fmixCtes("__k", Seq("doc_id"), "__x", "__h", "h")},
       keyed AS (SELECT doc_id, ${OracleHash.toSigned("h")} AS ord_key,
           CAST(h % $EpochShards AS BIGINT) AS shard FROM __h)"""
  }

  private def epochShuffleOracle: String =
    epochKeyCtes +
      """
       SELECT shard,
         CAST(row_number() OVER (PARTITION BY shard
           ORDER BY ord_key, doc_id) - 1 AS BIGINT) AS pos,
         doc_id, ord_key
       FROM keyed ORDER BY shard, pos"""

  /** Same keys, then the greedy budget cut: cumulative tokens BEFORE
    * each doc in (ord_key, doc_id) order within its shard, batch =
    * floor(before / budget) — the exact rule curate_pack_sequences'
    * oracle applies per stream.
    */
  private def epochBatchesOracle: String =
    epochKeyCtes +
      s""",
       toks AS (SELECT k.doc_id, k.ord_key, k.shard,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nt
         FROM keyed k JOIN documents d USING (doc_id)
         WHERE d.text IS NOT NULL),
       c AS (SELECT shard, nt,
           coalesce(sum(nt) OVER (PARTITION BY shard
             ORDER BY ord_key, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cb
         FROM toks)
       SELECT shard, CAST(floor(cb / $PackBudget.0) AS BIGINT) AS batch,
         count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS batch_tokens
       FROM c GROUP BY shard, batch ORDER BY shard, batch"""

  /** DuckDB twins. Token counts mirror the Spark expression exactly
    * (whitespace split length); sums are CAST to BIGINT because DuckDB
    * sum() returns HUGEINT while Spark emits BIGINT and the driver's
    * hash compare is type-sensitive.
    */
  val oracles: Map[String, String] = Map(
    "curate_corpus_mix" ->
      """WITH per AS (
           SELECT lang, count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY lang),
         tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
                        count(*) AS n_langs FROM per)
         SELECT lang, n_docs, n_tokens,
           round(least(1.0, (CAST(t AS DOUBLE) / n_langs) / n_tokens), 4)
             AS sample_rate
         FROM per, tot ORDER BY lang""",
    "curate_stratified_sample" ->
      """SELECT lang, source, count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         FROM documents
         WHERE doc_id % 100 < (CASE WHEN lang = 'en' THEN 25 ELSE 100 END)
         GROUP BY lang, source ORDER BY lang, source""",
    "curate_temperature_sample" ->
      """WITH per AS (
           SELECT lang, count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY lang),
         tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM per),
         w AS (SELECT lang, n_docs, n_tokens,
             pow(CAST(n_tokens AS DOUBLE) / t, 0.5) AS wgt, t
           FROM per, tot),
         s AS (SELECT sum(wgt) AS sw FROM w),
         r AS (SELECT lang, n_docs, n_tokens,
             round(wgt / sw, 6) AS q,
             CAST(round(least(1.0, wgt / sw * t / n_tokens) * 100, 0)
               AS BIGINT) AS keep_mod
           FROM w, s),
         k AS (SELECT d.lang, count(*) AS n_kept
           FROM documents d JOIN r ON d.lang = r.lang
           WHERE d.doc_id % 100 < r.keep_mod GROUP BY d.lang)
         SELECT r.lang, r.n_docs, r.n_tokens, r.q, r.keep_mod, k.n_kept
         FROM r JOIN k ON r.lang = k.lang ORDER BY r.lang""",
    "curate_pack_sequences" ->
      """WITH d AS (
           SELECT lang, source, doc_id,
             len(string_split(text, ' ')) AS nt
           FROM documents),
         c AS (
           SELECT lang, source, nt,
             coalesce(sum(nt) OVER (
               PARTITION BY lang, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM d)
         SELECT lang, source,
           CAST(floor(cb / 512.0) AS BIGINT) AS bin,
           count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS bin_tokens
         FROM c GROUP BY lang, source, bin
         ORDER BY lang, source, bin""",
    "curate_split" ->
      """SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
                WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         FROM documents GROUP BY 1 ORDER BY 1""",
    "curate_split_by_cluster" ->
      (DedupOps.clusterLabelsCte +
        """
         SELECT CASE WHEN cid % 10 < 8 THEN 'train'
                WHEN cid % 10 = 8 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(count(DISTINCT cid) AS BIGINT) AS n_clusters,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         FROM (SELECT d.doc_id, d.text,
                 coalesce(l.cluster_id, d.doc_id) AS cid
               FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id)
         GROUP BY 1 ORDER BY 1"""),
    "curate_quality_filter" ->
      s"""WITH t AS (
           SELECT lang, n_chars, CAST(length(text) AS INT) AS len,
             ${TextOps.qualityRatioSql}
           FROM documents),
         q AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med_chars
               FROM t GROUP BY lang)
         SELECT t.lang, med_chars, count(*) AS n_docs,
           CAST(sum(CASE WHEN ${TextOps.qualityKeepSql}
             AND n_chars >= med_chars
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM t JOIN q ON t.lang = q.lang
         GROUP BY t.lang, med_chars ORDER BY t.lang""",
    "curate_dedup_apply" ->
      (DedupOps.clusterLabelsCte +
        """,
         docs AS (
           SELECT d.lang, len(string_split(d.text, ' ')) AS nt,
             (d.doc_id = coalesce(l.cluster_id, d.doc_id)) AS kept
           FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT)
             AS kept_tokens
         FROM docs GROUP BY lang ORDER BY lang"""),
    "curate_dedup_weighted" ->
      (DedupOps.clusterLabelsCte +
        """,
         fc AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id)
               AS cluster_id
             FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id),
         sz AS (SELECT cluster_id, count(*) AS cluster_size
                FROM fc GROUP BY cluster_id)
         SELECT f.doc_id, f.cluster_id, s.cluster_size,
           round(1.0 / s.cluster_size, 6) AS weight
         FROM fc f JOIN sz s USING (cluster_id) ORDER BY doc_id"""),
    // composed from the SAME shared fragments the standalone oracles
    // use: the cluster-label CTE, the contamination gram CTEs, and the
    // quality ratio/keep SQL twins
    "curate_pipeline_report" ->
      (DedupOps.clusterLabelsCte +
        s""",
         ${DedupOps.contaminationGramCtes},
         scored AS (SELECT doc_id, lang, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
             CAST(length(text) AS INT) AS len, ${TextOps.qualityRatioSql}
           FROM documents),
         med AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med_chars
                 FROM scored GROUP BY lang),
         q AS (SELECT s.doc_id, s.nt,
             (${TextOps.qualityKeepSql} AND s.n_chars >= m.med_chars)
               AS q_kept
           FROM scored s JOIN med m USING (lang)),
         keepf AS (SELECT d.doc_id,
             (d.doc_id = coalesce(l.cluster_id, d.doc_id)) AS dedup_kept
           FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id),
         contam AS (SELECT DISTINCT doc_id FROM g8
           WHERE doc_id >= 10 AND g IN (SELECT g FROM bench)),
         f AS (SELECT q.doc_id, q.nt, q.q_kept, k.dedup_kept,
             (c.doc_id IS NULL) AS clean
           FROM q JOIN keepf k ON q.doc_id = k.doc_id
           LEFT JOIN contam c ON q.doc_id = c.doc_id),
         a AS (SELECT count(*) AS d0, CAST(sum(nt) AS BIGINT) AS t0,
             CAST(sum(CASE WHEN q_kept THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN q_kept THEN nt ELSE 0 END) AS BIGINT) AS t1,
             CAST(sum(CASE WHEN q_kept AND dedup_kept THEN 1 ELSE 0 END)
               AS BIGINT) AS d2,
             CAST(sum(CASE WHEN q_kept AND dedup_kept THEN nt ELSE 0 END)
               AS BIGINT) AS t2,
             CAST(sum(CASE WHEN q_kept AND dedup_kept AND clean THEN 1
               ELSE 0 END) AS BIGINT) AS d3,
             CAST(sum(CASE WHEN q_kept AND dedup_kept AND clean THEN nt
               ELSE 0 END) AS BIGINT) AS t3
           FROM f)
         SELECT CAST(0 AS INT) AS stage, 'raw' AS stage_name,
             d0 AS n_docs, t0 AS n_tokens FROM a
         UNION ALL SELECT 1, 'quality', d1, t1 FROM a
         UNION ALL SELECT 2, 'dedup', d2, t2 FROM a
         UNION ALL SELECT 3, 'decontaminated', d3, t3 FROM a
         ORDER BY stage"""),
    "curate_chunk_documents" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
                    FROM documents),
         c AS (SELECT doc_id, ts,
                 unnest(generate_series(1, greatest(len(ts), 1), 48)) AS start
               FROM t)
         SELECT doc_id, (start - 1) // 48 AS chunk_idx,
           CAST(len(ts[start:start+63]) AS INT) AS n_tokens,
           md5(array_to_string(ts[start:start+63], ' ')) AS chunk_md5
         FROM c ORDER BY doc_id, chunk_idx""",
    "curate_source_quality" ->
      s"""WITH t AS (
           SELECT source, lang, len(string_split(text, ' ')) AS nt,
             CAST(length(text) AS INT) AS len,
             ${TextOps.qualityRatioSql}
           FROM documents)
         SELECT source, count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           count(DISTINCT lang) AS n_langs,
           round(CAST(sum(CASE WHEN ${TextOps.qualityKeepSql} THEN 1 ELSE 0
             END) AS DOUBLE) / count(*), 4) AS keep_rate,
           round(CAST(sum(CAST(alpha_ratio AS DECIMAL(18,4))) AS DOUBLE)
             / count(*), 4) AS mean_alpha
         FROM t GROUP BY source ORDER BY source""",
    "curate_epoch_shuffle" -> epochShuffleOracle,
    "curate_epoch_batches" -> epochBatchesOracle,
  )
}
