package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Multimodal columns — the training-data-pipeline pattern for image /
  * audio / video payloads: an opaque `binary` column plus a typed metadata
  * struct, with decode / feature-extract / resize / frame-sample stages.
  *
  * The reference pipeline carries no binary data (its widest type is TEXT —
  * reference postgres/init/init.sql:9,17), so the asset table here is
  * DERIVED deterministically from the driver's `documents` testdata: the
  * payload is the document's UTF-8 bytes behind a modality tag, and the
  * metadata struct is computed from stable integer columns. That keeps the
  * inputs driver-controlled while exercising the real plumbing: binary
  * columns through scans/joins/explodes, metadata structs, batched
  * partition-wise decode, and modality-partitioned writes (spec-tested).
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs.
  * `decodeFeatures` is the Scala analogue of a `mapInPandas` decode: it
  * iterates each partition in fixed-size batches (the Arrow record-batch
  * shape) and runs a deterministic fake "codec" over the raw bytes. A real
  * deployment replaces only the marked per-batch function; the schema,
  * batching, and partitioning around it are what this module tests.
  *
  * Scale design (100 TB): payloads never shuffle — every operator either
  * reduces a payload to scalars in the scan stage (meta/catalog queries,
  * decode) or explodes it to bounded frame slices with the asset id as the
  * key. Assets at rest are partitioned by modality (see spec), so a
  * video-only pipeline prunes to 1/3 of the bytes before the scan.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** The derived asset table: (asset_id, modality, payload: binary,
    * meta: struct<width,height,sample_rate,n_frames>).
    */
  def assets(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("asset_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        (lit(16) + pmod(col("n_chars"), lit(64))).cast("int").as("width"),
        (lit(16) + pmod(col("n_chars") * 2, lit(64))).cast("int").as("height"),
        (lit(8000) + pmod(col("n_chars"), lit(3)) * 8000).cast("int")
          .as("sample_rate"),
        (lit(8) + pmod(col("doc_id"), lit(8))).cast("int").as("n_frames"),
        col("n_chars").cast("int").as("n_chars"))
        .as("meta"))

  /** Batched partition-wise decode + feature extraction + "resize"
    * (deterministic byte subsampling) — the mapInPandas-shaped stage.
    * Everything inside the per-batch lambda is the STUBBED codec.
    */
  def decodeFeatures(s: SparkSession, assetsDf: DataFrame,
      batchSize: Int = 64): DataFrame = {
    import s.implicits._
    assetsDf.select(col("asset_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch => // record-batch shape
          // the batch IS the unit of work: one scratch thumb buffer is
          // allocated per record-batch and reused across its records —
          // the allocation pattern a real vectorized codec (mapInPandas /
          // Arrow batch) has, so batch-size invariance is a property of
          // the code, not a vacuous claim
          val thumb = new Array[Byte](64)
          batch.map { case (id, modality, bytes) =>
            // --- STUBBED CODEC: a real pipeline hands `bytes` to an
            // image/audio/video library here. Deterministic fake below. ---
            val n = bytes.length
            val mean =
              if (n == 0) 0.0
              else bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / n
            val maxB = if (n == 0) 0 else bytes.map(_ & 0xFF).max
            // "resize": stride-subsample to <=64 bytes into the batch
            // scratch buffer, then fingerprint
            val stride = math.max(n / 64, 1)
            var i = 0; var k = 0
            while (i < n && k < 64) { thumb(k) = bytes(i); k += 1; i += stride }
            var thumbCk = 0L
            var j = 0
            while (j < k) {
              thumbCk = (thumbCk * 31 + (thumb(j) & 0xFF)) % 1000000007L
              j += 1
            }
            (id, modality, n, mean, maxB, k, thumbCk)
          }
        }
      }
      .toDF("asset_id", "modality", "n_bytes", "mean_byte", "max_byte",
        "thumb_bytes", "thumb_ck")
  }

  val queries: Map[String, Q] = Map(
    // Typed-metadata catalog: payload size/hash + flattened meta struct.
    "mm_asset_catalog" -> ((s, d) => {
      assets(s, d)
        .select(col("asset_id"), col("modality"),
          octet_length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("payload_sha"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.n_frames").as("n_frames"))
        .orderBy(col("asset_id"))
    }),

    // Per-modality stats over payload bytes and metadata.
    "mm_modality_stats" -> ((s, d) => {
      assets(s, d)
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_assets"),
          sum(octet_length(col("payload")).cast("long")).as("sum_bytes"),
          max(col("meta.width")).as("max_width"),
          sum(col("meta.n_frames").cast("long")).as("sum_frames"))
        .orderBy(col("modality"))
    }),

    // Frame sampling: explode each video asset into n_frames stride-sliced
    // frames (bounded fan-out; the asset id stays the key). Slices are
    // character-addressed so the DuckDB twin is exact; the byte-addressed
    // path is decodeFeatures (spec-tested).
    "mm_frame_sample" -> ((s, d) => {
      // frames come from the asset's own payload — no second documents
      // scan / re-join to recover the text (meta carries n_chars)
      val vids = assets(s, d).filter(col("modality") === "video")
        .withColumn("text", col("payload").cast("string"))
        .withColumn("stride",
          greatest(expr("meta.n_chars div meta.n_frames"), lit(1)))
      vids
        .select(col("asset_id"), col("text"), col("stride"),
          posexplode(sequence(lit(0), col("meta.n_frames") - 1))
            .as(Seq("frame_no", "i")))
        .select(col("asset_id"), col("frame_no").cast("int").as("frame_no"),
          sha2(col("text").substr(lit(1) + col("frame_no") * col("stride"),
            col("stride")), 256).as("frame_sha"),
          length(col("text").substr(lit(1) + col("frame_no") * col("stride"),
            col("stride"))).as("frame_chars"))
        .orderBy(col("asset_id"), col("frame_no"))
    }),

    // Asset-level exact dedup report — the first pass of every multimodal
    // ingest (re-crawled images/videos are byte-identical far more often
    // than text is near-identical): per modality, how many assets vs how
    // many distinct payloads. The payload reduces to a 128-bit digest IN
    // THE SCAN STAGE — only 16-byte hashes ever reach the exchange, never
    // payload bytes, which is the property that makes this runnable over
    // 100 TB of video. (On this corpus every payload is unique — n_dups
    // 0 — which the oracle gate pins; the plan is what's under test.)
    "mm_dedup_assets" -> ((s, d) =>
      assets(s, d)
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_assets"),
          countDistinct(md5(col("payload"))).as("n_distinct"),
          (count(lit(1)) - countDistinct(md5(col("payload"))))
            .as("n_dup_assets"))
        .orderBy(col("modality"))),

    // The batched stubbed-decode stage. The stub codec is deterministic
    // byte arithmetic, so it IS oracle-gated: the corpus text is ASCII,
    // where byte values equal char codes — the DuckDB twin recomputes
    // mean/max/stride-subsample/fold char-level. If the generator ever
    // emits non-ASCII the hash gate fails loudly (byte-level and
    // char-level diverge), which is the right failure. Byte-exactness on
    // arbitrary binary stays spec-tested in MultimodalSpec.
    "mm_decode_features" -> ((s, d) =>
      decodeFeatures(s, assets(s, d)).orderBy(col("asset_id"))),
  )

  val oracles: Map[String, String] = Map(
    "mm_asset_catalog" ->
      """SELECT doc_id AS asset_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS payload_sha,
           CAST(16 + n_chars % 64 AS INT) AS width,
           CAST(16 + (n_chars * 2) % 64 AS INT) AS height,
           CAST(8000 + (n_chars % 3) * 8000 AS INT) AS sample_rate,
           CAST(8 + doc_id % 8 AS INT) AS n_frames
         FROM documents ORDER BY asset_id""",
    "mm_modality_stats" ->
      """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           count(*) AS n_assets,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
           CAST(max(16 + n_chars % 64) AS INT) AS max_width,
           CAST(sum(8 + doc_id % 8) AS BIGINT) AS sum_frames
         FROM documents GROUP BY 1 ORDER BY modality""",
    // DuckDB md5() hashes the string's UTF-8 bytes — the same bytes the
    // engine's binary payload carries (payload = CAST(text AS BINARY))
    "mm_dedup_assets" ->
      """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           count(*) AS n_assets,
           count(DISTINCT md5(text)) AS n_distinct,
           count(*) - count(DISTINCT md5(text)) AS n_dup_assets
         FROM documents GROUP BY 1 ORDER BY modality""",
    // The stub codec re-expressed char-level (exact on the ASCII corpus;
    // see the query comment): stride = max(n/64, 1), k = min(64, ⌈n/stride⌉)
    // sampled positions, mean/max over all bytes, and the 31x+b mod 1e9+7
    // fold via list_reduce (whose seedless first step equals the
    // zero-seeded fold's, since b0 < the modulus).
    "mm_decode_features" ->
      """WITH a AS (
           SELECT doc_id AS asset_id,
                  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
                  text,
                  CAST(octet_length(encode(text)) AS INT) AS n
           FROM documents),
         b AS (
           SELECT *, CAST(greatest(n // 64, 1) AS INT) AS stride,
                  CAST(least(64, (n + greatest(n // 64, 1) - 1)
                    // greatest(n // 64, 1)) AS INT) AS k
           FROM a),
         c AS (
           SELECT asset_id, modality, n, k,
                  CASE WHEN n = 0 THEN 0.0
                       ELSE CAST(list_aggregate(list_transform(range(1, n + 1),
                              i -> ascii(substr(text, CAST(i AS INT), 1))),
                            'sum') AS DOUBLE) / n
                  END AS mean_byte,
                  CASE WHEN n = 0 THEN 0
                       ELSE CAST(list_aggregate(list_transform(range(1, n + 1),
                              i -> ascii(substr(text, CAST(i AS INT), 1))),
                            'max') AS INT)
                  END AS max_byte,
                  CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
                       ELSE list_reduce(list_transform(range(0, k),
                              i -> CAST(ascii(substr(text,
                                CAST(1 + i * stride AS INT), 1)) AS BIGINT)),
                            (x, y) -> (x * 31 + y) % 1000000007)
                  END AS thumb_ck
           FROM b)
         SELECT asset_id, modality, n AS n_bytes, mean_byte, max_byte,
                k AS thumb_bytes, thumb_ck
         FROM c ORDER BY asset_id""",
    "mm_frame_sample" ->
      """WITH f AS (
           SELECT asset_id, text, stride, unnest(range(0, n_frames)) AS frame_no
           FROM (SELECT doc_id AS asset_id, text,
                   8 + doc_id % 8 AS n_frames,
                   greatest(n_chars // (8 + doc_id % 8), 1) AS stride
                 FROM documents WHERE doc_id % 3 = 2) t)
         SELECT asset_id, CAST(frame_no AS INT) AS frame_no,
           sha256(substr(text, CAST(1 + frame_no * stride AS INT),
             CAST(stride AS INT))) AS frame_sha,
           CAST(length(substr(text, CAST(1 + frame_no * stride AS INT),
             CAST(stride AS INT))) AS INT) AS frame_chars
         FROM f ORDER BY asset_id, frame_no""",
  )
}
