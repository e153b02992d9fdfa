package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (north star): quality features, token counting,
  * tokenization (explode), content hashing for exact dedup.
  *
  * All features are pure per-row expressions (whole-stage codegen'd, no
  * UDFs), so at 100 TB they pipeline directly over the scan with zero
  * shuffles; only the final aggregations shuffle, on small keyspaces.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  /** Whitespace-delimited word count, robust across engines:
    * (#spaces + 1) on single-space-joined text.
    */
  private def wordCnt(text: org.apache.spark.sql.Column) =
    (length(text) - length(regexp_replace(text, " ", "")) + lit(1))

  val queries: Map[String, Q] = Map(
    // Per-document quality features: length, word/token/stopword counts,
    // average word length. Everything codegen'd scalar expressions.
    "text_stats" -> ((s, d) => {
      documents(s, d)
        .withColumn("len", length(col("text")))
        .withColumn("word_cnt", wordCnt(col("text")))
        .withColumn("tok_cnt", regexp_count(col("text"), lit("\\w+")))
        .withColumn("stop_cnt",
          regexp_count(col("text"), lit("\\b(the|a)\\b")))
        .withColumn("avg_word_len",
          (col("len") - (col("word_cnt") - 1)).cast("double") / col("word_cnt"))
        .select(col("doc_id"), col("len"), col("word_cnt"), col("tok_cnt"),
          col("stop_cnt"), col("avg_word_len"))
        .orderBy(col("doc_id"))
    }),

    // Corpus stats per language (counts + exact integer sums → exact avg).
    "text_lang_stats" -> ((s, d) => {
      documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          avg(col("n_chars")).as("avg_chars"))
        .orderBy(col("lang"))
    }),

    // Tokenization as a table-generating op (explode) + top-20 vocabulary.
    "text_top_tokens" -> ((s, d) => {
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),

    // Exact dedup by content hash (sha256) — at 100 TB this is the
    // hash-groupBy dedup: shuffle on a 32-byte key, never on the text.
    "dedup_exact" -> ((s, d) => {
      documents(s, d)
        .groupBy(sha2(col("text"), 256).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"), col("text_hash"))
        .orderBy(col("keep_id"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "text_stats" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS len,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS word_cnt,
         CAST(length(regexp_extract_all(text, '\w+')) AS INT) AS tok_cnt,
         CAST(length(regexp_extract_all(text, '\b(the|a)\b')) AS INT) AS stop_cnt,
         CAST(length(text) - (length(text) - length(replace(text, ' ', '')) + 1 - 1) AS DOUBLE)
           / (length(text) - length(replace(text, ' ', '')) + 1) AS avg_word_len
         FROM documents ORDER BY doc_id""",
    "text_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         avg(n_chars) AS avg_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "text_top_tokens" ->
      """SELECT token, count(*) AS n FROM (
           SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
         GROUP BY token ORDER BY n DESC, token LIMIT 20""",
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
         sha256(text) AS text_hash
         FROM documents GROUP BY sha256(text) ORDER BY keep_id""",
  )
}
