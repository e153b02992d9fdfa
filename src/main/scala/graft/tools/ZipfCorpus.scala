package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic power-law documents fixture — the corpus shape where
  * min-count LM pruning (`spark.graft.text.lmMinCount`) actually bites.
  * The ScaleUp rehearsal corpora CANNOT exercise it: each scaled copy
  * mints a fresh alphabet-permuted vocabulary whose per-token counts
  * equal the source's, so every token looks like head vocabulary and no
  * frequency floor prunes anything (measured: minCount 2 and 5 prune
  * zero tokens at sf1 AND sf10) — there, model growth ∝ vocabulary is
  * irreducible. Real corpora are the opposite: Zipf head + a long
  * singleton tail, which is what this fixture reproduces.
  *
  * Token index for (doc, pos): `floor(V · u⁴)` with `u` a hash-derived
  * uniform — density ∝ j^(−3/4), so counts run from thousands (head) to
  * singletons (tail) when `V ≈ totalTokens/4` (the default). Fully
  * deterministic: same args → byte-stable corpus.
  *
  *   sbt "runMain graft.tools.ZipfCorpus /tmp/zipf5k 5000"
  */
object ZipfCorpus {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ZipfCorpus <dstDir> <nDocs> [docLen]")
    val dst = args(0)
    val nDocs = args(1).toLong
    val docLen = if (args.length > 2) args(2).toInt else 60
    val vocab = math.max(1000L, nDocs * docLen / 4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.range(nDocs).toDF("doc_id")
      .repartition(cpus.toInt)
      .withColumn("text", array_join(transform(
        sequence(lit(1), lit(docLen)),
        p => concat(lit("t"), least(lit(vocab - 1),
          floor(lit(vocab.toDouble) * pow(
            pmod(xxhash64(col("doc_id"), p), lit(1000003L))
              .cast("double") / lit(1000003.0), lit(4.0)))
          .cast("long")))), " "))
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("zipf"))
      .withColumn("n_chars", length(col("text")))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
    docs.write.mode("overwrite").parquet(s"$dst/documents.parquet")
    println(s"[zipf] wrote $nDocs docs × $docLen tokens, lattice vocab " +
      s"$vocab, to $dst/documents.parquet")
    spark.stop()
  }
}
