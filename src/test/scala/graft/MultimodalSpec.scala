package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** The multimodal plumbing the driver's rows-only check can't cover:
  * byte-exact stubbed decode, batch-shape invariance, and the
  * modality-partitioned layout with partition pruning.
  */
class MultimodalSpec extends SparkSpec {

  test("decodeFeatures matches a plain-Scala reference byte for byte") {
    val a = MultimodalOps.assets(spark, sf)
    val got = MultimodalOps.decodeFeatures(spark, a)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getDouble(3), r.getInt(4), r.getInt(5), r.getLong(6)))
      .toMap
    val want = a.select("asset_id", "payload").collect().map { r =>
      val bytes = r.getAs[Array[Byte]](1)
      val n = bytes.length
      val mean = if (n == 0) 0.0
        else bytes.foldLeft(0L)((x, b) => x + (b & 0xFF)).toDouble / n
      val maxB = if (n == 0) 0 else bytes.map(_ & 0xFF).max
      val stride = math.max(n / 64, 1)
      val thumb = bytes.indices.by(stride).take(64).map(bytes(_))
      val ck = thumb.foldLeft(0L)((x, b) => (x * 31 + (b & 0xFF)) % 1000000007L)
      r.getLong(0) -> ((n, mean, maxB, thumb.length, ck))
    }.toMap
    assert(got.size == want.size && got.keySet == want.keySet)
    assert(got == want)
  }

  test("decode output is independent of the batch shape") {
    val a = MultimodalOps.assets(spark, sf)
    val b1 = MultimodalOps.decodeFeatures(spark, a, batchSize = 1)
      .orderBy("asset_id").collect().toSeq
    val b64 = MultimodalOps.decodeFeatures(spark, a, batchSize = 64)
      .orderBy("asset_id").collect().toSeq
    assert(b1 == b64)
  }

  test("modality-partitioned layout prunes to one modality's files") {
    val dir = Files.createTempDirectory("graft-mm").toString
    MultimodalOps.assets(spark, sf)
      .write.mode("overwrite").partitionBy("modality").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("modality") === "video")
    // partition pruning: only modality=video files are read
    val files = back.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("modality=video")))
    val expected = MultimodalOps.assets(spark, sf)
      .filter(col("modality") === "video").count()
    assert(back.count() == expected)
  }
}
