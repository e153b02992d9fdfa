package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` output for named registry queries — the
  * plan evidence files under `plans/<round>/`. Each query is EXECUTED
  * first so AQE's final plan is what gets dumped (the same protocol as
  * [[PlanAudit]]), then both the formatted initial plan and the final
  * adaptive executed plan are written:
  *
  *   `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <query ...>`
  *
  * writes `<outDir>/<query>_<suffix>.txt` per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <query ...>")
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3)
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown registry query: $name"))
      val df = fn(spark, sfDir)
      df.collect() // drive AQE to its final plan
      val formatted =
        df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val finalPlan = df.queryExecution.executedPlan.toString
      // plain concatenation, NOT stripMargin over interpolated plans: a
      // plan line whose first non-space char is '|' would be truncated
      val body =
        s"== query: $name  ($suffix; sfDir=$sfDir) ==\n\n" +
          s"$formatted\n== AQE final executed plan ==\n\n$finalPlan"
      val out = outDir.resolve(s"${name}_$suffix.txt")
      Files.write(out, body.getBytes(StandardCharsets.UTF_8))
      System.err.println(s"[plandump] wrote $out")
    }
    spark.stop()
  }
}
