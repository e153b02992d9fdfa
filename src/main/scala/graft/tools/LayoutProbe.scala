package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Read-side evidence for the layout writers: writes the events table
  * three ways — single-key sorted (the naive baseline), Z-ordered
  * (linear lattice), Z-ordered with rank normalization — and reports,
  * for a selective two-predicate probe (`user_id` range ∧ `ts` range)
  * plus each single-dimension probe:
  *
  *   - files/bytes a min-max-pruning reader (a Delta/Iceberg manifest,
  *     or parquet row-group stats at one-row-group-per-file sizing)
  *     must read: candidate = per-file [min,max] of BOTH columns
  *     intersects the predicate — computed from the REAL written files
  *     via [[Layout.fileSpans]], not estimated;
  *   - the probe query's wall seconds on that layout (min of
  *     SPARK_GRAFT_REPS, default 3) and its row count, which must agree
  *     across layouts (layout must never change answers).
  *
  * The headline number is the two-predicate candidate-file ratio:
  * a single-key sort bounds only its own dimension (the ts probe reads
  * ~every file), while the Z-order curve bounds both.
  *
  *   sbt "runMain graft.tools.LayoutProbe /tmp/sf1 bench/layout_probe.json 64"
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LayoutProbe <sfDir> [outJson] [numFiles]")
    val sfDir = args(0)
    val outFile = if (args.length > 1) args(1) else "bench/layout_probe.json"
    val numFiles = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ACTUAL bytes read per query (task input metrics — reflects parquet
    // row-group skipping, which the static candidate-file arithmetic
    // above the fold cannot see). The listener bus is async; reads are
    // taken after a settle sleep.
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (e.taskMetrics != null)
            bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
          ()
        }
      })

    // events with ts as comparable micros (layout keys must be numeric)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .withColumn("tsu", unix_micros(col("ts"))).drop("ts")

    // probe ranges: ~1% of each key's ROWS (the 45th..46th percentile),
    // anchored mid-distribution — quantiles, not span fractions, so a
    // sparse key space (ScaleUp offsets user ids by k·1e9, leaving
    // empty islands a span-anchored slice can land in) still yields a
    // probe that matches real rows
    val qs = ev.stat.approxQuantile(Array("user_id", "tsu"),
      Array(0.45, 0.46), 0.0005)
    val (u1, u2) = (qs(0)(0).toLong,
      math.max(qs(0)(0).toLong + 1, qs(0)(1).toLong))
    val (t1, t2) = (qs(1)(0).toLong,
      math.max(qs(1)(0).toLong + 1, qs(1)(1).toLong))
    println(s"[layout] probe: user_id in [$u1,$u2], tsu in [$t1,$t2]")

    val work = java.nio.file.Files
      .createTempDirectory("graft-layout-probe-").toString
    def writeSorted(dir: String): Unit = ev
      .repartitionByRange(numFiles, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(dir)

    val layouts = Seq(
      ("sorted_user_id", () => writeSorted(s"$work/sorted")),
      ("zorder", () =>
        Layout.writeZOrdered(ev, "user_id", "tsu", s"$work/zorder", numFiles)),
      ("zorder_ranked", () => Layout.writeZOrderedRanked(
        ev, "user_id", "tsu", s"$work/zorder_ranked", numFiles)))
    val dirs = Map("sorted_user_id" -> s"$work/sorted",
      "zorder" -> s"$work/zorder", "zorder_ranked" -> s"$work/zorder_ranked")

    val probes = Seq(
      ("both", (d: DataFrame) => d.filter(
        col("user_id").between(u1, u2) && col("tsu").between(t1, t2))),
      ("user_only", (d: DataFrame) => d.filter(col("user_id").between(u1, u2))),
      ("ts_only", (d: DataFrame) => d.filter(col("tsu").between(t1, t2))))

    val results = layouts.map { case (name, write) =>
      val tw0 = System.nanoTime()
      write()
      val wWall = (System.nanoTime() - tw0) / 1e9
      val dir = dirs(name)
      val df = spark.read.parquet(dir)
      // real per-file stats off the written files, both dimensions
      val spans = Layout.fileSpans(df, "user_id").withColumnRenamed("lo", "ulo")
        .withColumnRenamed("hi", "uhi")
        .join(Layout.fileSpans(df, "tsu").withColumnRenamed("lo", "tlo")
          .withColumnRenamed("hi", "thi"), Seq("file"))
        .collect()
      val sizes = spans.map { r =>
        val f = new java.io.File(new java.net.URI(r.getString(0)).getPath)
        r.getString(0) -> f.length()
      }.toMap
      val totalBytes = sizes.values.sum
      def candidates(uP: Option[(Long, Long)], tP: Option[(Long, Long)]) = {
        val c = spans.filter { r =>
          uP.forall { case (a, z) => r.getLong(1) <= z && r.getLong(2) >= a } &&
          tP.forall { case (a, z) => r.getLong(3) <= z && r.getLong(4) >= a }
        }
        (c.length, c.map(r => sizes(r.getString(0))).sum)
      }
      val probeStats = probes.map { case (pName, pred) =>
        val (nCand, bCand) = pName match {
          case "both" => candidates(Some((u1, u2)), Some((t1, t2)))
          case "user_only" => candidates(Some((u1, u2)), None)
          case _ => candidates(None, Some((t1, t2)))
        }
        var rows = 0L
        val wall = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          rows = pred(df).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[layout] $name%-14s $pName%-9s files=$nCand/${spans.length} " +
          f"bytes=${bCand * 100.0 / totalBytes}%.1f%% rows=$rows " +
          f"wall=$wall%.3f s")
        (pName, nCand, bCand, rows, wall)
      }
      // SERVING probe — the registry's cdc_user_trailing_1h shape
      // (trailing event-time RANGE frame per user) over the
      // two-predicate slice: the dashboard query a layout exists to
      // serve, measured as wall + ACTUAL bytes read, side by side per
      // layout. The window runs over the scanned slice (self-consistent
      // across layouts — the checksum assert below holds them to
      // identical answers).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("tsu"))
        .rangeBetween(-3600000000L, 0L)
      val servStats = Seq(
        ("serving_both", col("user_id").between(u1, u2) &&
          col("tsu").between(t1, t2)),
        ("serving_ts_only", col("tsu").between(t1, t2))).map {
        case (sName, slice) =>
          // per-rep (wall, bytes, checksum) triples: the reported bytes
          // must come from the SAME rep as the reported (min) wall, and
          // the listener bus is DRAINED deterministically before the
          // counter read — a fixed settle sleep undercounts late
          // task-end events on a loaded box
          val repStats = (1 to reps).map { _ =>
            // drain BEFORE the reset too: an earlier (un-drained) query's
            // task-end events landing after the reset would overcount
            org.apache.spark.graft.ListenerBusDrain
              .drain(spark.sparkContext)
            bytesRead.set(0)
            val t0 = System.nanoTime()
            val r = df.filter(slice)
              .withColumn("n_1h", count(lit(1)).over(w))
              .agg(count(lit(1)).as("n"),
                coalesce(bit_xor(xxhash64(col("user_id"), col("event_id"),
                  col("n_1h"))), lit(0L)).as("h"))
              .collect()(0)
            val dt = (System.nanoTime() - t0) / 1e9
            org.apache.spark.graft.ListenerBusDrain
              .drain(spark.sparkContext)
            (dt, bytesRead.get(), (r.getLong(0), r.getLong(1)))
          }
          val (servWall, servBytes, servChk) = repStats.minBy(_._1)
          require(repStats.map(_._3).distinct.size == 1,
            s"$name $sName answers differ across reps: " +
              repStats.map(_._3).distinct.toString)
          println(f"[layout] $name%-14s $sName%-15s bytes=" +
            f"${servBytes * 100.0 / totalBytes}%.1f%% rows=${servChk._1} " +
            f"wall=$servWall%.3f s")
          (sName, servWall, servBytes, servChk)
      }
      (name, wWall, spans.length, totalBytes, probeStats, servStats)
    }

    // layout must never change answers
    probes.indices.foreach { i =>
      val counts = results.map(_._5(i)._4).distinct
      require(counts.size == 1,
        s"probe ${probes(i)._1} row counts differ across layouts: $counts")
    }
    Seq(0, 1).foreach { i =>
      val chks = results.map(_._6(i)._4).distinct
      require(chks.size == 1,
        s"serving checksums differ across layouts (variant $i): $chks")
    }

    val json = {
      val ls = results.map {
        case (name, wWall, nFiles, totalBytes, ps, servs) =>
        val pj = ps.map { case (p, nc, bc, rows, wall) =>
          s""""$p":{"cand_files":$nc,"cand_bytes":$bc,"rows":$rows,""" +
            f""""wall_sec":$wall%.3f}"""
        }.mkString(",")
        val sj = servs.map { case (sName, sw, sb, sc) =>
          f""""$sName":{"wall_sec":$sw%.3f,""" +
            s""""bytes_read":$sb,"rows":${sc._1}}"""
        }.mkString(",")
        s""""$name":{"write_wall_sec":${f"$wWall%.1f"},"files":$nFiles,""" +
          s""""total_bytes":$totalBytes,$pj,$sj}"""
      }.mkString(",")
      s"""{"metric":"layout_probe","sf_dir":"$sfDir","num_files":$numFiles,""" +
        s""""probe":{"user_id":[$u1,$u2],"tsu":[$t1,$t2]},$ls}"""
    }
    val out = java.nio.file.Paths.get(outFile)
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[layout] wrote $outFile")
    println(json)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(work))
    spark.stop()
  }
}
