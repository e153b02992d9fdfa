package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scale-safe replacement for rank-family window functions over
  * LOW-CARDINALITY partition keys.
  *
  * `Window.partitionBy(group)` routes every row of a group through ONE
  * reducer task: with a handful of groups (event types, tenants, labels)
  * that is a skew wall no matter how many executors exist — the same
  * failure class the bounded [[graft.functions.TopK]] aggregator fixes for
  * top-k, but rank/ntile/percent_rank genuinely need each row's global
  * position within its group, so they cannot be partially aggregated.
  *
  * [[groupRanks]] is the classic two-phase distributed ranking:
  *
  *  1. range-partition by (group ++ order) and sort within partitions —
  *     each group spans MANY partitions, each partition holds a
  *     contiguous slice of one or more groups' total order;
  *  2. count rows per (partition, group) — a tiny side collect of
  *     O(partitions × groups) longs, never data-sized;
  *  3. prefix-sum those counts into per-(partition, group) offsets,
  *     broadcast, and stream each partition once adding
  *     offset + local position.
  *
  * Emits `__pos` (0-based position within the group's total order) and
  * `__cnt` (group size), from which the rank family derives in closed
  * form: row_number = pos+1, percent_rank = pos/(cnt−1), ntile per the
  * SQL bucket rule ([[ntileOf]]). Requires `order` to be a TOTAL order
  * within each group (ties would make rank ≠ row_number and the result
  * partition-dependent) and non-null group keys.
  *
  * This is one of the rare places `mapPartitions` over rows is the right
  * tool: the per-partition running counter is genuinely imperative, and
  * both passes are single sequential scans of already-sorted partitions.
  *
  * [[groupCumsum]] is the same machinery with a per-row WEIGHT instead of
  * a count — the scale path for running totals (sequence packing's
  * cumulative token count) over the same low-cardinality stream keys.
  */
object ScaleWindows {

  def groupRanks(df: DataFrame, group: Seq[String], order: Seq[String],
      numPartitions: Int): DataFrame =
    twoPhase(df, group, order, numPartitions, weightCol = None,
      beforeName = "__pos", totalName = "__cnt")

  /** The cumulative-sum sibling of [[groupRanks]] — the scale path for
    * running totals over low-cardinality partition keys (e.g. sequence
    * PACKING: bin = cum-tokens-before / budget per stream): emits
    * `__cum_before` (exclusive prefix sum of `valueCol` within the
    * group's total order) and `__sum` (group total), computed with each
    * group spread across many partitions. `valueCol` must be an integral
    * column; same total-order requirement as groupRanks.
    */
  def groupCumsum(df: DataFrame, group: Seq[String], order: Seq[String],
      valueCol: String, numPartitions: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val ok = df.schema(valueCol).dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    }
    require(ok, s"groupCumsum value column $valueCol must be integral, " +
      s"got ${df.schema(valueCol).dataType.simpleString}")
    twoPhase(df, group, order, numPartitions, weightCol = Some(valueCol),
      beforeName = "__cum_before", totalName = "__sum")
  }

  /** Shared two-phase machinery: range-partition by (group ++ order),
    * aggregate a per-(partition, group) weight (1 for ranks, `weightCol`
    * for cumsums), prefix-sum across partitions into offsets (a tiny
    * O(partitions × groups) collect), then one sequential pass emitting
    * offset + running local weight.
    */
  private def twoPhase(df: DataFrame, group: Seq[String], order: Seq[String],
      numPartitions: Int, weightCol: Option[String],
      beforeName: String, totalName: String): DataFrame = {
    require(group.nonEmpty && order.nonEmpty)
    // the offset maps key on the collected JVM values, which requires
    // VALUE equality — binary (Array[Byte]) and nested types compare by
    // reference, so pass 2's lookup would never find the re-read key
    group.foreach { g =>
      import org.apache.spark.sql.types._
      val bad = df.schema(g).dataType match {
        case BinaryType | _: StructType | _: ArrayType | _: MapType => true
        case _ => false
      }
      require(!bad,
        s"group column $g has type " +
          s"${df.schema(g).dataType.simpleString}; only atomic " +
          "value-comparable types are supported (no binary/nested)")
    }
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.col
    val sortCols = (group ++ order).map(col)
    val weightOf: Row => Long = weightCol match {
      case Some(c) => r => r.getAs[Number](c).longValue()
      case None => _ => 1L
    }
    // materialize the sorted layout once — both passes read it.
    // DISK_ONLY: the layout is data-sized (measured +1 GB live heap at
    // sf10 via the memoized eventValueRanks) and often outlives the
    // calling query in a session memo — park it on disk (OS page cache
    // keeps re-reads RAM-speed) instead of taxing every later query's
    // heap, the winsOf rationale.
    val parted = df.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // pass 1: per-(partition, group) weight sums. LinkedHashMap keeps
    // partition encounter order, but correctness only needs the pairs.
    val counts: Array[(Int, Seq[Any], Long)] =
      parted.rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]()
        it.foreach { r =>
          val k = group.map(r.getAs[Any])
          m.update(k, m.getOrElse(k, 0L) + weightOf(r))
        }
        m.iterator.map { case (k, n) => (pid, k, n) }
      }.collect()
    // this machinery exists for LOW-cardinality groups — with a
    // high-cardinality key the offset table itself becomes data-sized
    // on the driver, and the plain window (which spreads fine on such
    // keys) is the right tool. Named failure instead of a silent OOM.
    require(counts.length <= 4_000_000,
      s"groupRanks collected ${counts.length} (partition, group) " +
        "offsets — the group key looks high-cardinality; use " +
        "Window.partitionBy for high-cardinality keys (they spread " +
        "across tasks on their own)")
    val totals: Map[Seq[Any], Long] =
      counts.groupBy(_._2).map { case (k, rs) => k -> rs.map(_._3).sum }
    val offsets: Map[(Int, Seq[Any]), Long] =
      counts.groupBy(_._2).flatMap { case (k, rs) =>
        val inPidOrder = rs.sortBy(_._1)
        val cum = inPidOrder.map(_._3).scanLeft(0L)(_ + _)
        inPidOrder.zip(cum).map { case ((pid, _, _), off) => (pid, k) -> off }
      }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcTot = spark.sparkContext.broadcast(totals)
    // pass 2: sequential scan per partition, global running value =
    // cross-partition offset + running local weight (exclusive)
    val outSchema = parted.schema.add(beforeName, LongType)
      .add(totalName, LongType)
    val out = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.HashMap[Seq[Any], Long]()
      it.map { r =>
        val k = group.map(r.getAs[Any])
        val i = local.getOrElse(k, 0L)
        local.update(k, i + weightOf(r))
        Row.fromSeq(r.toSeq :+ (bcOff.value((pid, k)) + i) :+ bcTot.value(k))
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** SQL NTILE bucket (1-based) for 0-based `pos` in a group of `cnt`
    * rows: the first cnt % n buckets carry ⌈cnt/n⌉ rows, the rest ⌊cnt/n⌋
    * — identical to Spark's/DuckDB's NTILE.
    */
  def ntileOf(pos: Long, cnt: Long, n: Int): Long = {
    val q = cnt / n
    val r = cnt % n
    if (pos < r * (q + 1)) pos / (q + 1) + 1
    else r + (pos - r * (q + 1)) / math.max(q, 1L) + 1
  }

  /** Exact integral division of non-negative long Columns:
    * (a − a%b)/b has an integral quotient, so the double division is
    * exact while the quotient < 2^53 — any realistic group size.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast("long")

  /** [[ntileOf]] as a Column over groupRanks' `__pos`/`__cnt` — lets the
    * closed-form bucket run inside codegen instead of a per-row driver
    * function.
    */
  def ntileCol(pos: Column, cnt: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.{greatest, lit, when}
    val nl = lit(n.toLong)
    val q = idiv(cnt, nl)
    val r = cnt % nl
    val qp1 = q + lit(1L)
    when(pos < r * qp1, idiv(pos, qp1) + lit(1L))
      .otherwise(r + idiv(pos - r * qp1, greatest(q, lit(1L))) + lit(1L))
  }

  /** SQL percent_rank as a Column over `__pos`/`__cnt`: pos/(cnt−1),
    * defined as 0 for single-row groups — identical to the window
    * function when the order is total (rank == row_number).
    */
  def percentRankCol(pos: Column, cnt: Column): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    when(cnt === lit(1L), lit(0.0))
      .otherwise(pos.cast("double") / (cnt - lit(1L)).cast("double"))
  }
}
