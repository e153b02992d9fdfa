package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet loaders for the driver testdata (see /root/repo/TESTDATA.md).
  *
  * All engine queries take the scale-factor directory as a parameter and go
  * through these loaders, so scan-level concerns (format, pushdown options,
  * future bucketing) are controlled in one place. Schema comes from the
  * parquet footer — these are engine-internal tables, not untrusted input
  * (untrusted JSON ingest goes through [[CdcSchemas]] with explicit schemas).
  */
object Tables {
  /** Every timestamp literal/truncation in the query registry assumes a
    * UTC session zone (the oracle's timestamps are timezone-naive). That
    * is pinned at the documented entry points — [[registerAll]] and the
    * `SparkEntry` registry — NOT here: a bare table read must not mutate
    * session-global state under an embedding user who chose another zone.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // a partial rehearsal corpus (ScaleUp events-only mode) carries a
    // marker file; fail with the corpus's name for its own shape instead
    // of a context-free path-not-found from the parquet reader
    if (name != "events" &&
        java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, "_GRAFT_EVENTS_ONLY")))
      throw new IllegalArgumentException(
        s"$dir is an events-only rehearsal corpus (ScaleUp events-only " +
          s"mode — see its _GRAFT_EVENTS_ONLY marker); table '$name' was " +
          "never scaled into it. Point document/embedding consumers at a " +
          "full ScaleUp output instead.")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The events lake has shipped `ts` under three encodings across testdata
    * generations, so the loader dispatches on the schema it actually read
    * instead of assuming one (upstream encoding drift must not take the
    * whole event surface down — the reference's JsonSerDe re-coerces on
    * read the same way):
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4 refuses it as a timestamp
    *    ([PARQUET_TYPE_ILLEGAL]) unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (pinned by the repo's
    *    session builders) reads it as nanos-since-epoch long; convert with
    *    exact integer arithmetic (DIV — double division loses precision
    *    above 2^53 ns). The data carries microsecond precision, so lossless.
    *  - parquet timestamp[us] without UTC adjustment: reads as
    *    TIMESTAMP_NTZ; cast to TimestampType — the session zone is pinned
    *    UTC at the documented entry points, so the wall-clock values are
    *    preserved and match the timezone-naive oracle.
    *  - TimestampType: pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // a TIMESTAMP(NANOS) file on a session WITHOUT the legacy flag fails
    // inside schema resolution with Spark's raw [PARQUET_TYPE_ILLEGAL] —
    // catch it here and rethrow with the remediation the LongType branch
    // depends on, so an unprepared session gets a self-describing error
    // instead of a bare parquet type complaint
    val raw =
      try table(s, d, "events")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
              e.getMessage.contains("Illegal Parquet type") =>
          throw new IllegalArgumentException(
            "events.parquet `ts` is parquet TIMESTAMP(NANOS), which Spark 4 " +
              "refuses as a timestamp; set " +
              "spark.sql.legacy.parquet.nanosAsLong=true on the session " +
              "(Tables.registerAll and the repo's session builders pin it) " +
              "so the loader can read it as nanos-since-epoch and convert", e)
      }
    convertEventTs(raw)
  }

  /** The `ts`-encoding dispatch of [[events]], applied to any frame
    * carrying the raw file schema — shared with STREAMING readers of the
    * same lake (`readStream.parquet` over the events directory), so the
    * batch and stream paths cannot drift on encoding handling.
    */
  def convertEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // the cast below interprets NTZ wall-clock values in the SESSION
        // zone; under any zone with DST the oracle-naive values would
        // shift or go ambiguous in gaps/overlaps, so fail fast with the
        // fix instead of silently corrupting an hour of events per year
        val tz = raw.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.parquet `ts` is TIMESTAMP_NTZ and the session zone is " +
            s"'$tz': the NTZ→TIMESTAMP cast is only wall-clock-preserving " +
            "under UTC. Set spark.sql.session.timeZone=UTC (Tables." +
            "registerAll and the repo's session builders pin it)")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalArgumentException(
        s"events.parquet `ts` has unsupported type $other; expected " +
          "TIMESTAMP(NANOS)-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The full table surface, by name — one definition for [[registerAll]]
    * and anything else that iterates the catalog.
    */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** SQL face of the engine — the reference's consumers query Hive tables
    * with SQL, so a user switching to this library gets the same surface:
    * every table registered over the scale directory, plus the custom
    * function surface (`cosine_sim`), after which
    * `spark.sql("SELECT ... FROM lineitem ...")` just works.
    *
    * `persistent = false` (default): session-scoped temp views — lazily
    * planned, zero catalog state, pushdown/pruning identical to the
    * DataFrame path (same analyzed plan).
    *
    * `persistent = true`: the reference-parity CATALOG registration
    * (its tables are metastore-backed Hive external tables any session
    * can query, cdc_pipeline_dag.py:360-387): each parquet file becomes
    * a LOCATION-backed `CREATE TABLE ... USING parquet` in the shared
    * catalog, visible to every session on that catalog (`newSession()`
    * now; other JVMs too under `enableHiveSupport()`) without
    * re-registration. `events` needs its nanos→micros rewrite, so the
    * raw file registers as `events_raw` and `events` becomes a
    * persistent VIEW applying the exact conversion — a second session
    * still needs the two session confs below (they are per-session by
    * nature) and its own function registration (use
    * [[graft.functions.GraftExtensions]] to get functions on every
    * session automatically).
    */
  def registerAll(spark: SparkSession, dir: String,
      persistent: Boolean = false): Unit = {
    // documented side effects of this init entry point: registry/oracle
    // semantics are defined in UTC (see table()) and the events table
    // needs the nanos-as-long legacy flag (see events())
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (persistent) {
      all.keys.foreach { name =>
        val tbl = if (name == "events") "events_raw" else name
        ensureLocationTable(spark, tbl, s"$dir/$name.parquet",
          s"CREATE TABLE IF NOT EXISTS `$tbl` USING parquet " +
            s"LOCATION '$dir/$name.parquet'")
      }
      // the exact Tables.events conversion, as a catalog view — same
      // schema dispatch as events() so the view survives encoding drift
      val rawEvents = spark.table("events_raw")
      val tsSql = rawEvents.schema("ts").dataType match {
        case LongType => "timestamp_micros(ts DIV 1000) AS ts"
        case TimestampNTZType => "CAST(ts AS TIMESTAMP) AS ts"
        case TimestampType => "`ts`"
        // mirror events(): a fourth encoding must fail loudly here too,
        // not silently pass an unconverted column through the view
        case other => throw new IllegalArgumentException(
          s"events.parquet `ts` has unsupported type $other; expected " +
            "TIMESTAMP(NANOS)-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
      }
      val cols = rawEvents.columns.map {
        case "ts" => tsSql
        case c => s"`$c`"
      }.mkString(", ")
      spark.sql(
        s"CREATE OR REPLACE VIEW events AS SELECT $cols FROM events_raw")
    } else {
      all.foreach { case (name, load) =>
        load(spark, dir).createOrReplaceTempView(name)
      }
    }
    graft.functions.VectorExprs.registerFunctions(spark)
  }

  /** Guarded LOCATION-table creation: `CREATE TABLE IF NOT EXISTS` would
    * SILENTLY keep an existing table pointed at its old location — a
    * re-registration against a different scale dir would then serve the
    * old corpus with no error (the temp-view path replaces; the catalog
    * path must not silently ignore). Same check serves
    * [[graft.operators.Cdc.createEventsTable]].
    */
  private[graft] def ensureLocationTable(spark: SparkSession, table: String,
      location: String, createSql: String): Unit = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val cat = spark.sessionState.catalog
    val id = TableIdentifier(table)
    if (cat.tableExists(id)) {
      val existing = new java.io.File(
        cat.getTableMetadata(id).location.getPath).getCanonicalPath
      val wanted = new java.io.File(
        new java.net.URI(
          if (location.contains(":/")) location else s"file:$location")
          .getPath).getCanonicalPath
      require(existing == wanted,
        s"catalog table `$table` already exists at $existing; refusing to " +
          s"silently keep it while registering $wanted — DROP TABLE " +
          s"`$table` first (external: the data stays) or use another name")
    } else {
      spark.sql(createSql); ()
    }
  }
}
