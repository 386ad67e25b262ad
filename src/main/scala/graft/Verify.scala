package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Runs every query, writing `<outDir>/<name>.parquet` per the driver
    * contract. A query that THROWS still emits an artifact at its slot:
    * a one-row parquet with schema `(err: string)` — deliberately
    * oracle-incomparable, so the driver's compare records a RED row
    * (schema/rows/hash mismatch) instead of the round-9 failure mode
    * where the row silently vanished from the correctness artifact and
    * 105 registered queries read as "73/73 green". Returns the error
    * map (insertion-ordered).
    */
  def runAll(spark: SparkSession, sfDir: String, outDir: String,
             queries: collection.Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame])
      : scala.collection.mutable.LinkedHashMap[String, String] = {
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      // Output path is literally `<name>.parquet` per the driver
      // contract (it is a directory — Spark always writes one — but a
      // driver globbing the literal name, pyarrow.read_table, and
      // pandas.read_parquet all accept a directory at that path).
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
      }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        try {
          import spark.implicits._
          Seq(errors(name).take(2000)).toDF("err")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
        } catch { case _: Throwable => () } // the err row is best-effort
      }
      finally {
        // release this query's persistOnce caches (see Bench: nothing
        // in the operator surface unpersists; a full-registry session
        // otherwise accumulates every cached plan) — in a FINALLY so a
        // THROWING query's caches don't survive into every later
        // entry, reintroducing the accumulation pressure this exists
        // to remove and skewing post-failure rows
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        // ...and un-tune the ObjectHashAggregate fallback threshold a
        // topK-based entry may have raised (session-global by
        // necessity — see TopKByScore.tuneForManyGroups)
        graft.functions.TopKByScore.restoreTuning(spark)
      }
    }
    errors
  }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query names] — the
    // optional filter is a local iteration aid; the driver passes two.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write µs timestamps (not INT96) so DuckDB/pyarrow compare cleanly
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Contract check up front: every oracle must belong to a registered
    // query, else the driver's compare would silently skip it.
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    require(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
    val attempted = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val errors = runAll(spark, sfDir, outDir, attempted)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The driver keys its oracle lookup by the artifact name it globs
    // (`<name>.parquet`), so emit every oracle under BOTH the bare query
    // name and the `<name>.parquet` artifact name.
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Machine-readable coverage trace: which queries ran vs. errored.
    // A query that throws writes no parquet, so without this the
    // driver's correctness artifact silently loses the row (round-9
    // lesson — 32 rows vanished behind one loader regression).
    val summary =
      s"""{"attempted": ${attempted.size}, "succeeded": ${attempted.size - errors.size},""" +
      s""" "failed": ${errors.size}, "errors": ${
        errors.map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }.mkString("{", ",", "}")
      }}"""
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"), summary)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
