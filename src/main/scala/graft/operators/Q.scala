package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract:
  * a Spark implementation plus (when SQL-expressible) an equivalent
  * ANSI-SQL oracle that DuckDB runs over the same parquet tables.
  * `name` keys both `SparkEntry.queries` and `SparkEntry.oracleSql`.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
