package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-audit main: print the formatted physical plan of registry
  * queries without executing them — the `.explain("formatted")`
  * feedback loop the build guide prescribes, as a repeatable tool.
  *
  * Usage: runMain graft.PlanAudit <sfDir> [queryName ...]
  * (no names → every registry query).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = if (args.length > 1) args.tail.toSeq
                else operators.Registry.all.map(_.name)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = operators.Registry.byName(name).run(spark, sfDir)
      println(s"\n## $name\n")
      println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
