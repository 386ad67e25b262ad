package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Ad-hoc per-exchange shuffle attribution for doc_ngram_jaccard (test
  * scope, not shipped): prints every ShuffleExchange in the executed
  * plan with its written bytes + row count and one line of its child,
  * so the 100× shuffle total can be attributed to a stage.
  *
  * Run: sbt "Test/runMain graft.operators.NgramProfile [sliceDir] [query]"
  */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp/sf100ish")
    val qname = args.lift(1).getOrElse("doc_ngram_jaccard")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val df = Registry.byName(qname).run(spark, dir)
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.foreach(_ => ())
    println(f"wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case ex: ShuffleExchangeExec =>
          val mb = ex.metrics.get("shuffleBytesWritten").map(_.value / 1e6)
          val rows = ex.metrics.get("shuffleRecordsWritten").map(_.value)
          println(f"EXCHANGE ${mb.getOrElse(-1.0)}%10.1f MB ${rows.getOrElse(-1L)}%12d rows  <- " +
            ex.child.toString.linesIterator.next().take(120))
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    spark.stop()
  }
}
