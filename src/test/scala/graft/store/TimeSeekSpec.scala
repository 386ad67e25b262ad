package graft.store

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** The at-rest day subpartition must make time-range scans
  * (register_view's backfill seek) touch only the qualifying day
  * directories — asserted on the scan's numFiles metric, not just the
  * plan text.
  */
class TimeSeekSpec extends SparkSpec with graft.testkit.TestKitReported {

  private def filesRead(plan: SparkPlan): Long = {
    val own = plan match {
      case f: FileSourceScanExec => f.metrics.get("numFiles").map(_.value).getOrElse(0L)
      case _ => 0L
    }
    val nested = plan match {
      case a: AdaptiveSparkPlanExec => filesRead(a.executedPlan)
      case q: QueryStageExec => filesRead(q.plan)
      case _ => 0L
    }
    own + nested + plan.children.map(filesRead).sum
  }

  test("eventsSince reads only the qualifying day partitions") {
    val st = new EventStore(spark)
    st.registerDeciderEvent("T", "E")
    val day0 = 1700000000000L // 2023-11-14 UTC
    val msPerDay = 86400000L
    // 10 days, 2 events/day, one chained stream
    for (d <- 0 until 10) {
      st.now = () => new Timestamp(day0 + d * msPerDay)
      val batch = (0 until 2).map { i =>
        val k = d * 2 + i
        EventInput("E", s"e$k", "T", "p0", s"""{"k":$k}""",
          previous_id = if (k == 0) None else Some(s"e${k - 1}"))
      }
      assert(st.append(batch).rejected.isEmpty)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-timeseek").toString
    st.save(dir, buckets = 2)

    val from = new Timestamp(day0 + 8 * msPerDay)
    val ds = st.eventsSince(from)
    val rows = ds.collect()
    assert(rows.map(_.event_id).sorted.toSeq == Seq("e16", "e17", "e18", "e19"))

    val prunedFiles = filesRead(ds.queryExecution.executedPlan)
    val all = st.eventsSince(new Timestamp(0L))
    all.collect()
    val allFiles = filesRead(all.queryExecution.executedPlan)
    assert(prunedFiles > 0 && allFiles >= 10,
      s"unexpected file counts pruned=$prunedFiles all=$allFiles")
    assert(prunedFiles * 4 <= allFiles,
      s"day pruning ineffective: read $prunedFiles of $allFiles files for 2 of 10 days")
  }
}
