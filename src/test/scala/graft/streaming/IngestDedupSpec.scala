package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Semantics of streaming ingest dedup: duplicates within the
  * watermark delay are dropped across micro-batches; once the
  * watermark passes, state is evicted and the same content is
  * admitted again (the bounded-state trade the scaladoc declares —
  * far-apart re-crawls belong to the batch sweep).
  */
class IngestDedupSpec extends SparkSpec {

  test("dups within the delay are dropped; after eviction content re-admits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[DocArrival]
    val deduped = IngestDedup.exactDedup(source.toDF(), "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_sink")
      .outputMode("append")
      .start()
    try {
      val T = 1700000000000L
      def t(m: Long) = new Timestamp(T + m * 60000)
      // batch 1: two distinct docs + an intra-batch duplicate text
      source.addData(
        DocArrival(1L, "alpha beta", t(0)),
        DocArrival(2L, "gamma delta", t(1)),
        DocArrival(3L, "alpha beta", t(2)))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate inside the delay → dropped
      source.addData(DocArrival(4L, "alpha beta", t(5)))
      q.processAllAvailable()
      val early = spark.table("dedup_sink").collect().map(_.getLong(0)).toSet
      assert(early == Set(1L, 2L), s"got $early")
      // batch 3: advance the watermark far past the digest's state,
      // then batch 4 re-sends the same content → admitted again
      source.addData(DocArrival(5L, "unrelated words", t(60)))
      q.processAllAvailable()
      source.addData(DocArrival(6L, "alpha beta", t(61)))
      q.processAllAvailable()
      val late = spark.table("dedup_sink").collect().map(_.getLong(0)).toSet
      assert(late.contains(6L), s"got $late")
      assert(!late.contains(3L) && !late.contains(4L))
    } finally q.stop()
  }
}

case class DocArrival(doc_id: Long, text: String, ingest_ts: Timestamp)
