package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming pipeline must gate, scrub, dedup, and chunk as
  * documents arrive — all in append mode with bounded state.
  */
class CorpusIngestSpec extends SparkSpec {

  test("arriving docs are gated, deduped and chunked across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[DocArrival]
    val chunks = CorpusIngest.prepare(source.toDF(), "10 minutes")
    val q = chunks.writeStream
      .format("memory").queryName("ingest_chunks")
      .outputMode("append")
      .start()
    try {
      val T = 1700000000000L
      def t(m: Long) = new Timestamp(T + m * 60000)
      val longDoc = (1 to 25).map(i => s"word$i").mkString(" ")
      source.addData(
        DocArrival(1L, longDoc, t(0)),
        DocArrival(2L, "too short", t(1)),            // fails the gate
        DocArrival(3L, "mail bob@site.io " + longDoc, t(2))) // scrub + admit
      q.processAllAvailable()
      source.addData(DocArrival(4L, longDoc, t(3)))   // dup of 1 → dropped
      q.processAllAvailable()
      val rows = spark.table("ingest_chunks").collect()
      val byDoc = rows.groupBy(_.getLong(0))
      assert(byDoc.keySet == Set(1L, 3L), s"got ${byDoc.keySet}")
      // doc 1: 25 words → chunks at 0 and 15 (len 20, stride 15)
      assert(byDoc(1L).map(_.getInt(1)).sorted.toSeq == Seq(0, 1))
      // scrubbed email must not appear in any chunk text
      assert(!byDoc(3L).exists(_.getString(4).contains("bob@site.io")))
      assert(byDoc(3L).exists(_.getString(4).contains("<EMAIL>")))
    } finally q.stop()
  }
}
