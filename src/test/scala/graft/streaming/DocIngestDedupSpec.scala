package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.operators.IncrementalDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup dedup of arriving documents against the
  * persisted signature index: verdicts must equal a plain-Scala EXACT
  * shard×corpus 3-shingle-Jaccard recompute (the 16×4 banding is
  * recall-exhaustive at ≥ 0.8, so exact is the truth, not a floor).
  */
class DocIngestDedupSpec extends SparkSpec {

  test("arriving docs flag against the index; verdicts equal the exact recompute") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val shard = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-doc-stream-idx").toString
    IncrementalDedup.build(spark, corpus, dir)

    def sets(df: org.apache.spark.sql.DataFrame): Seq[(Long, Set[String])] =
      df.select("doc_id", "text").as[(Long, String)].collect().toSeq
        .map { case (id, t) =>
          val ws = t.toLowerCase.split(" ", -1)
          (id, if (ws.length < 3) Set.empty[String]
               else ws.sliding(3).map(_.mkString(" ")).toSet)
        }
    val corp = sets(corpus)
    // plant two arrivals that must flag: an exact copy of a corpus doc
    // and a one-word-substituted near-copy (still Jaccard >= 0.8 on a
    // long doc); un-planted shard docs pin the negative side
    val srcText = corpus.orderBy(desc("n_chars")).select("text")
      .as[String].head()
    val nearWords = srcText.split(" ")
    val near = (nearWords.take(nearWords.length / 2) ++ Array("zzzqq") ++
      nearWords.drop(nearWords.length / 2 + 1)).mkString(" ")
    val arrivals = shard.select("doc_id", "text").as[(Long, String)]
      .collect().toSeq ++ Seq((900000L, srcText), (900001L, near))
    val expected = arrivals.flatMap { case (sid, st) =>
      val ws = st.toLowerCase.split(" ", -1)
      val ss = if (ws.length < 3) Set.empty[String]
               else ws.sliding(3).map(_.mkString(" ")).toSet
      val hits = corp.flatMap { case (cid, cs) =>
        val inter = (ss & cs).size
        val union = ss.size + cs.size - inter
        if (union == 0) None
        else {
          val j = BigDecimal(inter.toDouble / union)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (j >= IncrementalDedup.Threshold) Some((cid, j)) else None
        }
      }
      if (hits.isEmpty) None
      else Some(sid -> hits.maxBy { case (cid, j) => (j, -cid.toDouble) })
    }.toMap
    assert(expected.contains(900000L) && expected.contains(900001L),
      "planted arrivals must have exact matches")

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[DocArrival]
    val out = IncrementalDedup.dedupStream(spark, source.toDF(), dir,
      watermarkDelay = "1 minute", windowDuration = "1 minute")
    val q = out.writeStream.format("memory").queryName("doc_stream_dedup")
      .outputMode("append").start()
    try {
      val T = 1700000000000L
      source.addData(arrivals.map { case (id, t) =>
        DocArrival(id, t, new Timestamp(T)) }.toIndexedSeq: _*)
      q.processAllAvailable()
      // late flush arrival advances the watermark so append rows emit
      source.addData(DocArrival(999999L, srcText,
        new Timestamp(T + 3600L * 1000)))
      q.processAllAvailable()
      val streamed = spark.table("doc_stream_dedup").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        .filterNot(_._1 == 999999L)
      assert(streamed === expected,
        s"stream/exact divergence: only-stream=${(streamed.keySet -- expected.keySet).take(5)}, " +
          s"only-exact=${(expected.keySet -- streamed.keySet).take(5)}")
    } finally q.stop()
  }
}
