package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The embedding incremental-dedup contract (the vector-side twin of
  * IncrementalDedupSpec): a new shard is checked against the PERSISTED
  * signature+vector index at shard-proportional cost — the job must
  * read the index files, never the corpus embeddings parquet — and the
  * file-backed path must agree row-for-row with the in-query twin the
  * oracle verifies.
  */
class EmbIncrementalDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("file-backed dedupIncrement equals the in-query twin; appended shards become visible") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sf)
    val corpus = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val shard = e.filter(pmod(col("vec_id"), lit(5)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-index").toString

    EmbIncrementalDedup.build(spark, corpus, dir)
    val viaIndex = EmbIncrementalDedup.dedupIncrement(spark, shard, dir).collect()
    val inQuery = Registry.byName("emb_dedup_incremental").run(spark, sf).collect()
    assert(viaIndex.toSeq === inQuery.toSeq)
    assert(viaIndex.nonEmpty)

    // append the shard; an exact copy of a shard vector arriving in a
    // LATER shard must flag against the now-indexed one at sim 1.0
    EmbIncrementalDedup.appendIncrement(spark, shard, dir)
    val probeId = viaIndex.head.getLong(0)
    val probeVec = e.filter(col("vec_id") === probeId)
      .select("embedding").as[Array[Float]].head()
    val shard2 = Seq((1000000L, probeVec.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    val out2 = EmbIncrementalDedup.dedupIncrement(spark, shard2, dir).collect()
    assert(out2.length === 1)
    assert(out2.head.getBoolean(1), "exact copy of an indexed vector must flag")
    assert(out2.head.getLong(2) === probeId)
    assert(out2.head.getDouble(3) === 1.0)
  }

  test("dedupIncrement scans the index, not the corpus parquet") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sf)
    val corpus = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-index2").toString
    EmbIncrementalDedup.build(spark, corpus, dir)
    val probe = Array.fill(64)(0.1f)
    val shard = Seq((77777L, probe.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    val out = EmbIncrementalDedup.dedupIncrement(spark, shard, dir)
    val files = out.inputFiles.toSeq
    assert(files.nonEmpty, "expected file scans over the index")
    assert(files.forall(_.contains(dir)),
      s"non-index file scanned: ${files.filterNot(_.contains(dir)).take(3).mkString(",")}")
    assert(!files.exists(_.contains("embeddings.parquet")),
      "corpus embeddings parquet must not be scanned by the incremental path")
    out.collect() // and it runs
  }

  test("keep-first within the shard: the later of two identical shard vectors flags") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sf)
    val corpus = e.filter(col("vec_id") < 400)
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-index3").toString
    EmbIncrementalDedup.build(spark, corpus, dir)
    val v = Array.tabulate(64)(i => (i + 1).toFloat / 64)
    val shard = Seq((500000L, v.toSeq, 0), (500001L, v.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    val out = EmbIncrementalDedup.dedupIncrement(spark, shard, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(500000L).getBoolean(1), "first of the identical pair keeps")
    assert(out(500001L).getBoolean(1) && out(500001L).getLong(2) === 500000L,
      "second flags against the first (keep-first)")
  }

  test("decontaminate: a planted paraphrase of a benchmark vector flags, clean corpus passes") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sf)
    // every 20th vector plays the benchmark suite; index it once
    val bench = e.filter(pmod(col("vec_id"), lit(20)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-decon").toString
    EmbIncrementalDedup.build(spark, bench, dir)
    val benchVec = bench.orderBy("vec_id")
      .select("vec_id", "embedding").as[(Long, Array[Float])].head()
    // "paraphrase" = the benchmark vector nudged by small noise —
    // lexically different, semantically on top of it (cosine ≈ 0.9999)
    val paraphrase = benchVec._2.zipWithIndex
      .map { case (x, i) => x + (if (i % 2 == 0) 1e-3f else -1e-3f) }
    // clean doc: an orthogonal-ish direction far from every benchmark
    val clean = Array.tabulate(benchVec._2.length)(i =>
      if (i % 2 == 0) 1.0f else -1.0f)
    val corpus = Seq((900001L, paraphrase.toSeq, 0), (900002L, clean.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    val flagged = EmbIncrementalDedup
      .decontaminateIndex(spark, corpus, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(flagged.contains(900001L),
      "near-identical paraphrase of a benchmark vector must flag")
    assert(flagged(900001L).getLong(1) === benchVec._1,
      "flag must name the benchmark item it leaked from")
    assert(flagged(900001L).getDouble(2) >= EmbIncrementalDedup.Threshold)
    assert(!flagged.contains(900002L),
      "a vector far from every benchmark must pass (absence = clean)")
  }
}
