package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** simhash_votes must equal the declarative spelling — per token
  * occurrence (maximal [a-z]+ run), ±1 votes from md5 hex-digit bits,
  * summed per bit — with element 65 carrying the token count.
  */
class SimHashVotesSpec extends SparkSpec {

  private def reference(txt: String): (Seq[Long], Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = "[a-z]+".r.findAllIn(txt).toSeq
    val votes = new Array[Long](64)
    for (w <- toks) {
      md.reset()
      val hx = md.digest(w.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString
      for (j <- 0 until 64) {
        val digit = Integer.parseInt(hx(j / 4).toString, 16)
        votes(j) += (if (((digit >> (j % 4)) & 1) == 1) 1 else -1)
      }
    }
    (votes.toSeq, toks.size.toLong)
  }

  private val cases = Seq(
    "", "   ", "the quick brown fox", "a", "A B C", "0x9 12ab34",
    "é語ab cd-ef", "dup dup dup dup", "x" * 200)

  test("helper equals the plain-Scala reference") {
    for (txt <- cases) {
      val got = SimHashVotes.compute(UTF8String.fromString(txt))
      val longs = (0 until 65).map(got.getLong)
      val (votes, n) = reference(txt)
      assert(longs.take(64) == votes && longs(64) == n, s"mismatch for '$txt'")
    }
  }

  test("plan path equals the declarative md5/conv spelling") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = (cases ++ Seq.tabulate(50) { k =>
      val rnd = new scala.util.Random(k)
      Seq.fill(rnd.nextInt(30))("abc def G 7 é ok".split(" ")(rnd.nextInt(6)))
        .mkString(" ")
    }).zipWithIndex.map(_.swap).toDF("id", "txt")
    val kernel = df.select(col("id"),
        call_function("simhash_votes", col("txt")).as("v"))
      .filter(element_at(col("v"), 65) > 0)
      .select(col("id") +:
        (0 until 64).map(j => element_at(col("v"), j + 1).as(s"s$j")): _*)
    val toks = df.select(col("id"),
        explode(expr("regexp_extract_all(txt, '[a-z]+', 0)")).as("w"))
      .withColumn("hx", md5(col("w")))
    val toksD = (0 until 16).foldLeft(toks)((acc, dd) =>
      acc.withColumn(s"d$dd", expr(s"int(conv(substring(hx, ${dd + 1}, 1), 16, 10))")))
    val sumCols = (0 until 64).map(j =>
      sum(when(expr(s"(shiftright(d${j / 4}, ${j % 4}) & 1) = 1"), 1).otherwise(-1))
        .as(s"s$j"))
    val decl = toksD.groupBy("id").agg(sumCols.head, sumCols.tail: _*)
    assert(kernel.exceptAll(decl).isEmpty && decl.exceptAll(kernel).isEmpty)
  }
}
