package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** count_tokens must equal
  * `size(regexp_extract_all(s, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))` on
  * letter/digit runs, mixed boundaries, spaces, uppercase (callers
  * lowercase first, but the contract holds for any input), multi-byte
  * UTF-8 and supplementary code points (one token each, like Java's
  * per-code-point classes).
  */
class CountTokensSpec extends SparkSpec {

  private def reference(s: String): Int =
    "[a-z]+|[0-9]+|[^a-z0-9 ]".r.findAllIn(s).length

  private val cases = Seq(
    "", " ", "   ", "abc", "abc def", "ab12cd", "12 34", "a1b2",
    "a.b,c", "...", "ABC", "a  b", "héllo", "日本語", "🙂🙂",
    "mixed 日本 a1. 🙂 z9", "a" * 300, ("a1 " * 100).trim)

  test("helper equals the regex reference") {
    for (s <- cases)
      assert(CountTokens.compute(UTF8String.fromString(s)) == reference(s),
        s"mismatch for '$s'")
  }

  test("random fuzz vs the regex") {
    val rnd = new scala.util.Random(11)
    val pieces = Seq("a", "z", "0", "9", " ", ".", "#", "A", "é", "語", "🙂", "bb", "12")
    for (_ <- 1 to 500) {
      val s = Seq.fill(rnd.nextInt(50))(pieces(rnd.nextInt(pieces.length))).mkString
      assert(CountTokens.compute(UTF8String.fromString(s)) == reference(s),
        s"mismatch for '$s'")
    }
  }

  test("plan path equals the regex spelling run by Spark") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rows = cases.toDF("s").select(
      call_function("count_tokens", col("s")).as("k"),
      size(expr("regexp_extract_all(s, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("r"))
      .collect()
    for (r <- rows) assert(r.getInt(0) == r.getInt(1))
  }
}
