package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The registry's doc_pii_scrub runs over a corpus with no PII (the
  * oracle checks exact passthrough), so the actual redaction behavior
  * is asserted here on planted data.
  */
class PiiScrubSpec extends SparkSpec {

  private def scrub(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(regexp_replace(
        regexp_replace(col("text"), lit(PiiPatterns.email), lit("<EMAIL>")),
        lit(PiiPatterns.phone), lit("<PHONE>")).as("s"))
      .head().getString(0)
  }

  test("emails are redacted, all occurrences") {
    assert(scrub("mail jane.doe+x@example.co.uk or bob@site.io now") ==
      "mail <EMAIL> or <EMAIL> now")
  }

  test("phone numbers are redacted in -, . and space forms") {
    assert(scrub("call 555-123-4567 or 555.123.4567 or 555 123 4567") ==
      "call <PHONE> or <PHONE> or <PHONE>")
  }

  test("clean text passes through unchanged") {
    val t = "spark batch column sort 123456 plain words"
    assert(scrub(t) == t)
  }

  test("word boundaries hold: digit runs inside longer numbers are kept") {
    assert(scrub("id 9555-123-45678 stays") == "id 9555-123-45678 stays")
  }
}
