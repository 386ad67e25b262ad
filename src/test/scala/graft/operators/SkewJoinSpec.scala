package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = spark.range(0, 20000)
      .select((when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 100)).as("k"),
        col("id").as("payload"))
    val dim = spark.range(0, 100).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("dval"))
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "dval")
    val salted = SkewJoin.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "payload", "dval")
    assert(plain.exceptAll(salted).count() === 0L)
    assert(salted.exceptAll(plain).count() === 0L)
  }

  test("hot-key rows spread across multiple salt buckets") {
    import spark.implicits._
    val fact = spark.range(0, 10000)
      .select(lit(7L).as("k"), col("id").as("payload"))
    val salts = fact.withColumn("__salt", pmod(hash(col("k"), col("payload")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4L) // one hot key fans out over most salt buckets
  }
}
