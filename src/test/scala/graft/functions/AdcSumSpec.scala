package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** adc_sum(tbl, codes) must equal the declarative higher-order fold it
  * replaces (ascending subspace order, double accumulation) — the
  * IVF-PQ oracle's bit-identity argument leans on this equivalence.
  */
class AdcSumSpec extends SparkSpec {

  test("adc_sum equals the aggregate(sequence(...)) fold bit-for-bit") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 50).map { i =>
      val tbl = Seq.fill(8)(Seq.fill(16)(rnd.nextDouble() * 2 - 1))
      val codes = Seq.fill(8)(rnd.nextInt(16))
      (i.toLong, tbl, codes)
    }
    val df = rows.toDF("id", "tbl", "codes")
    val hof = aggregate(sequence(lit(1), lit(8)), lit(0.0), (acc, m) =>
      acc + element_at(element_at(col("tbl"), m), element_at(col("codes"), m) + 1))
    val out = df.select(col("id"),
      call_function("adc_sum", col("tbl"), col("codes")).as("fast"), hof.as("slow"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"mismatch at id ${r.getLong(0)}")
    }
  }

  test("adc_sum survives codegen and interpreted paths identically") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(Seq(1.5, 2.5), Seq(10.0, 20.0)), Seq(1, 0)))
      .toDF("tbl", "codes")
    // 2.5 (tbl[0][1]) + 10.0 (tbl[1][0])
    assert(df.select(call_function("adc_sum", col("tbl"), col("codes")))
      .head.getDouble(0) === 12.5)
  }
}
