package graft

/** The raw-SQL front door: registerSqlViews exposes every table as a
  * temp view (events nanosecond handling included) plus the custom
  * Catalyst functions, so plain `spark.sql` — the surface a user of
  * the SQL reference expects — drives the engine.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("plain SQL over the registered views matches the DataFrame registry") {
    Tables.registerSqlViews(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         GROUP BY l_returnflag ORDER BY l_returnflag""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val viaDf = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").count().orderBy("l_returnflag").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(viaSql === viaDf)
  }

  test("events view carries the normalized microsecond timestamp") {
    Tables.registerSqlViews(spark, sf)
    val row = spark.sql(
      "SELECT min(ts) AS lo, max(ts) AS hi, count(*) AS n FROM events").head()
    assert(row.getAs[java.sql.Timestamp]("lo").getTime > 0L)
    assert(row.getLong(2) > 0L)
    // joins across views work (events × a TPC-H dim is nonsensical
    // semantically but exercises the catalog)
    assert(spark.sql(
      """SELECT count(*) FROM events e JOIN nation n
         ON pmod(e.user_id, 25) = n.n_nationkey""").head().getLong(0) > 0L)
  }

  test("custom Catalyst functions are callable from SQL") {
    Tables.registerSqlViews(spark, sf)
    val sims = spark.sql(
      """SELECT a.vec_id, round(cosine_sim(a.embedding, a.embedding), 6) AS self_sim
         FROM embeddings a ORDER BY a.vec_id LIMIT 5""").collect()
    assert(sims.length === 5)
    sims.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"self-cosine must be 1.0: $r"))
    val sigs = spark.sql(
      """SELECT size(band_sigs(embedding,
           array(array(CAST(0.5 AS FLOAT)), array(CAST(-0.5 AS FLOAT))), 1)) AS n
         FROM embeddings LIMIT 1""").head()
    assert(sigs.getInt(0) === 2, "two 1-bit bands from two planes")
  }
}
