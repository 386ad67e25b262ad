package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY X-notes; the manual
  * fallback when AQE's skew-join split cannot apply, e.g. a broadcast
  * threshold forces a sort-merge join against a dimension too big to
  * broadcast and one key dominates the fact side).
  *
  * The fact side gets a deterministic salt in [0, salts) per ROW; the
  * dimension side is replicated `salts` times. The join key becomes
  * (key, salt), so one hot key's rows spread over `salts` tasks
  * instead of one. Row-level `pmod(hash(monotonically-varying cols))`
  * is NOT used — the salt must be independent of the key but stable,
  * so it derives from a uniform hash of the whole fact row's join-side
  * payload columns.
  */
object SkewJoin {

  /** Inner equi-join `fact ⋈ dim ON fact(key) = dim(key)` with the
    * dimension replicated across `salts` salt values.
    *
    * @param saltSource columns of `fact` whose hash spreads rows of a
    *                   hot key across salts (any columns with per-row
    *                   variety; defaults to all of fact's columns).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltSource: Seq[Column] = Nil): DataFrame = {
    val src = if (saltSource.nonEmpty) saltSource else fact.columns.toSeq.map(col)
    val saltedFact = fact.withColumn("__salt", pmod(hash(src: _*), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
