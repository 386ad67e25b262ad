package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders,
  * events ⋈ events) is the shuffle of both sides. Spark's bucketed
  * tables remove it: both sides are written pre-hash-partitioned into
  * the SAME number of buckets on the join key, so SortMergeJoin reads
  * bucket i of each side directly — zero Exchange in the plan, and the
  * cost is paid ONCE at write time instead of on every query.
  * `sortBy` on the same key additionally pre-orders rows inside each
  * bucket file, so the join skips its Sort when Spark can prove the
  * ordering (and always skips the shuffle).
  *
  * This is the batch twin of EventStore's hash-bucketed event log
  * (EventStore.save partitions by `pmod(hash(decider_id), buckets)`);
  * reference analogue: the PostgreSQL side gets this for free from
  * btree locality (/root/reference/schema.sql:30-35's indexes), a
  * distributed engine has to materialize it.
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted managed table. `buckets` must
    * match on both sides of an intended join for the co-located read.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** True when `plan` contains no shuffle exchange — the property the
    * bucketed layout exists to guarantee. Exposed for specs and for
    * plan audits (PLANS_r*.md).
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    // any Exchange EXCEPT a broadcast is a shuffle — hash, range
    // (orderBy/repartitionByRange) and SinglePartition (global agg)
    // all move data; matching only hashpartitioning would pass those
    val physical = df.queryExecution.executedPlan.toString()
      .replace("BroadcastExchange", "__broadcast__")
    !physical.contains("Exchange")
  }
}
