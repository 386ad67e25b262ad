package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent persist: Spark's CacheManager already dedups identical
  * logical plans (a second `.persist` of the same plan reuses the
  * first's data), but it logs a "Asked to cache already cached data"
  * WARN per hit. `Dataset.storageLevel` consults the CacheManager
  * through public API, so guarding on it makes cross-query reuse of a
  * shared subplan (document shingles, vector norms) silent AND makes
  * the reuse explicit in the code.
  */
object Caching {
  def persistOnce(df: DataFrame,
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist(level) else df
}
