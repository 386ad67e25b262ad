package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered writes — the multi-dimensional
  * data-layout lever (Delta/Iceberg `OPTIMIZE ZORDER`) vanilla Spark
  * lacks: sorting a table by the bit-interleave of two quantized
  * dimensions makes every output file/row-group's [min, max] TIGHT on
  * BOTH columns simultaneously, so any reader's footer-stats pruning
  * (Spark's parquet row-group skipping, DuckDB's zone maps) skips
  * most of the table for a 2-dimensional range predicate — a
  * single-column sort gives tight bounds on one dimension and
  * full-range bounds on the other.
  *
  * At 100 TB this is a WRITE-path decision: one extra range-shuffle
  * at layout time buys every subsequent selective scan; the morton
  * key itself is a pure per-row projection (generated
  * shift/mask/or terms — whole-stage codegen'd, no UDF).
  *
  * Determinism: quantization is floor((v − min) · 65535 / (max −
  * min)) — one multiply and one divide on exact aggregate bounds in a
  * fixed association order, then floor (the ln-boundary discipline:
  * both engines compute the identical IEEE double before the floor);
  * the interleave is integer shift/mask arithmetic. The registry
  * entry (es_zorder_morton, operators/LayoutQueries) hash-verifies
  * the full construction against DuckDB.
  */
object ZOrderLayout {

  /** Bits kept per dimension (morton key = 2·Bits wide). 16 bits ≈
    * 65k distinct cells per dimension — finer than any practical
    * row-group count, so quantization never limits pruning. */
  val Bits = 16

  /** floor((c − mn) · 65535 / (mx − mn)) clamped to [0, 65535]; a
    * constant column (mx = mn) quantizes to 0 everywhere. */
  def quantize(c: Column, mn: Column, mx: Column): Column =
    when(mx > mn,
      floor(((c.cast("double") - mn.cast("double")) * lit((1 << Bits) - 1).cast("double")) /
        (mx.cast("double") - mn.cast("double"))).cast("long"))
      .otherwise(lit(0L))

  /** Bit-interleave of two quantized dimensions: x takes the even bit
    * positions, y the odd. Generated shift/mask/or chain — builtins
    * only, codegen'd. */
  def morton(xq: Column, yq: Column): Column =
    (0 until Bits).foldLeft(lit(0L): Column) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xq, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yq, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The same interleave as SQL text (for oracle generation) — one
    * spelling, two engines. */
  def mortonSql(xq: String, yq: String): String =
    (0 until Bits).flatMap(i => Seq(
      s"((($xq >> $i) & 1) << ${2 * i})",
      s"((($yq >> $i) & 1) << ${2 * i + 1})"))
      .mkString("(", " | ", ")")

  /** `df` + (xq, yq, morton) columns, bounds from one 1-row aggregate
    * broadcast onto the scan. */
  def withMorton(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val stats = df.agg(
      min(col(xCol)).cast("double").as("__xmn"),
      max(col(xCol)).cast("double").as("__xmx"),
      min(col(yCol)).cast("double").as("__ymn"),
      max(col(yCol)).cast("double").as("__ymx"))
    df.crossJoin(broadcast(stats))
      .withColumn("xq", quantize(col(xCol), col("__xmn"), col("__xmx")))
      .withColumn("yq", quantize(col(yCol), col("__ymn"), col("__ymx")))
      .withColumn("morton", morton(col("xq"), col("yq")))
      .drop("__xmn", "__xmx", "__ymn", "__ymx")
  }

  /** Write `df` parquet-clustered on the z-order of (xCol, yCol):
    * range-partitioned AND sorted by the morton key, so each of the
    * `nFiles` output files covers one contiguous curve segment and
    * its footer min/max are tight on BOTH dimensions. The helper
    * columns are dropped from the files — layout is invisible to the
    * schema. */
  def writeClustered(df: DataFrame, xCol: String, yCol: String,
                     outDir: String, nFiles: Int): Unit =
    withMorton(df, xCol, yCol)
      .repartitionByRange(nFiles, col("morton"))
      .sortWithinPartitions("morton")
      .drop("xq", "yq", "morton")
      .write.mode("overwrite").parquet(outDir)
}
