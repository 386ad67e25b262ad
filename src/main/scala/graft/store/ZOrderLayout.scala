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

  /** Bits kept per dimension in the 2-d form (morton key = 2·Bits
    * wide). 16 bits ≈ 65k distinct cells per dimension — finer than
    * any practical row-group count, so quantization never limits
    * pruning. N-d forms use [[bitsFor]]: min(16, 62 / k) so the key
    * stays inside a non-negative BIGINT at any arity. */
  val Bits = 16

  /** Per-dimension bit width for a k-dimensional key. */
  def bitsFor(k: Int): Int = math.min(Bits, 62 / k)

  /** floor((c − mn) · (2^bits − 1) / (mx − mn)); a constant column
    * (mx = mn) quantizes to 0 everywhere. */
  def quantize(c: Column, mn: Column, mx: Column, bits: Int = Bits): Column =
    when(mx > mn,
      floor(((c.cast("double") - mn.cast("double")) * lit((1 << bits) - 1).cast("double")) /
        (mx.cast("double") - mn.cast("double"))).cast("long"))
      .otherwise(lit(0L))

  /** Bit-interleave of k quantized dimensions, round-robin: bit j of
    * dimension d lands at position j·k + d (for k = 2 that is x on
    * the even bits, y on the odd). Generated shift/mask/or chain —
    * builtins only, codegen'd. */
  def mortonN(qs: Seq[Column], bits: Int): Column = {
    val k = qs.size
    (0 until bits).foldLeft(lit(0L): Column) { (acc, j) =>
      qs.zipWithIndex.foldLeft(acc) { case (a, (q, d)) =>
        a.bitwiseOR(shiftleft(shiftright(q, j).bitwiseAND(lit(1L)), j * k + d))
      }
    }
  }

  /** 2-d convenience form (the historical layout). */
  def morton(xq: Column, yq: Column): Column = mortonN(Seq(xq, yq), Bits)

  /** The same interleave as SQL text (for oracle generation) — one
    * spelling, two engines. */
  def mortonSqlN(qs: Seq[String], bits: Int): String = {
    val k = qs.size
    (0 until bits).flatMap(j => qs.zipWithIndex.map { case (q, d) =>
      s"((($q >> $j) & 1) << ${j * k + d})"
    }).mkString("(", " | ", ")")
  }

  def mortonSql(xq: String, yq: String): String =
    mortonSqlN(Seq(xq, yq), Bits)

  /** `df` + one quantized column per dimension (q0..q{k-1}) + the
    * `morton` key; bounds from ONE 1-row aggregate broadcast onto the
    * scan. */
  def withMortonN(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "z-order needs at least 2 dimensions")
    val bits = bitsFor(cols.size)
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      min(col(c)).cast("double").as(s"__mn$i"),
      max(col(c)).cast("double").as(s"__mx$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val withQ = cols.zipWithIndex.foldLeft(df.crossJoin(broadcast(stats))) {
      case (acc, (c, i)) =>
        acc.withColumn(s"q$i", quantize(col(c), col(s"__mn$i"), col(s"__mx$i"), bits))
    }
    withQ
      .withColumn("morton", mortonN(cols.indices.map(i => col(s"q$i")), bits))
      .drop(cols.indices.flatMap(i => Seq(s"__mn$i", s"__mx$i")): _*)
  }

  /** 2-d form with the historical (xq, yq) column names — what
    * es_zorder_morton hash-verifies. */
  def withMorton(df: DataFrame, xCol: String, yCol: String): DataFrame =
    withMortonN(df, Seq(xCol, yCol))
      .withColumnRenamed("q0", "xq")
      .withColumnRenamed("q1", "yq")

  /** Write `df` parquet-clustered on the z-order of `cols`:
    * range-partitioned AND sorted by the morton key, so each of the
    * `nFiles` output files covers one contiguous curve segment and
    * its footer min/max are tight on EVERY clustered dimension. The
    * helper columns are dropped from the files — layout is invisible
    * to the schema. */
  def writeClusteredN(df: DataFrame, cols: Seq[String],
                      outDir: String, nFiles: Int): Unit =
    withMortonN(df, cols)
      .repartitionByRange(nFiles, col("morton"))
      .sortWithinPartitions("morton")
      .drop(cols.indices.map(i => s"q$i") :+ "morton": _*)
      .write.mode("overwrite").parquet(outDir)

  def writeClustered(df: DataFrame, xCol: String, yCol: String,
                     outDir: String, nFiles: Int): Unit =
    writeClusteredN(df, Seq(xCol, yCol), outDir, nFiles)
}
