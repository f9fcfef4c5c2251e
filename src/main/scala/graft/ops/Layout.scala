package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering, the
  * technique behind Delta/Iceberg `ZORDER BY`: interleaving the bits of
  * two (or more) bounded keys gives a single sort key under which rows
  * close in EITHER dimension land close on disk, so parquet row-group
  * min/max stats prune scans filtered on either column — a plain sort
  * can only serve its leading column. The reference writes unclustered
  * Delta (batch_process_Bronze_to_Silver.py:317); at 100 TB the layout
  * of the silver table IS the difference between a pruned scan and a
  * full one.
  *
  * The z-value is pure integer bit arithmetic (16-ish flat terms over
  * the two key attributes — no nesting, stays in codegen), so an
  * external oracle replays it bit-for-bit; the clustering guarantee is
  * exact and spec-checkable: an ALIGNED 2^m x 2^m box of the key space
  * is one CONTIGUOUS z-range of length 4^m.
  */
object Layout {

  /** Morton interleave of two `bits`-bit non-negative keys: bit k of `a`
    * lands at position 2k, bit k of `b` at 2k+1. Inputs must already be
    * bounded to [0, 2^bits) — callers fold wider domains (e.g.
    * `pmod(key, 1 << bits)`). NULL in either key yields NULL.
    *
    * Inputs are widened to LongType before shifting: `shiftleft` on an
    * IntegerType column uses Java int semantics (shift count masked to 5
    * bits), so a 32-bit input with bits > 16 would silently wrap — the
    * cast makes the interleave 64-bit regardless of caller column type. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits out of range")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { k =>
      shiftleft(shiftright(al, k).bitwiseAND(1), 2 * k)
        .bitwiseOR(shiftleft(shiftright(bl, k).bitwiseAND(1), 2 * k + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-clustered on (aCol, bCol): range-partition then sort
    * by the z-value so every output file covers one tight z-range (and
    * therefore a tight min/max on BOTH key columns). The helper column
    * is dropped before the write — ordering survives projection.
    * `options` pass through to the parquet writer (e.g. a small
    * `parquet.block.size` to get several row groups per file, so
    * row-group stats pruning — not just file pruning — has grain to
    * work with; see LayoutSpec's pruning proof). */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String, bits: Int,
                    path: String,
                    options: Map[String, String] = Map.empty): Unit =
    df.withColumn("__z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.options(options).mode("overwrite").parquet(path)
}
