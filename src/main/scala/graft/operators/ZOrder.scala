package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional answer to
  * "which column do I sort the files by?". Sorting a 100 TB table by one
  * column gives perfect row-group min/max pruning on that column and none
  * on any other; interleaving the bits of TWO dimensions into one sort key
  * keeps rows that are close in EITHER dimension close on disk, so parquet
  * row-group statistics prune box predicates on both. (The technique
  * behind Delta/Iceberg OPTIMIZE ZORDER, expressed as plain Spark:
  * a pure bit-arithmetic sort key + repartitionByRange, nothing
  * engine-private.)
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so consecutive bits land 2 apart
    * (0b1111 → 0b01010101) — the classic mask-doubling Morton step; pure
    * codegen'd bit arithmetic, also expressible 1:1 in any SQL oracle. */
  private def spread16(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x33333333L))
    v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x55555555L))
    v
  }

  /** 32-bit Morton key interleaving the low 16 bits of two non-negative
    * dimension columns (a in the even bit positions, b in the odd). */
  def morton16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Lay `df` out in Morton order over (dimA, dimB): range-partition by
    * the interleaved key into `nFiles` output partitions (each a
    * contiguous Z-curve segment → tight min/max on BOTH dims), sorted
    * within partitions so row groups inside a file stay tight too. One
    * range shuffle — the same cost as any global sort — paid once at
    * write time, repaid on every box-predicate scan. */
  def layoutByZ(df: DataFrame, dimA: String, dimB: String,
      nFiles: Int): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    require(!df.columns.contains("_z"),
      "layoutByZ writes working column '_z' — input already has one")
    df.withColumn("_z", morton16(col(dimA), col(dimB)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
