package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional data-layout key
  * under Delta/Iceberg OPTIMIZE ZORDER: sorting/partitioning by the
  * interleaved bits keeps 2-D-close rows storage-close, so a 2-D box
  * predicate prunes to a small set of z-ranges instead of scanning one
  * dimension's full stripes. Pure bit arithmetic (codegen'd builtins) —
  * FormatsSpec carries the executed partition-pruning receipt.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative values:
    * bit i of x lands at 2i, bit i of y at 2i+1.
    */
  def zInterleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(
          shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(
          shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Driver-side twin of [[zInterleave]] for small-box z-range
    * enumeration (the litmax/bigmin stand-in when the predicate box is
    * small enough to enumerate exactly).
    */
  def zOf(x: Long, y: Long, bits: Int = 16): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
