package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-column data layout.
  *
  * Sorting a write by a single column gives perfect min/max file
  * pruning on THAT column and none on any other; sorting by the
  * Morton interleave of two columns gives good (≈√-factor) pruning on
  * BOTH — the standard clustered-layout trick for a 100 TB table
  * queried by more than one predicate column. Readers need no support:
  * parquet min/max stats per file/row-group do the pruning, the curve
  * only decides which rows land together (see [[graft.sources.Sinks
  * .writeZOrdered]], locality asserted in SinksSpec).
  *
  * Pure bitwise column arithmetic (shift/and/or ladder) — codegen'd
  * builtins, no UDF, engine-exact: the oracle reproduces the same
  * ladder in SQL and matches bit-for-bit.
  */
object ZOrder {

  private val Masks = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `c`: bit i moves to position 2i. */
  def spread16(c: Column): Column =
    Masks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code over the low 16 bits of `a` and `b` (`a` takes
    * the even bit positions). Columns with >16 significant bits should
    * be range-bucketed first — layout needs relative order, not
    * full-width uniqueness.
    */
  def zorder2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
