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

  /** Per-dimension bit budget for an n-column interleave: 16 bits per
    * column up to the 62-bit signed-long budget (3 cols → 16 bits,
    * 4 cols → 15).
    */
  def bitsFor(n: Int): Int = math.min(16, 62 / n)

  /** Spread the low `bits` bits of `c` with stride `n`: bit i moves to
    * position n·i. The generic (bit-at-a-time) ladder — `bits` OR'd
    * shift/mask terms, all codegen'd builtins; [[spread16]] is the
    * mask-parallel n=2 special case. The term list is reproduced
    * verbatim in SQL by the fn_zorder3 oracle, so the code is
    * engine-exact bit-for-bit.
    */
  def spreadN(c: Column, n: Int, bits: Int): Column = {
    val x = c.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits)
      .map(i => shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * n))
      .reduce(_.bitwiseOR(_))
  }

  /** n-column Morton code (2 ≤ n ≤ 4): column j's bits land at
    * positions n·i + j, so a sort by the code gives every column
    * ≈(1/n)-power min/max file pruning — the multi-predicate layout
    * a real table wants (date + customer + region, not just two).
    * For n = 2 this is bit-identical to [[zorder2]].
    */
  def zorderN(cols: Seq[Column]): Column = {
    require(cols.size >= 2 && cols.size <= 4, "zorderN takes 2..4 columns")
    val n = cols.size
    val bits = bitsFor(n)
    cols.zipWithIndex
      .map { case (c, j) => shiftleft(spreadN(c, n, bits), j) }
      .reduce(_.bitwiseOR(_))
  }
}
