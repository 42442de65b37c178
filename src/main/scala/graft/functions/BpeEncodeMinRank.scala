package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Min-rank-first BPE encode: `bpe_encode_minrank(text)` with a
  * plan-time merge table → `array<string>` of the encoded pieces.
  *
  * This is the CLASSIC BPE encode loop — the semantics every
  * externally-trained merge table (an HF-style `merges.txt`) assumes:
  * repeatedly merge the currently-adjacent pair with the LOWEST rank,
  * leftmost occurrence first, until no adjacent pair is in the table.
  * Two deliberate contrasts with [[BpeEncodePieces]] (the rank-order
  * pass twin that [[graft.operators.TextAnalysis.bpeTrain]]'s corpus
  * rewrite replays):
  *
  *  - a LATER merge can re-enable an EARLIER one: with merges
  *    1:(ab,c), 2:(a,b) over [a b c], rank 2 produces piece `ab`,
  *    which rank 1 then merges to [abc] — the pass kernel gives
  *    [a&#x1f;b, c] and never revisits rank 1;
  *  - merged pieces are the PLAIN CONCATENATION l+r (the external
  *    table's vocabulary entries), not the engine-internal
  *    l+U+001F+r marker form — so the output pieces are the strings
  *    an external tokenizer's vocab file actually contains.
  *
  * One occurrence merges at a time, ordered by (rank, position) — not
  * a full pass per rank: with merges 1:(ab,a), 2:(a,b) over
  * [a b a b], merging the leftmost (a,b) yields [ab, a, b] whose
  * (ab,a) outranks the remaining (a,b), giving [aba, b]; a
  * full-pass-per-rank loop would give [ab, ab]. The one-at-a-time
  * order is what HF-style tokenizers implement, so that is the
  * interop contract this expression keeps (property- and
  * fixture-tested; the DuckDB oracle replays it string-surgically).
  *
  * Scale shape per row: a doubly-linked piece list + a binary heap of
  * (rank, pos) candidates with lazy invalidation — every currently
  * adjacent in-table pair always has a live heap entry carrying its
  * current rank, stale entries fail the rank re-check on pop and
  * drop. O(pieces + merges_applied · log pieces) per row, table
  * probes via one hash map riding the plan as a single reference
  * object (same mechanism as [[BpeEncodePieces]]). Inside whole-stage
  * codegen via the static kernel forwarder.
  */
case class BpeEncodeMinRank(child: Expression, table: BpeMergeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_minrank expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_encode_minrank"

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeMinRank.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef =
      ctx.addReferenceObj("bpeMergeTable", table, classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncodeMinRank.encode($c, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeMinRank =
    copy(child = newChild)
}

object BpeEncodeMinRank {

  /** Row kernel, shared by interpreted eval and codegen. Tokenization
    * prep is [[BpeEncodePieces.encode]]'s verbatim: strip `|`/U+001F
    * (the oracle's rep-string delimiters), trim SPACES only, split on
    * `" +"` with limit −1 — an empty text yields the single empty
    * piece. Tokens therefore never contain a space, and min-rank
    * merged pieces are space-free concatenations, so `l + " " + r` is
    * an unambiguous pair key.
    */
  def encode(s: UTF8String, t: BpeMergeTable): ArrayData = {
    val raw = s.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var ci = 0
    while (ci < raw.length) {
      val ch = raw.charAt(ci)
      if (ch != '|' && ch != '\u001f') sb.append(ch)
      ci += 1
    }
    var lo = 0
    var hi = sb.length
    while (lo < hi && sb.charAt(lo) == ' ') lo += 1
    while (hi > lo && sb.charAt(hi - 1) == ' ') hi -= 1
    val pieces = sb.substring(lo, hi).split(" +", -1)
    val n = pieces.length
    val alive = new Array[Boolean](n)
    java.util.Arrays.fill(alive, true)
    var nAlive = n
    if (n >= 2 && t.size > 0) {
      val ranks = t.minRankIndex
      def rankOf(a: String, b: String): Int = {
        val r = ranks.get(a + " " + b)
        if (r == null) -1 else r.intValue()
      }
      val nxt = new Array[Int](n)
      val prv = new Array[Int](n)
      var i = 0
      while (i < n) {
        nxt(i) = if (i + 1 < n) i + 1 else -1
        prv(i) = i - 1
        i += 1
      }
      // (rank, leftPos) packed into one long: natural ordering = pop
      // the lowest rank, leftmost occurrence first (node indices are
      // stable across merges — the left node absorbs, the right dies)
      val heap = new java.util.PriorityQueue[java.lang.Long](math.max(16, n))
      i = 0
      while (i < n - 1) {
        val r = rankOf(pieces(i), pieces(i + 1))
        if (r > 0) heap.add((r.toLong << 32) | i.toLong)
        i += 1
      }
      while (!heap.isEmpty) {
        val e = heap.poll().longValue()
        val r = (e >>> 32).toInt
        val p = (e & 0xffffffffL).toInt
        // lazy invalidation: act only if the pair at p still exists
        // with exactly this rank (a merge at p or its neighbors
        // re-pushed the fresh pair when it formed)
        if (alive(p)) {
          val j = nxt(p)
          if (j != -1 && rankOf(pieces(p), pieces(j)) == r) {
            pieces(p) = pieces(p) + pieces(j) // plain concat: the external vocab entry
            alive(j) = false
            nAlive -= 1
            nxt(p) = nxt(j)
            if (nxt(j) != -1) prv(nxt(j)) = p
            if (prv(p) != -1) {
              val r2 = rankOf(pieces(prv(p)), pieces(p))
              if (r2 > 0) heap.add((r2.toLong << 32) | prv(p).toLong)
            }
            if (nxt(p) != -1) {
              val r2 = rankOf(pieces(p), pieces(nxt(p)))
              if (r2 > 0) heap.add((r2.toLong << 32) | p.toLong)
            }
          }
        }
      }
    }
    val out = new Array[Any](nAlive)
    var k = 0
    var w = 0
    while (k < n) {
      if (alive(k)) { out(w) = UTF8String.fromString(pieces(k)); w += 1 }
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry: the merge table is a driver-side Seq in rank
    * order — an externally-trained (HF-style) table's row order.
    */
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      BpeEncodeMinRank(ColumnBridge.expression(c), BpeMergeTable(merges)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Registration triple for SparkSessionExtensions.injectFunction:
    * `bpe_encode_minrank(text, '<table literal>')` — same
    * [[BpeEncodePieces.parseTable]] literal format as the pass twin.
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("bpe_encode_minrank"),
    new ExpressionInfo(classOf[BpeEncodeMinRank].getName, "bpe_encode_minrank"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "bpe_encode_minrank(text, table) takes exactly 2 arguments")
      val tableLit = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, _: StringType) =>
          v.toString
        case other =>
          throw new IllegalArgumentException(
            s"bpe_encode_minrank: table must be a string literal, got $other")
      }
      BpeEncodeMinRank(children(0), BpeMergeTable(BpeEncodePieces.parseTable(tableLit)))
    })
}
