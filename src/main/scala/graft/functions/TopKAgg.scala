package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: `topk_agg(score, id, k)` keeps the
  * k largest (score, id) pairs per group — score DESC, ties id ASC —
  * and returns them as a sorted `array<struct<score double, id
  * bigint>>`.
  *
  * This is the skew-safe per-group top-k. The window form
  * (`row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k`) ships
  * EVERY row of a group to one reducer and sorts it — a single hot
  * group (one viral key at 100 TB) serializes the whole stage. As a
  * [[TypedImperativeAggregate]] this aggregate map-side combines:
  * each input partition contributes at most k pairs per group to the
  * shuffle, so a group's reduce-side cost is O(partitions·k), bounded
  * and skew-free, and the shuffle shrinks from |rows| to
  * |groups|·k·|partitions| worst-case. (Catalyst plans it as
  * ObjectHashAggregate with a partial stage — plan-asserted in the
  * spec.)
  *
  * Buffer is a fixed-size binary min-heap keyed worst-first (smallest
  * score, then LARGEST id, at the root) so every update is O(log k)
  * with zero allocation once warm; serialization is the raw
  * (size, score[], id[]) frame. Null score or id contributes nothing.
  * NOTE the one semantic divergence from the window form: with
  * `ORDER BY score DESC NULLS LAST`, a group holding FEWER than k
  * non-null rows still fills its `rn <= k` quota with null-score
  * rows, while this aggregate emits only the non-null pairs — on a
  * nullable score column the two forms differ exactly on such
  * under-filled groups. That is deliberate (a null score is "no
  * evidence", not "rank me last"); callers wanting window parity on
  * nullable scores must coalesce first. Exact doubles and longs pass
  * through untouched — cross-engine deterministic including the tie
  * order.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Heap] {

  require(k >= 1 && k <= 100000, s"topk_agg: k must be in [1, 100000], got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val scoreOk = scoreExpr.dataType match {
      case DoubleType | FloatType | IntegerType | LongType | ShortType |
           ByteType | _: DecimalType => true
      case _ => false
    }
    val idOk = idExpr.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (scoreOk && idOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_agg expects (numeric score, integral id), got " +
        s"(${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")
  }

  override def nullable: Boolean = false

  override def dataType: DataType = TopKAgg.resultType

  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val score = s match {
        case d: Double => d
        case f: Float => f.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: java.lang.Number => n.doubleValue()
      }
      val id = i match {
        case l: java.lang.Long => l.longValue()
        case n: java.lang.Number => n.longValue()
      }
      buf.offer(score, id)
    }
    buf
  }

  override def merge(buf: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    val out = buf.sortedDesc()
    new GenericArrayData(out.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.size)
    buf.foreach { (s, i) => o.writeDouble(s); o.writeLong(i) }
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKAgg.Heap(k)
    var j = 0
    while (j < n) {
      h.offer(in.readDouble(), in.readLong())
      j += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** Fixed-capacity binary min-heap, WORST entry at the root — worst
    * means (smaller score, then larger id), the exact inverse of the
    * output order, so `offer` can reject or displace in O(log k).
    *
    * Score comparisons use SQL's total order for doubles (NaN sorts
    * GREATEST, −0.0 equals 0.0 — `offer` normalizes the sign), so the
    * result matches the window `ORDER BY score DESC` form bit for bit
    * even on NaN-bearing columns; a naive IEEE `<` would let one NaN
    * poison the root and reject every later offer. Backing arrays
    * start small and grow geometrically to k — a large-k aggregate
    * over many tiny groups must not pay k·16 bytes per group buffer.
    */
  final class Heap(capacity: Int) {
    private var scores = new Array[Double](math.min(capacity, 16))
    private var ids = new Array[Long](math.min(capacity, 16))
    private var n = 0

    def size: Int = n

    // a is WORSE than b (belongs nearer the root); NaN is the BEST
    // score (java.lang.Double.compare: NaN > any finite > -Inf)
    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = java.lang.Double.compare(sa, sb)
      c < 0 || (c == 0 && ia > ib)
    }

    private def ensure(cap: Int): Unit = {
      if (cap > scores.length) {
        val next = math.min(capacity, math.max(cap, scores.length * 2))
        scores = java.util.Arrays.copyOf(scores, next)
        ids = java.util.Arrays.copyOf(ids, next)
      }
    }

    def offer(s0: Double, i: Long): Unit = {
      val s = if (s0 == 0.0) 0.0 else s0 // normalize -0.0 (SQL equality)
      if (n < capacity) {
        ensure(n + 1)
        // sift up
        var c = n
        scores(c) = s; ids(c) = i
        n += 1
        while (c > 0) {
          val p = (c - 1) >> 1
          if (worse(scores(c), ids(c), scores(p), ids(p))) {
            val ts = scores(c); val ti = ids(c)
            scores(c) = scores(p); ids(c) = ids(p)
            scores(p) = ts; ids(p) = ti
            c = p
          } else c = 0
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        // displace the root, sift down
        scores(0) = s; ids(0) = i
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1
          val r = l + 1
          var w = p
          if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
          if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
          if (w == p) done = true
          else {
            val ts = scores(p); val ti = ids(p)
            scores(p) = scores(w); ids(p) = ids(w)
            scores(w) = ts; ids(w) = ti
            p = w
          }
        }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    /** Entries in output order: score DESC (NaN first — SQL's DESC
      * total order), id ASC.
      */
    def sortedDesc(): Array[(Double, Long)] = {
      val arr = new Array[(Double, Long)](n)
      var j = 0
      while (j < n) { arr(j) = (scores(j), ids(j)); j += 1 }
      scala.util.Sorting.stableSort(arr,
        (a: (Double, Long), b: (Double, Long)) => {
          val c = java.lang.Double.compare(a._1, b._1)
          c > 0 || (c == 0 && a._2 < b._2)
        })
      arr
    }
  }

  /** Column-API entry: per-group top-k as a sorted array of structs.
    * Explode + inline to get row form.
    */
  def apply(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Registration triple for SparkSessionExtensions.injectFunction:
    * `topk_agg(score, id, k)` in SQL — k must be an integer literal
    * (it sizes the heap at plan time).
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("topk_agg"),
    new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "topk_agg(score, id, k) takes exactly 3 arguments")
      val k = children(2) match {
        case Literal(v: Int, IntegerType) => v
        case Literal(v: Long, LongType) => v.toInt
        case other => throw new IllegalArgumentException(
          s"topk_agg: k must be an integer literal, got $other")
      }
      TopKAgg(children(0), children(1), k)
    })
}
