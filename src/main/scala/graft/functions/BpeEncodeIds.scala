package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A tokenizer vocabulary as plan-time state: pieces in vocab-id
  * order (id = position). Same value-semantics rationale as
  * [[BpeMergeTable]] — a Seq keeps Catalyst expression equality and
  * canonicalization working; the probe map is a transient view
  * rebuilt after deserialization.
  */
final case class BpeVocabTable(pieces: Seq[String]) extends Serializable {
  @transient lazy val idIndex: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    var id = 0L
    // forward traversal (indexed Seq access is O(n²) on a List at
    // vocabulary size); first occurrence wins duplicate pieces
    pieces.foreach { p =>
      m.putIfAbsent(p, java.lang.Long.valueOf(id))
      id += 1
    }
    m
  }
  def size: Int = pieces.size
}

/** Token-ID encoding: `bpe_encode_ids(text)` with a plan-time merge
  * table AND vocabulary → `array<bigint>` of vocabulary ids — the
  * actual training input a tokenizer build ships, closing the
  * artifact chain train → vocab → ids. Pieces are produced by the
  * SAME rank-order pass kernel as [[BpeEncodePieces]] (one shared
  * static kernel — the semantics [[graft.operators.TextAnalysis.bpeTrain]]'s
  * tables replay and [[graft.operators.TextAnalysis.bpeVocab]]'s ids
  * are defined over), then mapped through the vocabulary; a piece
  * outside the vocabulary encodes as −1, the OOV sentinel the
  * training loader replaces with its own UNK policy.
  *
  * Scale shape: ONE shuffle-free codegen'd projection — both tables
  * ride the plan as reference objects (task-closure broadcast, the
  * [[BpeEncodePieces]] mechanism), so id-encoding a 100 TB corpus is
  * a map-only pass; the alternative broadcast-join + positional
  * reassembly costs a token-grain shuffle for the same result.
  */
case class BpeEncodeIds(child: Expression, table: BpeMergeTable,
    vocab: BpeVocabTable) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "bpe_encode_ids"

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeIds.encode(input.asInstanceOf[UTF8String], table, vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef =
      ctx.addReferenceObj("bpeMergeTable", table, classOf[BpeMergeTable].getName)
    val vocabRef =
      ctx.addReferenceObj("bpeVocabTable", vocab, classOf[BpeVocabTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncodeIds.encode($c, $tableRef, $vocabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

object BpeEncodeIds {

  /** Row kernel: the shared pass-encode produces the pieces, then one
    * hash probe per piece maps to the vocab id (−1 = OOV).
    */
  def encode(s: UTF8String, t: BpeMergeTable, v: BpeVocabTable): ArrayData = {
    val pieces = BpeEncodePieces.encode(s, t)
    val n = pieces.numElements()
    val ids = new Array[Long](n)
    val idx = v.idIndex
    var i = 0
    while (i < n) {
      val id = idx.get(pieces.getUTF8String(i).toString)
      ids(i) = if (id == null) -1L else id.longValue()
      i += 1
    }
    new GenericArrayData(ids)
  }

  /** Column-API entry: merges in rank order, vocabulary pieces in
    * vocab-id order ([[graft.operators.TextAnalysis.bpeVocab]]'s
    * output shape).
    */
  def apply(c: Column, merges: Seq[(String, String)],
      vocabPieces: Seq[String]): Column =
    ColumnBridge.column(BpeEncodeIds(ColumnBridge.expression(c),
      BpeMergeTable(merges), BpeVocabTable(vocabPieces)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  /** Registration triple: `bpe_encode_ids(text, '<merge table>',
    * '<vocab>')` — merges in [[BpeEncodePieces.parseTable]]'s literal
    * format, vocabulary as pieces joined by `|,|` (pieces cannot
    * contain `|`, stripped on corpus entry).
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("bpe_encode_ids"),
    new ExpressionInfo(classOf[BpeEncodeIds].getName, "bpe_encode_ids"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "bpe_encode_ids(text, table, vocab) takes exactly 3 arguments")
      def lit(e: Expression, what: String): String = e match {
        case Literal(v: UTF8String, _: StringType) => v.toString
        case other => throw new IllegalArgumentException(
          s"bpe_encode_ids: $what must be a string literal, got $other")
      }
      val merges = BpeEncodePieces.parseTable(lit(children(1), "table"))
      val vocabLit = lit(children(2), "vocab")
      val vocab =
        if (vocabLit.isEmpty) Nil else vocabLit.split("\\|,\\|", -1).toSeq
      BpeEncodeIds(children(0), BpeMergeTable(merges), BpeVocabTable(vocab))
    })
}
