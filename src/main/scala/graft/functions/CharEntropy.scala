package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits) of a string's character distribution as a native
  * Catalyst expression — the standard cheap gibberish/boilerplate signal in
  * corpus quality gating (near-zero for `aaaa…`/padding, ~4.2 for English
  * prose, ~6 for base64 or key-mash noise; used alongside the stopword /
  * repetition gates in [[graft.text.TextOps]]). Computing it as an
  * `Expression` keeps the hot path map-only and inside the surrounding
  * WholeStageCodegen stage — the explode→groupBy(char) formulation would
  * shuffle one row per CHARACTER, which is exactly the shape that dies at
  * 100 TB (that formulation is kept as the independent DuckDB oracle).
  *
  * Counts are per Unicode code point, matching DuckDB's
  * `string_split(text,'')` on NFC text (a combining sequence counts as its
  * code points here vs one grapheme there — run [[NfcNormalize]] first, as
  * the curation pipeline does, and the two agree on precomposed forms).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      CharEntropy.entropyBits(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharEntropy.entropyBits($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : CharEntropy = copy(child = newChild)
}

object CharEntropy {
  /** Static entry the generated code calls.
    *
    * H = log2(n) − (Σ cᵢ·log2 cᵢ)/n over code-point counts cᵢ — one pass to
    * count, one over the ≤|alphabet| distinct entries (sorted for a
    * deterministic summation order). Empty string → 0.0.
    */
  def entropyBits(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Array[Int]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Int](1))
      slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      acc += c * (Math.log(c) / Math.log(2.0))
    }
    Math.log(n.toDouble) / Math.log(2.0) - acc / n
  }

  def charEntropy(c: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(c)))
}
