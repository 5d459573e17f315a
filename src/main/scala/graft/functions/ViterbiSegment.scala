package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled Viterbi word segmentation under a config-sized unigram
  * piece model — the native replacement for [[graft.text.UnigramLm]]'s
  * composed higher-order `aggregate` DP (r15 optimization).
  *
  * The composed fold was the unigram family's hot path: Catalyst
  * higher-order functions are CodegenFallback, and the forward DP paid
  * an interpreted lambda tree PLUS a full `concat(best, array(x))`
  * re-allocation per character (O(len²) copying), then a second
  * interpreted fold for the backtrace — all repeated per EM iteration
  * and again at encode. This expression runs the IDENTICAL recurrence
  * as one tight loop inside whole-stage codegen; the piece scores ride
  * the expression as a reference object (exactly the payload a
  * broadcast hash join would ship), so the lattice join + per-word
  * collect_list shuffle disappear outright.
  *
  * EXACT-parity contract with the composed DP (the DuckDB oracles
  * replay the recurrence, so semantics must not move a bit):
  *  - positions are CODE POINTS (the composed DP's `length`/`substr`
  *    semantics), not UTF-16 units;
  *  - best[i] = max over j in [max(0, i-maxPieceLen), i) with
  *    w[j..i) scored: best[j] + score; ties break to the SMALLEST j
  *    (the composed `array_max` over (total, -j) structs) — the
  *    ascending-j scan with strict improvement keeps exactly that;
  *  - the pieces array comes back in BACK-TO-FRONT backtrace order
  *    (first element = last piece), as the composed walk emitted it;
  *  - a word with an unreachable end (a character outside the model —
  *    impossible in the learn loop, where every single-char piece of
  *    the vocabulary is in the model by construction) yields null;
  *  - the alt variant additionally skips candidate edges whose piece
  *    equals `px` (the [[graft.text.UnigramPrune]] exclusion DP); its
  *    total for an unreachable word is null. Unreachable interior
  *    positions are skipped exactly as the composed fold's null-
  *    propagating `array_max` skipped them.
  */
object ViterbiSegment {

  /** Shared forward pass: fills best/bp, returns true when best[n] is
    * reachable. `excl` (nullable) is the piece string to exclude. */
  private def forward(cps: Array[Int], scores: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int, excl: String, best: Array[Long],
      bp: Array[Int]): Boolean = {
    val n = cps.length
    java.util.Arrays.fill(best, Long.MinValue)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Long.MinValue) {
          val piece = new String(cps, j, i - j)
          if (excl == null || piece != excl) {
            val s = scores.get(piece)
            if (s != null && best(j) + s.longValue() > best(i)) {
              best(i) = best(j) + s.longValue()
              bp(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    best(n) != Long.MinValue
  }

  /** Backtraced pieces, back-to-front; null when unreachable. */
  def pieces(w: UTF8String, scores: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): GenericArrayData = {
    val cps = w.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(new Array[AnyRef](0)
      .asInstanceOf[Array[Any]])
    val best = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    if (!forward(cps, scores, maxPieceLen, null, best, bp)) return null
    val out = new Array[AnyRef](n)
    var m = 0
    var pos = n
    while (pos > 0) {
      val j = bp(pos)
      out(m) = UTF8String.fromString(new String(cps, j, pos - j))
      m += 1
      pos = j
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m)
      .asInstanceOf[Array[Any]])
  }

  /** Best path total in micro-nats; Long.MinValue = unreachable (the
    * codegen null sentinel). */
  def total(w: UTF8String, scores: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Long = {
    val cps = w.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    val best = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    if (forward(cps, scores, maxPieceLen, null, best, bp)) best(n)
    else Long.MinValue
  }

  /** Best path total avoiding piece `px`; Long.MinValue = unreachable. */
  def altTotal(w: UTF8String, px: UTF8String,
      scores: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int): Long = {
    val cps = w.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    val best = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    if (forward(cps, scores, maxPieceLen, px.toString, best, bp)) best(n)
    else Long.MinValue
  }

  /** The score map as the task-shippable reference object. */
  def buildScores(pairs: Iterable[(String, Long)])
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pairs.size * 2)
    pairs.foreach { case (p, s) => m.put(p, s) }
    m
  }

  def viterbiPieces(w: Column, scores: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Column =
    ColumnBridge.column(
      ViterbiPiecesExpr(ColumnBridge.expression(w), scores, maxPieceLen))

  def viterbiTotal(w: Column, scores: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Column =
    ColumnBridge.column(
      ViterbiTotalExpr(ColumnBridge.expression(w), scores, maxPieceLen))

  def viterbiAltTotal(w: Column, px: Column,
      scores: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int): Column =
    ColumnBridge.column(ViterbiAltTotalExpr(ColumnBridge.expression(w),
      ColumnBridge.expression(px), scores, maxPieceLen))

  private[functions] def checkString(t: DataType, who: String)
      : TypeCheckResult = t match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$who needs string, got ${other.simpleString}")
  }
}

/** viterbi_pieces(w): best segmentation's pieces, back-to-front. */
case class ViterbiPiecesExpr(child: Expression,
    scores: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "viterbi_pieces"

  override def checkInputDataTypes(): TypeCheckResult =
    ViterbiSegment.checkString(child.dataType, prettyName)

  override def nullSafeEval(v: Any): Any =
    ViterbiSegment.pieces(v.asInstanceOf[UTF8String], scores, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("viterbiScores", scores,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, w => {
      s"""
         |${ev.value} = graft.functions.ViterbiSegment.pieces(
         |  $w, $mapRef, $maxPieceLen);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ViterbiPiecesExpr = copy(child = newChild)
}

/** viterbi_total(w): best path total in micro-nats. */
case class ViterbiTotalExpr(child: Expression,
    scores: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "viterbi_total"

  override def checkInputDataTypes(): TypeCheckResult =
    ViterbiSegment.checkString(child.dataType, prettyName)

  override def nullSafeEval(v: Any): Any = {
    val r = ViterbiSegment.total(v.asInstanceOf[UTF8String], scores,
      maxPieceLen)
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("viterbiScores", scores,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, w => {
      s"""
         |${ev.value} = graft.functions.ViterbiSegment.total(
         |  $w, $mapRef, $maxPieceLen);
         |${ev.isNull} = (${ev.value} == Long.MIN_VALUE);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ViterbiTotalExpr = copy(child = newChild)
}

/** viterbi_alt_total(w, px): best path total avoiding piece px — the
  * [[graft.text.UnigramPrune]] exclusion DP. */
case class ViterbiAltTotalExpr(left: Expression, right: Expression,
    scores: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "viterbi_alt_total"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(w: Any, px: Any): Any = {
    val r = ViterbiSegment.altTotal(w.asInstanceOf[UTF8String],
      px.asInstanceOf[UTF8String], scores, maxPieceLen)
    if (r == Long.MinValue) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("viterbiScores", scores,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (w, px) => {
      s"""
         |${ev.value} = graft.functions.ViterbiSegment.altTotal(
         |  $w, $px, $mapRef, $maxPieceLen);
         |${ev.isNull} = (${ev.value} == Long.MIN_VALUE);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ViterbiAltTotalExpr =
    copy(left = newLeft, right = newRight)
}
