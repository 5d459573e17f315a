package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** ±1 Johnson–Lindenstrauss projection of a double vector as ONE
  * native codegen'd Catalyst expression: out[o] = Σᵢ sign(o,i) ·
  * floor(v[i]·scale + 0.5), all `outDim` components in a fused loop
  * over a flattened sign constant, the input quantized ONCE into a
  * stack long[].
  *
  * Replaces the composed `transform(sequence, aggregate(sequence,
  * element_at…))` form: higher-order array functions are
  * CodegenFallback, so the composed plan paid outDim interpreted
  * folds × dim boxed element_at calls per row (measured 4.9 s warm
  * over 500 rows at sf0.001; this expression is sub-100 ms). Exact
  * parity: the same floor(x·scale + 0.5) per element, the same
  * ascending-i integer accumulation — bit-identical output, so the
  * DuckDB oracle is unchanged.
  *
  * A null vector, a length mismatch, or any null element yields a
  * null projection (what the composed form produced).
  *
  * Envelope: |acc| ≤ dim·(|v|max·scale + 1) — exact in long for
  * dim ≤ 2¹⁶, |v| ≤ 10⁶, scale ≤ 2¹⁰ (graft.tools.NumericEnvelopes
  * pins the bound). */
case class JlProjection(child: Expression, signs: IndexedSeq[Int],
    outDim: Int, dim: Int, scale: Int) extends UnaryExpression {

  require(signs.length == outDim * dim,
    s"signs must be outDim*dim = ${outDim * dim} values, got ${signs.length}")
  require(outDim >= 1 && dim >= 1 && scale >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"jl_projection needs array<double>, got ${t.simpleString}")
  }

  @transient private lazy val signsArray: Array[Int] = signs.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      q(i) = math.floor(arr.getDouble(i) * scale + 0.5).toLong
      i += 1
    }
    val out = new Array[Long](outDim)
    val s = signsArray
    var o = 0
    while (o < outDim) {
      var acc = 0L
      val base = o * dim
      var j = 0
      while (j < dim) { acc += s(base + j) * q(j); j += 1 }
      out(o) = acc
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flat = ctx.addReferenceObj("jlSigns", signsArray, "int[]")
    val arr = ctx.freshName("arr")
    val q = ctx.freshName("q")
    val out = ctx.freshName("out")
    val valid = ctx.freshName("valid")
    val i = ctx.freshName("i")
    val o = ctx.freshName("o")
    val j = ctx.freshName("j")
    val acc = ctx.freshName("acc")
    val base = ctx.freshName("base")
    val body =
      s"""
         |boolean ${ev.isNull} = true;
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${childGen.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
         |  boolean $valid = $arr.numElements() == $dim;
         |  long[] $q = new long[$dim];
         |  if ($valid) {
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($arr.isNullAt($i)) { $valid = false; break; }
         |      $q[$i] = (long) java.lang.Math.floor(
         |        $arr.getDouble($i) * $scale + 0.5);
         |    }
         |  }
         |  if ($valid) {
         |    long[] $out = new long[$outDim];
         |    for (int $o = 0; $o < $outDim; $o++) {
         |      long $acc = 0L;
         |      int $base = $o * $dim;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $acc += $flat[$base + $j] * $q[$j];
         |      }
         |      $out[$o] = $acc;
         |    }
         |    ${ev.isNull} = false;
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    ev.copy(code = childGen.code + code"$body")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : JlProjection = copy(child = newChild)
}

object JlProjection {
  /** Column API: input cast to array<double> once, before the loop. */
  def project(vec: Column, signs: IndexedSeq[Int], outDim: Int, dim: Int,
      scale: Int): Column =
    ColumnBridge.column(JlProjection(
      ColumnBridge.expression(vec.cast("array<double>")), signs, outDim,
      dim, scale))
}
