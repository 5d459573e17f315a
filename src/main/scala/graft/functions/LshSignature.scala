package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Sign-bit LSH signature over a double vector as ONE native codegen'd
  * Catalyst expression: bit p = 1 iff v · plane_p > 0, all `nBits` planes
  * in a single fused loop over a flattened plane constant.
  *
  * Replaces the composed per-bit `aggregate(zip_with(v, plane, _*_))`
  * form: higher-order array functions are CodegenFallback in Spark, so the
  * old expression paid nBits interpreted lambda evaluations AND nBits
  * zipped-array allocations per row — 12 tables × 6 bits = 72 of each per
  * row on the embedding-dedup path. This expression stays inside
  * WholeStageCodegen with zero allocation.
  *
  * Exact-parity contract with the composed form (the DuckDB oracles replay
  * the signatures, so semantics must not move):
  *  - each dot product accumulates left-to-right over ascending i — the
  *    same float-op order as ArrayAggregate's fold, so bits are identical;
  *  - a null vector, a vector whose length differs from `dim`, or any null
  *    element yields signature 0L (never null) — exactly what the
  *    when(null-dot > 0).otherwise(0) + reduce(+) composition produced.
  */
case class LshSignature(child: Expression, planes: IndexedSeq[Double],
    nBits: Int, dim: Int) extends UnaryExpression {

  require(planes.length == nBits * dim,
    s"planes must be nBits*dim = ${nBits * dim} doubles, got ${planes.length}")
  require(nBits >= 1 && nBits <= 63, "nBits must be in [1, 63]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_signature needs array<double>, got ${t.simpleString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return java.lang.Long.valueOf(0L)
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return java.lang.Long.valueOf(0L)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return java.lang.Long.valueOf(0L)
      i += 1
    }
    val flat = planesArray
    var sig = 0L
    var p = 0
    while (p < nBits) {
      var dot = 0.0
      val base = p * dim
      var j = 0
      while (j < dim) { dot += arr.getDouble(j) * flat(base + j); j += 1 }
      if (dot > 0.0) sig |= 1L << p
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }

  @transient private lazy val planesArray: Array[Double] = planes.toArray

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flat = ctx.addReferenceObj("lshPlanes", planesArray, "double[]")
    val arr = ctx.freshName("arr")
    val sig = ctx.freshName("sig")
    val valid = ctx.freshName("valid")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val j = ctx.freshName("j")
    val dot = ctx.freshName("dot")
    val base = ctx.freshName("base")
    val body =
      s"""
         |long $sig = 0L;
         |if (!${childGen.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
         |  boolean $valid = $arr.numElements() == $dim;
         |  if ($valid) {
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($arr.isNullAt($i)) { $valid = false; break; }
         |    }
         |  }
         |  if ($valid) {
         |    for (int $p = 0; $p < $nBits; $p++) {
         |      double $dot = 0.0;
         |      int $base = $p * $dim;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $dot += $arr.getDouble($j) * $flat[$base + $j];
         |      }
         |      if ($dot > 0.0) $sig |= 1L << $p;
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(
      code = childGen.code + code"$body",
      isNull = FalseLiteral,
      value = JavaCode.variable(sig, LongType))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : LshSignature = copy(child = newChild)
}

object LshSignature {
  /** Column API: input cast to array<double> once, before the loop. */
  def signature(vec: Column, planes: IndexedSeq[Double], nBits: Int,
      dim: Int): Column =
    ColumnBridge.column(LshSignature(
      ColumnBridge.expression(vec.cast("array<double>")), planes, nBits, dim))
}
