package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** SQUARED euclidean distance of two double arrays as a native Catalyst
  * expression with whole-stage codegen — the coarse-quantizer hot loop of
  * [[graft.sim.SimilarityOps]] (IVF assignment, SemDeDup cells), where
  * every vector is scored against every centroid per pass.
  *
  * Squared (no sqrt) deliberately: the quantizer argmins compare d² with
  * a (d², cid) tie-break, and the DuckDB oracles replay d² — sqrt is
  * monotone but not injective in doubles, so taking it here could merge
  * two distinct d² into one rounded root and flip a tie-break the oracle
  * would not flip. Accumulation order matches the composed
  * `aggregate(zip_with(v, c, (a,b) => (a−b)²), 0.0, +)` form (one
  * left-to-right pass), so for EQUAL-LENGTH, NULL-FREE arrays — the
  * quantizer invariant, and the same min-length convention as
  * [[EuclideanDistance]]/[[CosineSimilarity]] — swapping the composed form
  * for this expression is bit-identical. (On mismatched lengths the forms
  * diverge: `zip_with` pads the shorter array with nulls so the composed
  * fold yields NULL, while this expression truncates to the common
  * prefix.) The swap only removes the per-row zipped-array allocation
  * and the interpreted lambda folds ([[EuclideanDistance]]'s measured 9×
  * on the silhouette pair scan; same loop body minus the sqrt).
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_distance needs two array<double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SquaredDistance = copy(newLeft, newRight)
}

object SquaredDistance {
  /** Column API: both inputs cast to array<double> once, before the loop. */
  def squaredDist(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}
