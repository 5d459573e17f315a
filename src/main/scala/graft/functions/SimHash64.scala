package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array as a native Catalyst expression
  * (preference order (b) from the build guide: custom `Expression` over a
  * UDF — operates directly on `UTF8String`s with no serialization).
  *
  * Per token, a 64-bit hash votes ±1 on each bit position; the signature's
  * bit i is 1 iff the summed vote is positive. Near-duplicate docs differ in
  * few bits (Hamming distance), so at scale candidates are bucketed by
  * signature bands and only within-bucket pairs are compared — see
  * [[graft.dedup.DedupOps]].
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == ArrayType(StringType, containsNull = false) ||
        child.dataType == ArrayType(StringType, containsNull = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"SimHash64 needs array<string>, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    while (t < arr.numElements()) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        val h = SimHash64.hash64(s)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** Deterministic 64-bit token hash: first 8 bytes of SHA-256 of the
    * token's UTF-8 bytes, big-endian. SHA-256 (rather than murmur) makes
    * the signature portable across engines — any SQL engine with a sha256
    * function reproduces it bit-for-bit, which is what the DuckDB oracles
    * for q_d_simhash / q_d_simhash_pairs do. */
  private[graft] def hash64(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(s.getBytes)
    ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
      ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
      ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
  }

  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  }

  /** Hamming distance between two simhash signatures. */
  def hammingDist(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")
}
