package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType, ArrayType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over an array<string> of shingles as a native Catalyst
  * expression: one pass per row, a 64-slot bit-balance accumulator, sign
  * bits packed into a long. Replaces the 64-nested-aggregate expression
  * formulation (which fell out of codegen and was ~100x slower).
  *
  * doGenCode emits a direct call into the static kernel so the
  * expression stays inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** FNV-1a 64-bit over UTF-8 bytes with an avalanche finisher —
    * deterministic, allocation-free.
    */
  def hashShingle(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 avalanche for bit uniformity
    h += 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val balance = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hashShingle(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) balance(b) += 1 else balance(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (balance(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** wrap as a Column (Spark 4 column-node bridge) */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SimHash64(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
}
