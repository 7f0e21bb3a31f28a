package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-permutation MinHash signature over word n-gram shingles as one
  * native Catalyst expression: word hashes are combined per window (no
  * shingle strings), each window hash remixed per seed, single pass —
  * and the projection stays in whole-stage codegen (the child is a
  * plain split()).
  */
case class MinHashSig(child: Expression, k: Int, shingleN: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash requires array<string>, got $other")
    }

  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSig.compute(input.asInstanceOf[ArrayData], k, shingleN))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSig.compute($c, $k, $shingleN))")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** per-seed remix of a base shingle hash (splitmix64 step) */
  private def remix(h0: Long, seed: Long): Long = {
    var z = h0 + seed * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(arr: ArrayData, k: Int, shingleN: Int): Array[Long] = {
    val hs = SimHash64.windowHashes(arr, shingleN)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h0 = hs(i)
      var j = 0
      while (j < k) {
        val h = remix(h0, j + 1)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    mins
  }

  def apply(words: Column, k: Int, shingleN: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graftbridge.ColumnBridge.expression(words), k, shingleN))
}
