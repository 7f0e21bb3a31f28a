package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over word n-gram shingles as a native Catalyst
  * expression. Takes the WORDS array (one split per row); shingle
  * hashes are built by combining per-word hashes — no shingle strings
  * are ever materialized, and because the child is a plain split()
  * the whole projection stays inside whole-stage codegen (higher-order
  * transform() lambdas would force interpreted eval).
  */
case class SimHash64(child: Expression, shingleN: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** FNV-1a 64-bit over UTF-8 bytes with a splitmix64 avalanche. */
  def hashShingle(s: UTF8String): Long = avalanche(fnv(s))

  private def fnv(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def avalanche(h0: Long): Long = {
    var h = h0 + 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** per-window shingle hashes from word hashes (no string building);
    * returns the count of windows written into `out`
    */
  private[functions] def windowHashes(arr: ArrayData, n: Int): Array[Long] = {
    val m = arr.numElements()
    val wordH = new Array[Long](m)
    var i = 0
    while (i < m) {
      wordH(i) = if (arr.isNullAt(i)) 0L else fnv(arr.getUTF8String(i))
      i += 1
    }
    val nWin = math.max(1, m - n + 1)
    val out = new Array[Long](nWin)
    i = 0
    while (i < nWin) {
      var c = 0xcbf29ce484222325L
      var j = 0
      while (j < n && i + j < m) {
        c = (c ^ wordH(i + j)) * 0x100000001b3L
        j += 1
      }
      out(i) = avalanche(c)
      i += 1
    }
    out
  }

  def compute(arr: ArrayData, shingleN: Int): Long = {
    val hs = windowHashes(arr, shingleN)
    // distinct shingles only (matching set-based SimHash semantics)
    val seen = new java.util.HashSet[java.lang.Long](hs.length * 2)
    val balance = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      if (seen.add(h)) {
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

  /** wrap as a Column over a WORDS array column */
  def apply(words: Column, shingleN: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SimHash64(org.apache.spark.sql.graftbridge.ColumnBridge.expression(words), shingleN))
}
