package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass extraction + entity-unescape of the deterministic HTML
  * wrapper (TextExtract.wrap): locate the fixed prefix / body marker /
  * suffix with byte scans, then unescape `&lt; &gt; &amp;` in ONE pass
  * over the body. Replaces one anchored (?s)-regex capture plus three
  * regexp_replace passes per page — the hottest per-row work of the
  * derive stage. Semantics match the regex form exactly on every
  * wrap()-produced document (the only specified domain — the
  * byte-identical round-trip invariant `extract(wrap(t)) == t`,
  * cross-checked against the regex form in TextExtractSpec); a
  * non-matching document yields "" like regexp_extract.
  */
case class ExtractWrapped(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"extract_wrapped requires string, got $other")
    }
  override def prettyName: String = "extract_wrapped"
  override def nullSafeEval(input: Any): Any =
    ExtractWrapped.extract(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractWrapped.extract($c)")
  override protected def withNewChildInternal(newChild: Expression): ExtractWrapped =
    copy(child = newChild)
}

object ExtractWrapped {

  private val prefix = "<html><head><title>".getBytes("UTF-8")
  private val marker = "</title></head><body><p>".getBytes("UTF-8")
  private val suffix = "</p></body></html>".getBytes("UTF-8")
  private val empty = UTF8String.fromString("")

  private def startsWith(b: Array[Byte], off: Int, pat: Array[Byte]): Boolean = {
    if (off + pat.length > b.length) return false
    var i = 0
    while (i < pat.length) {
      if (b(off + i) != pat(i)) return false
      i += 1
    }
    true
  }

  private def indexOf(b: Array[Byte], from: Int, pat: Array[Byte]): Int = {
    var i = from
    val last = b.length - pat.length
    while (i <= last) {
      if (b(i) == pat(0) && startsWith(b, i, pat)) return i
      i += 1
    }
    -1
  }

  def extract(html: UTF8String): UTF8String = {
    val b = html.getBytes
    if (!startsWith(b, 0, prefix)) return empty
    val m = indexOf(b, prefix.length, marker)
    if (m < 0) return empty
    val bodyStart = m + marker.length
    val bodyEnd = b.length - suffix.length
    if (bodyEnd < bodyStart || !startsWith(b, bodyEnd, suffix)) return empty
    // single-pass unescape of &lt; &gt; &amp;
    val out = new Array[Byte](bodyEnd - bodyStart)
    var i = bodyStart
    var o = 0
    while (i < bodyEnd) {
      val c = b(i)
      if (c == '&' && i + 3 < bodyEnd) {
        if (b(i + 1) == 'l' && b(i + 2) == 't' && b(i + 3) == ';') {
          out(o) = '<'; o += 1; i += 4
        } else if (b(i + 1) == 'g' && b(i + 2) == 't' && b(i + 3) == ';') {
          out(o) = '>'; o += 1; i += 4
        } else if (i + 4 < bodyEnd && b(i + 1) == 'a' && b(i + 2) == 'm' &&
          b(i + 3) == 'p' && b(i + 4) == ';') {
          out(o) = '&'; o += 1; i += 5
        } else { out(o) = c; o += 1; i += 1 }
      } else { out(o) = c; o += 1; i += 1 }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  def apply(html: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ExtractWrapped(org.apache.spark.sql.graftbridge.ColumnBridge.expression(html)))
}

/** Count of ASCII letters [A-Za-z] in a string — a single byte scan
  * replacing `length(regexp_replace(s, "[^a-zA-Z]", ""))` (which builds
  * a new string per row). Char count == byte count here because ASCII
  * letters are one UTF-8 byte and multibyte chars are never letters in
  * the ASCII class.
  */
case class AsciiAlphaCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ascii_alpha_count requires string, got $other")
    }
  override def prettyName: String = "ascii_alpha_count"
  override def nullSafeEval(input: Any): Any =
    AsciiAlphaCount.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AsciiAlphaCount.count($c)")
  override protected def withNewChildInternal(newChild: Expression): AsciiAlphaCount =
    copy(child = newChild)
}

object AsciiAlphaCount {
  def count(s: UTF8String): Int = {
    val b = s.getBytes
    var n = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) n += 1
      i += 1
    }
    n
  }
  def apply(s: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      AsciiAlphaCount(org.apache.spark.sql.graftbridge.ColumnBridge.expression(s)))
}
