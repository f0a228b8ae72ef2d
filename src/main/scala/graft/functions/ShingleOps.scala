package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled single-pass builders for the word-n-gram relations behind the
  * whole dedup family. The declarative forms they replace
  * (`array_distinct(filter(transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i+1, n)))))` in [[graft.operators.TextAnalysis.shingles]] and
  * the positional-md5 twin in [[graft.operators.Dedup.spanGrams]]) run on
  * Spark's higher-order functions, whose lambdas are evaluated INTERPRETED —
  * per document that is O(tokens × n) interpreted expression-tree walks plus
  * an allocation per slice/concat. These helpers do the same work as one
  * static JVM call per row (token scan → rolling join → hash/dedup), staying
  * inside whole-stage codegen.
  *
  * Bit-exactness is contractual, not aspirational: [[ShingleArray]] and
  * [[SpanGramKeys]] are property-tested equal to the interpreted pipelines
  * they replace (ShingleOpsSpec), including the edge quirks:
  *
  *  - tokens = non-empty runs of `split(lower(text), " ")` — split on the
  *    SINGLE space byte (the 0x20 byte never appears inside a multi-byte
  *    UTF-8 char, so byte-splitting ≡ the regex split);
  *  - a doc with ZERO tokens still evaluates `concat_ws` over an empty
  *    slice → `""` → `split("", " ")` is `[""]` (length 1), so for n = 1 the
  *    old form emits the empty-string shingle `""` — reproduced;
  *  - `array_distinct` keeps FIRST-occurrence order — reproduced via an
  *    insertion-ordered seen-set.
  */
object ShingleOps {

  /** Lower-cased non-empty space-separated tokens, as UTF8 slices of one
    * lowered buffer (no per-token string copies beyond the slice headers).
    */
  private def tokenize(text: UTF8String): Array[UTF8String] = {
    val lowered = text.toLowerCase
    val bytes = lowered.getBytes // may copy when offset-shared; done once per row
    val out = new java.util.ArrayList[UTF8String](16)
    var start = 0
    var i = 0
    val len = bytes.length
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
        start = i + 1
      }
      i += 1
    }
    out.toArray(new Array[UTF8String](out.size))
  }

  /** Byte image of tokens[i .. i+k-1] joined with a single space. */
  private def joinBytes(toks: Array[UTF8String], i: Int, k: Int): Array[Byte] = {
    var sz = if (k > 0) k - 1 else 0
    var j = 0
    while (j < k) { sz += toks(i + j).numBytes(); j += 1 }
    val buf = new Array[Byte](sz)
    var pos = 0
    j = 0
    while (j < k) {
      if (j > 0) { buf(pos) = ' '; pos += 1 }
      val t = toks(i + j)
      t.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
      pos += t.numBytes()
      j += 1
    }
    buf
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): UTF8String = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Distinct word n-gram shingles in first-occurrence order — the compiled
    * twin of [[graft.operators.TextAnalysis.shingles]].
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    val m = toks.length
    if (m < n) {
      // old form: one candidate at i = 0 of length m; kept only when its
      // space-split arity equals n — i.e. the m == 0, n == 1 empty-string
      // quirk (split("") = [""]) or never.
      if (m == 0 && n == 1)
        return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
      if (m == 0) return new GenericArrayData(Array.empty[Any])
      // 0 < m < n: single short candidate, always filtered out.
      return new GenericArrayData(Array.empty[Any])
    }
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    var i = 0
    while (i <= m - n) {
      seen.add(UTF8String.fromBytes(joinBytes(toks, i, n)))
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  /** ALL word-internal character n-grams of lengths `minLen..maxLen` over
    * the doc's tokens (repeats kept — the downstream is a count) — the
    * compiled twin of the HOF pipeline inside
    * [[graft.operators.TextAnalysis.subwordVocab]]: substrings are
    * code-point based ([[UTF8String.substringSQL]] ≡ `substr`), words
    * shorter than a length contribute nothing at that length.
    */
  def subwords(text: UTF8String, minLen: Int, maxLen: Int): ArrayData = {
    val toks = tokenize(text)
    val out = new java.util.ArrayList[UTF8String](toks.length * 8)
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      val n = w.numChars()
      var l = minLen
      val lMax = math.min(maxLen, n)
      while (l <= lMax) {
        var i = 0
        while (i <= n - l) {
          out.add(w.substringSQL(i + 1, l))
          i += 1
        }
        l += 1
      }
      t += 1
    }
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < out.size) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** md5-hex keys of ALL positional w-grams (repeats kept, index = token
    * offset) — the compiled twin of the gram builder inside
    * [[graft.operators.Dedup.spanGrams]]. Docs with fewer than w tokens
    * yield an empty array (the old pipeline filtered them out pre-explode;
    * posexplode of the empty array drops them identically).
    */
  def spanGramKeys(text: UTF8String, w: Int): ArrayData = {
    val toks = tokenize(text)
    val m = toks.length
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val arr = new Array[Any](m - w + 1)
    var i = 0
    while (i <= m - w) {
      arr(i) = md5Hex(joinBytes(toks, i, w))
      i += 1
    }
    new GenericArrayData(arr)
  }
}

/** Base for the two compiled gram builders: string in, array<string> out,
  * computed by one static [[ShingleOps]] call per row from generated code
  * (the whole token scan runs as compiled bytecode inside the stage — no
  * interpreted lambda dispatch).
  */
abstract class GramArrayExpression extends UnaryExpression {
  /** Gram width parameter. */
  def width: Int
  /** Fully-qualified static method the generated code calls. */
  protected def staticMethod: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $staticMethod($t, $width);")
}

/** Compiled [[graft.operators.TextAnalysis.shingles]]. */
case class ShingleArray(child: Expression, width: Int)
  extends GramArrayExpression {
  require(width >= 1, s"shingle width must be >= 1, got $width")
  override def prettyName: String = "shingle_array"
  override protected def staticMethod: String =
    "graft.functions.ShingleOps.shingles"
  override protected def nullSafeEval(v: Any): Any =
    ShingleOps.shingles(v.asInstanceOf[UTF8String], width)
  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleArray(ColumnBridge.expression(text), n))
}

/** Compiled positional-gram key builder of [[graft.operators.Dedup.spanGrams]]. */
case class SpanGramKeys(child: Expression, width: Int)
  extends GramArrayExpression {
  require(width >= 1, s"gram width must be >= 1, got $width")
  override def prettyName: String = "span_gram_keys"
  override protected def staticMethod: String =
    "graft.functions.ShingleOps.spanGramKeys"
  override protected def nullSafeEval(v: Any): Any =
    ShingleOps.spanGramKeys(v.asInstanceOf[UTF8String], width)
  override protected def withNewChildInternal(newChild: Expression): SpanGramKeys =
    copy(child = newChild)
}

object SpanGramKeys {
  def apply(text: Column, w: Int): Column =
    ColumnBridge.column(SpanGramKeys(ColumnBridge.expression(text), w))
}

/** Compiled word-internal char-n-gram builder of
  * [[graft.operators.TextAnalysis.subwordVocab]] — one static call per doc
  * instead of two nested interpreted HOF layers per word.
  */
case class SubwordArray(child: Expression, minLen: Int, maxLen: Int)
  extends UnaryExpression {
  require(1 <= minLen && minLen <= maxLen,
    s"subword lengths must satisfy 1 <= min <= max, got [$minLen,$maxLen]")

  override def prettyName: String = "subword_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(v: Any): Any =
    ShingleOps.subwords(v.asInstanceOf[UTF8String], minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShingleOps.subwords($t, $minLen, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): SubwordArray =
    copy(child = newChild)
}

object SubwordArray {
  def apply(text: Column, minLen: Int, maxLen: Int): Column =
    ColumnBridge.column(
      SubwordArray(ColumnBridge.expression(text), minLen, maxLen))
}
