package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedLit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared BPE-encode kernel: applies a learned merge list to one document's
  * token array, reproducing EXACTLY the trainer's per-round semantics — each
  * word becomes the space-padded character sequence " a b c " and each merge
  * applies the three-pass non-overlapping `replace(" l r " -> " lr ")` fold
  * (see TextAnalysis.bpeMerges for why three passes, and why parity with the
  * DuckDB oracle holds by construction: both engines run the identical
  * replace chain, `String.replace` and Spark/DuckDB `replace` are all
  * left-to-right non-overlapping).
  *
  * This object exists so the merge list is ONE broadcast-style reference
  * held by the expression instance — k-independent plan size. The previous
  * form folded k merges into a k·3-deep literal `replace` expression chain,
  * which blows up analysis/codegen at a production vocab (32k merges =
  * ~100k-node expression tree); here the plan carries one opaque call and
  * the loop runs in JVM code at scan speed.
  *
  * Serializable: shipped to executors inside the expression (driver-tiny —
  * 2k short strings). */
class BpeCodec(pairs: Array[String], merged: Array[String]) extends Serializable {
  require(pairs.length == merged.length,
    s"pairs/merged length mismatch: ${pairs.length} vs ${merged.length}")
  private val pats: Array[String] = pairs.map(p => " " + p + " ")
  private val reps: Array[String] = merged.map(m => " " + m + " ")

  /** " a b c " form of a word — per Unicode code point, matching
    * `split(w, "")` in Spark and `string_split(w, '')` in DuckDB (the
    * tokenizer only emits [a-z0-9]+ so this is ASCII in practice). */
  def seed(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      sb.appendCodePoint(cp)
      sb.append(' ')
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Fold one word through every merge in rank order (trimmed result). */
  def encodeWord(w: String): String = {
    var s = seed(w)
    var m = 0
    while (m < pats.length) {
      val p = pats(m)
      // contains-guard is pure speed: replace is identity when absent
      if (s.contains(p)) {
        val r = reps(m)
        s = s.replace(p, r)
        s = s.replace(p, r)
        s = s.replace(p, r)
      }
      m += 1
    }
    s.trim
  }

  /** Text-in entry point: tokenizes with the engine's pinned kernel
    * (TokenizeGenerator.tokenizeToArray — the same semantics as
    * TextFunctions.tokens, asserted equal in PlansSpec) then encodes.
    * Taking TEXT rather than a pre-split array keeps the whole projection
    * inside whole-stage codegen: the `tokens()` column form contains an
    * ArrayFilter lambda, and higher-order functions are CodegenFallback —
    * one in the child expression drags the entire projection out of
    * codegen (BpeSpec pins the fused plan). */
  def encodeText(text: UTF8String): GenericInternalRow =
    encodeDoc(TokenizeGenerator.tokenizeToArray(text))

  /** Whole-document encode: struct(encoded, n_words, n_subwords) with
    * subwords space-joined per word and words joined by " | " — identical
    * to the `concat_ws`/`aggregate` composition it replaces. */
  def encodeDoc(toks: ArrayData): GenericInternalRow = {
    val n = toks.numElements()
    val sb = new java.lang.StringBuilder()
    var subwords = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val e = encodeWord(if (t == null) "" else t.toString)
      if (i > 0) sb.append(" | ")
      sb.append(e)
      // subword count = separator spaces + 1 (e is trimmed, single-spaced)
      var c = 1L
      var j = 0
      while (j < e.length) {
        if (e.charAt(j) == ' ') c += 1
        j += 1
      }
      subwords += c
      i += 1
    }
    if (n == 0) new GenericInternalRow(Array[Any](UTF8String.fromString(""), 0L, 0L))
    else new GenericInternalRow(
      Array[Any](UTF8String.fromString(sb.toString), n.toLong, subwords))
  }
}

/** Native Catalyst expression for BPE encoding: TEXT in (tokenized inside
  * with the pinned TokenizeGenerator kernel — array-column input would put
  * a CodegenFallback HOF in the child and break the fused plan),
  * `struct<encoded string, n_words bigint, n_subwords bigint>` out. The
  * merge list is embedded in the expression instance (plan-time constant,
  * like NearestCentroid's centroid matrix), so the plan is ONE projection
  * with ONE opaque call regardless of k — whole-stage codegen emits a
  * single `codec.encodeText(text)` invocation (no k-deep expression tree,
  * no CodeGenerator fallback at 32k merges).
  *
  * `pairs`/`merged` are Seq so case-class equality — and expression
  * canonicalization/subexpression elimination — stays structural (the
  * NearestCentroid rule). */
case class BpeEncodeDoc(child: Expression, pairs: Seq[String], merged: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("encoded", StringType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode requires STRING input, got ${other.catalogString}")
    }

  @transient private lazy val codec = new BpeCodec(pairs.toArray, merged.toArray)

  override def nullSafeEval(a: Any): Any =
    codec.encodeText(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encodeText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeDoc =
    copy(child = newChild)
}

object BpeExpressions {
  /** Column handle (requires GraftFunctions.register, done by
    * GraftSession.local): `text` is the RAW text column (tokenized inside
    * the expression); the merge table rides into the plan as two foldable
    * array<string> literals unpacked at plan time. */
  def bpeEncodeCol(text: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_encode", text,
      typedLit(merges.map(_._1)), typedLit(merges.map(_._2)))
}
