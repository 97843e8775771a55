package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 32-bit md5-prefix hash — native, codegen'd replacement for the
  * compositional `conv(substring(md5(c), 1, 8), 16, 10)` chain
  * (TextFunctions.hash32), which materializes the full 32-char hex string,
  * substrings it, and re-parses base-16 per call. This expression digests
  * the UTF-8 bytes once and assembles the first 4 bytes into the same
  * unsigned 32-bit value — bit-identical to the chain and to the DuckDB
  * oracle's `('0x' || substr(md5(x),1,8))::BIGINT` (asserted in PlansSpec).
  * MinHash/SimHash call this once per shingle/token, so it is the hottest
  * scalar in the dedup family.
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  // fail at analysis, not with a ClassCastException inside a running job
  // (ExpectsInputTypes is unavailable here — AbstractDataType is
  // private[sql], the same seam issue noted in ROUND_NOTES)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix32 requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.md5Prefix32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExpressions.md5Prefix32($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

/** Fused word-shingle hash array — the whole MinHash scan kernel in one
  * expression: for a token array of size s, emit the md5-prefix32 of each
  * n-token shingle, i.e. hash32(concat_ws(" ", t_i..t_{i+n-1})) for
  * i in [0, s-n]. The compositional chain (wordShingles transform →
  * array_distinct later → transform(hash32)) materializes every shingle
  * STRING (O(s·n) UTF8String concats per row) just to digest and discard
  * it; here the digest streams token bytes + a single 0x20 separator
  * directly — md5 of the identical byte sequence, ZERO intermediate
  * strings. Bit-equality with the compositional form is asserted in
  * PlansSpec; NULL tokens are skipped exactly like concat_ws skips null
  * args (they never occur post-tokenizer — contract documented there).
  * Returns an empty array when s < n, matching the filtered transform. */
case class ShingleHash32(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hash32 requires ARRAY<STRING> input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.shingleHash32(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExpressions.shingleHash32($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash32 =
    copy(child = newChild)
}

/** Fused Jaccard similarity over two SORTED-DISTINCT long arrays — one
  * primitive merge loop replacing `size(array_intersect) /
  * size(array_union)`, which builds two boxed hash sets per PAIR (the
  * dominant cost of the minhash verify stage: 673k candidate pairs ×
  * ~150-element arrays at sf1 ≈ 200M boxed set operations). On distinct
  * inputs the merge computes the identical value: |A∩B| by two-pointer
  * scan, |A∪B| = n + m − |A∩B|, same double division (0-element union →
  * NaN, matching 0.0/0). INPUT CONTRACT: both arrays ascending-sorted and
  * duplicate-free — Dedup.shingleSets emits exactly this (array_sort ∘
  * array_distinct), and every jaccardVerify caller feeds shingleSets
  * output (directly or via a band registry written by it; a registry
  * written before the sort landed must be rebuilt). Equality with the
  * compositional form is asserted in PlansSpec. */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(LongType, _),
            org.apache.spark.sql.types.ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted requires two ARRAY<BIGINT> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashExpressions.jaccardSorted(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.HashExpressions.jaccardSorted($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** Fused |A∩B| over two SORTED-DISTINCT long arrays — the two-pointer
  * sibling of [[JaccardSorted]] for ASYMMETRIC measures (containment
  * |A∩B|/|A|), where the caller divides by its own denominator. Same
  * input contract and the same boxed-hash-set cost story. */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(LongType, _),
            org.apache.spark.sql.types.ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count_sorted requires two ARRAY<BIGINT> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashExpressions.intersectCountSorted(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.HashExpressions.intersectCountSorted($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}

/** Fused 32-bit SimHash straight from TEXT: tokenize (the pinned
  * TokenizeGenerator kernel), dedup tokens, md5-prefix-hash each DISTINCT
  * token once, accumulate the 32 sign votes in one primitive loop —
  * semantics identical to `TextFunctions.simhash32 ∘ tokenSet` (asserted
  * in PlansSpec) and to Dedup.simhashTable's explode+groupBy form, at a
  * fraction of either's cost: the compositional form is 32 interpreted
  * array folds per doc (HOFs are CodegenFallback — they also unfuse the
  * whole projection), the groupBy form shuffles 32-int vote rows. This is
  * ONE codegen'd map-side call — zero exchanges at any corpus size. Zero
  * tokens → NULL (the simhashTable contract: an empty doc has no
  * signature, not the all-ones vote-0 artifact). */
case class SimHash32Doc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32_fused requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.simhash32Doc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, NOT a fixed local: when this expression is emitted
      // twice in one codegen function (e.g. the isnotnull filter plus
      // the projection), a fixed `r` is a Janino "Redefinition of local
      // variable" error — which silently drops the WHOLE stage to
      // interpreted execution (seen in the round-8 bench log)
      val r = ctx.freshName("simhashRes")
      s"""
      Object $r = graft.plans.HashExpressions.simhash32Doc($c);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
    """})

  override protected def withNewChildInternal(newChild: Expression): SimHash32Doc =
    copy(child = newChild)
}

/** All `n` MinHash signatures of a 32-bit hash array in ONE codegen'd
  * pass — the compositional form (`array_min(transform(hashes, perm_s))`
  * per seed) is n interpreted HOF evaluations per row (ArrayTransform is
  * CodegenFallback), which jcmd sampling showed as the hot frame of the
  * minhash band build at sf3. Permutation family is pinned identical to
  * TextFunctions.minhashSigFromHashes:
  * `sig_s = min_v ((v·(2s+1) + 7919s + 1) mod 4294967291)` — bit-equality
  * asserted in PlansSpec. Empty input → array of n nulls (array_min of an
  * empty array is NULL, and a null signature must stay null — banding on
  * a fabricated constant would bucket every empty doc together). */
case class MinhashSigs(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"signature count must be >= 1, got $n")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires ARRAY<BIGINT> input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.minhashSigs(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExpressions.minhashSigs($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

/** Sorted-distinct long array in one primitive pass — replaces the
  * `array_sort(array_distinct(...))` chain (two interpreted HOF
  * evaluations per row; ArraySort/ArrayDistinct fall out of codegen) on
  * the shingle-set build. NULL elements are rejected loudly: every
  * caller feeds hash arrays (containsNull=false), and a silent drop
  * would change Jaccard denominators. */
case class SortedDistinctLongs(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_distinct_i64 requires ARRAY<BIGINT> input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.sortedDistinctLongs(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExpressions.sortedDistinctLongs($c)")

  override protected def withNewChildInternal(newChild: Expression): SortedDistinctLongs =
    copy(child = newChild)
}

/** Scalar form of the pinned tokenizer — the SAME kernel the
  * TokenizeGenerator UDTF and SimHash32Doc use
  * (TokenizeGenerator.tokenizeToArray), exposed as a codegen'd
  * expression so array-consuming pipelines (shingling, minhash) skip the
  * `filter(split(...))` chain whose ArrayFilter lambda evaluates
  * interpreted. NULL text → empty array, matching `tokens()` on
  * coalesced input; bit-equality with the compositional form asserted in
  * PlansSpec. */
case class TokenizeArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokenize_array requires STRING input, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TokenizeGenerator.tokenizeToArray(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.TokenizeGenerator.tokenizeToArray(${c.isNull} ? null : ${c.value});
      """
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeArray =
    copy(child = newChild)
}

/** Fused CJK-bigram tokenizer (see TokenizeGenerator.tokenizeToArrayCjk
  * for the pinned semantics): the codegen'd form of
  * `TextFunctions.tokens(text, cjk = true)`, swapped into the curation
  * cjk mode's one-pass token binding. */
case class TokenizeArrayCjk(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokenize_array_cjk requires STRING input, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TokenizeGenerator.tokenizeToArrayCjk(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.TokenizeGenerator.tokenizeToArrayCjk(${c.isNull} ? null : ${c.value});
      """
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeArrayCjk =
    copy(child = newChild)
}

/** Latin tokenizer WITH source spans (see
  * TokenizeGenerator.tokenizeToSpans for the pinned semantics):
  * array<struct<t string, s int, e int>>, [s, e) the token's codepoint
  * range in lower_root(text); `t` fields bit-identical to
  * tokenize_array (PlansSpec). The structure-preserving latin arm of
  * TextAnalysis.decontaminateSpans consumes this — excising the union
  * of covered character ranges keeps separators/punctuation/line
  * structure that the token rebuild normalizes away. */
case class TokenizeSpans(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("e",
          org.apache.spark.sql.types.IntegerType, nullable = false))),
      containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokenize_spans requires STRING input, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TokenizeGenerator.tokenizeToSpans(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.TokenizeGenerator.tokenizeToSpans(${c.isNull} ? null : ${c.value});
      """
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeSpans =
    copy(child = newChild)
}

/** CJK-bigram tokenizer WITH source spans (see
  * TokenizeGenerator.tokenizeToSpansCjk for the pinned semantics):
  * array<struct<t string, s int, e int>>, where [s, e) is the token's
  * codepoint range in lower_root(text). The offset-based span-excision
  * path (TextAnalysis.decontaminateSpans cjk mode) consumes this — a
  * token REBUILD cannot work for overlapping CJK bigrams (interior
  * ideographs would duplicate), but excising the union of covered
  * character ranges can. `t` fields are bit-identical to
  * tokenize_array_cjk (PlansSpec). */
case class TokenizeSpansCjk(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("e",
          org.apache.spark.sql.types.IntegerType, nullable = false))),
      containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokenize_spans_cjk requires STRING input, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TokenizeGenerator.tokenizeToSpansCjk(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.TokenizeGenerator.tokenizeToSpansCjk(${c.isNull} ? null : ${c.value});
      """
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeSpansCjk =
    copy(child = newChild)
}

/** Consecutive k-token chunks of a `tokenize_spans_cjk` stream with
  * half-open character extents — the fused form of Dedup.chunkTableCjk's
  * compositional build (`transform(sequence(0, nChunks-1), i =>
  * struct(pos, concat_ws(' ', transform(slice(spans, …), sp -> sp.t)),
  * element_at(…).s, coalesce(try_element_at(…).s, ltLen)))`), whose THREE
  * nested lambdas evaluate INTERPRETED per row and re-slice the spans
  * array per chunk — the same per-row cost class every prior fusion
  * removed from a corpus path (cjk span dedup runs this over every doc,
  * batch and streaming registry alike). One walk over the spans array,
  * no intermediate slices. Semantics are PINNED bit-identical to the
  * compositional form (PlansSpec): chunk i covers tokens
  * [i·k, min((i+1)·k, n)); `span` = their space-joined text (content
  * identity for the corpus ban count); [cs, ce) = [own first token's
  * start, next chunk's first token's start), the LAST chunk extending to
  * `ltLen` — a partition of lower_root(text) from the first token on.
  * Empty/null spans → empty array (a doc with no tokens has no chunks). */
case class ChunkSpansCjk(spans: Expression, ltLen: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = spans
  override def right: Expression = ltLen

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("span", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cs",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("ce",
          org.apache.spark.sql.types.IntegerType, nullable = false))),
      containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    // a bad constant fails like the type checks below — through the
    // normal AnalysisException path, not an IllegalArgumentException
    // thrown out of the analyzer (ADVICE r12)
    if (k <= 0)
      return TypeCheckResult.TypeCheckFailure(
        s"chunk_spans_cjk chunk length must be positive, got $k")
    (spans.dataType, ltLen.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(
          st: org.apache.spark.sql.types.StructType, _),
          org.apache.spark.sql.types.IntegerType)
          if st.length == 3 && st(0).dataType == StringType &&
            st(1).dataType == org.apache.spark.sql.types.IntegerType &&
            st(2).dataType == org.apache.spark.sql.types.IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case (s, l) => TypeCheckResult.TypeCheckFailure(
        "chunk_spans_cjk requires (ARRAY<STRUCT<t STRING, s INT, e INT>>, INT) " +
          s"input, got (${s.catalogString}, ${l.catalogString})")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = spans.eval(input)
    val l = ltLen.eval(input)
    HashExpressions.chunkSpansCjk(
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      if (l == null) 0 else l.asInstanceOf[Int], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = spans.genCode(ctx)
    val l = ltLen.genCode(ctx)
    val code = code"""
      ${s.code}
      ${l.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.plans.HashExpressions.chunkSpansCjk(
          ${s.isNull} ? null : ${s.value}, ${l.isNull} ? 0 : ${l.value}, $k);
      """
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChunkSpansCjk =
    copy(spans = newLeft, ltLen = newRight)
}

/** Character-offset span excision — the fused form of
  * decontaminateSpansByOffset's rebuild chain: covered token positions
  * (the union of [p, p+n) over the hit-position array), their character
  * ranges via the spans struct array, the sorted-range union fold over
  * lower_root(text). The compositional form ran FOUR interpreted
  * lambdas per contaminated doc (sequence-expansion transform,
  * array_distinct/flatten, the cspans struct transform + array_sort,
  * and the aggregate fold) — hit-bounded work, but on dense-hit
  * corpora (and the Curate `excise` stage runs this over every doc in
  * BOTH modes since round 12) it dominates the operator (SCALE.md
  * §Round-12). One walk: a boolean cover array over token positions,
  * then one forward pass over the string emitting kept gaps, with a
  * (codepoint, char) cursor so astral separators stay one-codepoint
  * (the tokenize_spans contract). Returns struct<text, n_removed>;
  * NULL/empty hits → (lt unchanged, 0) — clean docs are
  * unchanged-by-value, exactly like the fold. Bit-parity with the
  * compositional chain pinned in PlansSpec; the span-excision oracles
  * hash-gate it cross-engine at 3 SFs. */
case class ExciseSpans(lt: Expression, spans: Expression, hp: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = lt
  override def second: Expression = spans
  override def third: Expression = hp

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("text", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n_removed",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    // normal AnalysisException path for a bad constant, like the type
    // checks below (ADVICE r12)
    if (n <= 0)
      return TypeCheckResult.TypeCheckFailure(
        s"excise_spans gram length must be positive, got $n")
    (lt.dataType, spans.dataType, hp.dataType) match {
      case (StringType,
          org.apache.spark.sql.types.ArrayType(
            st: org.apache.spark.sql.types.StructType, _),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType, _))
          if st.length == 3 && st(0).dataType == StringType &&
            st(1).dataType == org.apache.spark.sql.types.IntegerType &&
            st(2).dataType == org.apache.spark.sql.types.IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "excise_spans requires (STRING, ARRAY<STRUCT<t STRING, s INT, e INT>>, " +
          s"ARRAY<INT>) input, got (${a.catalogString}, ${b.catalogString}, " +
          s"${c.catalogString})")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = lt.eval(input)
    val s = spans.eval(input)
    val h = hp.eval(input)
    HashExpressions.exciseSpans(
      l.asInstanceOf[UTF8String],
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      h.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = lt.genCode(ctx)
    val s = spans.genCode(ctx)
    val h = hp.genCode(ctx)
    val code = code"""
      ${l.code}
      ${s.code}
      ${h.code}
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        graft.plans.HashExpressions.exciseSpans(
          ${l.isNull} ? null : ${l.value},
          ${s.isNull} ? null : ${s.value},
          ${h.isNull} ? null : ${h.value}, $n);
      """
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ExciseSpans =
    copy(lt = newFirst, spans = newSecond, hp = newThird)
}

/** Occurrence count of array elements contained in a pinned string set —
  * the codegen'd form of `size(filter(toks, t => array_contains(lit,
  * t)))`, whose interpreted ArrayFilter lambda re-evaluates the literal
  * CreateArray PER TOKEN per row (the stop-rate term of the quality
  * score runs this over every curated corpus). The set hashes once at
  * plan time. NULL elements count as not-in (array_contains(_, null) is
  * null → the compositional filter drops them); NULL input → NULL. */
case class CountInSet(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"count_in_set requires ARRAY<STRING> input, got ${other.catalogString}")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.countInSet(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSet", set, classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExpressions.countInSet($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

/** First-occurrence-ordered DISTINCT character trigram set — the
  * codegen'd form of langIdNgram's
  * `array_distinct(transform(sequence(1, len−2), i => substr(s, i, 3)))`
  * (an interpreted lambda allocating one substring per char position per
  * row, corpus-wide). Input is the space-padded latin-normalized string
  * (pure ASCII by construction — the [^a-z0-9]→space strip precedes it —
  * so char windows ≡ codepoint windows); strings shorter than 3 chars
  * yield an empty array, matching the compositional when() guard. */
case class CharTrigramSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_trigram_set requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.charTrigramSet(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExpressions.charTrigramSet($c)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigramSet =
    copy(child = newChild)
}

/** Word-level n-gram shingles as STRINGS — the codegen'd form of the
  * transform+filter lambda pair in
  * TextFunctions.wordShinglesCompositional (interpreted per row across
  * the lmScore / repetition / decontamination / collocation sites).
  * Each of the max(0, sz−n+1) full windows joins its n tokens with one
  * space via UTF8String.concatWs, which SKIPS null elements exactly
  * like the compositional concat_ws. NULL input → NULL. Hash-only
  * consumers use ShingleHash32 instead (no strings at all). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires ARRAY<STRING> input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.wordShingles(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExpressions.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Σ ceil(numChars(token)/4) — the codegen'd form of the BPE-ish subword
  * estimate `aggregate(toks, 0L, acc + ceil(length(t)/4.0))`, whose
  * interpreted ArrayAggregate lambda sat on the t_token_stats headline.
  * NULL element → NULL result (the compositional fold's null-absorbing
  * addition); NULL input → NULL. */
case class SubwordEst(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"subword_est requires ARRAY<STRING> input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.subwordEst(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = child.genCode(ctx)
    val boxed = ctx.freshName("subwordSum")
    val code = code"""
      ${arr.code}
      boolean ${ev.isNull} = ${arr.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        java.lang.Long $boxed = graft.plans.HashExpressions.subwordEst(${arr.value});
        if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
      }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordEst =
    copy(child = newChild)
}

/** Count of array elements that MIGHT be in a broadcast Bloom filter —
  * the codegen'd form of bloomScoreBroadcast's per-row Scala UDF loop,
  * the one interpreted per-row loop that was left on the decontamination
  * scale path (the map-side 100 TB gate: the corpus never explodes or
  * shuffles, every doc probes its bound gram array against the
  * benchmark's filter). The expression holds the BROADCAST HANDLE, not
  * the filter: tasks serialize a few bytes and executors torrent-fetch
  * the MB-sized filter once, exactly like the UDF closure did — which is
  * why construction goes through [[BloomHandles]] (a Broadcast cannot
  * ride a SQL literal). Spark's own BloomFilterMightContain is internal
  * to runtime join filtering, hence this public twin. NULL elements
  * count as not-in (the UDF's Seq[String] contract); NULL input → NULL
  * via defineCodeGen's null guard. */
case class BloomHits(child: Expression,
    bf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_hits requires ARRAY<STRING> input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HashExpressions.bloomHits(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bfBroadcast", bf,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c => s"graft.plans.HashExpressions.bloomHits($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHits =
    copy(child = newChild)
}

/** Driver-side handle registry bridging Broadcast objects into the SQL
  * function surface: `bloom_hits(arr, <id>)` resolves its SECOND argument
  * (a plan-time literal) to the registered Broadcast at analysis time on
  * the driver. Entries are handles (bytes, not filters) keyed by the
  * broadcast's own id. LIFECYCLE: an entry lives only between [[register]]
  * and [[deregister]] — DataFrames analyze eagerly, so
  * `TextAnalysis.bloomScoreBroadcast` resolves its `bloom_hits` call (which
  * embeds the Broadcast OBJECT in the analyzed [[BloomHits]] expression,
  * independent of this map) and deregisters before returning; the map is
  * empty at rest instead of accumulating one dead handle per curated
  * benchmark on a long-lived session. A stale or destroyed-broadcast id
  * therefore fails LOUDLY at analysis (the [[get]] require), never
  * obscurely at task execution. */
object BloomHandles {
  private final case class Handle(
      bf: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      refs: Int)
  private val map =
    new java.util.concurrent.ConcurrentHashMap[Long, Handle]()

  /** REFERENCE-COUNTED (ADVICE r12): two threads sharing one Broadcast
    * object (same id) each register/deregister their own count, so the
    * first caller's finally-deregister cannot remove the handle while
    * the second caller's frame is still being analyzed. */
  def register(bf: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter]): Long = {
    map.compute(bf.id, (_, h) =>
      if (h == null) Handle(bf, 1) else h.copy(refs = h.refs + 1))
    bf.id
  }

  /** Drop one reference; the handle disappears when the last concurrent
    * registrant releases it. Unknown ids are a no-op (idempotent under
    * a double-release). */
  def deregister(id: Long): Unit = {
    map.computeIfPresent(id, (_, h) =>
      if (h.refs <= 1) null else h.copy(refs = h.refs - 1))
    ()
  }

  /** Live handle count — the no-unbounded-growth pin (PlansSpec). */
  def size: Int = map.size

  def get(id: Long): org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter] = {
    val h = map.get(id)
    require(h != null, s"no broadcast Bloom filter registered under id $id " +
      "(construct bloom_hits through TextAnalysis.bloomScoreBroadcast; a " +
      "handle is live only while that call analyzes — it deregisters on return)")
    h.bf
  }
}

object HashExpressions {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** [[BloomHits]] kernel: probes each non-null element against the
    * broadcast filter (executor-local after the first torrent fetch). */
  def bloomHits(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      bf: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): Long = {
    val f = bf.value
    val sz = arr.numElements()
    var i = 0
    var n = 0L
    while (i < sz) {
      if (!arr.isNullAt(i) && f.mightContainString(arr.getUTF8String(i).toString))
        n += 1
      i += 1
    }
    n
  }

  /** [[ChunkSpansCjk]] kernel: one walk over the spans array, building
    * each chunk's joined token text and [cs, ce) extent directly —
    * replaces three interpreted lambdas + per-chunk array slices. */
  def chunkSpansCjk(spans: org.apache.spark.sql.catalyst.util.ArrayData,
      ltLen: Int, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (spans == null || spans.numElements() == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val n = spans.numElements()
    val nChunks = (n + k - 1) / k
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder
    var ci = 0
    while (ci < nChunks) {
      val start = ci * k
      val end = math.min(start + k, n)
      sb.setLength(0)
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(spans.getStruct(j, 3).getUTF8String(0).toString)
        j += 1
      }
      val cs = spans.getStruct(start, 3).getInt(1)
      val ce = if (start + k < n) spans.getStruct(start + k, 3).getInt(1) else ltLen
      out(ci) = org.apache.spark.sql.catalyst.InternalRow(
        ci, UTF8String.fromString(sb.toString), cs, ce)
      ci += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** [[ExciseSpans]] kernel: cover array over token positions, one
    * forward pass over the string with a (codepoint, char) cursor. */
  def exciseSpans(lt: UTF8String, spans: org.apache.spark.sql.catalyst.util.ArrayData,
      hp: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val ltU = if (lt == null) UTF8String.EMPTY_UTF8 else lt
    if (hp == null || hp.numElements() == 0 ||
        spans == null || spans.numElements() == 0)
      return org.apache.spark.sql.catalyst.InternalRow(ltU, 0)
    val nTok = spans.numElements()
    val covered = new Array[Boolean](nTok)
    var nCov = 0
    var i = 0
    while (i < hp.numElements()) {
      if (!hp.isNullAt(i)) {
        val p = hp.getInt(i)
        var j = math.max(p, 0)
        val end = math.min(p.toLong + n, nTok.toLong).toInt
        while (j < end) {
          if (!covered(j)) { covered(j) = true; nCov += 1 }
          j += 1
        }
      }
      i += 1
    }
    if (nCov == 0) return org.apache.spark.sql.catalyst.InternalRow(ltU, 0)
    val str = ltU.toString
    val sb = new java.lang.StringBuilder(str.length)
    // forward (codepoint → char) cursor: ranges arrive with
    // non-decreasing starts (token order), so one monotone walk maps
    // every needed codepoint offset; astral separators are one
    // codepoint, two chars (the tokenize_spans contract)
    var charIdx = 0
    var cpIdx = 0
    def charAt(cp: Int): Int = {
      while (cpIdx < cp && charIdx < str.length) {
        val c = str.charAt(charIdx)
        if (Character.isHighSurrogate(c) && charIdx + 1 < str.length &&
          Character.isLowSurrogate(str.charAt(charIdx + 1))) charIdx += 2
        else charIdx += 1
        cpIdx += 1
      }
      charIdx
    }
    var last = 0
    var t = 0
    while (t < nTok) {
      if (covered(t)) {
        val row = spans.getStruct(t, 3)
        val s = row.getInt(1)
        val e = row.getInt(2)
        if (s > last) {
          val from = charAt(last)
          val until = charAt(s)
          sb.append(str, from, until)
        }
        if (e > last) last = e
      }
      t += 1
    }
    sb.append(str, charAt(last), str.length)
    org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(sb.toString), nCov)
  }

  /** Whole-doc SimHash kernel (see [[SimHash32Doc]]); null for zero
    * tokens. Returns a boxed Long (the codegen call site null-checks). */
  def simhash32Doc(text: UTF8String): java.lang.Long = {
    val toks = TokenizeGenerator.tokenizeToArray(text)
    val n = toks.numElements()
    if (n == 0) return null
    val seen = new java.util.HashSet[String](n * 2)
    val votes = new Array[Int](32)
    var any = false
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (seen.add(t.toString)) {
        any = true
        val h = md5Prefix32(t)
        var b = 0
        while (b < 32) {
          if (((h >> (31 - b)) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) >= 0) sig |= (1L << (31 - b))
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  /** Two-pointer |A∩B| over sorted-distinct long arrays (see
    * [[IntersectCountSorted]]). */
  def intersectCountSorted(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** Two-pointer Jaccard over sorted-distinct long arrays (see
    * [[JaccardSorted]]). */
  def jaccardSorted(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val uni = n + m - inter
    if (uni == 0) Double.NaN else inter.toDouble / uni
  }

  /** All n MinHash signatures in one pass (see [[MinhashSigs]]); empty
    * input → n nulls (array_min-of-empty parity). NULL elements are
    * rejected loudly, mirroring [[sortedDistinctLongs]]: getLong on a
    * NULL slot silently reads 0, which would fabricate a near-minimal
    * permuted hash (h = c) and diverge from the compositional
    * array_min(transform(...)) form, which SKIPS nulls. */
  def minhashSigs(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val sz = arr.numElements()
    val out = new Array[Any](n)
    if (sz > 0) {
      // ONE upfront validation pass (not inside the n-signature loop —
      // this is the kernel the interpreted-HOF fusion made hot-path;
      // per-signature re-checks would cost n× redundant branches)
      var v = 0
      while (v < sz) {
        if (arr.isNullAt(v))
          throw new IllegalArgumentException(
            "minhash_sigs: NULL element (callers feed null-free hash arrays; " +
              "getLong(null)=0 would fabricate a near-minimal signature)")
        v += 1
      }
      var s = 0
      while (s < n) {
        val a = 2L * s + 1
        val c = 7919L * s + 1
        var min = Long.MaxValue
        var i = 0
        while (i < sz) {
          val h = (arr.getLong(i) * a + c) % 4294967291L
          if (h < min) min = h
          i += 1
        }
        out(s) = min
        s += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Sorted-distinct long array (see [[SortedDistinctLongs]]). */
  def sortedDistinctLongs(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val a = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          "sorted_distinct_i64: NULL element (callers feed null-free hash arrays; " +
            "a silent drop would change Jaccard denominators)")
      a(i) = arr.getLong(i)
      i += 1
    }
    java.util.Arrays.sort(a)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(a, w))
  }

  private val spaceSep = UTF8String.fromString(" ")

  /** First-occurrence-ordered distinct 3-char windows (see
    * [[CharTrigramSet]]). Codepoint-based windows via String chars —
    * valid because the caller's normalization strips the input to
    * ASCII-plus-space before padding. */
  def charTrigramSet(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < 3)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](n * 2)
    var i = 0
    while (i <= n - 3) {
      seen.add(str.substring(i, i + 3))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var w = 0
    while (it.hasNext) { out(w) = UTF8String.fromString(it.next()); w += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** n-gram string shingles over full windows (see [[WordShingles]]);
    * concatWs skips null elements, matching the compositional
    * concat_ws. */
  def wordShingles(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val sz = arr.numElements()
    val m = math.max(0, sz - n + 1)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) {
        parts(k) = if (arr.isNullAt(i + k)) null else arr.getUTF8String(i + k)
        k += 1
      }
      out(i) = UTF8String.concatWs(spaceSep, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Occurrence count of elements ∈ `set` (see [[CountInSet]]); NULL
    * elements are skipped (array_contains-null parity). */
  def countInSet(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var i = 0
    var c = 0L
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Σ ceil(numChars/4) per token (see [[SubwordEst]]); a NULL element
    * nulls the whole sum (the compositional fold's null absorption). */
  def subwordEst(arr: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var i = 0
    var s = 0L
    while (i < n) {
      if (arr.isNullAt(i)) return null
      s += (arr.getUTF8String(i).numChars() + 3) / 4
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** First 4 md5 bytes of the UTF-8 input, big-endian unsigned. */
  def md5Prefix32(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  private val space = Array[Byte](0x20)

  /** md5-prefix32 per n-token window, streaming bytes straight into the
    * digest (see [[ShingleHash32]]). */
  def shingleHash32(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val sz = arr.numElements()
    val m = math.max(0, sz - n + 1)
    val out = new Array[Long](m)
    // extract each token's bytes ONCE — a token sits in up to n windows,
    // and UTF8String.getBytes copies on every call
    val bytes = new Array[Array[Byte]](sz)
    var j = 0
    while (j < sz) {
      bytes(j) = if (arr.isNullAt(j)) null else arr.getUTF8String(j).getBytes
      j += 1
    }
    val d = md.get()
    var i = 0
    while (i < m) {
      d.reset()
      var wrote = false
      var k = 0
      while (k < n) {
        val t = bytes(i + k)
        if (t != null) { // concat_ws semantics: null args vanish, no separator
          if (wrote) d.update(space)
          d.update(t)
          wrote = true
        }
        k += 1
      }
      val b = d.digest()
      out(i) = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
        ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
