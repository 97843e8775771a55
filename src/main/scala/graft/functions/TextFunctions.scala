package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text kernel for the document-processing operators.
  *
  * Everything here is built from `org.apache.spark.sql.functions._` (so it
  * stays inside whole-stage codegen — no Scala UDFs in the hot path) and is
  * deliberately re-expressible in ANSI SQL so the DuckDB oracle can verify
  * each operator bit-for-bit.
  *
  * Tokenizer semantics are PINNED (the one semantic substitution noted in
  * SURVEY.md §7.4 for the reference's IK analyzer,
  * gmall-realtime-self/.../util/KeywordUtil.java:13-35): lowercase, split on
  * runs of non-[a-z0-9], drop empties.
  */
object TextFunctions {

  /** Pinned tokenizer: lowercase, split on non-alphanumeric runs, drop "". */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** CJK Unified Ideographs (BMP block, U+4E00–U+9FFF) — the pinned
    * fallback range: BMP-only keeps Spark/DuckDB substring and length
    * semantics identical (one code unit per char on both engines). */
  private val Cjk = "一-鿿"

  /** Tokenizer with the CJK-bigram fallback mode — closes the declared
    * semantic substitution vs the reference's IK Chinese analyzer
    * (gmall-realtime-self/.../util/KeywordUtil.java:13-35): IK segments
    * Chinese by dictionary; the standard dictionary-free substitute is
    * overlapping character bigrams, which the CJK IR literature pins as
    * near-parity for retrieval. Semantics (pinned):
    *   - latin/digit runs tokenize exactly as [[tokens]] (lowercased
    *     maximal [a-z0-9] runs);
    *   - each maximal CJK run of length L ≥ 2 emits its L−1 overlapping
    *     character bigrams, in order;
    *   - an isolated CJK char (run of length 1) emits itself;
    *   - everything else separates.
    * `cjk = false` is byte-identical to [[tokens]]. Stays inside
    * whole-stage codegen (regexp + array lambdas, no UDF) and is
    * re-expressible in DuckDB (u2_cjk_tokens oracle). */
  def tokens(text: Column, cjk: Boolean): Column =
    if (!cjk) tokens(text)
    else {
      // keep [a-z0-9] + CJK, everything else -> space; then wrap each
      // CJK run with spaces so latin and CJK runs split apart (capture-
      // group replace — DuckDB's RE2 has no lookaround, so the oracle
      // can mirror this exactly)
      val kept = regexp_replace(lower(text), s"[^a-z0-9$Cjk]+", " ")
      val sep = regexp_replace(kept, s"([$Cjk]+)", " $1 ")
      val pieces = filter(split(sep, " +"), p => p =!= "")
      flatten(transform(pieces, p =>
        when(p.rlike(s"^[$Cjk]") && length(p) > 1,
          transform(sequence(lit(1), length(p) - 1), j => p.substr(j, lit(2))))
          .otherwise(array(p))))
    }

  /** Distinct token set (order-free; use array_sort for deterministic output). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word-level n-gram shingles: ["a","b","c"] with n=2 -> ["a b","b c"].
    *
    * IMPORTANT: pass a *bound column* (project the token array first), not
    * the raw tokenizer expression — `toks` is referenced inside the lambda,
    * and an unbound expression would be re-evaluated per element (O(n²)
    * tokenizations per row; measured 15x slowdown on the documents table).
    */
  def wordShingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("word_shingles", toks,
      org.apache.spark.sql.functions.lit(n))

  /** The pure-functions form of [[wordShingles]], kept for the
    * bit-equality proof in PlansSpec (the hash32 rule): the fused
    * plans.WordShingles replaces this interpreted transform+filter
    * lambda pair across lmScore/repetition/decontamination/collocation
    * sites. */
  def wordShinglesCompositional(toks: Column, n: Int): Column =
    filter(
      transform(toks, (_, i) => concat_ws(" ", (0 until n).map(k => get(toks, i + k)): _*)),
      (_, i) => i <= size(toks) - n)

  /** 32-bit numeric hash of a string: first 8 hex digits of md5, engine-
    * portable (DuckDB: `('0x'||substr(md5(x),1,8))::BIGINT`). Backed by
    * the fused native Md5Prefix32 expression (one digest, no hex-string
    * round-trip; registered by GraftFunctions.register, which every
    * GraftSession/SparkTestSession runs); `hash32Compositional` is the
    * pure-functions form kept for the bit-equality proof in PlansSpec. */
  def hash32(c: Column): Column =
    org.apache.spark.sql.functions.call_function("md5_prefix32", c)

  def hash32Compositional(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** MinHash permutation `seed` over a precomputed hash32 array: universal
    * hashing h_s(v) = ((2s+1)·v + 7919s + 1) mod p — ONE md5 per element
    * total, 8 cheap integer permutations on top (vs 8 md5 passes). */
  def minhashSigFromHashes(hashes: Column, seed: Int): Column =
    array_min(transform(hashes,
      v => (v * (2 * seed + 1) + (7919 * seed + 1)) % lit(4294967291L)))

  /** One MinHash signature directly from a token set (column-expression
    * form of minhashSigFromHashes). */
  def minhashSig(tokenSet: Column, seed: Int): Column =
    minhashSigFromHashes(transform(tokenSet, hash32(_)), seed)

  /** All `n` MinHash signatures in ONE codegen'd pass over the hash
    * array — the hot-path form of n× [[minhashSigFromHashes]], whose
    * ArrayTransform lambda evaluates interpreted per seed per row
    * (plans.MinhashSigs; bit-equality asserted in PlansSpec). */
  def minhashSigsFused(hashes: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("minhash_sigs", hashes,
      org.apache.spark.sql.functions.lit(n))

  /** Sorted-distinct long array in one primitive pass — the hot-path
    * form of `array_sort(array_distinct(...))` (two interpreted HOF
    * evaluations per row) on hash arrays. */
  def sortedDistinct(hashes: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_distinct_i64", hashes)

  /** The pinned tokenizer as ONE native expression (the same kernel the
    * tokenize UDTF uses) — the hot-path form of [[tokens]], whose
    * ArrayFilter lambda evaluates interpreted. NULL text → empty array
    * (tokens(coalesce(text, '')) parity).
    *
    * Lowercasing nuance: the kernel lowercases with Locale.ROOT
    * (locale-INDEPENDENT — matching DuckDB's utf8proc `lower()`), while
    * the compositional [[tokens]] rides Spark's `lower()`, which routes
    * non-ASCII strings through the JVM default locale. On a tr/az-locale
    * JVM the two can disagree on dotted/dotless I in mixed-script text;
    * the fused form is the deterministic one, and ASCII corpora (every
    * fixture here) are identical under both. */
  def tokensFused(text: Column): Column =
    org.apache.spark.sql.functions.call_function("tokenize_array", text)

  /** Fused form of [[tokens]]`(text, cjk = true)` — one codegen'd linear
    * scan instead of the compositional two-regex + interpreted-HOF chain
    * (plans.TokenizeArrayCjk; bit-parity pinned in PlansSpec under the
    * same Locale.ROOT-like-default precondition as [[tokensFused]] — the
    * compositional form's `lower()` routes non-ASCII through the JVM
    * default locale, so tr/az JVMs can diverge on dotted/dotless I; the
    * fused kernel is the locale-independent one). Null text yields an
    * empty array (the tokensFused contract), so callers need no
    * coalesce. */
  def tokensFusedCjk(text: Column): Column =
    org.apache.spark.sql.functions.call_function("tokenize_array_cjk", text)

  /** Mode-dispatched fused tokenizer — the ONE place the curation mode
    * flag maps to a kernel (mirrors [[tokens]]`(text, cjk)`). Every
    * Curate/CurateStream binding site (corpus AND benchmark) goes
    * through this, so the corpus and benchmark token spaces cannot
    * drift apart by a missed call-site edit. */
  def tokensFused(text: Column, cjk: Boolean): Column =
    if (cjk) tokensFusedCjk(text) else tokensFused(text)

  /** Occurrence count of tokens in a pinned word set — the fused form of
    * `size(filter(toks, t => array_contains(lit, t)))` (plans.CountInSet;
    * the interpreted lambda re-evaluated the literal array PER TOKEN). */
  def countInSet(toks: Column, words: Seq[String]): Column =
    org.apache.spark.sql.functions.call_function("count_in_set", toks,
      org.apache.spark.sql.functions.typedLit(words))

  /** Σ ceil(numChars/4) per token — the fused BPE-ish subword estimate
    * (plans.SubwordEst; replaces the interpreted aggregate() fold). */
  def subwordEstimate(toks: Column): Column =
    org.apache.spark.sql.functions.call_function("subword_est", toks)

  /** Fused per-position word-shingle hash array:
    * `shingleHash32(toks, n)[i] == hash32(concat_ws(" ", toks[i..i+n-1]))`
    * with ZERO intermediate shingle strings (token bytes stream straight
    * into one digest — see plans.ShingleHash32; per-position bit-equality
    * vs the compositional chain asserted in PlansSpec). The MinHash scan
    * kernel: use this instead of
    * `transform(wordShingles(toks, n), hash32)` wherever only the hashes
    * are consumed. */
  def shingleHash32(toks: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("shingle_hash32", toks,
      org.apache.spark.sql.functions.lit(n))

  /** Document fingerprint: md5 over whitespace-normalized lowercased text. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Unicode NFC canonical composition (native codegen'd expression —
    * plans.NfcNormalize). Run before fingerprint/shingle stages on
    * multilingual corpora: precomposed and decomposed spellings of the
    * same text must collapse to one fingerprint. */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", text)

  /** Winnowing window-min step (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS local fingerprinting algorithm): over a *bound* column of k-gram
    * hashes IN POSITION ORDER, slide a window of `w` consecutive hashes and
    * keep each window's MINIMUM; result is the distinct sorted fingerprint
    * set. Any shared run of >= w+k-1 tokens between two documents is
    * guaranteed to share a fingerprint, at expected density 2/(w+1).
    *
    * `hashes` MUST be a bound attribute (project it first — same rule as
    * wordShingles: an unbound expression would re-run the whole
    * tokenize+hash pipeline per window). */
  def winnowFromHashes(hashes: Column, w: Int): Column =
    array_sort(array_distinct(filter(
      transform(hashes, (_, i) => array_min(slice(hashes, i + 1, lit(w)))),
      (_, i) => i <= size(hashes) - w)))

  /** 32-bit SimHash over a token set: bit b votes +1/-1 by bit b of each
    * token's hash32; the simhash bit is the vote sum's sign. Pure
    * column-expression form (32 array folds) — Dedup.simhashTable has the
    * faster explode+groupBy formulation with identical semantics.
    */
  def simhash32(tokenSet: Column): Column = {
    val hashes = transform(tokenSet, hash32(_))
    val sig = (0 until 32).map { b =>
      val voteSum = aggregate(hashes, lit(0L),
        (acc, v) => acc + (shiftright(v, 31 - b).bitwiseAND(lit(1L)) * 2 - 1))
      when(voteSum >= 0, lit(1L << (31 - b))).otherwise(lit(0L))
    }.reduce(_ + _)
    // zero tokens => null, matching simhashTable (whose explode emits no
    // row) — without the guard an empty set votes 0 on every bit and
    // returns 0xFFFFFFFF, a bogus "signature" that near-matches nothing
    when(size(tokenSet) === 0, lit(null).cast("long")).otherwise(sig)
  }
}
