package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token statistics. All pure projections (no shuffle) —
  * at 100 TB these run at scan speed and feed filter decisions.
  *
  * Each operator projects the token array ONCE and computes everything off
  * the bound column — repeated references to the raw tokenizer expression
  * would re-tokenize per reference (see wordShingles scaladoc).
  */
object TextAnalysis {

  /** Default [[bpeMerges]] word-type cap: the trainer's driver collect is
    * bounded by construction unless a caller explicitly opts out with 0. */
  val DefaultMaxWordTypes: Int = 1000000

  /** Tiny pinned stopword lexicons (n-gram-heuristic language ID).
    * Deterministic and oracle-expressible; a production build would swap in
    * larger lexicons without changing the operator shape. */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un"))

  /** Pinned zh function-word bigrams — the CJK evidence lexicon. Chinese
    * has no word delimiters, so the latin device (tokenize, intersect a
    * stopword list) never fires; the dictionary-free substitute is
    * character-BIGRAM evidence (the same substitution the CJK tokenizer
    * mode pins vs the reference's IK analyzer,
    * gmall-realtime-self/.../util/KeywordUtil.java:13-35). Containment of
    * a pinned common-bigram in the RAW text ≡ a bigram-token intersect
    * with multiplicity collapsed — and it stays a plain codegen'd
    * `contains` per entry, no tokenizer pass and no interpreted HOF in
    * this map-side path. All chars are BMP CJK Unified Ideographs
    * (U+4E00–U+9FFF), keeping Spark/DuckDB string semantics identical. */
  val zhLexicon: Seq[String] = Seq("我们", "他们", "什么", "一个", "可以", "没有")

  /** zh evidence: how many of the pinned bigrams the raw text contains
    * (0..6, the same scale as a 6-word stopword-lexicon hit count). A sum
    * of codegen'd conditionals — deliberately NOT a filter() lambda. */
  private def zhHits(text: Column): Column =
    zhLexicon.map(b => when(contains(coalesce(text, lit("")), lit(b)), 1)
      .otherwise(0)).reduce(_ + _)

  /** (doc_id, n_chars, toks, __text) — REUSES a caller-bound `toks`
    * column when one is present (contract: it must be `tokens(text)` —
    * or, in the mixed-script curation mode, `tokens(text, cjk = true)` —
    * of the same frame, e.g. `profiled`'s persisted per-doc frame or
    * Curate's cjk-bound corpus), so a profile that fans into quality +
    * language + token stats tokenizes the corpus once, not once per
    * consumer. `__text` carries the coalesced raw text for the zh
    * containment evidence, which never depends on the tokenization. */
  private def withToks(docs: DataFrame): DataFrame =
    if (docs.columns.contains("toks"))
      docs.select(col("doc_id"),
        length(coalesce(col("text"), lit(""))).cast("long").as("n_chars"),
        col("toks"),
        coalesce(col("text"), lit("")).as("__text"))
    else
      docs.select(col("doc_id"),
        length(coalesce(col("text"), lit(""))).cast("long").as("n_chars"),
        tokensFused(col("text")).as("toks"),
        coalesce(col("text"), lit("")).as("__text"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(array_distinct(toks), array(words.map(lit): _*)))

  /** The bound-toks reuse contract as ONE expression helper (the column
    * form of [[withToks]], shared by contaminationGrams/trainLm/scoreLm
    * — Dedup.boundToks is the same contract on the dedup side): reuse a
    * caller-bound `toks` column when present, else tokenize latin-fused.
    * Any future change to the contract (type validation, a mode tag)
    * lands here once instead of per consumer. */
  private def boundToksCol(df: DataFrame): Column =
    if (df.columns.contains("toks")) col("toks")
    else tokensFused(col("text"))

  /** Predict language from stopword hits plus CJK-bigram evidence
    * ([[zhLexicon]] containment — the zh arm latin tokenization can never
    * reach, since the tokenizer strips CJK); ties broken alphabetically
    * (de < en < es < fr < zh), zero hits => 'und' (undetermined). Emits
    * per-lexicon hit counts. */
  def langId(docs: DataFrame): DataFrame = {
    val t = withToks(docs)
    val hitCols = lexicons.map { case (lang, words) => lang -> hits(col("toks"), words) } :+
      ("zh" -> zhHits(col("__text")))
    val mx = greatest(hitCols.map(_._2): _*)
    val pred = hitCols.foldLeft(when(mx === 0, "und"): Column) {
      case (acc, (lang, h)) => acc.when(h === mx, lang)
    }
    t.select(
      (col("doc_id") +: hitCols.map { case (l, h) => h.cast("long").as(s"hits_$l") } :+
        pred.as("pred_lang")): _*)
  }

  /** Pinned char-trigram profiles (top trigrams with space-padded word
    * boundaries — " th"/"he " are classic English signals). Tiny by
    * design; production swaps in trained profiles, same operator shape. */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("er ", "en ", "der", "ein", "sch", "ich", "nde", "die"),
    "en" -> Seq(" th", "the", "he ", "ing", "and", " of", "ed ", "ion"),
    "es" -> Seq(" de", "de ", "os ", "la ", "el ", "que", " es", "ado"),
    "fr" -> Seq(" le", "le ", "es ", "ent", "que", "les", " un", "ais"))

  /** Char-n-gram language ID: space-padded normalized text → distinct
    * trigram set → per-language profile hits; ties broken alphabetically,
    * zero hits => 'und'. The trigram array is bound in its own projection
    * before any lambda references it (re-evaluation cliff — see scaladoc
    * above). Pure map-side, like langId. */
  def langIdNgram(docs: DataFrame): DataFrame = {
    val padded = docs.select(col("doc_id"),
      concat(lit(" "),
        trim(regexp_replace(lower(coalesce(col("text"), lit(""))), "[^a-z0-9]+", " ")),
        lit(" ")).as("s"),
      // zh evidence comes from the RAW text (the [a-z0-9] normalization
      // strips CJK): trigram profiles are a latin-script device, and the
      // CJK IR literature pins BIGRAMS as the dictionary-free unit — so
      // the zh arm reuses the bigram-containment lexicon, same 0..6 scale
      zhHits(col("text")).as("hzh"))
    // fused char_trigram_set: the compositional
    // array_distinct(transform(sequence(...), substr)) allocated one
    // interpreted substring per char position per row (bit-parity with
    // that form pinned in PlansSpec; `s` is ASCII by construction, the
    // kernel's documented precondition)
    val bound = padded.select(col("doc_id"), col("hzh"),
      org.apache.spark.sql.functions.call_function("char_trigram_set", col("s"))
        .as("tris"))
    val hitCols = trigramProfiles.map { case (lang, tris) =>
      lang -> size(array_intersect(col("tris"), array(tris.map(lit): _*)))
    } :+ ("zh" -> (col("hzh"): Column))
    val mx = greatest(hitCols.map(_._2): _*)
    val pred = hitCols.foldLeft(when(mx === 0, "und"): Column) {
      case (acc, (lang, h)) => acc.when(h === mx, lang)
    }
    bound.select(
      (col("doc_id") +: hitCols.map { case (l, h) => h.cast("long").as(s"tri_$l") } :+
        pred.as("pred_lang")): _*)
  }

  /** Quality score: length saturation, type-token ratio, stopword rate —
    * the classic cheap pre-filter trio for web-scale corpora.
    *
    * `cjk = true` (the Curate mixed-script mode, where `toks` are bound
    * via the CJK-bigram tokenizer) extends the stop set with the
    * [[zhLexicon]] function-word bigrams — in that mode those bigrams ARE
    * tokens, so the containment arm langId uses is expressible as plain
    * set membership here. Without the arm the stop-rate term is CONSTANT
    * 0 for pure-zh docs (the latin set can never hit a CJK bigram): a zh
    * keyword-stuffing doc and fluent zh prose were indistinguishable on
    * it, and zh docs got the term's maximum for free while fluent latin
    * docs pay their natural 0.3–0.5 stop rate. Measured before the fix
    * (round 10): fluent pure-zh docs score 0.70–0.79 — they PASS the 0.55
    * gate either way (the round-9 "under-scored / fails the gate" premise
    * was tested and refuted; TextOpsSpec pins both facts), so this arm is
    * a scoring-parity fix, not a gate flip. */
  def qualityScore(docs: DataFrame, cjk: Boolean = false): DataFrame = {
    val stopwords =
      (lexicons.flatMap(_._2) ++ (if (cjk) zhLexicon else Nil)).distinct.sorted
    val nTok = size(col("toks")).cast("double")
    val ttr = size(array_distinct(col("toks"))).cast("double") / nTok
    // fused count_in_set: the former size(filter(...)) lambda evaluated
    // interpreted and re-built the stopword literal array PER TOKEN —
    // this is the quality gate every curated corpus pays (bit-parity
    // with the compositional form pinned in PlansSpec)
    val stopRate = countInSet(col("toks"), stopwords).cast("double") / nTok
    val lenSat = least(lit(1.0), nTok / lit(100.0))
    // ratios stay UNROUNDED: both engines compute them bit-identically,
    // while round() ties diverge (Spark rounds the shortest decimal repr
    // via BigDecimal.valueOf, DuckDB rounds the binary double — found at
    // sf0.1 where 16/5000 docs landed on .xxxx5 boundaries)
    withToks(docs)
      .filter(size(col("toks")) > 0)
      .select(
        col("doc_id"), col("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        ttr.as("ttr"),
        stopRate.as("stop_rate"),
        (lit(0.4) * ttr + lit(0.3) * lenSat + lit(0.3) * (lit(1.0) - stopRate)).as("quality"))
  }

  /** Token statistics incl. a BPE-ish subword estimate (ceil(len/4) pieces
    * per token — a deterministic stand-in for a real BPE vocab; fused
    * subword_est replaces the interpreted aggregate() fold that sat on
    * the t_token_stats bench headline — PlansSpec pins bit-parity). */
  def tokenStats(docs: DataFrame): DataFrame =
    withToks(docs).select(
      col("doc_id"), col("n_chars"),
      size(col("toks")).cast("long").as("n_tokens"),
      size(array_distinct(col("toks"))).cast("long").as("n_unique"),
      subwordEstimate(col("toks")).as("n_subwords"))

  /** Repetition scoring (the Gopher/MassiveText repetition filters,
    * Rae et al. 2021 §A.1.1, re-expressed as column math): duplicate
    * 2-gram / 3-gram fractions (1 − distinct/total) and the most-frequent-
    * token fraction. Highly repetitive docs (boilerplate, keyword stuffing,
    * degenerate generations) score high and get filtered. Pure map-side
    * like the rest of this file: the max-run count rides on ONE
    * array_sort + fold per row, no shuffle, no per-distinct-token rescan. */
  def repetitionScore(docs: DataFrame): DataFrame = {
    def dupFrac(g: Column): Column =
      when(size(g) > 0,
        lit(1.0) - size(array_distinct(g)).cast("double") / size(g).cast("double"))
        .otherwise(lit(0.0))
    // bind the n-gram arrays in their own projection before the ratio
    // lambdas reference them (re-evaluation cliff — see file scaladoc)
    val bound = withToks(docs).filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        wordShingles(col("toks"), 2).as("g2"),
        wordShingles(col("toks"), 3).as("g3"),
        array_sort(col("toks")).as("sorted"))
    // longest run of equal adjacent tokens in the sorted array = max
    // per-token count; tokens are non-empty so "" is a safe sentinel
    val maxCount = aggregate(col("sorted"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    bound.select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      dupFrac(col("g2")).as("dup_2gram_frac"),
      dupFrac(col("g3")).as("dup_3gram_frac"),
      (maxCount.cast("double") / size(col("toks")).cast("double")).as("top_token_frac"))
  }

  /** Benchmark decontamination: per corpus doc, how many of its distinct
    * n-token shingles appear in the BENCHMARK table (eval sets the
    * training corpus must not leak). The contract every serious pipeline
    * runs before training; a doc with n_shared > 0 is contaminated and
    * gets dropped (left_anti on this table).
    *
    * Shape at 100 TB: both sides explode to (gram) rows and the join
    * shuffles on the gram string — never a per-doc cross product; the
    * benchmark side is distinct-ed first (eval suites are tiny next to
    * the corpus, so AQE turns this into a broadcast join in practice).
    * Both array frames are persisted BEFORE their explode — Generate
    * re-inlines higher-order projection chains (see Dedup.winnowPairs). */
  def contaminationTable(docs: DataFrame, benchmark: DataFrame, n: Int = 4): DataFrame = {
    val dg = contaminationGrams(docs, n).persist()
    val bg = contaminationGrams(benchmark, n).persist()
    try {
      val corpusGrams = dg.select(col("doc_id"), explode(col("g")).as("gram"))
      val benchGrams = bg.select(explode(col("g")).as("gram")).distinct()
      // eager: the output (contaminated doc_id + count) is tiny next to
      // the corpus, and materializing it here lets the operator release
      // its own gram caches instead of leaking them to the caller
      corpusGrams.join(benchGrams, "gram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared_grams"))
        .localCheckpoint(true)
    } finally {
      dg.unpersist(blocking = false)
      bg.unpersist(blocking = false)
      ()
    }
  }

  /** Per-document top-k salient terms by tf × rarity: score = tf/df — the
    * log-free tf-idf variant. The substitution is deliberate: small-int
    * ratios are IEEE-exact in every engine, so the rank order is
    * deterministic and oracle-checkable, where tf·ln(N/df) would hang the
    * hash gate on libm's last ulp; the operator shape (and every shuffle)
    * is identical if a caller swaps the score expression. Ties break by
    * term ascending, so the output is total-ordered.
    *
    * Scale: tf is one (doc, term)-keyed partial agg; df reuses the tf
    * table (term-keyed agg — one row per distinct (doc, term), not the
    * token stream); the tf⋈df join shuffles on term; the top-k window
    * partitions by doc_id. Every stage is key-bucketed — no global sort,
    * no driver pass. */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    val terms = docs
      .select(col("doc_id"), explode(tokensFused(col("text"))).as("term"))
    // persisted (session registry, Dedup.releaseCaches contract): tf feeds
    // BOTH the score side and the df aggregation — unpersisted, the whole
    // tokenize+explode+groupBy pipeline runs twice
    val tf = Dedup.track(
      terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")).persist())
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }

  /** Bloom-filter decontamination — the 100 TB path next to
    * contaminationTable's join: the benchmark's distinct n-grams are folded
    * into ONE Bloom filter (driver-built via df.stat.bloomFilter, MB-sized
    * for even very large eval suites), broadcast once, and every corpus doc
    * is scored MAP-SIDE — the corpus never explodes and never shuffles, so
    * the operator runs at scan speed regardless of corpus size.
    *
    * Guarantees: no false negatives (every truly-shared gram is counted, so
    * `n_bf_grams >= true n_shared_grams` per doc and a contaminated doc is
    * always flagged); false-positive rate per probed gram is `fpp`. The
    * catalog entry gates both properties against the exact join in-query.
    *
    * The per-doc probe is the native codegen'd `bloom_hits` expression
    * over the (bound) gram array (plans.BloomHits — round 11 closed the
    * one deliberate UDF exception that used to live here; bit-parity
    * with the UDF form pinned in PlansSpec). The expression carries the
    * broadcast HANDLE, so tasks stay bytes-small and executors fetch the
    * filter once, exactly as the UDF closure did. */
  def contaminationBloom(
      docs: DataFrame, benchmark: DataFrame, n: Int = 4,
      fpp: Double = 1e-6): DataFrame =
    bloomScore(docs, benchmarkBloom(benchmark, n, fpp), n)

  /** Build the benchmark's n-gram Bloom filter ONCE (driver-held, MB-sized
    * for even very large eval suites; None for an empty benchmark — Spark's
    * stat.bloomFilter NPEs on an empty frame, so the no-grams case is an
    * explicit no-filter). Split from the scoring so a STREAMING caller can
    * build the filter once at query start and score every micro-batch
    * against it (decontaminationSink). */
  def benchmarkBloom(benchmark: DataFrame, n: Int = 4,
      fpp: Double = 1e-6): Option[org.apache.spark.util.sketch.BloomFilter] = {
    val bg = contaminationGrams(benchmark, n)
      .select(explode(col("g")).as("gram")).distinct().persist()
    try {
      val nGrams = bg.count()
      if (nGrams == 0) None else Some(bg.stat.bloomFilter("gram", nGrams, fpp))
    } finally {
      bg.unpersist(blocking = false)
      ()
    }
  }

  /** Map-side contamination scoring against a prebuilt benchmark filter:
    * (doc_id, n_grams, n_bf_grams) at scan speed — the corpus never
    * explodes and never shuffles. Works identically on batch and
    * micro-batch frames (the filter rides in the UDF closure and is
    * torrent-broadcast once per executor). */
  def bloomScore(docs: DataFrame,
      bf: Option[org.apache.spark.util.sketch.BloomFilter], n: Int = 4): DataFrame =
    bf match {
      case None =>
        contaminationGrams(docs, n).select(
          col("doc_id"),
          size(col("g")).cast("long").as("n_grams"),
          lit(0L).as("n_bf_grams"))
      case Some(filter) =>
        bloomScoreBroadcast(docs, docs.sparkSession.sparkContext.broadcast(filter), n)
    }

  /** bloomScore against an ALREADY-broadcast filter — the streaming form:
    * decontaminationSink broadcasts the benchmark filter once at query
    * start and every micro-batch reuses the same broadcast instead of
    * re-shipping MBs of filter per trigger. */
  def bloomScoreBroadcast(docs: DataFrame,
      bfB: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      n: Int = 4): DataFrame = {
    // register → analyze → deregister: DataFrames analyze EAGERLY, so by
    // the time select() returns, BloomHits embeds the Broadcast object
    // itself and the registry entry is dead weight — dropping it here
    // keeps the driver map empty at rest across arbitrarily many curated
    // benchmarks (round-11 ADVICE: the registry had no unregister path)
    val handle = graft.plans.BloomHandles.register(bfB)
    try contaminationGrams(docs, n).select(
      col("doc_id"),
      size(col("g")).cast("long").as("n_grams"),
      org.apache.spark.sql.functions.call_function("bloom_hits",
        col("g"), lit(handle)).as("n_bf_grams"))
    finally graft.plans.BloomHandles.deregister(handle)
  }

  /** SURGICAL decontamination — excise contaminated spans instead of
    * dropping whole documents (the softer knife next to
    * [[contaminationTable]]'s doc-level gate: dropping a 100-page doc for
    * one leaked eval question wastes the other 99 pages). Every token
    * position covered by ANY n-gram shared with the benchmark is removed;
    * the document is rebuilt from the surviving tokens. Output one row per
    * corpus doc: (doc_id, text, n_tokens, n_removed) — text is the
    * token-rebuilt form (the dedupSpans contract), unchanged-by-value for
    * clean docs.
    *
    * Scale: positional grams explode only docs with >= n tokens and the
    * gram join shuffles on the gram string with the DISTINCT benchmark side
    * (tiny → AQE broadcasts it); the hit list aggregates per contaminated
    * doc only (bounded by doc length); the rebuild is one doc_id-keyed
    * left join back to the corpus plus a map-side index filter. The corpus
    * is never crossed with itself.
    *
    * Both array-producing frames are persisted before their explode
    * (Generate re-inlines higher-order chains — see Dedup.winnowPairs) and
    * registered in the session cache registry (caller releases via
    * Curate.releaseCaches, the tfIdfTopTerms contract). The covered-
    * position array is bound to its own column before the index-filter
    * lambda references it (HOF re-inline invariant). */
  /** @param cjk mixed-script mode: excision by CHARACTER OFFSETS instead
    *   of token rebuild. The latin path rebuilds `concat_ws(" ", kept
    *   tokens)`, which is only text-faithful for a NON-OVERLAPPING
    *   tokenization — rebuilding from CJK character bigrams would emit
    *   every interior ideograph twice with spaces mid-word ("今天天气" →
    *   "今天 天天 天气"); round 10 therefore shipped span excision
    *   latin-only. The cjk path closes that: each token carries its
    *   source span (the fused `tokenize_spans_cjk` kernel — codepoint
    *   ranges into lower_root(text), bit-identical token text to
    *   tokenize_array_cjk), covered token positions map to character
    *   ranges, overlapping ranges UNION, and the output text is
    *   lower_root(text) with the covered ranges excised — separators,
    *   punctuation and line structure survive (unlike the latin token
    *   rebuild, which normalizes them away; the two modes' outputs are
    *   intentionally different shapes, each pinned by its own oracle).
    *   Cost shape is identical to latin: the only non-map-side stages
    *   are the gram join (DISTINCT tiny benchmark side) and the per-
    *   contaminated-doc hit aggregation; the rebuild fold does work
    *   proportional to a doc's covered spans, not its length.
    *
    * SINGLE-PASS semantics (both arms): excision joins the kept
    * segments, and tokens that become adjacent across an excised seam
    * can form n-grams that did not exist before — so one pass does NOT
    * guarantee the output shares zero n-grams with the benchmark
    * (TextOpsSpec pins a seam-created gram). Pipelines that need a
    * guaranteed-clean corpus compose the surgical pass with the
    * doc-level gate — Curate's `excise` + `benchmark` together: excise
    * first, then drop the (rare) docs still contaminated after the
    * seam. An iterated fixpoint would re-run the gram join per round
    * for a residue the gate handles in the same single extra join. */
  /** @param preserveStructure latin-mode rebuild choice (cjk mode ALWAYS
    *   excises by offset): false (default) keeps the round-10 token
    *   rebuild — kept tokens joined by single spaces, separators
    *   normalized away (the dedupSpans contract, pinned by
    *   t_decontaminate_spans); true routes latin excision through the
    *   SAME character-offset path as cjk (`tokenize_spans`, the latin
    *   spans kernel), so punctuation, casing-independent separators and
    *   line structure SURVIVE — clean docs come back as lower_root(text)
    *   unchanged-by-value (pinned by t_decontaminate_spans_offset).
    *   Curate's `excise` pre-transform uses this form in both modes:
    *   shipped text should differ from the original ONLY inside excised
    *   ranges. */
  def decontaminateSpans(docs: DataFrame, benchmark: DataFrame, n: Int = 4,
      cjk: Boolean = false, preserveStructure: Boolean = false): DataFrame =
    if (cjk || preserveStructure) decontaminateSpansByOffset(docs, benchmark, n, cjk)
    else decontaminateSpansLatin(docs, benchmark, n)

  private def decontaminateSpansLatin(docs: DataFrame, benchmark: DataFrame,
      n: Int): DataFrame = {
    // deliberately NOT bound-toks (the one decontamination path that
    // re-tokenizes): the rebuild below is concat_ws over the KEPT
    // tokens — see the cjk @param above for why a bound CJK-bigram
    // tokenization cannot ride this path and gets the offset-based one.
    val dt = Dedup.track(docs
      .select(col("doc_id"), tokensFused(col("text")).as("toks"))
      .persist())
    val sg = Dedup.track(dt.filter(size(col("toks")) >= n)
      .select(col("doc_id"), wordShingles(col("toks"), n).as("g"))
      .persist())
    val bg = Dedup.track(contaminationGrams(benchmark, n).persist())
    val pg = sg.select(col("doc_id"), posexplode(col("g")).as(Seq("pos", "gram")))
    val benchGrams = bg.select(explode(col("g")).as("gram")).distinct()
    val hits = pg.join(benchGrams, "gram")
      .groupBy(col("doc_id")).agg(collect_set(col("pos")).as("hp"))
    val cov = array_distinct(flatten(transform(col("hp"), p => sequence(p, p + lit(n - 1)))))
    // Rebuild by a fold over the SORTED covered positions (emit the
    // kept-token gap before each covered index, then the tail),
    // byte-identical to the old `concat_ws(' ', kept tokens)` filter
    // form but O(|covered|) per doc instead of O(n_tokens · |covered|):
    // the filter(sequence) + array_contains + transform(get) chain is
    // three interpreted HOFs re-scanning the covered array PER TOKEN,
    // measured 3x end-to-end on the boilerplate-heavy sf1/sf3 fixtures
    // (29 -> 10 s at sf1; SCALE.md §Round-11 span family). The oracle is
    // unchanged — t_decontaminate_spans hash-gates the equivalence.
    val seg = (from: Column, until: Column) =>
      concat_ws(" ", slice(col("toks"), from + 1, until - from))
    val glue = (acc: Column, piece: Column) =>
      when(piece === "", acc)
        .when(acc === "", piece)
        .otherwise(concat(acc, lit(" "), piece))
    val rebuilt = aggregate(
      array_sort(col("cov")),
      struct(lit(0).as("last"), lit("").as("acc")),
      (st, p) => struct(
        (p + 1).as("last"),
        when(p > st("last"), glue(st("acc"), seg(st("last"), p)))
          .otherwise(st("acc")).as("acc")),
      st => when(size(col("toks")) > st("last"),
        glue(st("acc"), seg(st("last"), size(col("toks")))))
        .otherwise(st("acc")))
    dt.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(cov, array().cast("array<int>")).as("cov"))
      .select(col("doc_id"),
        rebuilt.as("text"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("cov")).cast("long").as("n_removed"))
  }

  /** The character-offset arm of [[decontaminateSpans]] (always for cjk,
    * opt-in for latin via preserveStructure): same gram-join +
    * covered-position pipeline, but tokens carry codepoint spans and the
    * rebuild excises the UNION of covered character ranges from
    * lower_root(text) — one sorted fold over a doc's covered spans
    * (gap-before-each-range, then the tail), so the rebuild cost scales
    * with hits, not document length. The benchmark is tokenized in the
    * SAME mode unless the caller pre-bound `toks` (wrong-mode bindings
    * refused — see below). */
  private def decontaminateSpansByOffset(docs: DataFrame, benchmark: DataFrame,
      n: Int, cjk: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{call_function => fn}
    val spansFn = if (cjk) "tokenize_spans_cjk" else "tokenize_spans"
    val dt = Dedup.track(docs
      .select(col("doc_id"),
        fn(spansFn, col("text")).as("spans"),
        fn("lower_root", coalesce(col("text"), lit(""))).as("lt"))
      .persist()) // Generate re-inline hazard (see file scaladoc)
    // spans.t projection rides Spark's native GetArrayStructFields
    // (codegen'd), NOT transform(spans, sp -> sp.t): SimpleHigherOrder-
    // Function lambdas are CodegenFallback and this projection runs over
    // the whole corpus (round-11 verdict item 3 — the cjk arm's measured
    // gap over its latin twin was exactly this interpreted HOF class)
    val sg = Dedup.track(dt
      .select(col("doc_id"), col("spans").getField("t").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), wordShingles(col("toks"), n).as("g"))
      .persist())
    // a pre-bound benchmark must PROVE it is in this arm's token space
    // (round-11 ADVICE: a wrong-mode or untagged benchmark here yields
    // zero shared grams and the excision silently never fires — the
    // exact silent-inert class the Curate entrances refuse); the unbound
    // case binds the arm's own mode, like Curate's defensive rebind
    val want = graft.functions.TokMode.name(cjk)
    val bb =
      if (benchmark.columns.contains("toks")) {
        val m = graft.functions.TokMode.of(benchmark)
        require(m == want,
          s"decontaminateSpans(cjk = $cjk) got a benchmark with a pre-bound " +
            s"'toks' column in '$m' mode: a '$m' tokenization shares no " +
            s"grams with the '$want' corpus side, so excision would silently never " +
            s"fire — bind via graft.functions.TokMode.bind(benchmark, cjk = $cjk) " +
            "or drop the manual binding")
        benchmark
      } else graft.functions.TokMode.bind(benchmark, cjk)
    val bg = Dedup.track(contaminationGrams(bb, n).persist())
    val pg = sg.select(col("doc_id"), posexplode(col("g")).as(Seq("pos", "gram")))
    val benchGrams = bg.select(explode(col("g")).as("gram")).distinct()
    val hits = pg.join(benchGrams, "gram")
      .groupBy(col("doc_id")).agg(collect_set(col("pos")).as("hp"))
    // the whole rebuild — covered-position expansion, character-range
    // union, sorted excision fold — is ONE fused codegen'd call
    // (plans.ExciseSpans): the compositional chain ran four interpreted
    // lambdas per contaminated doc, hit-bounded but dominant on
    // dense-hit corpora (and Curate's excise runs this path over every
    // doc in both modes). Bit-parity with the compositional form is
    // pinned in PlansSpec; the span-excision oracles hash-gate it at
    // 3 SFs. NULL hp (clean doc) → text = lt unchanged-by-value.
    dt.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        fn("excise_spans", col("lt"), col("spans"), col("hp"), lit(n)).as("ex"),
        size(col("spans")).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("ex.text").as("text"), col("n_tokens"),
        col("ex.n_removed").cast("long").as("n_removed"))
  }

  /** Distinct n-gram arrays per doc (the shared shape of every
    * decontamination path); docs shorter than n tokens have no gram.
    * REUSES a caller-bound `toks` column when present (the withToks /
    * Dedup.shingleSets contract) — in the Curate cjk mode BOTH the corpus
    * and the benchmark arrive with CJK-bigram toks bound, so the
    * decontamination gate sees CJK overlap instead of two latin
    * tokenizations that strip CJK text to zero grams on each side (the
    * silent-no-fire defect class round 9 fixed for the n-gram near-dup
    * policies). */
  private def contaminationGrams(df: DataFrame, n: Int): DataFrame = df
    .select(col("doc_id"), boundToksCol(df).as("toks"))
    .filter(size(col("toks")) >= n)
    .select(col("doc_id"), array_distinct(wordShingles(col("toks"), n)).as("g"))

  /** Corpus vocabulary (tokenizer-training prep): the top-k terms by
    * total occurrence count, with document frequency and a dense rank —
    * what a BPE/WordPiece trainer consumes as its seed frequency table.
    *
    * Scale: ONE scan — the (doc, term) tf table feeds both aggregates
    * (occurrences = sum of tfs, doc_freq = tf-row count per term), then
    * `orderBy().limit(k)` plans as TakeOrderedAndProject (per-partition
    * top-k heaps, k-row driver merge — no global sort); the rank window
    * runs over the k surviving rows only. Ties break by term ascending,
    * so the cut at k is a deterministic total order (oracle-checkable). */
  def vocabulary(docs: DataFrame, k: Int = 1000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = docs
      .select(col("doc_id"), explode(tokensFused(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    Ranks.topN(
      tf.groupBy(col("term"))
        .agg(sum(col("tf")).as("n_occurrences"), count(lit(1)).as("doc_freq")),
      Seq(col("n_occurrences").desc, col("term").asc), k)
  }

  /** HTML stripping — the extraction-hygiene pass for web-crawl text that
    * arrived with markup still in it: drop <script>/<style> blocks WITH
    * their payload (code is not prose), strip remaining tags, decode the
    * common entities, collapse whitespace. Deliberately regex-based and
    * pinned (both engines run the same RE2-compatible patterns — no
    * backtracking-only constructs), not a DOM parser: at 100 TB this is
    * a map-side scan, and the goal is training-text hygiene, not HTML
    * fidelity. Entity decode order is pinned with `&amp;` LAST so
    * double-encoded text decodes one level per pass (idempotent on clean
    * text, like redactPii).
    *
    * Returns (doc_id, text, changed) — text rebuilt, flag for accounting
    * (any rewrite counts, incl. whitespace collapse). NULL text passes
    * through as NULL. */
  /** One block pattern PER tag type: the single alternation
    * `<(script|style)>.*?</(script|style)>` cross-matched an opening
    * `<script>` with the first `</style>` and leaked the script payload
    * after it into the cleaned text. Public so the DuckDB oracle folds
    * the IDENTICAL list (one source of truth, the piiPatterns rule). */
  val htmlBlockPatterns: Seq[String] = Seq(
    "(?s)<script[^>]*>.*?</script>", "(?s)<style[^>]*>.*?</style>")

  def stripHtml(docs: DataFrame): DataFrame = {
    val noBlocks = htmlBlockPatterns.foldLeft(col("text")) {
      (c, p) => regexp_replace(c, p, " ")
    }
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    val cleaned = trim(regexp_replace(decoded, "\\s+", " "))
    docs.select(col("doc_id"), cleaned.as("text"),
      (!(col("text") <=> cleaned)).as("changed"))
  }

  /** Content-addressed corpus identity: one row
    * (n_docs, n_distinct_fp, version) where `version` is the mod-2^63
    * folded sum of 32-bit fingerprint hashes over the DISTINCT normalized-text
    * fingerprints — an order-free, partition-order-free, mergeable
    * digest of the corpus CONTENT SET. Two corpora get the same version
    * iff their distinct-fingerprint sets collide (sum collisions over
    * 32-bit summands are possible but need engineered inputs — this is a
    * change DETECTOR for cache invalidation and provenance stamps, not a
    * cryptographic commitment, and n_docs/n_distinct_fp ride along as
    * cheap secondary checks). Duplicate and reordered docs do not move
    * the version; any added, removed, or edited text does. (`version`
    * sums DISTINCT hash VALUES - a 32-bit collision between two distinct
    * fingerprints collapses one summand; same definition in both
    * engines, and n_distinct_fp still moves.)
    *
    * Scale: ONE scan, one aggregation (the distinct count and the
    * distinct sum share its partial agg). The sum accumulates in
    * DECIMAL(38,0) — exact past 10^28 distinct fingerprints — and the
    * stamp is the sum FOLDED mod 2^63 explicitly on BOTH engines (a raw
    * BIGINT sum of 2^32-sized summands crosses signed-64 at ~4×10^9
    * distinct fps, a plausible 100 TB corpus, and Spark/DuckDB disagree
    * on what happens next: wrap vs HUGEINT promotion — exactly when the
    * digest is being trusted). Below the fold the value is unchanged. */
  def corpusVersion(docs: DataFrame): DataFrame =
    docs.select(coalesce(
        graft.functions.TextFunctions.fingerprint(col("text")), lit("null:")).as("fp"))
      .select(col("fp"), graft.functions.TextFunctions.hash32(col("fp")).as("h"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct_fp"),
        coalesce(
          pmod(sum_distinct(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0))),
            lit(new java.math.BigDecimal("9223372036854775808"))).cast("long"),
          lit(0L)).as("version"))

  /** Term-frequency drift between two corpora: the top-k terms whose
    * relative frequency moved most between corpus A and corpus B — the
    * "what actually changed between crawls / sources" diagnosis behind a
    * divergence number. The per-term statistic is the parts-per-billion
    * frequency difference |ppb_a − ppb_b| with ppb = (c·10⁹) div N
    * computed through an exact DECIMAL intermediate: deterministic
    * integer arithmetic (no doubles, both engines quantize identically)
    * and BOUNDED at every corpus size — the cross-multiplied form
    * |c_a·N_b − c_b·N_a| is exact but silently crosses signed-64 once a
    * side passes ~10^10 tokens (top-term c ~5×10^8 × N ~10^10 ≈ 2^62),
    * far below the target scale; c·10⁹ instead lives in DECIMAL(30,0)
    * for any BIGINT c and the div result is ≤ 10⁹. Resolution is 1 ppb —
    * terms whose frequencies differ by < 10⁻⁹ tie (and rank by term
    * ascending, so the cut stays a total order). Terms absent from one
    * side count 0 there — vocabulary drift surfaces alongside frequency
    * drift. An empty side contributes frequency 0 for every term.
    *
    * Scale: one scan + one partial-agged count per corpus, a term-keyed
    * full-outer join of the two VOCAB tables (model-sized, never the
    * corpora), broadcast scalar totals, heap top-k. */
  def termDrift(a: DataFrame, b: DataFrame, k: Int = 50): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def counts(df: DataFrame) = df
      .select(explode(tokensFused(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // persisted: each vocab table feeds BOTH the join and its scalar
    // total — without the cache each consumer re-runs the corpus scan
    // (the sourceOverlap lesson)
    val ca = Dedup.track(counts(a).select(col("w"), col("c").as("c_a")).persist())
    val cb = Dedup.track(counts(b).select(col("w"), col("c").as("c_b")).persist())
    val joined = ca.join(cb, Seq("w"), "full_outer")
      .select(col("w"), coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .crossJoin(broadcast(ca.agg(coalesce(sum(col("c_a")), lit(0L)).as("n_a"))))
      .crossJoin(broadcast(cb.agg(coalesce(sum(col("c_b")), lit(0L)).as("n_b"))))
    // ppb through DECIMAL(19,0)·10⁹ → DECIMAL(30,0), integral-divided
    // back to BIGINT; the zero-N guard keeps ANSI div-by-zero out
    def ppb(c: String, n: String): Column =
      when(col(n) === 0, lit(0L)).otherwise(
        expr(s"(CAST($c AS DECIMAL(19,0)) * 1000000000) div $n"))
    Ranks.topN(
      joined.select(col("w"), col("c_a"), col("c_b"),
        abs(ppb("c_a", "n_a") - ppb("c_b", "n_b")).as("shift_ppb")),
      Seq(col("shift_ppb").desc, col("w").asc), k)
  }

  /** Collocation mining: top-k token bigrams ranked by a PMI-monotone
    * association score — pairs that co-occur far more than their parts'
    * frequencies predict ("new york", "machine learning"), the phrase
    * inventory a tokenizer or quality audit wants. The score is the
    * engine-parity integer surrogate c(ab)·10⁹ div (c(a)·c(b)):
    * corpus-constant factors (N) drop out of the RANKING, and exact
    * integer arithmetic (DECIMAL/HUGEINT intermediates — overflow-free
    * for any BIGINT counts) keeps both engines bit-identical where a
    * log-based PMI would diverge (ln is not correctly rounded — the
    * Classify/LmScore rule). Counts cover bigram-eligible docs (≥ 2
    * tokens), occurrences not distinct-per-doc. Ties rank by bigram
    * string ascending.
    *
    * Scale: one scan builds both count tables (the bigram frame is
    * persisted before its explode — Generate re-inlines higher-order
    * chains); the score join keys on the VOCAB tables, not the corpus;
    * top-k plans as TakeOrderedAndProject heaps. */
  def collocations(docs: DataFrame, k: Int = 50): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val t = Dedup.track(docs
      .select(col("doc_id"), tokensFused(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .persist())
    val bg = Dedup.track(t.select(wordShingles(col("toks"), 2).as("gs")).persist())
    val c2 = bg.select(explode(col("gs")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c_ab"))
    val c1 = t.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val scored = c2
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .withColumn("w2", split(col("g"), " ").getItem(1))
      .join(c1.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(c1.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .select(col("g"), col("c_ab"),
        // DECIMAL intermediates: c_ab·10⁹ lives in DECIMAL(30,0) and
        // c_a·c_b in DECIMAL(38,0) (max BIGINT² ≈ 8.5×10³⁷ < 10³⁸), so
        // the surrogate is exact at any corpus size — the raw BIGINT
        // form overflows silently at c_ab > ~9.2×10⁹ (stop-word bigrams
        // at 10¹³ tokens) and flips the ranking; div returns BIGINT
        expr("(CAST(c_ab AS DECIMAL(19,0)) * 1000000000)" +
          " div (CAST(c_a AS DECIMAL(19,0)) * c_b)").as("score_micro"))
    Ranks.topN(scored, Seq(col("score_micro").desc, col("g").asc), k)
  }

  /** Vocabulary coverage / OOV accounting: per doc, how many token
    * occurrences a fixed vocabulary covers — the "will this tokenizer
    * vocab handle this corpus" check run before committing to a vocab
    * (high OOV mass = retrain the vocab or expect degenerate byte
    * fallbacks). `vocab` is any frame with a `term` column (typically
    * `vocabulary(...)` output — train on one slice, measure everywhere).
    *
    * Scale: the corpus explodes to (doc_id, term) rows once and the
    * vocab side is model-sized → broadcast hash join, then one partial-
    * agged doc_id aggregation. Zero-token docs survive via explode_outer
    * (n_tokens 0, not a missing row). */
  def vocabCoverage(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val v = vocab.select(col("term")).distinct().withColumn("__in", lit(1))
    docs
      .select(col("doc_id"),
        explode_outer(tokensFused(col("text"))).as("term"))
      .join(broadcast(v), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("term")).as("n_tokens"),
        coalesce(sum(col("__in")), lit(0)).cast("long").as("n_in_vocab"))
      .select(col("doc_id"), col("n_tokens"), col("n_in_vocab"),
        (col("n_tokens") - col("n_in_vocab")).as("n_oov"))
  }

  /** Deterministic BPE merge training (Sennrich et al., ACL'16 — the
    * byte-pair-encoding subword learner every modern tokenizer descends
    * from), distributed the way the algorithm wants to be: ONE corpus
    * scan builds the word-frequency table (partial-agged, vocab-sized),
    * which is collected ONCE and the whole merge loop runs in driver
    * memory with incremental pair-count maintenance (BpeTrainer,
    * SentencePiece-style) — the cluster work is k-INDEPENDENT, so a
    * production vocab (32k merges) costs the same single corpus scan as
    * k=8 instead of 2 sequential Spark jobs per merge round. Returns one
    * row per learned merge: (rank, pair, merged, cnt), rank in learning
    * order. `maxWordTypes` > 0 caps the collected table to the most
    * frequent word types (ties by word ascending — deterministic), the
    * standard trainer pre-prune for open-vocab web corpora; the DEFAULT
    * is capped at 1,000,000 word types (a web corpus's word-type count
    * is unbounded — hundreds of millions at 100 TB — and an uncapped
    * default would make the driver collect the scale hazard), so the
    * uncapped collect is an EXPLICIT opt-in: pass 0 only when the
    * vocabulary is known bounded (BpeSpec pins the default).
    *
    * Determinism: ties in the pair-count argmax break by pair string
    * ascending (byte order — engine-portable over [a-z0-9 ] symbols), so
    * the merge sequence is reproducible across runs, engines, and
    * cluster sizes.
    *
    * Word-internal merges only (no end-of-word marker — an engine op,
    * not a drop-in tokenizer). Sequences are space-delimited symbol
    * strings padded with one leading/trailing space; a merge applies
    * `replace(" l r " -> " lr ")` THREE times. Plain left-to-right
    * non-overlapping string replace has a fencepost: consecutive
    * occurrences share the delimiter space, so one pass merges at least
    * every other occurrence and each extra pass halves the remainder —
    * three passes cover same-pair chains up to ~8 symbols, far beyond
    * any real word. The oracle applies the IDENTICAL three passes, so
    * cross-engine equality holds exactly even where a chain is longer
    * (both engines leave the same residue — parity by construction, not
    * by convergence).
    *
    * At 100 TB: the corpus contributes one tokenize scan (the ONLY
    * cluster job); the merge loop holds O(distinct words + pairs) on the
    * driver — the table every production BPE trainer holds — bounded by
    * `maxWordTypes` when the vocabulary itself is unbounded. */
  def bpeMerges(docs: DataFrame, k: Int = 8,
      maxWordTypes: Int = TextAnalysis.DefaultMaxWordTypes): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val wfDf = docs
      .select(explode(tokensFused(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("f"))
    // the cap plans as TakeOrderedAndProject — the collect itself is
    // bounded, not just the loop's working set
    val capped =
      if (maxWordTypes > 0) wfDf.orderBy(col("f").desc, col("w").asc).limit(maxWordTypes)
      else wfDf
    val wf = capped.collect().map(r => (r.getString(0), r.getLong(1)))
    BpeTrainer.train(wf, k).toDF("rank", "pair", "merged", "cnt")
  }

  /** Apply a learned BPE merge list (the output of [[bpeMerges]]) to the
    * corpus — the ENCODE half of the tokenizer story: training produced
    * the merge sequence, this segments every document with it. Each
    * word's character sequence folds through the merges in rank order
    * using the IDENTICAL three-pass `replace(" l r " -> " lr ")` the
    * trainer applied per round, so a word encodes exactly as it would
    * have evolved during training (parity by construction — same residue
    * on pathological same-pair chains, see bpeMerges).
    *
    * Output one row per doc: `encoded` (subwords space-joined within a
    * word, words joined by " | "), `n_words`, `n_subwords`.
    *
    * Scale: the merge table is embedded ONCE in a native expression
    * (plans.BpeEncodeDoc) — the plan is one map-side projection with one
    * opaque call, k-INDEPENDENT in size, inside whole-stage codegen. The
    * previous form folded k merges into a k·3-deep literal replace chain,
    * which blows analysis/codegen past ~1k merges; now 32k merges costs
    * the same one-node plan as 8 (ClassifySpec pins the plan shape at
    * k=256). This is the right distribution for a tokenizer: the model
    * is tiny and static, the corpus is 100 TB. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs
      .select(col("doc_id"),
        graft.plans.BpeExpressions.bpeEncodeCol(
          coalesce(col("text"), lit("")), merges).as("r"))
      .select(col("doc_id"), col("r").getField("encoded").as("encoded"),
        col("r").getField("n_words").as("n_words"),
        col("r").getField("n_subwords").as("n_subwords"))

  /** PII detectors (the standard pre-training scrub list: emails, credit
    * cards, SSNs, phone numbers, IPv4s), each with its redaction
    * placeholder. The regexes stay inside the Java-regex ∩ RE2 common
    * subset (no lookaround, no backreferences; `\b` is the ASCII word
    * boundary and `\d` is [0-9] in both engines), so the DuckDB oracle
    * runs the IDENTICAL pattern strings and must agree match-for-match.
    *
    * Order is part of the contract: redaction applies top to bottom
    * (email first — its local part may contain digit runs a later pattern
    * would bite into; card before phone so a 4-4-4-4 digit run becomes one
    * <CC> rather than a phone-shaped fragment; the SSN 3-2-4 and phone
    * 3-3-4 group shapes are mutually exclusive by construction).
    *
    * The card pattern demands ONE separator style per number (all-hyphen
    * or all-space, via alternation): with the lax `[- ]` class a card
    * following an SSN matched across the boundary ("…-1120 4111-1111-1111"
    * as a "card"), mangling both — found by PiiSpec's idempotence check.
    * Mixed-separator true cards don't match; both engines agree, which is
    * the property the oracle certifies. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    // (?i): addresses are case-insensitive and "John.Doe@Example.COM" is
    // the common real-world form — a lowercase-only pattern let every
    // mixed-case email through the scrub; no placeholder contains an '@',
    // so idempotence survives the flag
    ("email", "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("cc", "\\b\\d{4}(-\\d{4}){3}\\b|\\b\\d{4}( \\d{4}){3}\\b", "<CC>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** PII scan + redaction — the privacy scrub every public-web training
    * corpus runs before anything else sees the text. Emits per-type match
    * counts (measured on the ORIGINAL text, each pattern independently)
    * and the redacted text (patterns applied in [[piiPatterns]] order;
    * every match replaced by its typed placeholder).
    *
    * Idempotent by construction: no placeholder contains a digit, an '@',
    * or a lowercase run a pattern could re-match, so
    * redact(redact(x)) == redact(x) (PiiSpec asserts it).
    *
    * Scale: pure projection — five regex passes per row, whole-stage
    * codegen'd, no shuffle; at 100 TB this runs at scan speed exactly like
    * the quality/language gates it sits beside. */
  def redactPii(docs: DataFrame): DataFrame = {
    val txt = coalesce(col("text"), lit(""))
    val counts = piiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(txt, lit(pat), lit(0))).cast("long").as(s"n_$name")
    }
    val redacted = piiPatterns.foldLeft(txt) { case (s, (_, pat, rep)) =>
      regexp_replace(s, pat, rep)
    }
    docs.select((col("doc_id") +: counts :+ redacted.as("redacted")): _*)
  }

  /** Fixed-size token-window chunking with overlap — the context-window
    * splitter every RAG / long-document training pipeline runs: chunk i
    * covers tokens [i·step, i·step + chunkTokens) with
    * step = chunkTokens − overlap, so consecutive chunks share `overlap`
    * tokens and every token lands in ≥ 1 chunk. Output one row per
    * (doc_id, chunk_id) with the rebuilt chunk text and its token count
    * (the tail chunk may be shorter). Chunking STOPS once a chunk reaches
    * the document end — the last chunk id is ceil((n − chunkTokens)/step)
    * (0 for docs that fit one chunk), NOT floor((n−1)/step): the latter
    * emits a final chunk strictly contained in its predecessor whenever
    * the predecessor already covers the tail (duplicated training rows).
    * Zero-token docs produce no chunks (the shingle <k rule; also the
    * `sequence(0, n-1)` n=0 descending trap — see ROUND_NOTES).
    * Deterministic and map-side: tokenize + bounded explode, no shuffle —
    * scan speed at any corpus size. */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 32, overlap: Int = 8): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    docs
      .select(col("doc_id"), tokensFused(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          greatest(lit(0),
            ceil((size(col("toks")) - chunkTokens).cast("double") / step)
              .cast("int")))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("chunk_id") * step + 1, lit(chunkTokens)).as("ctoks"))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", col("ctoks")).as("text"),
        size(col("ctoks")).cast("long").as("n_tokens"))
  }

  /** Corpus-frequency line-level boilerplate removal — the line-dedup pass
    * web-scale pipelines (CCNet §4.1, RefinedWeb/Gopher line filters) run
    * to kill nav bars, cookie banners and footers: a line occurring in
    * more than `maxDocFreq` DISTINCT documents is boilerplate and is
    * stripped from EVERY document; surviving lines keep their order.
    * Emits (doc_id, text, n_lines, n_stripped); a doc whose every line is
    * boilerplate survives with empty text (loud accounting, not a silent
    * row loss). Frequency counts the line byte-exactly (split on '\n') —
    * normalization, if wanted, belongs in a projection before the call.
    *
    * Scale: explode to (line, idx) rows, ONE line-keyed aggregation with
    * map-side partials counts distinct docs, the hot-line table (tiny —
    * only lines crossing a corpus-wide threshold) broadcast-joins back as
    * a FLAG, and one doc_id-keyed aggregation rebuilds text and both
    * counts together — every doc has ≥ 1 line, so no join back to the
    * corpus for totals (an earlier draft's corpus⋈corpus doc_id join,
    * visible in its plan, is gone). Two high-cardinality shuffles, no
    * per-doc state, no corpus self-join.
    * Inherently batch/corpus-level: hotness is a global property, and a
    * line may cross the threshold only after earlier docs already
    * shipped — there is deliberately no incremental streaming twin. */
  def stripBoilerplate(docs: DataFrame, maxDocFreq: Int = 5): DataFrame = {
    val withLs = docs.select(col("doc_id"),
      split(coalesce(col("text"), lit("")), "\n").as("ls"))
    val bound = Dedup.track(withLs.persist()) // Generate re-inline hazard
    val lines = bound.select(col("doc_id"),
      posexplode(col("ls")).as(Seq("idx", "line")))
    val hot = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > maxDocFreq)
      .select(col("line"), lit(true).as("__hot"))
    // no broadcast() hint: hot is tiny for any sane threshold and AQE
    // broadcasts it, but a pathological corpus (everything boilerplate)
    // must be allowed to fall back to a shuffle join instead of OOMing
    lines.join(hot, Seq("line"), "left")
      .groupBy(col("doc_id"))
      .agg(
        concat_ws("\n",
          transform(
            filter(
              array_sort(collect_list(struct(col("idx"), col("line"), col("__hot")))),
              s => s.getField("__hot").isNull),
            s => s.getField("line"))).as("text"),
        count(lit(1)).as("n_lines"),
        count(col("__hot")).as("n_stripped"))
      .select(col("doc_id"), col("text"), col("n_lines"), col("n_stripped"))
  }

  /** Bigram-LM fluency scoring — the CCNet/KenLM perplexity gate
    * re-expressed with engine-parity arithmetic: train add-one-smoothed
    * bigram counts on `reference`, score every doc by its mean smoothed
    * bigram probability. The canonical form averages log-probs
    * (perplexity), but `ln` is not IEEE-correctly-rounded (same surrogate
    * rule as [[Classify]]), so each bigram occurrence scores the quantized
    * probability
    *   p_micro(w1 w2) = (c2(w1 w2) + 1) · 10^6 div (c1(w1) + V)
    * — exact BIGINT ops throughout (c1 = occurrences of w1 as a bigram
    * left context in the reference, V = reference vocabulary size; unseen
    * contexts fall back to 10^6 div V). Per doc: n_bigrams, sum_micro
    * (exact BIGINT — immune to double summation order) and lm_micro_avg =
    * sum/n as ONE correctly-rounded double division (NULL for docs with
    * < 2 tokens — they have no bigram evidence either way). Fluent /
    * in-domain docs score high, garbled docs low — the same decision
    * family as perplexity bucketing, bit-reproducible cross-engine;
    * thresholding or tertile bucketing composes downstream (e.g.
    * [[Sampling.sampleFixed]] over (lm_micro_avg, doc_id)). An EMPTY
    * reference has no probability space (V = 0) and fails loud under
    * ANSI division rather than silently scoring everything 0
    * (TextOpsSpec pins this).
    *
    * Scale: the model is the reference's bigram count table (vocab-
    * bounded, tiny next to a 100 TB corpus); c1 is derived FROM that
    * table (sum by left word), never from a second corpus pass. The
    * corpus explode_outer's to bigram occurrences (zero-bigram docs keep
    * one NULL row, so every doc reaches the final aggregation WITHOUT a
    * corpus⋈corpus join-back for the missing rows) and takes two keyed
    * joins against the count tables (AQE broadcasts them at any real
    * corpus/model ratio), then ONE doc_id-keyed aggregation with
    * map-side partials — the corpus's only shuffle. The corpus never
    * self-joins and is never re-scanned. */
  def lmScore(docs: DataFrame, reference: DataFrame): DataFrame =
    scoreLm(docs, trainLm(reference))

  /** The trained bigram model behind [[lmScore]]: the bigram count table,
    * the left-context totals derived from it, and the 1-row vocabulary
    * size. All three are vocab-bounded (tiny next to any corpus) and
    * STATIC once trained — train once, score any number of frames or
    * micro-batches against the same model (the streaming-twin contract:
    * per-doc scoring against fixed tables is batching-independent). */
  /** @param tokMode which tokenizer produced the training tokens
    *   (graft.functions.TokMode: "latin" / "cjk" / "unknown") — recorded
    *   so mode-aware callers (Curate/CurateStream) can REFUSE a mismatch
    *   in EITHER direction instead of silently scoring every bigram at
    *   the +1-smoothing floor and wiping the corpus as lm_fluency. The
    *   round-10 form recorded only that a binding EXISTED
    *   (`boundToks: Boolean`), which a latin-bound reference — the very
    *   thing Curate emits in both modes since round 10 — also satisfied;
    *   the mode tag (written by TokMode.bind, read by trainLm) closes
    *   that silent-mismatch class. An untagged manual binding records
    *   "unknown" and is refused by the mode-checked gates. */
  final case class LmModel(c2: DataFrame, c1: DataFrame, vrow: DataFrame,
      tokMode: String = graft.functions.TokMode.Latin)

  /** Train [[LmModel]] from a reference corpus — one bigram scan plus a
    * count-table fold and a vocabulary count (see [[lmScore]]). REUSES a
    * caller-bound `toks` column (the withToks contract): a cjk-mode
    * caller trains the model on the SAME tokenization its corpus is
    * scored with — a model trained latin and served CJK shares no vocab
    * and the gate degenerates to the +1-smoothing floor. Bind the
    * reference via `TokMode.bind(ref, cjk = ...)` so the model records
    * WHICH tokenizer trained it (an unbound reference is tokenized
    * latin here and records "latin"; an untagged manual binding records
    * "unknown" and the mode-checked gates refuse it). */
  def trainLm(reference: DataFrame): LmModel = {
    val toksOf = boundToksCol(reference)
    val refBound = Dedup.track(reference
      .select(col("doc_id"), toksOf.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), wordShingles(col("toks"), 2).as("gs"))
      .persist()) // Generate re-inline hazard (see file scaladoc)
    val c2 = refBound.select(explode(col("gs")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val c1 = c2.select(substring_index(col("g"), " ", 1).as("w1"), col("c2"))
      .groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vrow = reference
      .select(col("doc_id"), toksOf.as("toks"))
      .select(explode(col("toks")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    LmModel(c2, c1, vrow, graft.functions.TokMode.of(reference))
  }

  /** Score a corpus against a trained [[LmModel]] (see [[lmScore]] for
    * semantics and the scale shape). REUSES a caller-bound `toks` column,
    * so the Curate cjk mode scores CJK-bigram streams against a cjk-
    * trained model instead of silently scoring the latin tokens only
    * (pure-CJK docs had zero bigrams and passed by the NULL-average
    * default — the gate was inert for the very script the mode curates). */
  def scoreLm(docs: DataFrame, model: LmModel): DataFrame = {
    // explode_outer: zero-bigram docs keep one NULL-g row, so every doc
    // reaches the final aggregation without a corpus⋈corpus join-back
    val docBound = Dedup.track(docs
      .select(col("doc_id"), boundToksCol(docs).as("toks"))
      .select(col("doc_id"), wordShingles(col("toks"), 2).as("gs"))
      .persist()) // Generate re-inline hazard
    docBound.select(col("doc_id"), explode_outer(col("gs")).as("g"))
      .join(model.c2, Seq("g"), "left")
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(model.c1, Seq("w1"), "left")
      .crossJoin(broadcast(model.vrow))
      .withColumn("p_micro", when(col("g").isNotNull,
        expr("(coalesce(c2, 0L) + 1L) * 1000000L div (coalesce(c1, 0L) + v)")))
      .groupBy(col("doc_id"))
      .agg(count(col("g")).as("n_bigrams"),
        coalesce(sum(col("p_micro")), lit(0L)).as("sum_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_micro"),
        when(col("n_bigrams") > 0,
          col("sum_micro").cast("double") / col("n_bigrams").cast("double"))
          .as("lm_micro_avg"))
  }

  /** One-row corpus data-quality profile — the `DESCRIBE corpus` surface
    * a pipeline operator checks before and after every gate: doc and
    * empty-text counts, exact distinct-fingerprint count (dup mass =
    * input − distinct), total token volume, per-language doc counts, and
    * the corpus quality mass as an exact BIGINT micro-sum
    * (floor(quality·10^6 + 0.5) per doc, the repo's pinned rounding —
    * a double mean would be summation-order-dependent and break the
    * cross-engine hash; mean = sum/10^6/input, derived by the caller).
    *
    * Scale: per-doc columns are map-side; the single global aggregation
    * partial-combines, and the one distinct (fingerprints) expands to
    * the standard two-exchange plan keyed by the fingerprint — one scan,
    * no joins, no corpus self-join. */
  def profile(docs: DataFrame): DataFrame = profiled(docs, Nil)

  /** [[profile]] per group (e.g. per source or per shard): one report row
    * per distinct value of `group` — the per-source health dashboard a
    * multi-source mix needs (a source whose distinct_fp/input collapses
    * or whose quality mass drops flags itself). Same single-scan shape;
    * the group key rides the same partial-agged aggregation, so cost is
    * identical to the global profile. Note distinct_fp is per-GROUP
    * distinct — two sources sharing a doc each count it once. */
  def profileBy(docs: DataFrame, group: String): DataFrame =
    profiled(docs, Seq(group))

  private def profiled(docs: DataFrame, group: Seq[String]): DataFrame = {
    val perDoc = Dedup.track(docs
      .select((Seq(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
        (col("text").isNull || col("text") === "").as("is_empty")) ++
        group.map(col)): _*)
      .withColumn("fp", coalesce(
        graft.functions.TextFunctions.fingerprint(col("text")), lit("null:")))
      .withColumn("toks", tokens(col("text")))
      .persist())
    val quality = qualityScore(perDoc).select(col("doc_id"),
      floor(col("quality") * lit(1e6) + lit(0.5)).cast("long").as("q_micro"))
    val lang = langId(perDoc).select(col("doc_id"), col("pred_lang"))
    val langCounts = Seq("de", "en", "es", "fr", "zh", "und").map(l =>
      count(when(col("pred_lang") === l, lit(1))).as(s"lang_$l"))
    val cols: Seq[Column] =
      count(lit(1)).as("input") +:
        count(when(col("is_empty"), lit(1))).as("empty_text") +:
        countDistinct(col("fp")).as("distinct_fp") +:
        coalesce(sum(size(col("toks"))), lit(0L)).cast("long").as("total_tokens") +:
        coalesce(sum(col("q_micro")), lit(0L)).as("sum_quality_micro") +:
        langCounts
    val joined = perDoc
      .join(quality, Seq("doc_id"), "left")
      .join(lang, Seq("doc_id"), "left")
    if (group.isEmpty) joined.agg(cols.head, cols.tail: _*)
    else joined.groupBy(group.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** CCNet-style head/middle/tail fluency buckets over [[scoreLm]]
    * output: per-doc integer fluency floor (sum_micro div n_bigrams —
    * stays in the exact-BIGINT family, domain ≤ 10^6+1), exact corpus
    * tertile thresholds via [[Sampling.boundedIntQuantiles]], and the
    * label — bottom third `tail`, middle third `middle`, top `head`
    * (high mean bigram probability = fluent/in-domain, the head CCNet
    * keeps). Docs with no bigram evidence label `none` (they never had a
    * score; they also never count toward N). The threshold rule is
    * boundary-inclusive on the lower side, so ties at a tertile boundary
    * all land in the lower bucket — deterministic, no rank jitter.
    *
    * Scale: scored is read twice (histogram + labeling) — persisted via
    * the cache registry so that costs one materialization; thresholds are
    * a broadcast 1-row frame; labeling is map-side. No corpus shuffle
    * beyond scoreLm's own doc_id agg. */
  def lmBuckets(scored: DataFrame): DataFrame = {
    val base = Dedup.track(scored.withColumn("lm_floor",
      when(col("n_bigrams") > 0, expr("sum_micro div n_bigrams"))).persist())
    val thr = Sampling.boundedIntQuantiles(base, col("lm_floor"), Seq((1, 3), (2, 3)))
    labelBuckets(base.crossJoin(broadcast(thr.select(col("t0"), col("t1")))),
      col("t0"), col("t1"))
  }

  /** [[lmBuckets]] with FROZEN thresholds — the streaming-compatible
    * form: exact tertiles are a corpus-level property (a doc's label can
    * change as later docs shift the distribution), so a continuous
    * pipeline freezes thresholds from a batch profile
    * ([[Sampling.boundedIntQuantiles]] over a reference corpus) and
    * labels per-doc map-side — batching-independent, no global state,
    * identical to [[lmBuckets]] whenever the thresholds came from the
    * same corpus (TextOpsSpec pins the equivalence). */
  def lmBucketsFrozen(scored: DataFrame, t0: Long, t1: Long): DataFrame =
    labelBuckets(scored.withColumn("lm_floor",
      when(col("n_bigrams") > 0, expr("sum_micro div n_bigrams"))),
      lit(t0), lit(t1))

  /** Heuristic-quality tertile buckets — lmBuckets' sibling over the
    * cheap quality score: per-doc integer quality micros (the profile
    * quantization), exact corpus tertiles via the bounded-domain
    * histogram (domain ≤ 10⁶+1 — data-size-free), head/middle/tail
    * labels with the boundary-inclusive-low rule. Docs with no tokens
    * have no quality score and label `none`. The curriculum/mixing
    * input when no reference LM exists to score fluency against. */
  def qualityBuckets(docs: DataFrame): DataFrame = {
    val base = Dedup.track(docs.select(col("doc_id"))
      .join(qualityScore(docs).select(col("doc_id"),
        floor(col("quality") * lit(1e6) + lit(0.5)).cast("long").as("q_micro")),
        Seq("doc_id"), "left")
      .persist())
    val thr = Sampling.boundedIntQuantiles(base, col("q_micro"), Seq((1, 3), (2, 3)))
    base.crossJoin(broadcast(thr.select(col("t0"), col("t1"))))
      .select(col("doc_id"), col("q_micro"),
        when(col("q_micro").isNull, lit("none"))
          .when(col("q_micro") <= col("t0"), lit("tail"))
          .when(col("q_micro") <= col("t1"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
  }

  private def labelBuckets(withFloor: DataFrame, t0: Column, t1: Column): DataFrame =
    withFloor.select(col("doc_id"), col("lm_floor"),
      when(col("lm_floor").isNull, lit("none"))
        .when(col("lm_floor") <= t0, lit("tail"))
        .when(col("lm_floor") <= t1, lit("middle"))
        .otherwise(lit("head")).as("bucket"))

  /** The Gopher/MassiveText rule-set quality filter (Rae et al. 2021
    * §A.1.1) as per-doc boolean flags plus the composite `keep` verdict —
    * the explainable rule-based sibling of the learned `Classify` gate
    * (every drop is attributable to a named rule, which is what a curation
    * audit needs).
    *
    * Rules, each as a DIVISION-FREE integer comparison (the repo's
    * engine-parity invariant — cross-engine double division never enters a
    * threshold compare):
    *   r_wordcount  minWords <= #words <= maxWords
    *   r_meanlen    3 <= mean word length <= 10   (3n <= sumlen <= 10n)
    *   r_symbol     symbol-to-word ratio <= 0.1   ('#', '...', '…')
    *   r_bullets    <= 90% of lines start with a bullet ('- ', '* ', '• ')
    *   r_ellipsis   <= 30% of lines end with an ellipsis
    *   r_alpha      >= 80% of words contain an alphabetic character
    *   r_stops      >= 2 distinct required stopwords present
    *
    * Words split on whitespace runs (case preserved — r_alpha needs it;
    * r_stops lowercases per word), lines on '\n' with blank lines dropped.
    * Pure map-side: one projection chain, no shuffle — at 100 TB this runs
    * at scan speed next to `qualityScore`/`repetitionScore`. Arrays are
    * bound in their own projection before any lambda references them
    * (re-evaluation cliff — see file scaladoc). */
  def gopherRules(
      docs: DataFrame,
      minWords: Int = 50,
      maxWords: Int = 100000,
      requiredStops: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with")): DataFrame = {
    val raw = docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("s"))
    val bound = raw.select(col("doc_id"), col("s"),
      filter(split(col("s"), "[ \\t\\r\\n]+"), w => w =!= "").as("words"),
      filter(transform(split(col("s"), "\n"), l => trim(l)), l => l =!= "").as("lines"))
    val nWords = size(col("words")).cast("long")
    val sumChars = aggregate(col("words"), lit(0L), (a, w) => a + length(w).cast("long"))
    val nAlpha = size(filter(col("words"), w => w.rlike("[A-Za-z]"))).cast("long")
    val stopArr = array(requiredStops.map(lit): _*)
    val stopHits = size(array_intersect(
      array_distinct(transform(col("words"), w => lower(w))), stopArr)).cast("long")
    val nLines = size(col("lines")).cast("long")
    val bullets = Seq("- ", "* ", "• ")
    val nBullet = size(filter(col("lines"),
      l => l.substr(lit(1), lit(2)).isin(bullets: _*))).cast("long")
    val nEllLine = size(filter(col("lines"), l =>
      (length(l) >= 3 && l.substr(length(l) - 2, lit(3)) === "...") ||
        (length(l) >= 1 && l.substr(length(l), lit(1)) === "…"))).cast("long")
    def occurrences(of: String): Column =
      ((length(col("s")) - length(replace(col("s"), lit(of), lit("")))) / lit(of.length))
        .cast("long")
    val nSymbols = occurrences("#") + occurrences("...") + occurrences("…")
    val m = bound.select(col("doc_id"),
      nWords.as("n_words"), sumChars.as("sum_chars"), nAlpha.as("n_alpha"),
      stopHits.as("stop_hits"), nLines.as("n_lines"), nBullet.as("n_bullet"),
      nEllLine.as("n_ell_line"), nSymbols.as("n_symbols"))
    val rules = Seq(
      "r_wordcount" -> (col("n_words") >= minWords && col("n_words") <= maxWords),
      "r_meanlen" -> (lit(3L) * col("n_words") <= col("sum_chars") &&
        col("sum_chars") <= lit(10L) * col("n_words")),
      "r_symbol" -> (lit(10L) * col("n_symbols") <= col("n_words")),
      "r_bullets" -> (lit(10L) * col("n_bullet") <= lit(9L) * col("n_lines")),
      "r_ellipsis" -> (lit(10L) * col("n_ell_line") <= lit(3L) * col("n_lines")),
      "r_alpha" -> (lit(5L) * col("n_alpha") >= lit(4L) * col("n_words")),
      "r_stops" -> (col("stop_hits") >= 2L))
    m.select(
      (Seq(col("doc_id"), col("n_words"), col("n_lines")) ++
        rules.map { case (n, c) => c.as(n) } :+
        rules.map(_._2).reduce(_ && _).as("keep")): _*)
  }
}
