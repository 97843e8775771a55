package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shared 64-bit-fingerprint banding machinery — ONE definition of the
  * banded hamming join for every perceptual-hash consumer (the image
  * aHash in [[Images]], the audio block-energy fingerprint in [[Audio]],
  * and any future SimHash-64 caller), extracted in round 13 so the
  * modalities cannot drift apart.
  *
  * The scheme: a 64-bit fingerprint splits into `bands` equal bit
  * slices; two fingerprints within hamming distance d share at least
  * one band whenever d < bands (pigeonhole — d differing bits cannot
  * touch all `bands` slices). So a band-keyed equi-join generates ALL
  * candidate pairs for d ≤ bands − 1 with zero recall loss, and
  * [[requireLossless]] ENFORCES that bound (a silently lossy recall
  * default is the silent-wrong class this repo refuses). Candidates
  * verify by exact xor/bit_count. Shuffle cost: one exchange on small
  * (band, value) keys + one candidate distinct — never a cartesian.
  *
  * All entry points take (doc_id, <hashCol>) frames; `hashCol` is the
  * caller's fingerprint column name so the output schema matches the
  * modality's catalog/oracle contract ("ahash" for images, "afp" for
  * audio).
  */
object Fingerprints {

  /** Default geometry: 4 × 16-bit bands over a 64-bit fingerprint —
    * lossless through hamming 3, the threshold both shipped consumers
    * use. */
  val DefaultBands = 4

  /** Enforce the pigeonhole recall bound: `bands`-way banding of a
    * 64-bit fingerprint is lossless only for hamming ≤ bands − 1. */
  private[graft] def requireLossless(maxHamming: Int, bands: Int = DefaultBands): Unit = {
    require(bands > 0 && 64 % bands == 0,
      s"band count must divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming <= bands - 1,
      s"${bands}x${64 / bands}-bit banding is recall-lossless only for " +
        s"hamming <= ${bands - 1} (pigeonhole over $bands bands), got " +
        s"$maxHamming — re-band before raising it")
  }

  /** Persist + registry-track `df` ONLY if it is not already persisted
    * (a caller-persisted frame keeps its own storage level and its own
    * unpersist responsibility — re-persisting would throw Spark's
    * cannot-change-storage-level error and double-release it). */
  private def ensurePersisted(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) Dedup.track(df.persist()) else df

  /** (doc_id, <hashCol>, band, v): the band explosion every consumer —
    * batch pair join, keeper join, streaming registry probe — keys on.
    * ONE definition, or stream ≢ batch. */
  private[graft] def hashBands(hashes: DataFrame, hashCol: String,
      bands: Int = DefaultBands): DataFrame = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    hashes.select(col("doc_id"), col(hashCol),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col(hashCol), b * width)
            .bitwiseAND(lit(mask)).as("v"))): _*)).as("bk"))
      .select(col("doc_id"), col(hashCol),
        col("bk.band").as("band"), col("bk.v").as("v"))
  }

  /** Near-duplicate pairs by banded hamming join: candidates share a
    * band; survivors verify exact hamming ≤ `maxHamming` (lossless —
    * see [[requireLossless]]). Output (doc_a < doc_b, hamming), the
    * Dedup.minhashPairs shape. NOTE: output is inherently quadratic in
    * duplicate-group size — when the decision (not the pairs) is the
    * product, use [[nearDupKeepers]]. */
  def nearDupPairs(hashes: DataFrame, hashCol: String, maxHamming: Int,
      bands: Int = DefaultBands): DataFrame = {
    requireLossless(maxHamming, bands)
    // the self-join evaluates its input on BOTH sides: an unpersisted
    // (decode-heavy) hash frame would run the whole codec pass twice —
    // persist + registry-track unless the caller already persisted
    // (callers release via Dedup.releaseSince / Curate.releaseCaches)
    val banded = hashBands(ensurePersisted(hashes), hashCol, bands)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col(s"a.$hashCol").as("ha"), col(s"b.$hashCol").as("hb"))
      .distinct()
    cand.select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Keeper selection WITHOUT pair emission — the 100 TB form of
    * fingerprint near-dup removal. Collapses EXACT-hash duplicates
    * first (one hash-keyed partial agg → min doc_id per DISTINCT hash),
    * runs the banded join among distinct hashes only, and takes
    * m(H) = min over H's ≤-maxHamming neighborhood (self included) of
    * each neighbor hash's min doc_id. keep(d) ⟺ doc_id == m(hash(d)):
    * exactly the docs that survive [[nearDupPairs]]' drop-doc_b rule
    * (d drops iff some d' < d sits within maxHamming — if d is not its
    * neighborhood's min, that min is such a d'; if it is, none exists).
    * Output one row per input doc: (doc_id, <hashCol>, keep). */
  def nearDupKeepers(hashes: DataFrame, hashCol: String, maxHamming: Int,
      bands: Int = DefaultBands): DataFrame = {
    requireLossless(maxHamming, bands)
    // two consumers (the hash collapse and the final keep join) — same
    // double-decode hazard as nearDupPairs' self-join
    val h = ensurePersisted(hashes)
    val byHash = h.groupBy(col(hashCol)).agg(min(col("doc_id")).as("min_doc"))
    val banded = hashBands(
      byHash.select(col("min_doc").as("doc_id"), col(hashCol)), hashCol, bands)
    val nb = banded.select(col(hashCol).as("ha"), col("band"), col("v"))
    val ob = banded.select(col(hashCol).as("hb"), col("doc_id").as("db"),
      col("band"), col("v"))
    val neigh = nb.join(ob, Seq("band", "v"))
      .select(col("ha"), col("hb"), col("db")).distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxHamming)
      .groupBy(col("ha")).agg(min(col("db")).as("m"))
    h.join(neigh, h(hashCol) === neigh("ha"))
      .select(col("doc_id"), col(hashCol), (col("doc_id") === col("m")).as("keep"))
  }

  /** Cross-frame hamming pairs: `news` docs within `maxHamming` of any
    * `olds` doc — the streaming registry probe ((old_doc, doc_id,
    * hamming); same banding, same losslessness bound). Both inputs are
    * (doc_id, <hashCol>) frames. */
  /** EVAL-SET DECONTAMINATION over 64-bit fingerprints — the media twin
    * of the text arm's t_decontaminate family: keep(doc) ⟺ no eval-set
    * fingerprint lies within `maxHamming` of the doc's. The probe is
    * the recall-lossless banded join ([[hammingPairsAcross]] — the
    * pigeonhole bound applies, so a contaminated doc is NEVER missed),
    * keyed on bands: the corpus never pairs with itself, only with the
    * (typically tiny, broadcastable) eval side. Output one row per
    * corpus doc: (doc_id, <hashCol>, keep). */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, hashCol: String,
      maxHamming: Int): DataFrame = {
    requireLossless(maxHamming)
    val contaminated = hammingPairsAcross(corpus, evalSet, hashCol, maxHamming)
      .select(col("doc_id")).distinct().withColumn("__c", lit(1))
    corpus.join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col(hashCol), col("__c").isNull.as("keep"))
  }

  private[graft] def hammingPairsAcross(news: DataFrame, olds: DataFrame,
      hashCol: String, maxHamming: Int, bands: Int = DefaultBands): DataFrame = {
    requireLossless(maxHamming, bands)
    val nb = hashBands(news, hashCol, bands)
    val ob = hashBands(olds, hashCol, bands).select(col("doc_id").as("old_doc"),
      col(hashCol).as("old_hash"), col("band"), col("v"))
    nb.join(ob, Seq("band", "v"))
      .select(col("old_doc"), col("doc_id"), col("old_hash"), col(hashCol))
      .distinct()
      .select(col("old_doc"), col("doc_id"),
        bit_count(col("old_hash").bitwiseXOR(col(hashCol))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
