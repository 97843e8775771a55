package graft.operators

import scala.collection.mutable

/** Driver-memory BPE merge loop (SentencePiece-style): the cluster's ONE
  * job is the corpus scan that builds the word-frequency table; every merge
  * round then runs over that vocab-sized table in driver memory with
  * incremental pair-count maintenance — k-INDEPENDENT cluster work. The
  * previous formulation ran one argmax-collect + one materializing count
  * per round (2 Spark jobs/merge): fine at k=8, a pure driver-orchestration
  * bottleneck at a production vocab (32k merges ≈ 64k sequential jobs even
  * though each job was vocab-sized).
  *
  * Semantics are EXACTLY the distributed loop's (and the DuckDB oracle's
  * recomposed CTE chain): per round, adjacent symbol pairs are counted over
  * every word's current space-padded sequence weighted by word frequency
  * (overlapping same-pair chains count every adjacency), the argmax pair
  * wins with ties broken by pair string ascending, and the merge applies
  * the three-pass non-overlapping `replace(" l r " -> " lr ")` (three
  * passes cover same-pair chains to ~8 symbols; longer chains leave the
  * SAME residue on every engine — parity by construction, and the residual
  * pair stays in the count table exactly as a from-scratch recount would
  * keep it). Incremental maintenance recomputes each touched word's pair
  * multiset before/after the merge and applies exact deltas, so counts
  * equal a from-scratch recount every round (BpeSpec asserts this against
  * a naive reference trainer).
  *
  * Memory: O(distinct words + distinct pairs) on the driver — the same
  * table SentencePiece/HF trainers hold; ~10M word types ≈ a few hundred
  * MB. For open-vocab web corpora cap the table with `maxWordTypes` at the
  * scan (frequency-ranked, deterministic ties), the standard trainer
  * pre-prune.
  *
  * Argmax uses a lazy-invalidation max-heap keyed (count desc, pair asc):
  * stale entries are dropped when popped (their live count moved — a
  * fresher entry was pushed with the update), so each round costs
  * O(touched-words · word-len + log-heap), not a full table scan. */
object BpeTrainer {

  /** " a b c " space-padded code-point sequence of a word — the identical
    * seeding used by the encode kernel (plans.BpeCodec.seed) and both
    * engines' `split(w, '')`. */
  private def seed(w: String): String = {
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

  /** Adjacent symbol pairs of a padded sequence, one entry per adjacency
    * (overlaps included) — the zip_with(slice, slice) count the
    * distributed form used. */
  private def pairsOf(seq: String): Array[String] = {
    val t = seq.trim
    if (t.isEmpty) return Array.empty[String]
    val syms = t.split(" ")
    if (syms.length < 2) return Array.empty[String]
    val out = new Array[String](syms.length - 1)
    var i = 0
    while (i < syms.length - 1) {
      out(i) = syms(i) + " " + syms(i + 1)
      i += 1
    }
    out
  }

  /** Run up to `k` merge rounds over a collected word-frequency table.
    * Returns (rank, pair, merged, cnt) in learning order; stops early when
    * no adjacent pair remains (every word fully merged). */
  def train(wf: Array[(String, Long)], k: Int): Seq[(Long, String, String, Long)] = {
    require(k > 0, s"k must be positive, got $k")
    val nW = wf.length
    val freqs = new Array[Long](nW)
    val seqs = new Array[String](nW)
    var i = 0
    while (i < nW) {
      freqs(i) = wf(i)._2
      seqs(i) = seed(wf(i)._1)
      i += 1
    }

    val pairCnt = mutable.HashMap.empty[String, Long]
    // word ids that (may) contain the pair — entries go stale when a word
    // mutates; the contains() check at merge time filters them
    val pairWords = mutable.HashMap.empty[String, mutable.HashSet[Int]]
    // max-heap on (count, then pair ascending) with lazy invalidation
    implicit val ord: Ordering[(Long, String)] = Ordering.fromLessThan { (a, b) =>
      if (a._1 != b._1) a._1 < b._1 else a._2 > b._2
    }
    val heap = mutable.PriorityQueue.empty[(Long, String)]

    i = 0
    while (i < nW) {
      val f = freqs(i)
      val ps = pairsOf(seqs(i))
      var j = 0
      while (j < ps.length) {
        val p = ps(j)
        pairCnt.update(p, pairCnt.getOrElse(p, 0L) + f)
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty[Int]) += i
        j += 1
      }
      i += 1
    }
    pairCnt.foreach { case (p, c) => heap.enqueue((c, p)) }

    val out = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < k && !done) {
      var best: (Long, String) = null
      while (best == null && heap.nonEmpty) {
        val top = heap.dequeue()
        if (top._1 > 0L && pairCnt.getOrElse(top._2, 0L) == top._1) best = top
      }
      if (best == null) done = true
      else {
        val (cnt, pair) = best
        val mergedSym = pair.replace(" ", "")
        out += ((r.toLong, pair, mergedSym, cnt))
        val pat = " " + pair + " "
        val rep = " " + mergedSym + " "
        val touched = mutable.HashSet.empty[String]
        val members = pairWords.get(pair).map(_.toArray).getOrElse(Array.empty[Int])
        var m = 0
        while (m < members.length) {
          val wi = members(m)
          val old = seqs(wi)
          if (old.contains(pat)) {
            var s2 = old.replace(pat, rep)
            s2 = s2.replace(pat, rep)
            s2 = s2.replace(pat, rep)
            val f = freqs(wi)
            val oldPs = pairsOf(old)
            var j = 0
            while (j < oldPs.length) {
              val p = oldPs(j)
              pairCnt.update(p, pairCnt(p) - f)
              touched += p
              j += 1
            }
            val newPs = pairsOf(s2)
            j = 0
            while (j < newPs.length) {
              val p = newPs(j)
              pairCnt.update(p, pairCnt.getOrElse(p, 0L) + f)
              pairWords.getOrElseUpdate(p, mutable.HashSet.empty[Int]) += wi
              touched += p
              j += 1
            }
            seqs(wi) = s2
          }
          m += 1
        }
        touched.foreach { p =>
          val c = pairCnt.getOrElse(p, 0L)
          if (c <= 0L) {
            pairCnt.remove(p)
            pairWords.remove(p)
          } else heap.enqueue((c, p))
        }
        r += 1
      }
    }
    out.toSeq
  }
}
