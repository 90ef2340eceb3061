package graft.search

import scala.collection.mutable

/** Sloppy-phrase frequency — an array-backed from-scratch re-implementation
  * of the published SloppyPhraseScorer algorithm (Lucene 5.4
  * `SloppyPhraseScorer.java`, reached from the reference's BM25 via the
  * slop factor at `BM25.java:110-114`): enumerate match events by
  * repeatedly popping the minimal phase-adjusted position from a queue,
  * shrinking the current window while later slots tie the minimum, and
  * scoring `1/(matchLength+1)` whenever the window `end - min` fits the
  * slop. Slots repeating the same term are pinned to DISTINCT document
  * occurrences (repeat groups start on the term's 1st, 2nd, … occurrence;
  * collisions advance the lesser cursor) — the alignment detail the
  * earlier per-slot-nearest approximation missed for 3+-term phrases with
  * repeats (the two are provably identical for 2-term phrases; see
  * PhraseSpec's cross-check battery).
  *
  * Slots here are single terms (the engine has no multi-term synonym
  * positions), so the published algorithm's `hasMultiTermRpts` branches
  * are unreachable and intentionally omitted.
  */
object SloppyPhrase {

  /** One slot's position cursor. `position` is phase-adjusted
    * (docPos − slot offset); `tpPos` the raw document position; `ord` the
    * slot index (final ordering tie-break, making the heap order total).
    */
  private final class PP(val arr: Array[Int], val offset: Int, val ord: Int) {
    var i: Int = 0
    var rptGroup: Int = -1
    def position: Int = arr(i) - offset
    def tpPos: Int = arr(i)
    def next(): Boolean = { i += 1; i < arr.length }
    def lessThan(o: PP): Boolean =
      if (position == o.position)
        if (offset == o.offset) ord < o.ord else offset < o.offset
      else position < o.position
  }

  /** Phrase frequency for one (doc, phrase). `terms(s)` / `posBySlot(s)` /
    * `offs(s)` are slot s's term, its ascending in-doc positions
    * (non-empty — the caller only reaches here when every slot matched),
    * and its phrase offset (counting stopped-word gaps). Returns 0 when no
    * window fits within `slop`.
    */
  def freq(terms: Array[String], posBySlot: Array[Array[Int]],
           offs: Array[Int], slop: Int): Float = {
    val n = terms.length
    if (n == 0) return 0.0f
    // a one-slot "phrase" degenerates to the bare term (Lucene rewrites it
    // to a TermQuery): every occurrence is a zero-width match
    if (n == 1) return posBySlot(0).length.toFloat

    val pps = Array.tabulate(n)(s => new PP(posBySlot(s), offs(s), s))
    // repeat groups = terms occupying 2+ slots, members offset-ascending
    val groups: Array[Array[PP]] = terms.zip(pps).groupBy(_._1).values
      .map(_.map(_._2).sortBy(_.offset)).filter(_.length > 1).toArray
    groups.zipWithIndex.foreach { case (g, gi) => g.foreach(_.rptGroup = gi) }
    val hasRpts = groups.nonEmpty

    // repeat-group init: the j-th same-term cursor starts on the term's
    // j-th document occurrence (j advances from the first position)
    for (g <- groups; j <- 1 until g.length; _ <- 0 until j)
      if (!g(j).next()) return 0.0f // occurrences exhausted: no match

    // min-position heap (total order: position, then offset, then ord)
    val pq = mutable.PriorityQueue.empty[PP](
      Ordering.fromLessThan[PP]((a, b) => b.lessThan(a)))
    var end = Int.MinValue
    pps.foreach { p => if (p.position > end) end = p.position; pq.enqueue(p) }

    def advancePP(p: PP): Boolean =
      p.next() && { if (p.position > end) end = p.position; true }

    def collide(p: PP): PP = {
      val g = groups(p.rptGroup)
      var i = 0
      while (i < g.length) {
        val p2 = g(i)
        if ((p2 ne p) && p2.tpPos == p.tpPos) return p2
        i += 1
      }
      null
    }

    def lesserOf(a: PP, b: PP): PP =
      if (a.position < b.position ||
          (a.position == b.position && a.offset < b.offset)) a else b

    // resolve same-occurrence collisions among a repeat group by advancing
    // the lesser cursor until none collide; cursors advanced while sitting
    // IN the heap invalidate its order, so rebuild it (the array-backed
    // analog of the published bitset re-queue — same resulting heap)
    def advanceRpts(p0: PP): Boolean = {
      if (p0.rptGroup < 0) return true
      var p = p0
      var othersMoved = false
      var c = collide(p)
      while (c != null) {
        p = lesserOf(p, c)
        if (!advancePP(p)) return false
        if (p ne p0) othersMoved = true
        c = collide(p)
      }
      if (othersMoved) {
        val drained = pq.dequeueAll
        drained.foreach(pq.enqueue(_))
      }
      true
    }

    var freqAcc = 0.0f
    var pp = pq.dequeue()
    var matchLength = end - pp.position
    var next = pq.head.position
    var exhausted = false
    while (!exhausted && advancePP(pp)) {
      if (hasRpts && !advanceRpts(pp)) exhausted = true // cursors done
      else if (pp.position > next) { // done minimizing the current window
        if (matchLength <= slop) freqAcc += 1.0f / (matchLength + 1)
        pq.enqueue(pp)
        pp = pq.dequeue()
        next = pq.head.position
        matchLength = end - pp.position
      } else {
        val m2 = end - pp.position
        if (m2 < matchLength) matchLength = m2
      }
    }
    if (matchLength <= slop) freqAcc += 1.0f / (matchLength + 1)
    freqAcc
  }
}
