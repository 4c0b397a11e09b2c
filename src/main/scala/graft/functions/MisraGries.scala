package graft.functions

/** Misra–Gries frequent-items summary over Long keys — the ONE
  * implementation behind both heavy-hitter paths (the batch
  * per-partition prefilter in `Relational.heavyHitters` and the
  * streaming per-shard state in `EventsStream.MGSummaryProcessor`),
  * so the candidate-superset guarantee is pinned once, by property
  * test, for both.
  *
  * Invariant (the reason both callers are allowed to recount only
  * candidates): after folding a stream of n keys into a summary with
  * `cap` counters, every key with true frequency > n / cap is present
  * in the summary. Each decrement-all step removes one occurrence of
  * cap + 1 DISTINCT keys at once, so a key can lose at most
  * n / (cap + 1) < n / cap of its count — a > n/cap key cannot reach
  * zero. Folding is one pass with O(cap) state; resuming from a
  * previous summary IS processing the unbroken concatenated stream,
  * which is what lets the streaming processor persist counters across
  * micro-batches.
  */
object MisraGries {
  /** Fold `keys` into `counters` (mutated/replaced; pass the previous
    * summary to continue a stream), keeping at most `cap` counters. */
  def fold(counters: scala.collection.mutable.LongMap[Long],
      keys: IterableOnce[Long], cap: Int)
      : scala.collection.mutable.LongMap[Long] = {
    var cur = counters
    keys.iterator.foreach { k =>
      cur.get(k) match {
        case Some(c) => cur(k) = c + 1
        case None if cur.size < cap => cur(k) = 1L
        case None => // decrement-all; zeroed counters drop out
          val keep = scala.collection.mutable.LongMap.empty[Long]
          cur.foreachEntry((kk, cc) => if (cc > 1L) keep(kk) = cc - 1L)
          cur = keep
      }
    }
    cur
  }
}
