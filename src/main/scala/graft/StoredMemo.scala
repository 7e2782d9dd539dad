package graft

/** Overflow guard for the stored-index in-JVM memos (docs/SCALE.md,
  * round-10 section): each map should only ever hold a handful of
  * (dir, lever) keys, so a flooded map means some caller is keying on
  * one-shot frames — the class of bug behind the r9 e19 cold-sweep
  * regression (store builders training THROUGH a plan-keyed memo). On
  * overflow this warns loudly and clears: dropping the map's strong
  * references lets ContextCleaner free the checkpointed blocks once
  * GC'd (the same mechanism that freed the old per-call checkpoints),
  * at the cost of a rebuild on next use — bounded memory beats a
  * silent monotonic leak in a long-lived session.
  */
private[graft] object StoredMemo {
  def guard(cache: java.util.concurrent.ConcurrentHashMap[_, _],
            name: String, bound: Int = 16): Unit =
    if (cache.size > bound) {
      System.err.println(
        s"[graft] stored-index memo '$name' exceeded $bound entries — " +
          "clearing it; a flood here means some caller keys the memo on " +
          "one-shot frames (use the *Fresh bypass for store builds)")
      cache.clear()
    }
}
