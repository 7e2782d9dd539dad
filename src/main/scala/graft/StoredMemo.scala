package graft

import org.apache.spark.sql.SparkSession

/** Shared machinery for the stored-index in-JVM memos (docs/SCALE.md,
  * round-10 section): each build/serve family materializes its index
  * artifact once per (session, dir, result-changing levers) and serves
  * queries from the stored table — the single-JVM analogue of a
  * deployment persisting an index per corpus snapshot.
  *
  * Three concerns live here so every memo site inherits them:
  *
  *  1. '''Cold bypass''' ([[DisableConf]]): with
  *     `spark.graft.storedMemo.disable=true` every [[stored]] call runs
  *     its build thunk fresh — the bench's `--cold` mode, which prices
  *     build+serve per query instead of the warm serve-only path, so the
  *     stored-index discipline's build cost is MEASURED each round, not
  *     inferred (round-10 verdict item 1).
  *  2. '''Session-scoped keys''' ([[dirKey]]): memo values (DataFrames
  *     from `localCheckpoint`, catalog table names) are bound to the
  *     SparkSession that built them; a dir-only key would serve a frame
  *     from a stopped context to a restarted session in the same JVM.
  *     The applicationId rides in the key so a new context rebuilds.
  *  3. '''Bounded memory''' ([[guard]]): a flooded map means some caller
  *     keys the memo on one-shot frames — the class of bug behind the r9
  *     e19 cold-sweep regression (store builders training THROUGH a
  *     plan-keyed memo; they must use the *Fresh bypasses). The guard
  *     warns loudly and evicts only the OVERFLOW (arbitrary victims, not
  *     the whole map), so hot serving keys usually survive a flood
  *     instead of all being rebuilt mid-sweep. The check-then-evict is
  *     deliberately non-atomic — the bound is a memory safety valve, not
  *     an invariant; dropping the strong references lets ContextCleaner
  *     free the checkpointed blocks once GC'd.
  */
private[graft] object StoredMemo {
  /** When `true`, [[stored]] bypasses every memo and builds fresh per
    * call — the measured-cold-bench switch. */
  val DisableConf = "spark.graft.storedMemo.disable"

  /** Partition count for stored in-JVM artifacts that downstream
    * queries fan out over (r13 optimization round). A small artifact's
    * build plan usually ends in an AQE-coalesced exchange — often ONE
    * post-shuffle partition at fixture scale — and `localCheckpoint`
    * FREEZES that layout, so every probe that multiplies rows against
    * the artifact (d33's postings self-join, bucket joins) inherits a
    * single-task stage and runs one-core no matter the cluster
    * (measured: the d33 dots stage was 15.6 s single-partition vs ~2 s
    * spread; guide §2.4/§6 — the artifact boundary is a WRITE, size its
    * layout like one). Scale-adaptive: defaults to the context's
    * defaultParallelism (total cores), overridable per deployment via
    * `spark.graft.store.partitions` (CONFIG.md). */
  val StorePartsConf = "spark.graft.store.partitions"

  def storeParts(s: SparkSession): Int =
    s.conf.getOption(StorePartsConf).map { v =>
      val n = try v.trim.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$StorePartsConf must be a positive integer, got '$v'")
      }
      require(n > 0, s"$StorePartsConf must be a positive integer, got '$v'")
      n
    }.getOrElse(s.sparkContext.defaultParallelism)

  def disabled(s: SparkSession): Boolean =
    s.conf.getOption(DisableConf).exists(_.trim.equalsIgnoreCase("true"))

  /** Session-scoped memo key for a fixture dir: a restarted or second
    * SparkSession in the same JVM must not be served frames (or catalog
    * table names) bound to another context. */
  def dirKey(s: SparkSession, dir: String): String =
    s"${s.sparkContext.applicationId}|$dir"

  /** Collision-proof identifier tag for a dir, safe inside table names
    * and paths: the sanitized path keeps names readable, the MD5 prefix
    * disambiguates dirs that sanitize identically (`a/b` vs `a_b`) —
    * unlike `math.abs(dir.hashCode)`, which is still negative at
    * Int.MinValue and silently aliases two dirs on a 32-bit collision
    * (the second dir's table overwrites the first's and the stale memo
    * then serves wrong data). */
  def dirTag(dir: String): String = {
    val sane = dir.replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_+|_+$", "").takeRight(40)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = md5.take(4).map(b => f"$b%02x").mkString
    s"${sane}_$hex"
  }

  /** Memoize-or-bypass: the one entry point every stored-index family
    * routes through. Store builders (persisted-parquet trainers) must
    * NOT call this — their store is their memo; see pqCodebookFresh. */
  def stored[K, V](s: SparkSession,
                   cache: java.util.concurrent.ConcurrentHashMap[K, V],
                   name: String, key: K, bound: Int = 16)(build: => V): V =
    if (disabled(s)) build
    else {
      val v = cache.computeIfAbsent(key, _ => build)
      // guard AFTER the insert so the cache steady-states at the bound,
      // not bound+1; the just-inserted key is a live-session key, so the
      // victim preference below never picks it while foreign keys exist
      guard(cache, name, bound,
        liveApp = Some(s.sparkContext.applicationId))
      v
    }

  /** Evict down to the bound. Victim preference makes the "hot keys
    * survive a flood" property actually hold instead of relying on
    * hash-iteration luck: keys NOT belonging to the live session
    * (dead-context leftovers and one-shot flood keys that embed another
    * applicationId) go first; only if the overflow is entirely
    * live-session keys does eviction fall back to arbitrary victims (at
    * that point nothing distinguishes hot from flood, and the safety
    * valve still bounds memory). Every memo key carries the session
    * identity in a recognized position: plain [[dirKey]] strings lead
    * with `appId|`, and the composite tuple keys (codebook/lever memos)
    * lead with either the bare applicationId or a dirKey — so tuple
    * keys get the same live-session protection as string keys (the
    * round-11 advisory gap). */
  def guard(cache: java.util.concurrent.ConcurrentHashMap[_, _],
            name: String, bound: Int = 16,
            liveApp: Option[String] = None): Unit =
    if (cache.size > bound) {
      System.err.println(
        s"[graft] stored-index memo '$name' exceeded $bound entries — " +
          "evicting overflow; a flood here means some caller keys the memo " +
          "on one-shot frames (use the *Fresh bypass for store builds)")
      def evictWhere(victim: Any => Boolean): Unit = {
        val it = cache.keySet().iterator()
        while (cache.size > bound && it.hasNext) {
          val k = it.next()
          if (victim(k)) it.remove()
        }
      }
      liveApp.foreach { app =>
        def foreignTag(s: String): Boolean =
          s != app && !s.startsWith(app + "|")
        evictWhere {
          case s: String => foreignTag(s)
          case p: Product if p.productArity > 0 =>
            p.productElement(0) match {
              case s: String => foreignTag(s)
              case _ => false
            }
          case _ => false
        }
      }
      evictWhere(_ => true)
    }
}
