package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Embeddings, LlmText, Misc, SelfJoin}

/** The PERSISTED incremental-dedup index — the store that turns d30/e09
  * from operators into a daily pipeline with a day 2.
  *
  * d30 and e09 prove the bipartite probe shape (batch × index, never
  * corpus²) but recompute their index side in-query because the oracle
  * fixture has no store. The reference's analogous capability is its
  * accumulate-upsert store (adversStat/src/main/scala/JdbcHelper.scala:
  * 80-172 — state survives across runs and new data folds in); here the
  * index is four parquet tables, the layout a 100 TB deployment would
  * keep in its lake:
  *
  *  - `text_bands`    (band, band_key, doc_id) — the banded-LSH entries,
  *    exactly the rows d30's corpus side derives per document.
  *  - `text_shingles` (doc_id, sh) — the shingle sets Jaccard
  *    verification needs, so day-2 verification NEVER re-reads day-1
  *    text.
  *  - `cell_centroids` (cell, cvec, ncv) — the trained IVF directions,
  *    computed ONCE and frozen (the faiss convention: assignment uses
  *    the trained index; retraining is a separate, rarer event).
  *  - `cell_members`  (cell, vec_id, q, nq) — each vector's primary-cell
  *    assignment plus its quantized form for exact cosine verification.
  *  - `pq_codebook`   (m, code, cw, ncw) — the TRAINED product-quantizer
  *    codebook (per-subspace Lloyd, e12's machinery), frozen like the
  *    centroids; [[retrainPq]] is its refresh event.
  *  - `pq_codes`      (cell, vec_id, codes, nrecon) — every member's
  *    4-byte PQ encoding, the table an IVFPQ index persists: an ADC
  *    scan reads codes + codebook, never a raw vector.
  *  - `term_stats`    (term, df, widf) — the SPARSE retrieval half's
  *    frozen idf: document frequency and the integer-quantized weight
  *    `QuantIdf div df`, computed ONCE at build and reused for every
  *    later batch (the `cell_centroids` convention for lexical
  *    statistics; re-weighting is the separate [[reidf]] event).
  *  - `postings`      (doc_id, term, w) — the weighted inverted index
  *    d33 materializes in-query; persisted, a batch of queries retrieves
  *    with ZERO corpus re-tokenization.
  *  - `doc_norms`     (doc_id, nw) — exact integer self-norms Σ w², so
  *    candidate-side cosine needs no postings re-aggregation.
  *
  * Daily cost ∝ |batch| × collision width: the probe joins are the same
  * strategy-gated equi-joins as d30/e09 ([[SelfJoin]]: broadcast
  * locally, sort-merge + AQE skew split at scale), the index side
  * arrives via a parquet scan of exactly the columns needed, and
  * APPENDING survivors is an append of batch-sized partitions — the
  * corpus is never rewritten, never re-paired, never re-scanned.
  *
  * Contract: the store pins the signature scheme its entries were built
  * with — probes must run under the same `spark.graft.lsh.bandRows`
  * lever the build used (band keys would otherwise never collide), and
  * `cell_centroids` must be the SAME frozen table every batch assigns
  * against (that is what makes assignments comparable across days).
  */
object IncrementalIndex {
  val TextBands = "text_bands"
  val TextShingles = "text_shingles"
  val CellCentroids = "cell_centroids"
  val CellMembers = "cell_members"
  val TermStats = "term_stats"
  val Postings = "postings"
  val DocNorms = "doc_norms"
  val PqCodebook = "pq_codebook"
  val PqCodes = "pq_codes"
  val SqQuantizer = "sq_quantizer"
  val SqCodes = "sq_codes"
  val MediaBands = "media_bands"
  val BpeMerges = "bpe_merges"
  val BenchShingles = "bench_shingles"
  val RhPostings = "rh_postings"
  val KmvSketches = "kmv_sketches"
  val GraphEdges = "graph_edges"
  val LshBuckets = "lsh_buckets"
  val TruthTopK = "truth_topk"
  val QuantSketches = "quant_sketches"
  val DocTombstones = "doc_tombstones"
  val VecTombstones = "vec_tombstones"
  val BloomWords = "bloom_words"
  val ClusterLabels = "cluster_labels"
  val LabelRemaps = "label_remaps"

  private def p(indexDir: String, table: String): String = s"$indexDir/$table"

  /** Spread a narrow input across cores before a per-row-HEAVY
    * derivation (shingling — ~100 µs/row of string splitting and
    * hashing). Batch frames from a one-file stream source and the
    * fixture's one-file parquet scans arrive as a SINGLE partition, so
    * such a probe/build ran its map stage one-core regardless of
    * cluster size (r13 measurement: st23's bloom probe 3.7 s narrow vs
    * 2.2 s spread at sf0.1; guide §2.5 input skew — repartition
    * immediately after a narrow read). Conditional, so an
    * already-parallel input pays nothing. Applied ONLY on the text/
    * shingle paths: the vector-side derivations (quantize, phash) are
    * ~1–10 µs/row, where the measured A/B showed the batch-sized
    * exchange costs more than it parallelizes. */
  private def spread(df: DataFrame): DataFrame = graft.Tables.spreadIfNarrow(df)

  // ------------------------------------------------------- tombstones
  /** Which tombstone table filters which store table, on which id
    * columns. Row-LOCAL tables (one row belongs to one id) filter
    * exactly; the ranked artifacts (`graph_edges`, `truth_topk`) name
    * BOTH endpoint columns — an edge or truth row dies when EITHER side
    * is retracted (a serve may neither return a deleted id nor route
    * through one) — and filtering them is sound but lossy: the rebuild
    * is the completeness-restoring event (see [[vacuum]]). */
  private val tombKeys: Map[String, (String, Seq[String])] = Map(
    TextBands -> ((DocTombstones, Seq("doc_id"))),
    TextShingles -> ((DocTombstones, Seq("doc_id"))),
    Postings -> ((DocTombstones, Seq("doc_id"))),
    DocNorms -> ((DocTombstones, Seq("doc_id"))),
    RhPostings -> ((DocTombstones, Seq("doc_id"))),
    CellMembers -> ((VecTombstones, Seq("vec_id"))),
    LshBuckets -> ((VecTombstones, Seq("vec_id"))),
    PqCodes -> ((VecTombstones, Seq("vec_id"))),
    SqCodes -> ((VecTombstones, Seq("vec_id"))),
    GraphEdges -> ((VecTombstones, Seq("query_id", "neighbor_id"))),
    TruthTopK -> ((VecTombstones, Seq("query_id", "neighbor_id"))))

  private def tableExists(s: SparkSession, path: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(s.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Record upstream RETRACTIONS: the ids land append-only in the
    * index's tombstone table (`ids` is a 1-column frame of doc ids).
    * Deletion is the third lifecycle verb beside probe and append — a
    * real corpus pipeline must remove retracted documents from every
    * frozen artifact without rebuilding any of them; the tombstone
    * table is the cheap half (probes anti-join it via [[liveTable]]),
    * [[vacuum]] the physical half. */
  def writeDocTombstones(s: SparkSession, ids: DataFrame, indexDir: String,
                         mode: SaveMode = SaveMode.Append): Unit =
    ids.select(col(ids.columns.head).cast("long").as("doc_id"))
      .write.mode(mode).parquet(p(indexDir, DocTombstones))

  /** [[writeDocTombstones]]'s embedding twin (vec ids). */
  def writeVecTombstones(s: SparkSession, ids: DataFrame, indexDir: String,
                         mode: SaveMode = SaveMode.Append): Unit =
    ids.select(col(ids.columns.head).cast("long").as("vec_id"))
      .write.mode(mode).parquet(p(indexDir, VecTombstones))

  /** Batch-keyed tombstone append — st24's layout for [[VecTombstones]]
    * (the [[writeLshIndexBatch]] convention applied to retractions):
    * each micro-batch's retracted ids land in their own idempotent
    * `bid=<id>` partition, so a crash-replayed batch OVERWRITES its
    * earlier append instead of duplicating it. Exactly-once here is
    * doubly assured: the bid overwrite gives no-duplicate storage, and
    * tombstone application is a SET anti-join ([[liveTable]]) that a
    * duplicate id could not perturb anyway — the replay-safety is
    * structural at both layers. */
  def writeVecTombstonesBatch(s: SparkSession, ids: DataFrame, indexDir: String,
                              batchId: Long): Unit =
    ids.select(col(ids.columns.head).cast("long").as("vec_id"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, VecTombstones)}/bid=$batchId")

  /** A store table with its tombstone set applied PROBE-SIDE: one
    * broadcast anti-join per id column (the ranked artifacts pass both
    * endpoints). The tombstone set is retraction-sized — ≪ corpus, the
    * broadcast-dim discipline — so the filter costs one map-side
    * probe per row until [[vacuum]] makes it free. Absent tombstone
    * table (or a table with no id mapping) reads plain. */
  def liveTable(s: SparkSession, indexDir: String, table: String): DataFrame = {
    val df = s.read.parquet(p(indexDir, table))
    tombKeys.get(table) match {
      case Some((tomb, keys)) if tableExists(s, p(indexDir, tomb)) =>
        val ids = s.read.parquet(p(indexDir, tomb))
        val idCol = ids.columns.head
        keys.foldLeft(df)((d, k) =>
          d.join(broadcast(ids.select(col(idCol).as(k))), Seq(k), "left_anti"))
      case _ => df
    }
  }

  /** VACUUM — the physical half of deletion: rewrite every store table
    * that has tombstoned rows, dropping them, then clear the tombstone
    * tables (after a vacuum, [[liveTable]] ≡ the plain read). Flat
    * tables rewrite wholesale through the [[graft.etl.Sinks.compact]]
    * tmp-and-swap dance (crash-safe: the swap is the commit point, and
    * tombstones are only cleared once every rewrite landed — a re-run
    * resumes); bid-keyed tables rewrite ONLY the affected partitions
    * (the directories that actually hold a tombstoned row), each
    * through its own swap.
    *
    * Exactness contract: for row-local tables the vacuumed store is
    * row-identical to a rebuild over the survivor corpus under the
    * same frozen artifacts (stats/centroids/codebooks — TombstoneSpec
    * pins it). The ranked artifacts (`graph_edges`, `truth_topk`) are
    * only FILTERED — sound (no retracted id remains) but lossy (a
    * deleted neighbor's slot is not refilled and routing through the
    * deleted node is gone); restoring completeness is the explicit
    * rebuild event ([[writeGraphIndex]]/[[writeTruthIndex]] over the
    * survivors), never part of a vacuum. */
  def vacuum(s: SparkSession, indexDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    for ((table, (tomb, keys)) <- tombKeys
         if tableExists(s, p(indexDir, table)) &&
           tableExists(s, p(indexDir, tomb))) {
      val ids = s.read.parquet(p(indexDir, tomb))
      val idCol = ids.columns.head
      def drop(df: DataFrame): DataFrame =
        keys.foldLeft(df)((d, k) =>
          d.join(broadcast(ids.select(col(idCol).as(k))), Seq(k), "left_anti"))
      val rootStr = p(indexDir, table)
      val fs = new Path(rootStr).getFileSystem(s.sparkContext.hadoopConfiguration)
      val bidDirs = fs.listStatus(new Path(rootStr)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("bid="))
        .map(_.getPath.toString)
      if (bidDirs.isEmpty) rewriteSwap(s, rootStr, drop(s.read.parquet(rootStr)))
      else {
        // affected partitions only: a directory is rewritten iff it
        // holds at least one tombstoned row
        val hit = keys.map(k =>
            s.read.parquet(bidDirs: _*)
              .withColumn("__dir", regexp_extract(input_file_name(), "(.*/bid=-?\\d+)/", 1))
              .join(broadcast(ids.select(col(idCol).as(k))), Seq(k), "left_semi")
              .select(col("__dir")))
          .reduce(_ unionByName _)
          .distinct().collect().map(_.getString(0)) // ≤ #dirs rows
        hit.foreach(d => rewriteSwap(s, d, drop(s.read.parquet(d))))
      }
    }
    for (tomb <- Seq(DocTombstones, VecTombstones)
         if tableExists(s, p(indexDir, tomb)))
      fsOf(s, p(indexDir, tomb)).delete(
        new org.apache.hadoop.fs.Path(p(indexDir, tomb)), true)
  }

  private def fsOf(s: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Rewrite `path` to hold exactly `df`'s rows via the tmp-and-swap
    * dance ([[graft.etl.Sinks.compact]]'s crash-safety): write beside,
    * move the original aside, swap in, drop the original. `df` must
    * read FROM `path` lazily — the write materializes it before any
    * rename touches the source files. The scratch names are DOT-
    * prefixed siblings: Spark's readers skip dot-entries, so a crash
    * leftover can never poison partition discovery of a bid-keyed
    * table root (a `bid=3.vacuum-tmp` suffix-dir would). */
  private def rewriteSwap(s: SparkSession, path: String, df: DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, path)
    val target = new Path(path)
    val tmp = new Path(target.getParent, s".vacuum-tmp.${target.getName}")
    val old = new Path(target.getParent, s".vacuum-old.${target.getName}")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true) // leftover from a prior crash
    require(fs.rename(target, old), s"vacuum could not move $path aside")
    require(fs.rename(tmp, target), s"vacuum could not swap $tmp into $path")
    require(fs.delete(old, true), s"vacuum could not remove $old")
  }

  // ------------------------------------------------------------ build
  /** Write the text half of the index for `docs` (band entries +
    * shingle sets). `Append` is the day-N survivor fold; `Overwrite`
    * bootstraps day 1. One pass over the normalized text feeds both
    * tables (the shared base frame is persisted for the two derivations,
    * released before return). */
  def writeTextIndex(s: SparkSession, docs: DataFrame, indexDir: String,
                     mode: SaveMode = SaveMode.Overwrite): Unit = {
    val baseDf = LlmText.baseFrom(spread(docs)).persist()
    try {
      LlmText.bandEntriesOf(s, LlmText.sigOf(s, baseDf))
        .write.mode(mode).parquet(p(indexDir, TextBands))
      LlmText.shingleSetsOf(s, baseDf)
        .write.mode(mode).parquet(p(indexDir, TextShingles))
    } finally { baseDf.unpersist(); () }
  }

  /** FIXTURE-path bootstrap writer for the batch-keyed text index: the
    * `bid=-1` corpus partition derived from the in-JVM memoized band/
    * shingle tables ([[graft.operators.LlmText.bandsOf]]/[[graft
    * .operators.LlmText.shinglesOf]]) filtered by `pred` — row-identical
    * to [[writeTextIndexBatch]] over the same docs because both
    * derivations are per-doc pure functions (parity pinned in
    * FixtureParitySpec), but a warm process pays the parquet write,
    * not a tokenize→shingle→minhash recompute ([[writeServePair]]'s
    * discipline; cold runs rebuild through the same definitions).
    * st13/st25 bootstrap through this; the per-batch APPENDS keep the
    * explicit [[writeTextIndexBatch]] — arriving data is computed when
    * it arrives, that cost is the measured steady state. */
  def writeTextIndexFixtureBootstrap(s: SparkSession, dir: String,
                                     indexDir: String,
                                     pred: org.apache.spark.sql.Column): Unit = {
    // coalesce the write: the memo tables carry the corpus-wide spread
    // layout, which would land ~32 tiny files per bootstrap partition —
    // the small-files cost every later probe re-pays at open time
    // (guide §6); these tables are a few MB, so a handful of files is
    // the right landing size
    LlmText.bandsOf(s, dir).where(pred).coalesce(4)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, TextBands)}/bid=-1")
    LlmText.shinglesOf(s, dir).where(pred).coalesce(4)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, TextShingles)}/bid=-1")
  }

  /** IDEMPOTENT per-batch append for the streaming ingest twins: the
    * batch's index rows land in a batch-id-keyed partition directory
    * (`bid=<id>`, written with Overwrite). foreachBatch commits source
    * offsets AFTER the callback returns, so a batch replayed after a
    * crash arrives with the SAME id and overwrites its own partition
    * instead of duplicating — the Structured Streaming idempotent-sink
    * recipe that makes a parquet store exactly-once under recovery
    * (crash-resume pinned in StreamingSpec). Bootstrap rows take
    * bid = -1 so the whole store shares one partition-discovered
    * layout (flat files and bid dirs must not mix under one root). */
  def writeTextIndexBatch(s: SparkSession, docs: DataFrame, indexDir: String,
                          batchId: Long): Unit = {
    val baseDf = LlmText.baseFrom(spread(docs)).persist()
    try {
      LlmText.bandEntriesOf(s, LlmText.sigOf(s, baseDf))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"${p(indexDir, TextBands)}/bid=$batchId")
      LlmText.shingleSetsOf(s, baseDf)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"${p(indexDir, TextShingles)}/bid=$batchId")
    } finally { baseDf.unpersist(); () }
  }

  /** [[writeTextIndexBatch]]'s substring-postings twin (st19's append). */
  def writeSubstrIndexBatch(s: SparkSession, docs: DataFrame, indexDir: String,
                            batchId: Long): Unit =
    LlmText.rhPostingsFrom(s, spread(docs))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, RhPostings)}/bid=$batchId")

  // ------------------------------------------------------- compaction
  /** Compacted-segment bid encoding: the consolidation of every batch
    * partition with bid ≤ B lands in `bid = -2 - B`. Numeric, so the
    * partition column stays LongType beside live `bid=<batchId>` dirs;
    * strictly below the bootstrap's −1; and never equal to any real
    * batch id — a probe's `exceptBid(b)` (b ≥ 0, the crash-replay
    * contract) can therefore never drop compacted rows. Successive
    * compactions nest: the segment for B₂ > B₁ folds the B₁ segment in
    * (−2−B₁ passes the ≤ B₂ eligibility test like any other committed
    * partition). */
  def compactedBid(upToBid: Long): Long = -2L - upToBid

  /** COMPACT a batch-keyed store table: rewrite every committed
    * `bid=<id>` partition with id ≤ `upToBid` (bootstrap −1, batch ids,
    * and any earlier compacted segment) into ONE consolidated
    * `bid=<compactedBid(upToBid)>` segment, then delete the originals.
    * This is the small-files lifecycle event the exactly-once ingest
    * layout needs: months of 5 s micro-batches accrue one directory per
    * batch forever; compaction bounds the store at (one consolidated
    * segment) + (directories newer than the watermark), with the
    * segment's file count set by the scan's `maxPartitionBytes`
    * coalescing — data-proportional, never batch-count-proportional.
    *
    * Watermark contract: `upToBid` must be a COMMITTED batch id (its
    * offsets durably past — with a live stream, at most the last
    * completed batch minus one is always safe). Structured Streaming
    * batch ids are monotone, so no future append can land under the
    * watermark; an in-flight replayed batch b > upToBid keeps its own
    * `bid=b` directory and its `exceptBid(b)` probe semantics intact.
    *
    * Crash-safe by RESUMABILITY, not atomicity (the two-phase layout a
    * lake store without a transaction log can honor): phase 1 writes
    * the consolidated segment (its `_SUCCESS` marker is the commit
    * point); phase 2 deletes the originals. A crash between the phases
    * leaves originals beside a committed segment — duplicated rows —
    * and the documented recovery is to RE-RUN the same compaction,
    * which sees the committed marker, skips the rewrite, and finishes
    * the deletes (pinned in IncrementalIndexSpec). Probes must not read
    * the store between a compaction crash and its re-run.
    *
    * [[graft.etl.Sinks.compact]] is the complementary OFFLINE event: a
    * whole-table rewrite-and-swap for flat (non-batch-keyed) stores,
    * which must not run beside a live stream. This form does bounded
    * work (only partitions under the watermark) and leaves every
    * newer-than-watermark directory untouched, so it can run between
    * micro-batches of a live ingest. */
  def compactBatchStore(s: SparkSession, indexDir: String, table: String,
                        upToBid: Long): Unit = {
    require(upToBid >= -1L, s"compaction watermark must be >= -1, got $upToBid")
    val eligible = compactWritePhase(s, indexDir, table, upToBid)
    if (eligible.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(p(indexDir, table))
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      eligible.foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(d), true))
    }
  }

  /** Phase 1 of [[compactBatchStore]] — consolidate, don't delete.
    * Returns the original partition directories phase 2 removes (empty
    * = nothing to compact). Package-visible so the crash-resume spec
    * can stop between the phases. */
  private[graft] def compactWritePhase(s: SparkSession, indexDir: String,
                                       table: String, upToBid: Long): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val rootStr = p(indexDir, table)
    val root = new Path(rootStr)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val bidDirs = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("bid="))
          scala.util.Try(n.stripPrefix("bid=").toLong).toOption
            .map(b => b -> st.getPath.toString)
        else None
      }
    // watermarks are monotone: an existing segment covering B' > upToBid
    // would make the new segment's label a lie about its contents
    val newer = bidDirs.collect { case (b, _) if b < -1L && (-2L - b) > upToBid => -2L - b }
    require(newer.isEmpty,
      s"compaction watermark $upToBid is below an existing compacted segment's (${newer.sorted.lastOption.getOrElse(-1L)})")
    val target = compactedBid(upToBid)
    val eligible = bidDirs.filter { case (b, _) => b != target && b <= upToBid }
    if (eligible.isEmpty) return Nil
    val targetDir = s"$rootStr/bid=$target"
    // the resume check: a committed segment (marker present) means a
    // prior compaction crashed AFTER its write — the originals are all
    // still on disk (deletes only follow the commit), so skip straight
    // to finishing their removal
    if (!fs.exists(new Path(targetDir, "_SUCCESS"))) {
      s.read.parquet(eligible.map(_._2): _*)
        .write.mode(SaveMode.Overwrite).parquet(targetDir)
    }
    eligible.map(_._2)
  }

  /** Compact the text-ingest store pair (st13's tables) at one
    * watermark. */
  def compactTextIndex(s: SparkSession, indexDir: String, upToBid: Long): Unit = {
    compactBatchStore(s, indexDir, TextBands, upToBid)
    compactBatchStore(s, indexDir, TextShingles, upToBid)
  }

  /** Compact the substring-postings store (st19's table). */
  def compactSubstrIndex(s: SparkSession, indexDir: String, upToBid: Long): Unit =
    compactBatchStore(s, indexDir, RhPostings, upToBid)

  /** Store-table read honoring the batch-keyed layout: optionally
    * EXCLUDES one batch id — a crash-replayed batch must probe the
    * store as of the last COMMITTED batch, not see its own crashed
    * append (probe-before-append under recovery). Partition pruning
    * drops the excluded directory at planning time. */
  private def storeTable(s: SparkSession, indexDir: String, table: String,
                         exceptBid: Option[Long]): DataFrame = {
    val df = s.read.parquet(p(indexDir, table))
    exceptBid match {
      case None => df
      case Some(b) =>
        require(df.columns.contains("bid"),
          s"store table '$table' is not batch-keyed; cannot exclude batch $b")
        df.where(col("bid") =!= b)
    }
  }

  /** Write the embedding half: train (or adopt) the centroid table and
    * store every vector's primary-cell assignment. `centroidTrain`
    * defaults to `vecs` — pass a wider history to train the frozen
    * index on more data than day 1's slice (the e09 oracle form trains
    * on the full fixture; a production deployment trains on the corpus
    * so far and REUSES the stored table for every later batch). */
  def writeCellIndex(s: SparkSession, vecs: DataFrame, indexDir: String,
                     centroidTrain: Option[DataFrame] = None): Unit = {
    val cents = Embeddings.centroidsOf(s,
      Embeddings.quantizedFrom(s, centroidTrain.getOrElse(vecs)))
    cents.write.mode(SaveMode.Overwrite).parquet(p(indexDir, CellCentroids))
    appendCellMembers(s, vecs, indexDir, SaveMode.Overwrite)
  }

  /** Fixture-path twin of [[writeCellIndex]] at st14's standing shape
    * (members = the `vec_id % modE != 0` ingest corpus, centroids
    * trained on the FULL fixture — e09's oracle formulation): both
    * halves derive from the in-JVM memo path ([[graft.operators
    * .Embeddings.cellRanked]] is assignRanked(v, centroidsOf(v)) over
    * the same training set, and assignment is per-row pure given the
    * centroids, so the vec_id filter of the stored table is
    * row-identical to re-assigning the subset — the
    * writeTextIndexFixtureBootstrap discipline; parity pinned in
    * FixtureParitySpec). Warm pays the parquet writes; cold rebuilds
    * through the same definitions. */
  def writeCellIndexFixture(s: SparkSession, dir: String, indexDir: String): Unit = {
    val modE = Embeddings.IncrementalBatchModE
    Embeddings.centroidsOf(s, Embeddings.quantized(s, dir))
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, CellCentroids))
    Embeddings.cellRanked(s, dir)
      .where(col("rn") === 1 && col("vec_id") % modE =!= 0)
      .select(col("cell"), col("vec_id"), col("q"), col("nq"))
      .coalesce(4)
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, CellMembers))
  }

  /** Assign `vecs` against the STORED centroids and write their member
    * rows. `Append` is the ingest fold — st14's census form appends the
    * FULL batch (e09 counts matches against every earlier arrival);
    * [[appendCellSurvivors]] is the survivors-only curation policy. */
  private[graft] def appendCellMembers(s: SparkSession, vecs: DataFrame,
                                       indexDir: String, mode: SaveMode): Unit =
    Embeddings.assignRanked(s, Embeddings.quantizedFrom(s, vecs),
        s.read.parquet(p(indexDir, CellCentroids)))
      .where(col("rn") === 1)
      .select(col("cell"), col("vec_id"), col("q"), col("nq"))
      .write.mode(mode).parquet(p(indexDir, CellMembers))

  /** The RETRAIN event the frozen-centroid contract defers to: `rounds`
    * Lloyd iterations ([[graft.operators.Embeddings.lloydStep]] — e11's
    * step) over `trainVecs` starting from the STORED centroid table,
    * then swap the frozen table and REBUILD the member table for
    * `allVecs` under the new directions. Everything downstream keeps
    * working because probes always read `cell_centroids` fresh — but
    * assignments before and after a retrain are NOT comparable, which
    * is exactly why this is a separate, explicit event and never part
    * of a daily ingest. `trainVecs` is typically a sample; `allVecs`
    * the full corpus (the rebuild is the expensive half — one
    * assignment pass, map-shaped, plus the member-table rewrite). */
  def retrain(s: SparkSession, trainVecs: DataFrame, allVecs: DataFrame,
              indexDir: String, rounds: Int = 1): Unit = {
    require(rounds >= 1, s"retrain needs at least one Lloyd round, got $rounds")
    val q = Embeddings.quantizedFrom(s, trainVecs)
    var cents = s.read.parquet(p(indexDir, CellCentroids))
    (1 to rounds).foreach { _ => cents = Embeddings.lloydStep(s, q, cents) }
    // materialize before the overwrite: the final plan still reads the
    // stored table this write replaces (#cells rows — trivially small)
    cents.localCheckpoint(true)
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, CellCentroids))
    appendCellMembers(s, allVecs, indexDir, SaveMode.Overwrite)
  }

  /** Train and freeze the PQ half beside `cell_members`: per-subspace
    * Lloyd codebook over `trainVecs`' quantized vectors (e12's
    * [[graft.operators.Embeddings.pqCodebookOf]] — seed + fixed rounds,
    * deterministic) and the 4-byte code row for every vector of
    * `allVecs` under its STORED primary-cell assignment. Requires
    * `cell_centroids` (the coarse quantizer) to exist. `trainVecs` is
    * typically a sample at scale; `allVecs` the corpus — the encode is
    * the expensive half, one broadcast-join pass over the members. */
  def writePqIndex(s: SparkSession, trainVecs: DataFrame, allVecs: DataFrame,
                   indexDir: String): Unit = {
    Embeddings.pqCodebookFresh(s, Embeddings.quantizedFrom(s, trainVecs), "q")
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, PqCodebook))
    encodePqMembers(s, allVecs, indexDir, SaveMode.Overwrite)
  }

  /** Encode `vecs` against the STORED codebook + centroids and land
    * their code rows. `Append` is the ingest fold (a new batch's codes
    * join the store); `Overwrite` the build/retrain rebuild. */
  def encodePqMembers(s: SparkSession, vecs: DataFrame, indexDir: String,
                      mode: SaveMode = SaveMode.Append): Unit = {
    val members = Embeddings.assignRanked(s, Embeddings.quantizedFrom(s, vecs),
        s.read.parquet(p(indexDir, CellCentroids)))
      .where(col("rn") === 1)
      .select(col("cell"), col("vec_id"), col("q"))
    Embeddings.pqEncode(s, members, "q", s.read.parquet(p(indexDir, PqCodebook)))
      .withColumnRenamed("neighbor_id", "vec_id")
      .write.mode(mode).parquet(p(indexDir, PqCodes))
  }

  /** Persist the SQ8 half of the index (e14/e15's quantizer): the
    * trained per-dimension [lo, hi] row over `trainVecs` (frozen like
    * the PQ codebook; a sample at scale) and the 64-byte code row for
    * every vector of `allVecs` — the column an SQ-ADC scan streams
    * instead of raw floats. One shared encode definition
    * ([[graft.operators.Embeddings.sqEncode]]) keeps the stored table
    * bit-identical to the in-query quantizer. */
  def writeSqIndex(s: SparkSession, trainVecs: DataFrame, allVecs: DataFrame,
                   indexDir: String): Unit = {
    Embeddings.sqLohiFresh(Embeddings.quantizedFrom(s, trainVecs))
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, SqQuantizer))
    encodeSqMembers(s, allVecs, indexDir, SaveMode.Overwrite)
  }

  /** Encode `vecs` against the STORED quantizer and land their code
    * rows. `Append` is the ingest fold; `Overwrite` the build/retrain
    * rebuild (codes under different [lo, hi] tables are NOT comparable
    * — retraining re-encodes wholesale, the [[retrainPq]] contract). */
  def encodeSqMembers(s: SparkSession, vecs: DataFrame, indexDir: String,
                      mode: SaveMode = SaveMode.Append): DataFrame = {
    val v = Embeddings.quantizedFrom(s, vecs).select(col("vec_id"), col("q"))
    val enc = Embeddings.sqEncode(v, s.read.parquet(p(indexDir, SqQuantizer)))
      .select(col("vec_id"), col("codes"))
    enc.write.mode(mode).parquet(p(indexDir, SqCodes))
    enc
  }

  /** The CODEBOOK-RETRAIN event the frozen-codebook contract defers to
    * (the [[retrain]] of the product quantizer): re-run the Lloyd
    * training on `trainVecs` and re-encode `allVecs` wholesale — codes
    * under different codebooks are NOT comparable, so this is a
    * separate explicit event, never part of a daily ingest. */
  def retrainPq(s: SparkSession, trainVecs: DataFrame, allVecs: DataFrame,
                indexDir: String): Unit =
    writePqIndex(s, trainVecs, allVecs, indexDir)

  /** Build the SPARSE retrieval half: freeze the term statistics
    * (df → quantized idf weight, honoring the build session's
    * `spark.graft.sparse.maxDfPermille` pruning lever — the store PINS
    * the lever value its postings were weighted with, the `bandRows`
    * contract's lexical twin) and write every document's weighted
    * postings + self-norm. One tokenize+count pass feeds all three
    * tables. Also the [[reidf]] rebuild. */
  def writeSparseIndex(s: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    val tf = LlmText.tfOf(LlmText.baseFrom(docs)).persist()
    try {
      LlmText.termStatsOf(s, LlmText.baseFrom(docs), tf)
        .write.mode(SaveMode.Overwrite).parquet(p(indexDir, TermStats))
      writePostingsAgainstStats(s, tf, indexDir, SaveMode.Overwrite)
    } finally { tf.unpersist(); () }
  }

  /** Weight `tf` under the STORED (frozen) statistics and land the
    * postings + norms — shared by the day-1 build and the day-N append. */
  private def writePostingsAgainstStats(s: SparkSession, tf: DataFrame,
                                        indexDir: String, mode: SaveMode): Unit = {
    val w = LlmText.weightedPostingsOf(tf,
      s.read.parquet(p(indexDir, TermStats))).persist()
    try {
      w.write.mode(mode).parquet(p(indexDir, Postings))
      LlmText.sparseNormsOf(w)
        .write.mode(mode).parquet(p(indexDir, DocNorms))
    } finally { w.unpersist(); () }
  }

  /** Fold a batch of NEW documents into the postings store under the
    * frozen idf — batch-sized appended partitions, the corpus never
    * re-tokenized. Terms unseen at build time carry no stored weight
    * and are DROPPED (they cannot score against any indexed posting
    * anyway); the drift this accumulates is exactly what [[reidf]]
    * resets. */
  def appendSparsePostings(s: SparkSession, newDocs: DataFrame, indexDir: String): Unit =
    writePostingsAgainstStats(s, LlmText.tfOf(LlmText.baseFrom(newDocs)),
      indexDir, SaveMode.Append)

  /** The RE-IDF event the frozen-statistics contract defers to — the
    * [[retrain]] of the lexical half. Unlike centroids, idf has a
    * closed form (no warm start to iterate from), so re-weighting IS a
    * full rebuild: recompute df over the corpus so far, swap the frozen
    * stats, rewrite postings + norms wholesale. Rankings before and
    * after are NOT comparable — a separate, explicit event, never part
    * of a daily ingest. */
  def reidf(s: SparkSession, allDocs: DataFrame, indexDir: String): Unit =
    writeSparseIndex(s, allDocs, indexDir)

  /** Write the SUBSTRING-DEDUP half of the index: the rolling-hash
    * postings table (doc_id, byte offset, window hash) — one row per
    * [[LlmText.D44Window]]-byte window, the inverted index the
    * ExactSubstr span family (d44/d45) serves from. `Append` is the
    * day-N ingest: a new batch's windows fold in without the corpus
    * ever being re-hashed; the serving df-filter recomputes over the
    * store as it stands, so spans reflect every appended batch
    * (cross-batch duplicates surface exactly like in-batch ones). */
  def writeSubstrIndex(s: SparkSession, docs: DataFrame, indexDir: String,
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    LlmText.rhPostingsFrom(s, docs)
      .write.mode(mode).parquet(p(indexDir, RhPostings))

  /** Serve d44's maximal duplicated spans from the PERSISTED postings
    * store — the deployment twin of the in-JVM memo (frame parity
    * pinned in StoredParitySpec). */
  def probeSubstrSpans(s: SparkSession, indexDir: String): DataFrame =
    LlmText.spansFromPostings(s.read.parquet(p(indexDir, RhPostings)))

  /** Write the LSH half: every vector with its quantized form and both
    * hyperplane-table bucket hashes — the table e02/e04 (and the graph
    * seeds) serve from. One hash pass at build; queries never re-hash
    * the corpus (the in-JVM [[graft.operators.Embeddings.bucketedOf]]
    * memo is this table's single-JVM analogue; parity pinned in
    * StoredParitySpec). */
  def writeLshIndex(s: SparkSession, vecs: DataFrame, indexDir: String): Unit =
    Embeddings.bucketedFrom(s, Embeddings.quantizedFrom(s, vecs))
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, LshBuckets))

  def probeLshBuckets(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(p(indexDir, LshBuckets))

  /** Batch-keyed LSH bucket append — st22's layout for [[LshBuckets]]:
    * bootstrap rows take bid = −1 ([[writeTextIndexBatch]]'s
    * convention), each micro-batch's rows land in their own idempotent
    * `bid=<id>` partition so arrivals become retrievable by every
    * later batch while replays overwrite themselves. */
  def writeLshIndexBatch(s: SparkSession, vecs: DataFrame, indexDir: String,
                         batchId: Long): Unit =
    Embeddings.bucketedFrom(s, Embeddings.quantizedFrom(s, vecs))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, LshBuckets)}/bid=$batchId")

  /** The BOOTSTRAP graph for the online-insert lifecycle: the corpus's
    * NN-Descent edges in the `bid=-1` partition of a batch-keyed
    * [[GraphEdges]] store. Insert-time expansion reads EXACTLY this
    * partition ([[probeGraphInsert]] — partition pruning drops every
    * appended batch), the freeze that makes st22's arrivals
    * split-invariant. */
  def writeGraphBootstrapBatch(s: SparkSession, vecs: DataFrame, indexDir: String,
                               rounds: Int = 1,
                               revCap: Int = Embeddings.DefaultNndRevCap): Unit = {
    val v = Embeddings.quantizedFrom(s, vecs)
    Embeddings.nnDescentOver(s, Embeddings.bucketedFrom(s, v), v, rounds, revCap)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, GraphEdges)}/bid=-1")
  }

  /** FIXTURE-path bootstrap for st22's (lsh_buckets, graph_edges)
    * ingest pair: the `bid=-1` corpus partitions derived from the
    * in-JVM memo path — the bucket rows are a vec_id filter of the
    * corpus bucket memo (per-row pure hash), the bootstrap graph is
    * its own memoized descent over the subset ([[graft.operators
    * .Embeddings.ingestGraphOf]]) — row-identical to
    * [[writeLshIndexBatch]] + [[writeGraphBootstrapBatch]] over the
    * same subset (parity pinned in FixtureParitySpec), but a warm
    * process pays the parquet writes ([[writeServePair]]'s
    * discipline); cold runs rebuild through the same definitions. */
  def writeGraphBootstrapFixture(s: SparkSession, dir: String,
                                 indexDir: String): Unit = {
    val modE = Embeddings.IncrementalBatchModE
    // coalesced like the text bootstrap: small store, few files
    Embeddings.bucketedOf(s, dir)
      .where(col("vec_id") % modE =!= 0).coalesce(4)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, LshBuckets)}/bid=-1")
    Embeddings.ingestGraphOf(s, dir).coalesce(4)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, GraphEdges)}/bid=-1")
  }

  /** Append a batch's freshly computed insert edges (the
    * [[probeGraphInsert]] output) under its idempotent bid partition. */
  def writeGraphEdgesBatch(s: SparkSession, edges: DataFrame, indexDir: String,
                           batchId: Long): Unit =
    edges.write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, GraphEdges)}/bid=$batchId")

  /** ONLINE INSERT probe — compute a batch of arriving vectors' edge
    * lists against the store as it stands ([[graft.operators.Embeddings
    * .graphInsertOver]]): seeds from the stored bucket table (corpus +
    * every earlier arrival; `exceptBid` hides a crash-replayed batch's
    * own append), expansion through the FROZEN bootstrap edges only.
    * Returns the materialized batch-sized edge frame the caller appends
    * via [[writeGraphEdgesBatch]]. */
  def probeGraphInsert(s: SparkSession, batchVecs: DataFrame, indexDir: String,
                       exceptBid: Option[Long] = None): DataFrame =
    Embeddings.graphInsertOver(s,
      Embeddings.bucketedFrom(s, Embeddings.quantizedFrom(s, batchVecs)),
      storeTable(s, indexDir, LshBuckets, exceptBid),
      s.read.parquet(s"${p(indexDir, GraphEdges)}/bid=-1"))
      .localCheckpoint(true)

  /** Write the GROUND-TRUTH table: the exhaustive top-[[graft.operators
    * .Embeddings.MmrPoolN]] cosine ranking over the deterministic query
    * sample — the most expensive artifact of an ANN eval, always
    * precomputed and stored (faiss-bench practice) so every recall
    * audit (e07) reads it instead of re-running brute force. */
  def writeTruthIndex(s: SparkSession, vecs: DataFrame, indexDir: String): Unit =
    Embeddings.bruteRankedFrom(s, Embeddings.quantizedFrom(s, vecs))
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, TruthTopK))

  def probeTruth(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(p(indexDir, TruthTopK))

  /** Write the GRAPH half: the NN-Descent kNN graph (e22's iterate —
    * Dong et al. WWW'11) run `rounds` times over the two-table LSH
    * seeds of `vecs` and PERSISTED as the top-k edge table
    * (query_id, neighbor_id, cos, rank) — the HNSW/NSG base layer a
    * deployment builds once and serves many. The iterate is the SAME
    * core the in-JVM memo path serves ([[graft.operators.Embeddings
    * .nnDescentOver]]), so stored graph ≡ memo graph for the same
    * corpus and levers (parity pinned in StoredParitySpec). A retrain
    * (more rounds, new corpus snapshot) overwrites — edges from
    * different builds are not comparable, the
    * [[writeCellIndex]]/[[retrain]] freeze discipline. */
  def writeGraphIndex(s: SparkSession, vecs: DataFrame, indexDir: String,
                      rounds: Int = 1,
                      revCap: Int = Embeddings.DefaultNndRevCap): Unit = {
    val v = Embeddings.quantizedFrom(s, vecs)
    Embeddings.nnDescentOver(s, Embeddings.bucketedFrom(s, v), v, rounds, revCap)
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, GraphEdges))
  }

  /** The persisted kNN graph, served as e22 serves its memo: the graph
    * IS the query result (top-k neighbors per vector) — a reader joins
    * it on query_id, never touching vectors. */
  def probeGraph(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(p(indexDir, GraphEdges))

  /** Write the (lsh_buckets, graph_edges) serve pair for the FIXTURE
    * corpus through the in-JVM memo path ([[graft.operators.Embeddings
    * .bucketedOf]] / [[graft.operators.Embeddings.graphOf]] at the
    * pinned build levers) — row-identical to [[writeLshIndex]] +
    * [[writeGraphIndex]] over the same corpus (the memo-vs-stored
    * parity StoredParitySpec pins), but the build is SHARED with every
    * other memo consumer in the JVM: a warm process pays the parquet
    * write, not a recompute, which is exactly how a deployment derives
    * its store from an already-materialized build artifact. Memo-
    * disabled (cold) runs recompute through the same definitions, so
    * both prices stay honest. st21/st24 use this; st22 builds over a
    * corpus SUBSET and keeps the explicit writers. */
  def writeServePair(s: SparkSession, dir: String, indexDir: String): Unit = {
    // coalesced writes: the bucket memo carries the corpus-wide spread
    // layout (~32 partitions), which would land 32 tiny files every
    // later probe re-pays at open time (guide §6)
    Embeddings.bucketedOf(s, dir).coalesce(4)
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, LshBuckets))
    Embeddings.graphOf(s, dir, 1, Embeddings.DefaultNndRevCap).coalesce(4)
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, GraphEdges))
  }

  /** e23's graph-serve beam for a BATCH of query vectors against the
    * PERSISTED (lsh_buckets, graph_edges) pair — the online-ANN-serving
    * probe (st21's per-batch form): the batch hashes its own buckets
    * ([[graft.operators.Embeddings.bucketedFrom]] — identical to the
    * build-side hash), seeds from the stored bucket table, expands one
    * hop through the stored edges, exact-rescores. No cross-batch
    * state; verdicts are a pure function of (batch, frozen store). */
  def probeGraphServe(s: SparkSession, batchVecs: DataFrame,
                      indexDir: String): DataFrame =
    Embeddings.graphServeOver(s,
      Embeddings.bucketedFrom(s, Embeddings.quantizedFrom(s, batchVecs)),
      s.read.parquet(p(indexDir, LshBuckets)),
      probeGraph(s, indexDir), hops = 1)
      .localCheckpoint(true)

  /** e24's tombstoned serve over the PERSISTED pair — [[probeGraphServe]]
    * with every stage reading through [[liveTable]]: seeds come from
    * live bucket rows only, the stored graph drops every edge touching
    * a retracted ENDPOINT (either side — a beam may neither return a
    * deleted vector nor route through one), retracted queries ask
    * nothing, and the rescore reads only live vectors. The graph stays
    * the frozen pre-deletion build; st24 folds a retraction STREAM into
    * the tombstone table and reads this probe once the stream drains —
    * tombstones are a set, so the readout is split/order invariant and
    * equals the in-JVM batch form ([[graft.operators.Embeddings
    * .e24TombstoneServe]]) by construction. The standing e-suite query
    * sample (vec_id % 5 = 0) keeps the two forms row-identical. */
  def probeGraphServeLive(s: SparkSession, indexDir: String): DataFrame = {
    val alive = liveTable(s, indexDir, LshBuckets)
    Embeddings.graphServeOver(s, alive.where(col("vec_id") % 5 === 0), alive,
      liveTable(s, indexDir, GraphEdges), hops = 1)
      .localCheckpoint(true)
  }

  /** Write the SKETCH STORE: one KMV cardinality sketch per
    * (event_type, day) over the batch's events — the rollup-cube
    * practice (Druid/Pinot sketch columns): the base table is read
    * once per ingest day, every later distinct-count question is
    * answered by MERGING the stored k-row partials. `Append` is the
    * daily ingest; day boundaries are integer nanos arithmetic so the
    * shard key is engine-independent. */
  def writeSketchIndex(s: SparkSession, events: DataFrame, indexDir: String,
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    events
      .select(col("event_type"),
        expr("ts div 86400000000000").as("day"),
        graft.functions.Portable.h64(col("user_id")).as("h"))
      .groupBy(col("event_type"), col("day"))
      .agg(graft.functions.KmvSketch.kmvValues(Misc.KmvK)(col("h")).as("sk"))
      .write.mode(mode).parquet(p(indexDir, KmvSketches))

  /** Write the QUANTILE-SKETCH STORE — the rank-statistics column of
    * the rollup cube beside [[writeSketchIndex]]'s cardinality column:
    * one m19 pair sketch per (event_type, day) over the batch's
    * events. The base table is read once per ingest day; any later
    * "p99 of value for type X (over any day range)" merges the stored
    * k-pair partials ([[probeQuantiles]]) without a rescan — the KMV
    * lattice on the hash component makes the merge split/order/append
    * invariant (parity pinned in StoredParitySpec). */
  def writeQuantileIndex(s: SparkSession, events: DataFrame, indexDir: String,
                         mode: SaveMode = SaveMode.Overwrite): Unit =
    events
      .select(col("event_type"),
        expr("ts div 86400000000000").as("day"),
        graft.functions.Portable.h64(col("event_id")).as("h"),
        col("value").as("v"))
      .groupBy(col("event_type"), col("day"))
      .agg(graft.functions.KmvSketch.kmvPairs(Misc.QsK)(col("h"), col("v")).as("sk"))
      .write.mode(mode).parquet(p(indexDir, QuantSketches))

  /** Per-type quantile readout from the PERSISTED pair-sketch partials
    * alone — k-min-by-hash union of each type's stored day sketches,
    * then m19's shared percentile_disc readout (one definition with
    * the batch/streaming forms, so the three surfaces cannot drift). */
  def probeQuantiles(s: SparkSession, indexDir: String): DataFrame = {
    import Misc.QsK
    val sk = s.read.parquet(p(indexDir, QuantSketches))
      .groupBy(col("event_type"))
      .agg(graft.functions.KmvSketch.kmvPairsMerge(QsK)(col("sk")).as("sk"))
    Misc.sketchQuantiles(s, sk, Seq("event_type"))
  }

  /** Distinct-users readout from the PERSISTED sketch partials alone —
    * the k-min union of each type's stored day sketches
    * ([[graft.functions.KmvSketch.kmvMerge]]), never re-reading events.
    * Because the KMV union is associative/commutative/idempotent, this
    * equals the one-shot sketch over all events for ANY day split and
    * ANY append history (pinned in StoredParitySpec). Readout matches
    * st18's (m, kth, est_distinct). */
  def probeSketchDistinct(s: SparkSession, indexDir: String): DataFrame = {
    import Misc.KmvK
    s.read.parquet(p(indexDir, KmvSketches))
      .groupBy(col("event_type"))
      .agg(graft.functions.KmvSketch.kmvMerge(KmvK)(col("sk")).as("sk"))
      .select(col("event_type"),
        size(col("sk")).cast("long").as("m"),
        element_at(col("sk"), size(col("sk"))).as("kth"),
        graft.functions.KmvSketch.estDistinct(KmvK)(col("sk")).as("est_distinct"))
  }

  // ------------------------------------------------------------ probe
  /** d30's verdicts against the STORED index: every batch doc with its
    * verified near-dup match count against the indexed corpus plus its
    * own earlier batch members (keep-first, d09's convention). The
    * corpus side is the two stored tables — no day-1 text is re-read,
    * no corpus signature recomputed. Returns the materialized verdict
    * frame (batch-sized). */
  def probeText(s: SparkSession, batchDocs: DataFrame, indexDir: String,
                exceptBid: Option[Long] = None): DataFrame = {
    val (out, caches) = probeTextLazy(s, batchDocs, indexDir, exceptBid)
    val materialized = out.localCheckpoint(true)
    caches.foreach(_.unpersist())
    materialized
  }

  /** The un-materialized probe plan + its caches — the form the
    * lifecycle spec inspects for input files (the public entry
    * checkpoints, which erases lineage). Callers own the unpersist.
    * `exceptBid` serves the crash-replay contract ([[storeTable]]). */
  private[graft] def probeTextLazy(s: SparkSession, batchDocs: DataFrame,
                                   indexDir: String,
                                   exceptBid: Option[Long] = None): (DataFrame, Seq[DataFrame]) = {
    val (pairs, baseB) = probeTextPairsStage(s, batchDocs, indexDir, exceptBid)
    val matches = pairs.groupBy(col("new_id")).agg(count(lit(1)).as("n_matches"))
    val out = baseB.select(col("doc_id"))
      .join(matches.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"))
      .withColumn("is_dup", col("n_matches") > 0)
    (out, Seq(baseB))
  }

  /** The VERIFIED-PAIR stage shared by [[probeTextLazy]] (which counts
    * the pairs per batch doc — d30's verdict readout) and
    * [[probeTextPairs]] (which keeps them — the EDGES st25's online
    * clustering folds into its label store). Returns the un-
    * materialized `(new_id, old_id)` frame plus the batch base cache
    * the caller must unpersist. */
  private def probeTextPairsStage(s: SparkSession, batchDocs: DataFrame,
                                  indexDir: String,
                                  exceptBid: Option[Long]): (DataFrame, DataFrame) = {
    val baseB = LlmText.baseFrom(spread(batchDocs)).persist()
    val bandsB = LlmText.bandEntriesOf(s, LlmText.sigOf(s, baseB))
    val shB = LlmText.shingleSetsOf(s, baseB)
    val probe = bandsB
      .select(col("band"), col("band_key"), col("doc_id").as("new_id"))
    // stored entries are all PRE-batch ⇒ every collision is eligible;
    // intra-batch collisions add the keep-first (old < new) half —
    // together exactly d30's (not-batch OR earlier) candidate set
    val candStored = SelfJoin.on(probe,
      storeTable(s, indexDir, TextBands, exceptBid)
        .select(col("band"), col("band_key"), col("doc_id").as("old_id")),
      Seq("band", "band_key"))
    val candIntra = SelfJoin.on(probe,
      bandsB.select(col("band"), col("band_key"), col("doc_id").as("old_id")),
      Seq("band", "band_key"))
      .where(col("old_id") < col("new_id"))
    val cand = candStored.select(col("new_id"), col("old_id"))
      .union(candIntra.select(col("new_id"), col("old_id")))
      .distinct()
    // shingle lookups: batch docs resolve from the batch pass, index
    // docs from the store — keyed joins, so the union is never scanned
    // wider than the candidate list
    // explicit projection: a batch-keyed store carries the bid
    // partition column, which must not reach the unionByName
    val shAll = storeTable(s, indexDir, TextShingles, exceptBid)
      .select(col("doc_id"), col("sh"))
      .unionByName(shB.select(col("doc_id"), col("sh")))
    val ver = SelfJoin.on(
      cand, shB.select(col("doc_id").as("new_id"), col("sh").as("sh_n")), Seq("new_id"))
    val pairs = SelfJoin.on(
      ver, shAll.select(col("doc_id").as("old_id"), col("sh").as("sh_o")), Seq("old_id"))
      .where(size(array_intersect(col("sh_n"), col("sh_o"))).cast("double") /
        size(array_union(col("sh_n"), col("sh_o"))).cast("double") >= LlmText.NeardupThreshold)
      .select(col("new_id"), col("old_id"))
    (pairs, baseB)
  }

  /** A batch's verified near-dup EDGES against the stored index (plus
    * its own earlier members) — the pair form of [[probeText]]'s
    * verdicts, materialized batch-sized. These are exactly the edges
    * the one-shot d14 clustering would derive for (batch doc, earlier
    * doc) pairs, which is what makes st25's incremental labeling
    * oracle-equal to the full recompute. */
  def probeTextPairs(s: SparkSession, batchDocs: DataFrame, indexDir: String,
                     exceptBid: Option[Long] = None): DataFrame = {
    val (pairs, baseB) = probeTextPairsStage(s, batchDocs, indexDir, exceptBid)
    val materialized = pairs.localCheckpoint(true)
    baseB.unpersist()
    materialized
  }

  // ------------------------------------------ online cluster labels
  /** ONLINE CONNECTED-COMPONENT MAINTENANCE (st25's store) — the
    * union-find-as-log design: near-dup cluster labels must stay
    * current as documents arrive, but a label is a GLOBAL property (a
    * new doc can BRIDGE two existing clusters, relabeling every member
    * of the losing one), so naive maintenance rewrites the full label
    * table per batch. Instead the store is two append-only,
    * batch-keyed tables:
    *
    *  - `cluster_labels` (doc_id, label) — one row per doc that has
    *    ever appeared in a verified near-dup edge, stamped with the
    *    component min AS OF its batch (singletons have no row — d14's
    *    exclusion, so the readout matches the one-shot oracle shape).
    *  - `label_remaps`  (src, dst) — one row per MERGE event: when a
    *    batch bridges components, the losing labels point at the new
    *    min. Rows only ever point DOWNWARD (dst < src), so the remap
    *    graph is a forest of chains toward each component's final min.
    *
    * A batch's work ([[applyClusterBatch]]) touches only batch-sized
    * frames: probe edges, resolve the matched endpoints' CURRENT
    * labels through the (merge-event-sized) remap closure, run
    * min-label propagation on the CONTRACTED graph — nodes are the
    * batch's docs plus the distinct labels they touched, never the
    * clusters' members — and append one label partition + one remap
    * partition. Member relabeling is DEFERRED to the readout
    * ([[resolveClusterLabels]]): one remap-closure build (tiny) plus
    * one broadcast join against the label log. The full corpus is
    * never re-paired and the label table never rewritten in place —
    * the rewrite is the explicit [[rebaseClusterLabels]] maintenance
    * event (the vacuum/compaction class).
    *
    * Why the readout equals the one-shot d14 for ANY ascending-id
    * split: the edge SET accumulated by bootstrap + probes is exactly
    * the one-shot candidate-verify edge set (stored bands hold every
    * earlier doc; intra-batch adds the keep-earlier half), components
    * of a fixed edge set are split-invariant, and the incremental min
    * is the true min by induction — a bridge's contracted component
    * {new ids} ∪ {touched label mins} contains the merged component's
    * global min. Pinned in StreamingSpec (any split + crash-replay ≡
    * d14) and by st25's oracle row (d14Sql verbatim). */
  def writeClusterBootstrap(s: SparkSession, corpusDocs: DataFrame,
                            indexDir: String): Unit = {
    writeTextIndexBatch(s, corpusDocs, indexDir, batchId = -1L)
    writeBootstrapLabels(s, selfTextEdges(s, indexDir), indexDir)
  }

  /** [[writeClusterBootstrap]] for the FIXTURE corpus (st25's form —
    * the [[writeServePair]] discipline): the corpus-internal edge set
    * equals the memoized d03 verified-pair store restricted to
    * corpus-side endpoints (a band collision between two corpus docs
    * does not care which other docs exist), so a warm process derives
    * the bootstrap labels from the already-materialized pair table
    * instead of re-running the candidate self-join + verify; cold runs
    * recompute through the same definitions. The band/shingle index
    * write is the honest per-corpus ingest cost either way (st13's
    * bootstrap class). */
  def writeClusterBootstrapFixture(s: SparkSession, dir: String,
                                   indexDir: String): Unit = {
    val mod = LlmText.IncrementalBatchMod
    writeTextIndexFixtureBootstrap(s, dir, indexDir,
      col("doc_id") % mod =!= 0)
    bootstrapLabelsOf(s, dir).write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, ClusterLabels)}/bid=-1")
    // an explicitly-empty remap partition so every later storeTable
    // read finds the table (merge events may only come much later)
    bootstrapLabelsOf(s, dir).limit(0)
      .select(col("doc_id").as("src"), col("label").as("dst"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, LabelRemaps)}/bid=-1")
  }

  /** In-JVM memo of the fixture bootstrap LABELS (the corpus-subset
    * min-label components over the memoized d03 edge table) — the third
    * artifact [[writeClusterBootstrapFixture]] persists, derived once
    * per (session, dir, result levers) like the pair store it rides.
    * Keyed on the same levers as the d03 memo (they change the edges)
    * plus the batch mod. Cold runs recompute through the same
    * definitions. */
  private val bootLabelsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int, Long, String), DataFrame]()

  private def bootstrapLabelsOf(s: SparkSession, dir: String): DataFrame = {
    val mod = LlmText.IncrementalBatchMod
    val key = (graft.StoredMemo.dirKey(s, dir), mod,
      s.conf.get(LlmText.BandRowsConf, "1").toInt,
      s.conf.get(LlmText.MaxBucketConf, "0").toLong,
      s.conf.get(SelfJoin.StrategyConf, "broadcast"))
    graft.StoredMemo.stored(s, bootLabelsCache, "cluster-bootstrap-labels", key) {
      val edges = LlmText.d03LshNeardup(s, dir)
        .where(col("jaccard") >= LlmText.NeardupThreshold &&
          col("doc_a") % mod =!= 0 && col("doc_b") % mod =!= 0)
        .select(col("doc_a"), col("doc_b"))
      val labels =
        if (edges.isEmpty)
          edges.limit(0).select(col("doc_a").cast("long").as("doc_id"),
            col("doc_a").cast("long").as("label"))
        else LlmText.minLabelComponents(edges, LlmText.MaxClusterRounds)
          .select(col("doc_id"), col("cluster_id").as("label"))
      labels.localCheckpoint(true)
    }
  }

  private def writeBootstrapLabels(s: SparkSession, edges: DataFrame,
                                   indexDir: String): Unit = {
    val labels =
      if (edges.isEmpty)
        edges.limit(0).select(col("new_id").cast("long").as("doc_id"),
          col("new_id").cast("long").as("label"))
      else LlmText.minLabelComponents(edges.select(col("new_id").as("doc_a"),
          col("old_id").as("doc_b")), LlmText.MaxClusterRounds)
        .select(col("doc_id"), col("cluster_id").as("label"))
    labels.write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, ClusterLabels)}/bid=-1")
    // an explicitly-empty remap partition so every later storeTable
    // read finds the table (merge events may only come much later)
    labels.limit(0).select(col("doc_id").as("src"), col("label").as("dst"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${p(indexDir, LabelRemaps)}/bid=-1")
  }

  /** Corpus-INTERNAL verified near-dup pairs, derived from the stored
    * bootstrap partition itself (one band self-join + shingle verify —
    * d03's one-join form over the store instead of the fixture). */
  private def selfTextEdges(s: SparkSession, indexDir: String): DataFrame = {
    val bands = s.read.parquet(s"${p(indexDir, TextBands)}/bid=-1")
    val sh = s.read.parquet(s"${p(indexDir, TextShingles)}/bid=-1")
    val cand = SelfJoin.on(
        bands.select(col("band"), col("band_key"), col("doc_id").as("new_id")),
        bands.select(col("band"), col("band_key"), col("doc_id").as("old_id")),
        Seq("band", "band_key"))
      .where(col("old_id") < col("new_id"))
      .select(col("new_id"), col("old_id")).distinct()
    val ver = SelfJoin.on(
      cand, sh.select(col("doc_id").as("new_id"), col("sh").as("sh_n")), Seq("new_id"))
    SelfJoin.on(
      ver, sh.select(col("doc_id").as("old_id"), col("sh").as("sh_o")), Seq("old_id"))
      .where(size(array_intersect(col("sh_n"), col("sh_o"))).cast("double") /
        size(array_union(col("sh_n"), col("sh_o"))).cast("double") >= LlmText.NeardupThreshold)
      .select(col("new_id"), col("old_id"))
      .localCheckpoint(true)
  }

  /** The remap CLOSURE as a lookup: (src → final label), following
    * merge chains across batches to each component's current min.
    * Chains only point downward, so the closure is the component-min
    * labeling of the (tiny) remap graph. Empty-remap guard: an empty
    * frame, so `resolve` joins are no-ops. */
  private def remapClosure(s: SparkSession, indexDir: String,
                           exceptBid: Option[Long]): DataFrame = {
    val rem = storeTable(s, indexDir, LabelRemaps, exceptBid)
      .select(col("src"), col("dst"))
    if (rem.isEmpty) rem.limit(0).select(col("src"), col("dst").as("final"))
    else LlmText.minLabelComponents(
        rem.select(col("src").as("doc_a"), col("dst").as("doc_b")),
        LlmText.MaxClusterRounds)
      .select(col("doc_id").as("src"), col("cluster_id").as("final"))
  }

  /** Resolve a 1-column label frame through the remap closure. */
  private def resolveThrough(labels: DataFrame, closure: DataFrame,
                             labelCol: String): DataFrame =
    labels.join(broadcast(closure.withColumnRenamed("src", labelCol)),
        Seq(labelCol), "left")
      .withColumn(labelCol, coalesce(col("final"), col(labelCol)))
      .drop("final")

  /** Fold ONE batch of arriving documents into the cluster store:
    * probe → contract → append (see [[writeClusterBootstrap]] for the
    * design). Probe-before-append with `exceptBid` throughout, so a
    * crash-replayed batch recomputes identically and its four
    * partition overwrites (bands, shingles, labels, remaps) are
    * idempotent. */
  def applyClusterBatch(s: SparkSession, batchDocs: DataFrame, indexDir: String,
                        batchId: Long): Unit = {
    val pairs = probeTextPairs(s, batchDocs, indexDir, exceptBid = Some(batchId))
    writeTextIndexBatch(s, batchDocs, indexDir, batchId)
    val labelsPath = s"${p(indexDir, ClusterLabels)}/bid=$batchId"
    val remapsPath = s"${p(indexDir, LabelRemaps)}/bid=$batchId"
    if (pairs.isEmpty) {
      // nothing matched: explicit empty partitions keep the replay
      // overwrite idempotent even across a crash that wrote them
      val emptyLab = pairs.select(col("new_id").as("doc_id"), col("new_id").as("label"))
      emptyLab.write.mode(SaveMode.Overwrite).parquet(labelsPath)
      emptyLab.select(col("doc_id").as("src"), col("label").as("dst"))
        .write.mode(SaveMode.Overwrite).parquet(remapsPath)
      return
    }
    val labStore = storeTable(s, indexDir, ClusterLabels, Some(batchId))
      .select(col("doc_id"), col("label"))
    val closure = remapClosure(s, indexDir, Some(batchId))
    // contract: each matched endpoint enters as its CURRENT resolved
    // label (batch members and previously-singleton store docs enter
    // as themselves — a store lookup miss resolves to the id)
    val contracted = resolveThrough(
      pairs.join(labStore.withColumnRenamed("doc_id", "old_id"), Seq("old_id"), "left")
        .select(col("new_id"), coalesce(col("label"), col("old_id")).as("node")),
      closure, "node")
      .select(col("new_id").as("doc_a"), col("node").as("doc_b"))
    val comps = LlmText.minLabelComponents(contracted, LlmText.MaxClusterRounds)
      .select(col("doc_id").as("node"), col("cluster_id").as("comp"))
    val batchIds = batchDocs.select(col("doc_id").cast("long").as("doc_id"))
    val batchNodes = comps.join(batchIds.withColumnRenamed("doc_id", "node"),
      Seq("node"), "left_semi")
    val oldNodes = comps.join(batchIds.withColumnRenamed("doc_id", "node"),
      Seq("node"), "left_anti")
    // label rows: every batch doc in an edge, plus store docs that had
    // never been labeled (previous singletons matched for the first
    // time — their node entered the contraction as their own id)
    val prevSingletons = oldNodes.join(
      labStore.withColumnRenamed("doc_id", "node"), Seq("node"), "left_anti")
    batchNodes.unionByName(prevSingletons)
      .select(col("node").as("doc_id"), col("comp").as("label"))
      .write.mode(SaveMode.Overwrite).parquet(labelsPath)
    // merge events: a non-batch node whose component found a smaller
    // min was a losing label — point it at the winner
    oldNodes.where(col("comp") =!= col("node"))
      .select(col("node").as("src"), col("comp").as("dst"))
      .write.mode(SaveMode.Overwrite).parquet(remapsPath)
  }

  /** The label READOUT: every labeled doc with its label resolved
    * through the accumulated merge log — st25's final answer, equal to
    * the one-shot d14 clustering over everything ingested so far. */
  def resolveClusterLabels(s: SparkSession, indexDir: String): DataFrame = {
    val closure = remapClosure(s, indexDir, None)
    resolveThrough(
      storeTable(s, indexDir, ClusterLabels, None)
        .select(col("doc_id"), col("label")),
      closure, "label")
      .select(col("doc_id"), col("label").as("cluster_id"))
      .localCheckpoint(true)
  }

  /** REBASE — the maintenance event that keeps the merge log bounded
    * on a 24/7 deployment: fold the remap closure into the label rows
    * and reset the remap table to its empty bootstrap partition.
    * Readout rows are unchanged and the closure join becomes a no-op
    * (parity pinned in IncrementalIndexSpec). Unlike
    * [[compactBatchStore]] this rewrites ROW VALUES (labels resolve),
    * so the watermark must cover EVERY label partition and the store
    * must be quiesced (between micro-batches — the
    * [[graft.etl.Sinks.compact]] class, not the between-batch-safe
    * bounded form). Same two-phase crash discipline: the resolved
    * segment's `_SUCCESS` is the commit point; a re-run after a crash
    * sees it, skips the rewrite, and finishes the deletes. */
  def rebaseClusterLabels(s: SparkSession, indexDir: String, upToBid: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val root = p(indexDir, ClusterLabels)
    val fs = fsOf(s, root)
    val dirs = fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bid="))
    val bids = dirs.map(_.getPath.getName.stripPrefix("bid=").toLong)
    require(bids.forall(b => b <= upToBid && b >= -1L || b < -1L && (-2L - b) <= upToBid),
      s"rebase watermark $upToBid must cover every label partition (found bids ${bids.sorted.mkString(",")})")
    val target = compactedBid(upToBid)
    val targetDir = s"$root/bid=$target"
    if (!fs.exists(new Path(targetDir, "_SUCCESS"))) {
      // materialized BEFORE any delete: the resolved plan reads the
      // directories phase 2 removes
      resolveClusterLabels(s, indexDir)
        .select(col("doc_id"), col("cluster_id").as("label"))
        .write.mode(SaveMode.Overwrite).parquet(targetDir)
    }
    dirs.filter(_.getPath.getName != s"bid=$target")
      .foreach(d => fs.delete(d.getPath, true))
    // the merge log is folded in: reset to the empty bootstrap
    // partition (applyClusterBatch never writes remaps at bid=-1)
    val remRoot = p(indexDir, LabelRemaps)
    for (st <- fsOf(s, remRoot).listStatus(new Path(remRoot))
         if st.isDirectory && st.getPath.getName.startsWith("bid=") &&
           st.getPath.getName != "bid=-1")
      fsOf(s, remRoot).delete(st.getPath, true)
  }

  /** e09's verdicts against the STORED index: the batch assigns to the
    * stored (frozen) centroids and compares only against that cell's
    * stored members plus its own earlier batch members. No day-1 vector
    * is re-read, no centroid retrained. */
  def probeCells(s: SparkSession, batchVecs: DataFrame, indexDir: String): DataFrame =
    probeCellsLazy(s, batchVecs, indexDir).localCheckpoint(true)

  private[graft] def probeCellsLazy(s: SparkSession, batchVecs: DataFrame,
                                    indexDir: String): DataFrame = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.ArrayOps.longDot(s, a, b)
    val asgB = Embeddings.assignRanked(s, Embeddings.quantizedFrom(s, batchVecs),
        s.read.parquet(p(indexDir, CellCentroids)))
      .where(col("rn") === 1)
      .select(col("cell"), col("vec_id"), col("q"), col("nq"))
    val probe = asgB.select(col("cell"), col("vec_id").as("new_id"),
      col("q").as("qn"), col("nq").as("nn"))
    val stored = s.read.parquet(p(indexDir, CellMembers))
      .select(col("cell"), col("vec_id").as("old_id"),
        col("q").as("qo"), col("nq").as("no"))
    val intra = asgB.select(col("cell"), col("vec_id").as("old_id"),
      col("q").as("qo"), col("nq").as("no"))
    val candStored = SelfJoin.on(probe, stored, Seq("cell"))
    val candIntra = SelfJoin.on(probe, intra, Seq("cell"))
      .where(col("old_id") < col("new_id"))
    val matches = candStored.unionByName(candIntra)
      .where(dot(col("qn"), col("qo")).cast("double") /
        (sqrt(col("nn").cast("double")) * sqrt(col("no").cast("double"))) >=
        Embeddings.CosineThreshold)
      .groupBy(col("new_id")).agg(count(lit(1)).as("n_matches"))
    asgB.select(col("cell"), col("vec_id"))
      .join(matches.withColumnRenamed("new_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("cell"), col("vec_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"))
      .withColumn("kept", col("n_matches") === 0)
  }

  /** Write the MEDIA half of the index: every row's 64-bit perceptual
    * hash with its band keys — (band, band_key, media_id, phash), mm06's
    * banding verbatim ([[graft.operators.Multimodal.phashBandKeys]]), so
    * stored entries and a recompute can never band differently. `Append`
    * is the ingest fold (st16's census form — the full batch lands, as
    * probeText/probeCells). The phash is 8 bytes/row ×
    * [[graft.operators.Multimodal.PhashBands]] band rows — the media
    * corpus itself (the binary payloads) is never re-read after its
    * hash lands. */
  def writeMediaIndex(s: SparkSession, docs: DataFrame, indexDir: String,
                      mode: SaveMode = SaveMode.Overwrite): Unit =
    graft.operators.Multimodal.phashBandKeys(
        graft.operators.Multimodal.withPhash(s, docs))
      .write.mode(mode).parquet(p(indexDir, MediaBands))

  /** mm06's near-dup verdicts for a batch against the STORED media
    * index: batch rows hash + band map-side, candidates come from the
    * bipartite band join against the store plus intra-batch keep-first
    * (old < new), the popcount verify runs on candidates only, and the
    * banding is pigeonhole-COMPLETE at the emitted radius — so verdicts
    * equal the all-pairs recompute restricted to (stored ∪ earlier
    * batch) partners. Returns the materialized batch-sized frame. */
  def probeMedia(s: SparkSession, batchDocs: DataFrame, indexDir: String): DataFrame = {
    import graft.operators.Multimodal
    val ph = Multimodal.withPhash(s, batchDocs)
    val bandsB = Multimodal.phashBandKeys(ph)
    val probe = bandsB.select(col("band"), col("band_key"),
      col("media_id").as("new_id"), col("phash").as("ph_n"))
    val stored = s.read.parquet(p(indexDir, MediaBands))
      .select(col("band"), col("band_key"),
        col("media_id").as("old_id"), col("phash").as("ph_o"))
    val intra = bandsB.select(col("band"), col("band_key"),
      col("media_id").as("old_id"), col("phash").as("ph_o"))
    val candStored = SelfJoin.on(probe, stored, Seq("band", "band_key"))
    val candIntra = SelfJoin.on(probe, intra, Seq("band", "band_key"))
      .where(col("old_id") < col("new_id"))
    val matches = candStored.unionByName(candIntra)
      .select(col("new_id"), col("old_id"), col("ph_n"), col("ph_o"))
      .distinct() // a pair may agree on several bands — count it once
      .where(bit_count(col("ph_n").bitwiseXOR(col("ph_o"))) <=
        Multimodal.PhashMaxHamming)
      .groupBy(col("new_id")).agg(count(lit(1)).as("n_matches"))
    ph.select(col("media_id"))
      .join(matches.withColumnRenamed("new_id", "media_id"), Seq("media_id"), "left")
      .select(col("media_id"), coalesce(col("n_matches"), lit(0L)).as("n_matches"))
      .withColumn("is_dup", col("n_matches") > 0)
      .localCheckpoint(true)
  }

  /** Freeze the DECONTAMINATION half: the benchmark suite's rare-shingle
    * list (d18's bench side — exploded (bench_id, shingle) rows with the
    * hot-shingle cap already applied, so boilerplate n-grams common
    * across many benchmark docs never enter the store and can never fan
    * a probe out). Built ONCE when the eval suite is frozen; a changed
    * benchmark is the explicit rebuild event. Eval suites are bounded by
    * construction (thousands of docs), so the stored table is
    * broadcast-sized at any corpus scale. */
  def writeBenchIndex(s: SparkSession, benchDocs: DataFrame, indexDir: String): Unit =
    benchRowsFrom(s, LlmText.shingleSetsFrom(s, spread(benchDocs)))
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, BenchShingles))

  /** The capped rare-shingle rows for a bench shingle-set frame — the
    * shared derivation of [[writeBenchIndex]] and its fixture-memo
    * twin. */
  private def benchRowsFrom(s: SparkSession, shingleSets: DataFrame): DataFrame = {
    val ex = shingleSets
      .select(col("doc_id").as("bench_id"), explode(col("sh")).as("shingle"))
    val rare = ex.groupBy(col("shingle"))
      .agg(countDistinct(col("bench_id")).as("df"))
      .where(col("df") <= LlmText.BenchHotShingleCap)
      .select(col("shingle"))
    ex.join(broadcast(rare), Seq("shingle"))
      .select(col("bench_id"), col("shingle"))
  }

  /** In-JVM memo of the fixture benchmark-shingle store (the d18 bench
    * half at the standing `doc_id % ContaminationMod = 0` sample) —
    * derived from the memoized shingle table; st17/st23's bootstraps
    * pay the parquet write warm, the recompute cold ([[writeServePair]]
    * discipline). */
  private val benchRowsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), DataFrame]()

  private def benchRowsOf(s: SparkSession, dir: String): DataFrame = {
    val mod = LlmText.ContaminationMod
    graft.StoredMemo.stored(s, benchRowsCache, "bench-shingle-rows",
        (graft.StoredMemo.dirKey(s, dir), mod)) {
      benchRowsFrom(s,
        LlmText.shinglesOf(s, dir).where(col("doc_id") % mod === 0))
        .localCheckpoint(true)
    }
  }

  /** Fixture-path twin of [[writeBenchIndex]] at the standing bench
    * sample — one memo-served parquet write warm. */
  def writeBenchIndexFixture(s: SparkSession, dir: String, indexDir: String): Unit =
    benchRowsOf(s, dir)
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, BenchShingles))

  /** d18's contamination verdicts for a batch of training docs against
    * the STORED benchmark list: batch shingles explode map-side, the
    * broadcast bench join keys on the shingle, and the per-(doc, bench)
    * distinct-shingle count applies d18's threshold. Verdicts depend
    * only on (batch doc, frozen store) — no cross-batch state — so ANY
    * micro-batch split of the training side reproduces the batch d18
    * exactly (st17's contract). Returns the materialized frame. */
  def probeBench(s: SparkSession, batchDocs: DataFrame, indexDir: String): DataFrame = {
    val ex = LlmText.shingleSetsFrom(s, spread(batchDocs))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    val bench = s.read.parquet(p(indexDir, BenchShingles))
    ex.join(broadcast(bench), Seq("shingle"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(countDistinct(col("shingle")).as("n_shared"))
      .where(col("n_shared") >= LlmText.ContaminationMinShared)
      .localCheckpoint(true)
  }

  /** Freeze the benchmark's Bloom filter beside its shingle store: the
    * sparse (widx, word, bits, k) table of
    * [[graft.functions.BloomFilter.wordsDF]] over the SAME capped rare-
    * shingle set [[writeBenchIndex]] persists — the two halves of the
    * decontamination serve pair (the bits prefilter + the exact verify
    * list). Geometry (bits, k) rides IN the store, so a probe under any
    * session conf applies the hashing the filter was built with. */
  def writeBloomIndex(s: SparkSession, benchDocs: DataFrame, indexDir: String,
                      bits: Int, k: Int): Unit = {
    val ex = LlmText.shingleSetsFrom(s, spread(benchDocs))
      .select(col("doc_id").as("bench_id"), explode(col("sh")).as("shingle"))
    val rare = ex.groupBy(col("shingle"))
      .agg(countDistinct(col("bench_id")).as("df"))
      .where(col("df") <= LlmText.BenchHotShingleCap)
      .select(col("shingle"))
    graft.functions.BloomFilter.wordsDF(rare, "shingle", bits, k)
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, BloomWords))
  }

  /** Fixture-path twin of [[writeBloomIndex]]: the bits table derived
    * from the memoized bench-shingle rows (the distinct shingles of the
    * capped store ARE the filter's key set — same rows either way). The
    * word aggregate itself is bits/64-bounded and cheap; the memo saves
    * the bench-side shingle recompute. */
  def writeBloomIndexFixture(s: SparkSession, dir: String, indexDir: String,
                             bits: Int, k: Int): Unit =
    graft.functions.BloomFilter.wordsDF(
        benchRowsOf(s, dir).select(col("shingle")).distinct(), "shingle", bits, k)
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, BloomWords))

  /** [[probeBench]] with the STORED Bloom filter probed map-side before
    * the exact verify join — the Bloom-join serve path (d49's streaming
    * deployment). Reading the filter is one bounded collect (≤ bits/64
    * rows — the filter, never the data); the verdicts are EXACTLY
    * [[probeBench]]'s (no false negatives; the verify join removes the
    * false positives), so st23 shares st17's oracle and its any-split
    * equivalence contract (stateless per-batch probe of a frozen store). */
  def probeBenchBloom(s: SparkSession, batchDocs: DataFrame, indexDir: String): DataFrame = {
    import graft.functions.BloomFilter
    import s.implicits._
    val stored = s.read.parquet(p(indexDir, BloomWords))
    val (bits, k) = stored.select(col("bits"), col("k")).as[(Int, Int)].head()
    val words = BloomFilter.dense(
      stored.select(col("widx"), col("word")).as[(Long, Long)].collect().toSeq, bits)
    val ex = LlmText.shingleSetsFrom(s, spread(batchDocs))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .where(BloomFilter.mightContainFast(s, words, col("shingle"), bits, k))
    val bench = s.read.parquet(p(indexDir, BenchShingles))
    ex.join(broadcast(bench), Seq("shingle"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(countDistinct(col("shingle")).as("n_shared"))
      .where(col("n_shared") >= LlmText.ContaminationMinShared)
      .localCheckpoint(true)
  }

  /** Train the TOKENIZER half and freeze it: `rounds` full BPE
    * merge-selection iterations over `trainDocs`
    * ([[graft.operators.LlmText.bpeTrainMergesFrom]] — the canonical
    * rank-ordered algorithm, not d40's single-pass approximation) and
    * persist the learned merge table (round, left, right, cnt) — the
    * artifact a tokenizer ships. Frozen like the centroids/codebook:
    * token ids under different merge tables are not comparable, so
    * re-training is the explicit refresh event. */
  def writeBpeIndex(s: SparkSession, trainDocs: DataFrame, indexDir: String,
                    rounds: Int): Unit =
    LlmText.bpeTrainMergesFrom(s, LlmText.baseFrom(trainDocs), rounds)
      .write.mode(SaveMode.Overwrite).parquet(p(indexDir, BpeMerges))

  /** Encode a batch of documents with the STORED tokenizer: per-doc
    * subword token counts under the frozen merge table, applied in
    * RANK ORDER (true BPE — each merge rewrites the word's symbol
    * string left-to-right non-overlapping, the same boundary-exact
    * regex the training loop used, one map-only pass over the
    * DISTINCT-WORD table per merge). The corpus fans back in through
    * one word-keyed join — the batch's text is read once however many
    * merges the tokenizer carries; lineage is checkpointed every few
    * rounds (the d14/d17 iteration discipline). The merge table itself
    * is a scalar-sized artifact (its length is the vocabulary budget),
    * collected like the training argmax — never the corpus. */
  def encodeBpe(s: SparkSession, batchDocs: DataFrame, indexDir: String): DataFrame = {
    val merges = s.read.parquet(p(indexDir, BpeMerges))
      .orderBy(col("round"))
      .select(col("left"), col("right")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val baseDf = LlmText.baseFrom(batchDocs)
    val perDocWord = baseDf
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
    var words = perDocWord.select(col("w")).distinct()
      .select(col("w"), concat_ws(" ", split(col("w"), "")).as("syms"))
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      words = words.withColumn("syms",
        graft.operators.LlmText.bpeMergeApply(col("syms"), a, b))
      if ((i + 1) % 8 == 0) words = words.localCheckpoint()
    }
    val tokensPerWord = words
      .select(col("w"), size(split(col("syms"), " ")).cast("long").as("w_tokens"))
    perDocWord.join(tokensPerWord, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("w_tokens")).as("n_bpe_tokens"))
  }

  /** d33's ranking for a batch of queries against the STORED postings:
    * the batch tokenizes itself, weights under the frozen `term_stats`,
    * and joins the stored inverted index — no corpus text is re-read,
    * no df recomputed, no corpus norm re-aggregated. With the index
    * built over the full corpus this is row-identical to the d33
    * recompute form restricted to the batch's queries (SparseIndexSpec);
    * in deployment it is the serving path: cost ∝ Σ_t qdf(t)·df(t)
    * through the same [[SelfJoin]] strategy gate, never corpus². */
  def probeSparse(s: SparkSession, queryDocs: DataFrame, indexDir: String): DataFrame = {
    val (out, caches) = probeSparseLazy(s, queryDocs, indexDir)
    val materialized = out.localCheckpoint(true)
    caches.foreach(_.unpersist())
    materialized
  }

  private[graft] def probeSparseLazy(s: SparkSession, queryDocs: DataFrame,
                                     indexDir: String): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.expressions.Window
    // query-side postings under the FROZEN stats — probed twice (dots +
    // self-norms), so persisted like probeText's base; callers own it
    val qw0 = LlmText.weightedPostingsOf(
      LlmText.tfOf(LlmText.baseFrom(queryDocs)),
      s.read.parquet(p(indexDir, TermStats))).persist()
    val qw = qw0.select(col("term"), col("doc_id").as("query_id"), col("w").as("wq"))
    val cw = s.read.parquet(p(indexDir, Postings))
      .select(col("term"), col("doc_id").as("cand_id"), col("w").as("wc"))
    val dots = SelfJoin.on(qw, cw, Seq("term"))
      .where(col("query_id") =!= col("cand_id"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("wq") * col("wc")).as("dot"))
    val out = dots
      .join(LlmText.sparseNormsOf(qw0)
        .select(col("doc_id").as("query_id"), col("nw").as("nq")), Seq("query_id"))
      .join(s.read.parquet(p(indexDir, DocNorms))
        .select(col("doc_id").as("cand_id"), col("nw").as("nc")), Seq("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (col("dot").cast("double") /
          (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double")))).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)))
      .where(col("rnk") <= LlmText.SparseTopK)
    (out, Seq(qw0))
  }

  // ----------------------------------------------------------- append
  /** Fold the batch's SURVIVORS into the store — the step that gives
    * the lifecycle a day 3: next-day probes see today's kept docs as
    * corpus. Appends batch-sized partitions; the existing index files
    * are untouched. */
  def appendTextSurvivors(s: SparkSession, batchDocs: DataFrame,
                          verdicts: DataFrame, indexDir: String): Unit = {
    val survivors = verdicts.where(!col("is_dup")).select(col("doc_id"))
    writeTextIndex(s,
      batchDocs.join(survivors, Seq("doc_id"), "left_semi"),
      indexDir, SaveMode.Append)
  }

  /** Embedding-side survivor fold: kept batch vectors join the stored
    * member table under their (frozen-centroid) cell assignment. */
  def appendCellSurvivors(s: SparkSession, batchVecs: DataFrame,
                          verdicts: DataFrame, indexDir: String): Unit = {
    val kept = verdicts.where(col("kept")).select(col("vec_id"))
    appendCellMembers(s,
      batchVecs.join(kept, Seq("vec_id"), "left_semi"),
      indexDir, SaveMode.Append)
  }
}
