package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable._

/** Multimodal-column plumbing: media as opaque `binary` content with
  * typed metadata, chunk/frame sampling, and feature extraction. The
  * image/audio codecs are NOT in this environment, so the decode step is
  * a clearly-marked deterministic STUB ([[FakeDecoder]]) — what is real
  * and tested is everything Spark-side: the binary column representation,
  * the schema, the partition-parallel batch shape (mapPartitions — the
  * Scala analogue of mapInPandas batching), and the frame/feature
  * plumbing. Content is derived from `documents.text` bytes so every
  * stage is reproducible and oracle-checkable.
  *
  * Scale notes: media blobs stay opaque binary all the way through the
  * scan (no decode before the filter); frame sampling is a map-side
  * generator (sequence + explode), so a 100 TB media table fans out
  * without a shuffle; feature extraction is per-partition batched, the
  * shape GPU/codec vendors need.
  */
object Multimodal {

  /** media_id + media_type + binary content + deterministic metadata. */
  def media(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      col("n_chars").as("byte_len"))

  // ---------------------------------------------------------------- mm01
  /** Typed metadata per media row: dimensions/duration derived
    * deterministically from the content hash (the STUB for header
    * parsing — a real decoder reads these from the container format). */
  def mm01MediaMeta(s: SparkSession, dir: String): DataFrame =
    media(s, dir)
      .withColumn("h", h64(col("media_id")))
      .select(
        col("media_id"), col("media_type"), col("byte_len"),
        octet_length(col("content")).as("content_bytes"),
        when(col("media_type") === "image", lit(16) + (col("h") % 64) * 16).otherwise(lit(null).cast("bigint")).as("width"),
        when(col("media_type") === "image", lit(16) + (col("h") % 48) * 16).otherwise(lit(null).cast("bigint")).as("height"),
        when(col("media_type") =!= "image", (col("h") % 300000) + 1000).otherwise(lit(null).cast("bigint")).as("duration_ms"))

  val mm01Sql: String = {
    val h = h64Sql("doc_id")
    s"""SELECT doc_id AS media_id,
       |  (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
       |  n_chars AS byte_len,
       |  octet_length(encode(text)) AS content_bytes,
       |  CASE WHEN doc_id % 3 = 0 THEN 16 + ($h % 64) * 16 ELSE NULL END AS width,
       |  CASE WHEN doc_id % 3 = 0 THEN 16 + ($h % 48) * 16 ELSE NULL END AS height,
       |  CASE WHEN doc_id % 3 <> 0 THEN ($h % 300000) + 1000 ELSE NULL END AS duration_ms
       |FROM documents""".stripMargin
  }

  // ---------------------------------------------------------------- mm02
  /** Frame/chunk sampling: fixed-stride chunks of the content with a
    * per-frame content hash — the video-frame-extraction shape (generator
    * fan-out, no shuffle; each frame row carries provenance). Chunking
    * runs on the text (DuckDB cannot substring blobs), which carries the
    * identical byte content for this corpus. */
  val FrameStride = 64

  def mm02FrameSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), col("text"), col("n_chars"))
      // greatest(...,0): for n_chars=0 Spark's `div` truncates (-1 div 64
      // = 0) while DuckDB's `//` floors (= -1, emitting nothing) — the
      // floor makes empty media emit ONE empty frame on both engines
      .withColumn("frame_idx",
        explode(sequence(lit(0), expr(s"greatest((n_chars - 1) div $FrameStride, 0)"))))
      .select(
        col("media_id"), col("frame_idx"),
        // substring with a column start position needs the SQL form
        expr(s"md5(substring(text, CAST(frame_idx * $FrameStride + 1 AS INT), $FrameStride))")
          .as("frame_hash"))

  val mm02Sql: String =
    s"""WITH fr AS (
       |  SELECT doc_id, text, unnest(generate_series(0, greatest((n_chars - 1) // $FrameStride, 0))) AS i
       |  FROM documents
       |)
       |SELECT doc_id AS media_id, i AS frame_idx,
       |  md5(substring(text, CAST(i * $FrameStride + 1 AS INT), $FrameStride)) AS frame_hash
       |FROM fr""".stripMargin

  // ---------------------------------------------------------------- mm03
  /** Feature-extraction STUB: 8 deterministic pseudo-features per media
    * row derived from the content hash — stands in for an embedding
    * model; the schema/batch shape is what production swaps onto. */
  val NumFeatures = 8

  def mm03FeatureStub(s: SparkSession, dir: String): DataFrame = {
    val withMd5 = media(s, dir).withColumn("m", md5(col("content")))
    val feats = (0 until NumFeatures).map { j =>
      ((h64(concat(col("m"), lit(s"|$j"))) % 1000).cast("double") / 1000.0).as(s"f$j")
    }
    withMd5.select(col("media_id") +: feats: _*)
  }

  val mm03Sql: String = {
    // DuckDB's md5 takes VARCHAR; hashing the text hashes the same UTF-8
    // bytes Spark's md5(binary content) sees
    val feats = (0 until NumFeatures).map { j =>
      s"CAST(${h64Sql(s"md5(text) || '|$j'")} % 1000 AS DOUBLE) / 1000.0 AS f$j"
    }.mkString(",\n  ")
    s"""SELECT doc_id AS media_id,
       |  $feats
       |FROM documents""".stripMargin
  }

  // ---------------------------------------------------------------- mm04
  /** Resize/thumbnail STUB: target dimensions scale down proportionally
    * (capped at 64px on the long edge) and the "resized payload" is a
    * deterministic content reduction — a real image library would swap in
    * at the marked expression; the schema (orig/new dims + resized-bytes
    * hash) and the map-only plumbing are the real part. */
  def mm04ResizeStub(s: SparkSession, dir: String): DataFrame =
    mm01MediaMeta(s, dir)
      .where(col("media_type") === "image")
      .join(Tables.documents(s, dir).select(col("doc_id").as("media_id"), col("text")), Seq("media_id"))
      .select(
        col("media_id"), col("width"), col("height"),
        least(col("width"), lit(64L)).as("new_width"),
        // Spark's `/` on longs yields DOUBLE; integer div keeps both
        // engines in exact integer arithmetic
        expr("greatest(CAST(1 AS BIGINT), (height * least(width, CAST(64 AS BIGINT))) div width)")
          .as("new_height"),
        // STUB: stands in for the decoded-resized-reencoded payload
        md5(substring(col("text"), 1, 64)).as("resized_hash"))

  val mm04Sql: String = {
    val h = h64Sql("doc_id")
    s"""WITH meta AS (
       |  SELECT doc_id AS media_id, text,
       |    16 + ($h % 64) * 16 AS width,
       |    16 + ($h % 48) * 16 AS height
       |  FROM documents WHERE doc_id % 3 = 0
       |)
       |SELECT media_id, width, height,
       |  least(width, 64) AS new_width,
       |  greatest(1, (height * least(width, 64)) // width) AS new_height,
       |  md5(substring(text, 1, 64)) AS resized_hash
       |FROM meta""".stripMargin
  }

  // ---------------------------------------------------------------- mm05
  /** REAL-file media ingestion via the `binaryFile` source: every file
    * of the dataset directory arrives as one row of (path, length,
    * binary content) — the ingestion path a media corpus takes before
    * any of the mm01–mm04 processing, exercised here on the fixture's
    * own parquet files (the only real files guaranteed present). The
    * oracle reads the same files with DuckDB's `read_blob`; blob
    * hashing differs across engines, so the oracle-compared projection
    * is (file_name, n_bytes) and the content bytes are pinned by
    * MultimodalSpec (PAR1 magic + length == content size).
    *
    * Scale notes: binary files are non-splittable — one row per file,
    * partition packing governed by `spark.sql.files.maxPartitionBytes`;
    * the blob stays opaque through the scan, and a `pathGlobFilter` /
    * partition-dir layout prunes at the listing, not after read.
    *
    * The oracle must read the SAME directory the query is handed, but
    * oracle SQL is a static string — so the path is a `__SF_DIR__`
    * placeholder that [[graft.Verify]] templates with its sfDir argument
    * at dump time (a hardcoded fixture path would silently compare
    * against the wrong files at any other scale factor). */
  def mm05BinaryIngest(s: SparkSession, dir: String): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("length").as("n_bytes"))

  val mm05Sql: String =
    """SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
      |  CAST(size AS BIGINT) AS n_bytes
      |FROM read_blob('__SF_DIR__/*.parquet')""".stripMargin

  // ------------------------------------------------------- decode stub
  final case class MediaFrame(media_id: Long, frame_idx: Int, payload: Array[Byte])
  final case class DecodedFrame(media_id: Long, frame_idx: Int, feature: Double)

  /** Partition-parallel decode plumbing (the mapInPandas analogue):
    * batches flow through [[FakeDecoder]] per partition — a real codec
    * would replace `FakeDecoder.decode` and nothing else. Unit-tested;
    * not oracle-checked (the stub is the point, not the values). */
  def decodeFrames(frames: Dataset[MediaFrame]): Dataset[DecodedFrame] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      // per-partition init cost (codec/model load) amortizes over the batch
      val decoder = FakeDecoder
      it.map(f => DecodedFrame(f.media_id, f.frame_idx, decoder.decode(f.payload)))
    }
  }

  /** STUB: deterministic stand-in for an image/audio codec (none are
    * installed in this environment). Replace with the real decoder. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): Double =
      if (payload == null || payload.isEmpty) 0.0
      else payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xFFFFFF).toDouble / 0xFFFFFF
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_media_meta" -> (mm01MediaMeta _),
    "mm02_frame_sample" -> (mm02FrameSample _),
    "mm03_feature_stub" -> (mm03FeatureStub _),
    "mm04_resize_stub" -> (mm04ResizeStub _),
    "mm05_binary_ingest" -> (mm05BinaryIngest _))

  val oracleSql: Map[String, String] = Map(
    "mm01_media_meta" -> mm01Sql,
    "mm02_frame_sample" -> mm02Sql,
    "mm03_feature_stub" -> mm03Sql,
    "mm04_resize_stub" -> mm04Sql,
    "mm05_binary_ingest" -> mm05Sql)
}
