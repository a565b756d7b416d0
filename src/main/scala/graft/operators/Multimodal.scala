package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus partition-batched decode / feature-extraction /
  * frame-sampling operators.
  *
  * The decode KERNELS are deterministic STUBS (no image/audio codecs exist in
  * this environment): `stubDecodeFeatures` computes a byte-histogram "feature
  * vector" in place of a real model/codec. Everything around the kernel —
  * the binary+struct schema, the `mapPartitions` batch shape (one buffer
  * reused per partition, matching how a real codec/model would amortize
  * per-batch setup), partitioning, and column plumbing — is real and tested.
  * Swapping in a real decoder means replacing the body of one function.
  *
  * The media "files" are derived deterministically from the documents table
  * (UTF-8 bytes of the text as payload) so the operators run on the standard
  * corpus at every scale factor.
  *
  * Scale: decode is a narrow per-partition map — no shuffle; feature
  * aggregation shuffles only (source, 16-float) rows. Frame sampling fans out
  * rows but stays narrow. At 100 TB the binary payloads dominate scan cost;
  * metadata-only predicates (`meta.n_bytes < X`) prune before decode.
  */
object Multimodal {

  val FeatureDims = 16
  val FrameBytes = 256

  /** Manifest: one media row per document — binary payload + typed metadata. */
  def manifest(s: SparkSession, dir: String): DataFrame =
    Relational.t(s, dir, "documents")
      .select(
        col("doc_id"),
        col("source"),
        col("text").cast("binary").as("media"),
        struct(
          element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")), (col("doc_id") % 4 + 1).cast("int")).as("format"),
          (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
          (lit(64) + (col("doc_id") % 5) * 32).cast("int").as("height"),
          length(col("text")).cast("long").as("n_bytes")
        ).as("meta")
      )

  /** STUB decode kernel: byte-value histogram over 16 buckets, L1-normalized.
    * Deterministic stand-in for a real image/audio decoder + feature model.
    */
  def stubDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDims)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % FeatureDims) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    var j = 0
    while (j < FeatureDims) { hist(j) /= n; j += 1 }
    hist
  }

  /** Partition-batched decode: `mapPartitions` so a real codec/model would pay
    * per-partition (not per-row) setup — the Spark-side shape of a batched
    * inference UDF. Emits (doc_id, features: array<float>).
    */
  def decodeFeatures(manifest: DataFrame): DataFrame = {
    val spark = manifest.sparkSession
    import spark.implicits._
    manifest
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // Per-partition setup would go here (codec init, model session).
        rows.map { case (id, payload) => (id, stubDecodeFeatures(payload)) }
      }
      .toDF("doc_id", "features")
  }

  /** Frame sampling for "video" payloads: every FrameBytes-sized chunk becomes
    * a frame row. Pure column functions — narrow, codegen'd, no UDF.
    */
  def sampleFrames(manifest: DataFrame): DataFrame =
    manifest
      .select(
        col("doc_id"),
        col("meta"),
        posexplode(
          transform(
            sequence(lit(0), greatest((length(col("media")) / FrameBytes).cast("int") - 1, lit(0))),
            i => col("media").substr(i * FrameBytes + 1, lit(FrameBytes))
          )
        ).as(Seq("frame_idx", "frame"))
      )

  /** Metadata-level "resize": a pure struct rewrite (the shape a metadata
    * normalization pass takes before decode).
    */
  def resizeMeta(manifest: DataFrame, maxW: Int, maxH: Int): DataFrame =
    manifest.withColumn(
      "meta",
      struct(
        col("meta.format"),
        least(col("meta.width"), lit(maxW)).as("width"),
        least(col("meta.height"), lit(maxH)).as("height"),
        col("meta.n_bytes")
      )
    )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Feature extraction + per-source aggregation (rows-only driver check:
    // the stub kernel has no SQL-engine equivalent; determinism and batch
    // shape are asserted in MultimodalSpec).
    "mm_decode_features" -> { (s, dir) =>
      val feats = decodeFeatures(manifest(s, dir))
      feats
        .join(Relational.t(s, dir, "documents").select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_media"),
          sum(element_at(col("features"), 1).cast("decimal(20,10)")).cast("double").as("sum_f0"),
          sum(aggregate(col("features"), lit(0.0f), (a, x) => a + x).cast("decimal(20,10)"))
            .cast("double").as("sum_l1")
        )
        .orderBy("source")
    },

    // Metadata resize normalization on the gate: pure struct rewrite over the
    // "png" subset; the oracle recomputes the capped dimensions from the
    // manifest's doc_id arithmetic.
    "mm_resize_meta" -> { (s, dir) =>
      resizeMeta(manifest(s, dir), maxW = 96, maxH = 128)
        .filter(col("meta.format") === "png")
        .select(
          col("doc_id"),
          col("meta.format").as("format"),
          col("meta.width").as("width"),
          col("meta.height").as("height"))
        .orderBy("doc_id")
    },

    // Frame sampling + metadata pruning: frames only for "video" rows under a
    // byte cap (metadata predicate prunes before the binary fan-out).
    "mm_frame_stats" -> { (s, dir) =>
      val vids = manifest(s, dir).filter(col("meta.format") === "mp4" && col("meta.n_bytes") >= FrameBytes)
      sampleFrames(vids)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_frames"),
          sum(length(col("frame")).cast("long")).as("total_frame_bytes")
        )
        .orderBy("doc_id")
    },

    // Exact media dedup by payload content hash, summarized per format —
    // the asset-store ingest step (same media uploaded twice must store
    // once). The shuffle carries one 32-hex digest per row, never the
    // binary payload; at 100 TB this matters more than anywhere else in the
    // engine — media payloads are the biggest rows in the lake, and
    // hash-then-shuffle is the only viable dedup shape for them. Hashing
    // binary (not a string view) keeps the op correct for real non-UTF8
    // media; DuckDB's md5 over the same bytes proves the digest is
    // portable across engines.
    "mm_exact_dedup" -> { (s, dir) =>
      manifest(s, dir)
        .select(col("meta.format").as("format"), md5(col("media")).as("h"),
          col("meta.n_bytes").as("n_bytes"))
        .groupBy("format")
        .agg(
          count(lit(1)).as("n_media"),
          countDistinct(col("h")).as("n_distinct_payloads"),
          max(col("n_bytes")).as("max_bytes"))
        .orderBy("format")
    }
  )

  /** mm_frame_stats is SQL-expressible because the frame fan-out is pure
    * arithmetic on payload length: full FrameBytes chunks only (the trailing
    * partial chunk is dropped unless it is the only one): n_frames =
    * max(len div 256, 1); bytes = n_frames*256, except a single short payload
    * contributes its own length.
    */
  val oracles: Map[String, String] = Map(
    "mm_resize_meta" ->
      """SELECT doc_id, 'png' AS format,
        |  CAST(least(64 + (doc_id % 8) * 16, 96) AS INT) AS width,
        |  CAST(least(64 + (doc_id % 5) * 32, 128) AS INT) AS height
        |FROM documents WHERE doc_id % 4 = 0 ORDER BY doc_id""".stripMargin,
    "mm_frame_stats" ->
      s"""SELECT doc_id,
         |  greatest(length(text) // $FrameBytes, 1)::BIGINT AS n_frames,
         |  (CASE WHEN length(text) < $FrameBytes THEN length(text)
         |        ELSE (length(text) // $FrameBytes) * $FrameBytes END)::BIGINT AS total_frame_bytes
         |FROM documents
         |WHERE doc_id % 4 = 3 AND length(text) >= $FrameBytes
         |ORDER BY doc_id""".stripMargin,
    "mm_exact_dedup" ->
      """SELECT ['png','jpeg','wav','mp4'][CAST(doc_id % 4 + 1 AS INT)] AS format,
        |  COUNT(*) AS n_media,
        |  COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
        |  CAST(MAX(length(text)) AS BIGINT) AS max_bytes
        |FROM documents GROUP BY format ORDER BY format""".stripMargin
  )
}
