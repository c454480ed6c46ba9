package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable

/** Multimodal-column plumbing: image/audio/video content as opaque
  * `binary` columns with typed metadata.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * deterministic stub ([[decodeStub]]) — but everything Spark-side is
  * real: binary columns, metadata schema, batch-shaped per-partition
  * processing (`mapPartitions` over a typed Dataset — the Scala
  * equivalent of `mapInPandas`: one iterator per partition, so per-batch
  * setup like model/codec init happens once per partition, not per row),
  * frame sampling, and fingerprinting.
  *
  * The `documents` table stands in for a media table: its UTF-8 bytes are
  * the "blob". At 100 TB the blobs dominate storage — every operator here
  * is a narrow map (no shuffle), and projections never carry the blob
  * past the point it's needed (metadata queries prune it at the scan).
  */
object Multimodal {

  /** A decoded media record: what a real pipeline would carry. */
  case class MediaFeature(
      docId: Long, mediaType: String, nBytes: Long,
      width: Long, height: Long, nFrames: Long, fingerprint: Long)

  /** source → media_type, ONE definition rendering every consumer form
    * (decodeStub's Scala match, the Spark CASE, both DuckDB CASEs) so a
    * new source mapping can't be added to three of the four sites. */
  private val MediaTypeBySource =
    Seq("src0" -> "image", "src1" -> "audio", "src2" -> "video")
  private val MediaTypeDefault = "text"
  private val mediaTypeScala: Map[String, String] = MediaTypeBySource.toMap
  private def sparkMediaTypeCase: String =
    "case source " +
      MediaTypeBySource.map { case (s, t) => s"when '$s' then '$t'" }.mkString(" ") +
      s" else '$MediaTypeDefault' end"
  private def duckMediaTypeCase: String =
    "CASE source " +
      MediaTypeBySource.map { case (s, t) => s"WHEN '$s' THEN '$t'" }.mkString(" ") +
      s" ELSE '$MediaTypeDefault' END"

  /** The blob → fixed 32-CHARACTER "frame" chunking shared by
    * [[mFrameSample]] and [[mPhashDedup]] (substring/length are
    * character-based in both engines; the synthetic corpus is ASCII so
    * chars = bytes — a real codec integration would chunk the binary
    * blob instead). The empty-doc guard matters: sequence(0, -1) in
    * Spark yields a DESCENDING [0, -1] (same gotcha as
    * Portable.sparkShingles) and would emit a spurious frame_idx=0 row
    * that DuckDB's range(0, 0) does not. */
  private val frameExpr: String =
    "case when length(text) = 0 then array() else " +
      "transform(sequence(0, cast(ceil(length(text) / 32.0) as int) - 1), " +
      "i -> substring(text, i * 32 + 1, 32)) end"
  private val framesCte: String =
    """f AS (
      |  SELECT doc_id,
      |    unnest(range(0, CAST(ceil(length(text) / 32.0) AS BIGINT))) AS frame_idx,
      |    text
      |  FROM documents)""".stripMargin

  /** Deterministic stand-in for a real decoder (libjpeg/ffmpeg/...):
    * derives plausible metadata purely from the bytes. Runs once per
    * partition-iterator — the real-codec integration point. The
    * fingerprint is the portable md5-derived hash of the decoded UTF-8
    * payload, so the whole record is oracle-checkable ([[mDecode]]). */
  def decodeStub(spark: SparkSession, dir: String): Dataset[MediaFeature] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), expr("cast(text as binary)").as("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init (codec handles, model weights) goes here —
        // one reused digest instead of a provider lookup per row
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, source, blob) =>
          val h = Portable.jvmHash(md, new String(blob, "UTF-8"), "mm")
          val mediaType = mediaTypeScala.getOrElse(source, MediaTypeDefault)
          MediaFeature(id, mediaType, blob.length.toLong,
            width = 64 + (h & 0xff), height = 64 + ((h >> 8) & 0xff),
            nFrames = 1 + ((h >> 16) & 0x0f), fingerprint = h)
        }
      }
  }

  // ------------------------------------------------------------ m_decode
  /** The mapPartitions decode path (the `local_collect`/per-partition
    * imperative form, SURVEY §2.1 #6), registered with a full oracle:
    * every stubbed field is a pure function of the payload via the
    * portable hash, so DuckDB reproduces the "decoder" bit-for-bit. */
  def mDecode(s: SparkSession, dir: String): DataFrame =
    decodeStub(s, dir).toDF()
      .select(col("docId").as("doc_id"), col("mediaType").as("media_type"),
        col("nBytes").as("n_bytes"), col("width"), col("height"),
        col("nFrames").as("n_frames"), col("fingerprint"))

  val mDecodeSql: String = {
    val h = Portable.duckHash("text", "mm")
    s"""WITH d AS (SELECT doc_id, source, text, $h AS h FROM documents)
       |SELECT doc_id,
       |  $duckMediaTypeCase AS media_type,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  64 + (h & 255) AS width,
       |  64 + ((h >> 8) & 255) AS height,
       |  1 + ((h >> 16) & 15) AS n_frames,
       |  h AS fingerprint
       |FROM d""".stripMargin
  }

  // ------------------------------------------------------------ m_media_meta
  /** Metadata extraction over the opaque blob — byte length, sha256
    * content hash, media type from source, plus stubbed "decoded"
    * dimensions derived from the portable hash (SQL-expressible, so the
    * oracle can check the full row including the stub). */
  def mMediaMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      expr(sparkMediaTypeCase).as("media_type"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      sha2(col("text").cast("binary"), 256).as("content_hash"),
      expr(s"64 + (${Portable.sparkHash("text", "mmw")} & 255)").cast("long").as("fake_width"),
      expr(s"64 + (shiftright(${Portable.sparkHash("text", "mmw")}, 8) & 255)")
        .cast("long").as("fake_height"))

  val mMediaMetaSql: String =
    s"""SELECT doc_id,
       |  $duckMediaTypeCase AS media_type,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  sha256(text) AS content_hash,
       |  CAST(64 + (${Portable.duckHash("text", "mmw")} & 255) AS BIGINT) AS fake_width,
       |  CAST(64 + ((${Portable.duckHash("text", "mmw")} >> 8) & 255) AS BIGINT) AS fake_height
       |FROM documents""".stripMargin

  // ------------------------------------------------------------ m_frame_sample
  /** Frame sampling: the blob is cut into fixed 32-character "frames"
    * ([[frameExpr]]); every 4th frame is sampled and fingerprinted — the
    * plumbing shape of video frame extraction (explode + per-frame
    * feature), with the decoder stubbed by the portable hash. */
  def mFrameSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        posexplode(expr(frameExpr)).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % 4 === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(Portable.sparkHash("frame", "frame")).as("frame_hash"))

  val mFrameSampleSql: String =
    s"""WITH ${framesCte}
       |SELECT doc_id, frame_idx,
       |  ${Portable.duckHash("substr(text, CAST(frame_idx * 32 + 1 AS INTEGER), 32)", "frame")} AS frame_hash
       |FROM f WHERE frame_idx % 4 = 0""".stripMargin

  // ------------------------------------------------------------ m_text_vec
  /** Cross-modal join: the text side (documents) and the embedding side
    * (embeddings) keyed by the shared id, rolled up per embedding-space
    * label — the "join features from one modality onto another" shape
    * every multimodal pipeline runs (e.g. caption-quality stats per image
    * cluster). Counts/token sums are exact integers; the norm sum goes
    * through a DECIMAL(25,12) cast on both engines so the double
    * aggregation is order-independent (the q_events_sliding pattern).
    *
    * Scale shape: id⋈id is a co-partitionable fact-fact join — sort-merge
    * on the shared key (or zero-exchange if both sides are bucketed on
    * it, see sources/Bucketing.scala); the text blob is projected to its
    * two integer features BEFORE the join, so the shuffle never carries
    * the blob. */
  def mTextVec(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val docs = Tables.documents(s, dir).select(
      col("doc_id"),
      expr(s"size(${Portable.sparkTokens("text")})").cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"))
    val vecs = Tables.embeddings(s, dir).select(
      col("vec_id"), col("label").cast("long").as("label"),
      expr("sqrt(vec_dot(transform(embedding, x -> cast(x as double)), " +
        "transform(embedding, x -> cast(x as double))))").as("nrm"))
    docs.join(vecs, col("doc_id") === col("vec_id"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens_total"),
        sum("n_chars").as("n_chars_total"),
        sum(col("nrm").cast("decimal(25,12)")).cast("double").as("norm_sum"))
  }

  val mTextVecSql: String = {
    val vd = "CAST(embedding AS DOUBLE[])"
    // the one authoritative cross-engine dot-product fold
    val dot = Similarity.duckDot(vd, vd)
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(${Portable.duckTokens("text")}) AS BIGINT) AS n_tokens,
       |    CAST(length(text) AS BIGINT) AS n_chars
       |  FROM documents),
       |v AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label, sqrt($dot) AS nrm
       |  FROM embeddings)
       |SELECT label, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
       |  CAST(SUM(CAST(nrm AS DECIMAL(25,12))) AS DOUBLE) AS norm_sum
       |FROM d JOIN v ON doc_id = vec_id
       |GROUP BY label""".stripMargin
  }

  // ------------------------------------------------------------ m_phash_dedup
  /** Perceptual-hash near-dup pairs across media blobs — video/image
    * dedup's shape: sample frames (every 4th 32-character chunk, the
    * [[mFrameSample]] stub for a real decoder+pHash), build a 60-bit
    * SimHash over the sampled frames' content hashes (per-bit exact
    * integer vote sums — order-independent at any parallelism), then
    * find pairs within hamming ≤ [[Dedup.SimMaxHamming]] via the same
    * distinct-signature 15-bit banding as [[Dedup.dSimhashPairs]]: a
    * re-encoded copy that differs in a few frames lands within a small
    * hamming ball of the original.
    *
    * Scale shape: the frame explode is the linear decode-bounded pass;
    * the band join runs over DISTINCT signatures (a dup-clique collides
    * once, not C(k,2) times per band) and hamming filters BEFORE doc
    * expansion. Blobs never cross a shuffle — only (doc_id, 8-byte
    * signature) rows do. */
  def mPhashDedup(s: SparkSession, dir: String): DataFrame = {
    val frames = Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(expr(frameExpr)).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % 4 === 0)
      .withColumn("h1", expr(Portable.sparkHash("frame", "ph1")))
      .withColumn("h2", expr(Portable.sparkHash("frame", "ph2")))
    // both the signature rule AND the candidate pipeline are Dedup's
    // shared helpers — the bit rule and the LSH invariants live once,
    // not per modality
    val bitSums = Dedup.simSigBitSums
    Dedup.bandedSigPairs(frames.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), expr(Dedup.simSigAssembleExpr).as("phash")), "phash")
  }

  val mPhashDedupSql: String = {
    val bitSums = Dedup.duckSimSigBitSums
    val sigExpr = Dedup.duckSimSigAssembleExpr
    val fr = "substr(text, CAST(frame_idx * 32 + 1 AS INTEGER), 32)"
    s"""WITH ${framesCte},
       |fh AS (
       |  SELECT doc_id, ${Portable.duckHash(fr, "ph1")} AS h1,
       |    ${Portable.duckHash(fr, "ph2")} AS h2
       |  FROM f WHERE frame_idx % 4 = 0),
       |bsum AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM fh GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sigExpr AS phash FROM bsum),
       |${Dedup.bandedSigPairsSql("phash")}""".stripMargin
  }

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "m_phash_dedup" -> ((mPhashDedup _, Some(mPhashDedupSql))),
    "m_media_meta" -> ((mMediaMeta _, Some(mMediaMetaSql))),
    "m_frame_sample" -> ((mFrameSample _, Some(mFrameSampleSql))),
    "m_decode" -> ((mDecode _, Some(mDecodeSql))),
    "m_text_vec" -> ((mTextVec _, Some(mTextVecSql))))
}
