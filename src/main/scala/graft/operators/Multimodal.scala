package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2 m1): media as an opaque
  * `binary` column with typed metadata, decoded/feature-extracted through a
  * real distributed per-partition batch path.
  *
  * The container has no image/audio codecs, so the decode is a
  * deterministic STUB (byte statistics + fake dimensions derived from the
  * content hash) — but everything around it is the real thing: a binary
  * payload column, a typed metadata struct, and a `mapPartitions` batch
  * loop with an `Encoder`'d row class, which is exactly the shape a Pandas
  * `mapInPandas` / JNI codec call takes at scale. Swap `decodeStub` for a
  * codec and nothing else changes.
  *
  * Scale: the payload never moves through a shuffle — ingest, decode and
  * stats are one narrow pass; only the (tiny) per-item feature row
  * survives. Batching is per-partition with constant memory.
  */
object Multimodal {

  /** Raw media row: payload + typed metadata. */
  final case class MediaItem(doc_id: Long, media_type: String, content: Array[Byte])

  /** Decoded feature row (the only thing that outlives the scan). */
  final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Long, byte_sum: Long,
    first_byte: Long, width: Long, height: Long, channels: Long)

  /** Deterministic synthetic media table: a 64-byte binary payload derived
    * from the document's md5 (4x the 16-byte digest), typed by doc_id. At a
    * real deployment this is the blob/bytes column of an ingest table. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        unhex(repeat(md5(col("text")), 4)).as("content"))

  /** The stubbed codec: byte stats + md5-derived fake dimensions. Pure
    * function of the payload — replace with a real decoder at will. */
  def decodeStub(item: MediaItem): MediaFeatures = {
    val bytes = item.content
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    // fake dims from the first 60 bits of the payload's hex rendering —
    // reproducible as CAST('0x'||substr(hex,1,15) AS BIGINT) in any engine
    val hex = bytes.take(8).map("%02x".format(_)).mkString
    val h60 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val channels = item.media_type match {
      case "audio" => 1L
      case _ => 3L
    }
    MediaFeatures(
      doc_id = item.doc_id,
      media_type = item.media_type,
      n_bytes = bytes.length.toLong,
      byte_sum = sum,
      first_byte = (bytes(0) & 0xff).toLong,
      width = 64L + h60 % 1856L,
      height = 64L + (h60 / 2048L) % 1056L,
      channels = channels)
  }

  /** `m1_multimodal_meta`: the distributed decode pass — typed Dataset,
    * per-partition batched iteration (batch size bounds peak memory the
    * way an Arrow batch would for mapInPandas). */
  def m1MultimodalMeta(spark: SparkSession, dir: String, batchSize: Int = 256): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaItem]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real codec would decode the whole batch in one native call
          batch.iterator.map(decodeStub)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val oracle: String =
    """WITH m AS (
      | SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  repeat(md5(text), 4) AS hex
      | FROM documents)
      |SELECT doc_id, media_type,
      | CAST(length(hex) / 2 AS BIGINT) AS n_bytes,
      | CAST(list_sum(list_transform(range(1, length(hex) + 1, 2),
      |   i -> CAST(('0x' || substr(hex, i, 2)) AS BIGINT))) AS BIGINT) AS byte_sum,
      | CAST(('0x' || substr(hex, 1, 2)) AS BIGINT) AS first_byte,
      | 64 + CAST(('0x' || substr(hex, 1, 15)) AS BIGINT) % 1856 AS width,
      | 64 + (CAST(('0x' || substr(hex, 1, 15)) AS BIGINT) // 2048) % 1056 AS height,
      | CASE WHEN CAST(doc_id % 3 AS INTEGER) = 1 THEN 1 ELSE 3 END AS channels
      |FROM m ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_meta" -> ((s: SparkSession, d: String) => m1MultimodalMeta(s, d)))
}
