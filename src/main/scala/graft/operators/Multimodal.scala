package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * runs executor-side over partitions of raw bytes.
  *
  * The decode step itself is a clearly-marked STUB (no codec libraries in
  * this environment): it derives deterministic fake features from the bytes.
  * Everything around it — schema, binary encoding, partition-wise typed
  * traversal, batch shape — is the real production plumbing and is tested.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Long, content_md5: String,
      features: Array[Float])

  /** Attach an opaque binary payload + metadata struct. Here the payload is
    * the UTF-8 text bytes; in production it is the image/audio blob column
    * of the source table. */
  def withMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("text/plain").as("format"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("media_meta"))

  /** Executor-side feature extraction over the binary column, one partition
    * at a time (the `mapPartitions` shape lets a real implementation
    * amortize codec/model initialization per partition).
    *
    * STUB: `fakeDecode` stands in for the real image/audio decoder — it
    * emits 4 deterministic floats derived from the payload bytes. Replace
    * with a codec call; the signature and batch shape stay the same. */
  def extractFeatures(media: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[MediaFeatures]
    media.select("doc_id", "media").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init (real codecs/models would be loaded here, once)
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val md5hex = digest.digest(r.media).map("%02x".format(_)).mkString
          MediaFeatures(r.doc_id, r.media.length.toLong, md5hex, fakeDecode(r.media))
        }
      }
      .toDF()
  }

  /** STUB decoder — deterministic fake features in place of a real codec. */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val n = bytes.length
    Array(
      n.toFloat,
      if (n > 0) bytes(0).toFloat else 0f,
      if (n > 0) bytes(n - 1).toFloat else 0f,
      bytes.foldLeft(0)((a, b) => (a + (b & 0xff)) % 9973).toFloat)
  }
}
