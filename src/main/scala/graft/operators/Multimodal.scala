package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star, SURVEY.md §2.11): media
  * payloads are opaque BINARY columns with a typed metadata struct;
  * decode/feature-extraction runs batched per partition (the Scala
  * analog of the arrow-batched mapInPandas shape).
  *
  * The actual byte→pixels/samples decode is STUBBED (no image/audio
  * libs in this environment): `decodeStub` derives deterministic fake
  * features from the bytes. Everything around it — schema, typed
  * Dataset, partition-batched execution, metadata propagation — is the
  * real pipeline and is tested.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
                            width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                                 entropy: Double, mean_byte: Double,
                                 frames_sampled: Int)

  /** Attach a binary payload + metadata struct. In production the
    * payload comes from object storage; here it is synthesized from
    * the documents table deterministically. */
  def toMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        concat(lit("application/x-fake-"), col("lang")).as("mime"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"))
      .as[MediaRow]
  }

  /** STUB decode: real implementations plug an image/audio codec in
    * here; the surrounding partition-batched execution is real. */
  private def decodeStub(payload: Array[Byte]): (Double, Double) = {
    if (payload.isEmpty) return (0.0, 0.0)
    val hist = new Array[Long](256)
    payload.foreach(b => hist(b & 0xff) += 1)
    val n = payload.length.toDouble
    var ent = 0.0
    var sum = 0.0
    hist.foreach { c =>
      if (c > 0) { val p = c / n; ent -= p * math.log(p) / math.log(2) }
    }
    payload.foreach(b => sum += (b & 0xff))
    (ent, sum / n)
  }

  /** Batched feature extraction over media rows — one decode context
    * per partition, rows streamed through it. */
  def extractFeatures(media: Dataset[MediaRow], frameEvery: Int = 4096): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init (real decoders allocate contexts here)
      rows.map { m =>
        val (ent, mean) = decodeStub(m.payload)
        val frames = if (m.payload.length == 0) 0 else 1 + m.payload.length / frameEvery
        MediaFeatures(m.doc_id, m.mime, m.payload.length.toLong, ent, mean, frames)
      }
    }
  }
}
