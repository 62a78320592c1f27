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

  /** STUB resize: a real implementation rescales pixels through the
    * partition-local codec context; the stub deterministically samples
    * the payload down to w·h bytes. Schema, metadata propagation, and
    * the partition-batched execution are the real pipeline. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val target = math.max(1, w * h)
        val out =
          if (m.payload.length <= target) m.payload
          else {
            val res = new Array[Byte](target)
            var i = 0
            while (i < target) {
              res(i) = m.payload((i.toLong * m.payload.length / target).toInt)
              i += 1
            }
            res
          }
        m.copy(payload = out, width = w, height = h)
      }
    }
  }

  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: one `frameLen`-byte frame every `stride` payload
    * bytes (a real video decoder emits decoded frames at the same
    * positions). Fan-out is per-row bounded by payload size — the
    * flatMap shape that distributes at any corpus scale. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4096,
                   frameLen: Int = 256): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      if (m.payload.length == 0) Iterator.empty
      else Iterator.range(0, m.payload.length, stride).zipWithIndex.map { case (off, idx) =>
        MediaFrame(m.doc_id, idx,
          java.util.Arrays.copyOfRange(m.payload, off, math.min(off + frameLen, m.payload.length)))
      }
    }
  }
}
