package graft.sources.vortex

import org.apache.hadoop.fs.Path
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** File-set offset: the set of data files already emitted. Robust to
  * any file naming (new files = set difference), at the cost of offset
  * size growing with file count — fine for micro-batch ETL volumes;
  * compaction is a later refinement.
  */
case class VortexOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object VortexOffset {
  def fromJson(s: String): VortexOffset = {
    val t = s.trim.stripPrefix("[").stripSuffix("]").trim
    if (t.isEmpty) VortexOffset(Seq.empty)
    else VortexOffset(t.split("\",\\s*\"").map(_.stripPrefix("\"").stripSuffix("\"")
      .replace("\\\"", "\"").replace("\\\\", "\\")).toSeq)
  }
}

/** Micro-batch streaming source over a (growing) vortex directory:
  * each trigger reads the files that appeared since the last offset.
  * Files are atomic units (self-describing, written once) — exactly
  * the contract the vortex streaming sink provides, so
  * vortex → transform → vortex streaming ETL composes.
  */
class VortexMicroBatchStream(schema: StructType, paths: Seq[String],
                             checkpointLocation: String) extends MicroBatchStream {
  private val spark = SparkSession.active
  private def conf = spark.sessionState.newHadoopConf()

  private def currentFiles: Seq[String] =
    VortexDataSource.listAll(paths, conf).map(_._1.getPath.toString)

  override def initialOffset(): Offset = VortexOffset(Seq.empty)
  override def latestOffset(): Offset = VortexOffset(currentFiles)
  override def deserializeOffset(json: String): Offset = VortexOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[VortexOffset].files.toSet
    val fresh = end.asInstanceOf[VortexOffset].files.filterNot(seen)
    fresh.flatMap { f =>
      val footer = VortexFileReader.readFooter(new Path(f), conf)
      if (footer.chunks.isEmpty) None
      else Some(VortexInputPartition(f, footer.chunks.indices.toArray))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val bc: Broadcast[SerializableConfiguration] =
      spark.sparkContext.broadcast(new SerializableConfiguration(conf))
    new VortexReaderFactory(bc, schema)
  }
}
