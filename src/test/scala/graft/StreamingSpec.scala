package graft

import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventPipelines
import graft.streaming.EventPipelines.Event

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming windowed agg matches the batch result") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 00:45:00"), 2L, "click", 2.0),
      (3L, ts("2024-01-01 01:05:00"), 1L, "view", 3.0),
      (4L, ts("2024-01-01 01:30:00"), 3L, "click", 4.0),
      (5L, ts("2024-01-01 02:10:00"), 1L, "view", 5.0))
    val ms = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sdf = ms.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventPipelines.windowedAgg(sdf).writeStream
      .format("memory").queryName("win_out").outputMode("complete").start()
    ms.addData(rows: _*)
    q.processAllAvailable(); q.stop()

    val got = spark.table("win_out").orderBy("ws", "event_type").collect()
    val batch = EventPipelines.windowedAgg(rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .orderBy("ws", "event_type").collect()
    assert(got.toSeq == batch.toSeq)
    assert(got.length == 4)
  }

  test("e_stream_tumbling shape: complete-mode cents agg into an overwrite sink is replay-idempotent (r15)") {
    import spark.implicits._
    // the oracle row's machinery in miniature: a multi-batch file
    // stream, complete-mode windowedAggCents, each trigger OVERWRITING
    // the vortex sink — running the whole stream TWICE (fresh
    // checkpoint = full replay) must land byte-equal sink contents
    val landing = java.nio.file.Files.createTempDirectory("estream_land").toString
    val sink = java.nio.file.Files.createTempDirectory("estream_sink").toString + "/out"
    val rows = (0 until 500).map { i =>
      (i.toLong, ts(f"2024-01-01 ${i % 5}%02d:${i % 60}%02d:00"),
        (i % 7).toLong, if (i % 3 == 0) "click" else "view", i / 10.0)
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    df.repartition(3).write.mode("overwrite").parquet(landing)
    def runStream(): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("estream_ck").toString
      val ev = spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(landing)
      val q = EventPipelines.windowedAggCents(ev)
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.format("vortex").mode("overwrite").save(sink)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runStream()
    val first = spark.read.format("vortex").load(sink)
      .orderBy("ws", "event_type").collect().toSeq
    runStream() // full replay into the same sink
    val second = spark.read.format("vortex").load(sink)
      .orderBy("ws", "event_type").collect().toSeq
    assert(first == second, "replay must land the identical sink")
    // and the streamed answer equals the batch answer exactly
    val batch = EventPipelines.windowedAggCents(df)
      .orderBy("ws", "event_type").collect().toSeq
    assert(first == batch, "streamed == batch (cents partials are order-exact)")
  }

  test("dropDuplicatesWithinWatermark removes replayed event_ids") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sdf = ms.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventPipelines.dedupWithinWatermark(sdf).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    ms.addData(
      (1L, ts("2024-01-01 00:00:01"), 1L, "click", 1.0),
      (1L, ts("2024-01-01 00:00:01"), 1L, "click", 1.0), // exact replay
      (2L, ts("2024-01-01 00:00:02"), 1L, "click", 1.0))
    q.processAllAvailable()
    ms.addData((1L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0)) // late replay, same id
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("gap sessionization closes sessions after inactivity") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventPipelines.sessionize(ms.toDS(), gapMinutes = 30).writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    // user 1: two events 10 min apart (one session), then 2h gap, then one more
    ms.addData(
      Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 00:10:00"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 02:00:00"), 1, "view", 3.0))
    q.processAllAvailable()
    // advance watermark far past all timeouts
    ms.addData(Event(9, ts("2024-01-02 12:00:00"), 2, "click", 0.0))
    q.processAllAvailable(); q.stop()

    val sess = spark.table("sess_out").orderBy("start")
      .select("user_id", "n_events", "sum_value").collect().map(_.toSeq)
    assert(sess.toSeq == Seq(Seq(1L, 2L, 3.0), Seq(1L, 1L, 3.0)))
  }

  test("streaming sink: writeStream.format(\"vortex\") lands queryable files per epoch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("vortex_stream_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vortex_ckpt_").toString
    val ms = MemoryStream[(Long, String, Double)]
    val q = ms.toDF.toDF("id", "kind", "v").writeStream
      .format("vortex").option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    ms.addData((1L, "a", 1.5), (2L, "b", 2.5))
    q.processAllAvailable()
    ms.addData((3L, "c", 3.5))
    q.processAllAvailable(); q.stop()
    val back = spark.read.format("vortex").load(dir)
    assert(back.count() == 3)
    assert(back.agg(sum("id")).head().getLong(0) == 6L)
    // files from two epochs coexist
    val files = new java.io.File(dir).listFiles.count(_.getName.endsWith(".vortex"))
    assert(files >= 2, s"expected >=2 epoch files, got $files")
  }

  test("streaming source: readStream over a growing vortex directory") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("vortex_src_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vortex_ckpt2_").toString
    spark.range(0, 100).selectExpr("id", "id * 2 AS y")
      .write.format("vortex").mode("append").save(src)
    val stream = spark.readStream.format("vortex").load(src)
      .groupBy().agg(count(lit(1)).as("n"), sum("id").as("s"))
    val q = stream.writeStream.format("memory").queryName("vsrc_out")
      .option("checkpointLocation", ckpt).outputMode("complete").start()
    q.processAllAvailable()
    assert(spark.table("vsrc_out").head().toSeq == Seq(100L, 4950L))
    // new file arrives → next trigger picks up only the delta
    spark.range(100, 150).selectExpr("id", "id * 2 AS y")
      .write.format("vortex").mode("append").save(src)
    q.processAllAvailable(); q.stop()
    assert(spark.table("vsrc_out").head().toSeq == Seq(150L, (0L until 150L).sum))
  }

  test("streaming source: restart from checkpoint resumes with compacted offsets") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("vortex_src3_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vortex_ckpt3_").toString
    val out = java.nio.file.Files.createTempDirectory("vortex_out3_").toString
    spark.range(0, 50).selectExpr("id").write.format("vortex").mode("append").save(src)
    def run(): Unit = {
      val stream = spark.readStream.format("vortex").load(src)
      // file sink supports checkpoint recovery; each micro-batch's rows
      // land once — duplicates after restart would inflate the count
      val q = stream.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 50)
    // offset in the checkpoint is the compacted watermark form
    val off = java.nio.file.Files.list(java.nio.file.Paths.get(ckpt, "offsets"))
      .iterator().asScala.toSeq.maxBy(_.getFileName.toString)
    val text = new String(java.nio.file.Files.readAllBytes(off))
    assert(text.contains("\"m\""), s"expected compacted offset, got: $text")
    // RESTART with new files present: only the delta may be read
    spark.range(50, 80).selectExpr("id").write.format("vortex").mode("append").save(src)
    run()
    assert(spark.read.parquet(out).count() == 80)
    assert(spark.read.parquet(out).agg(sum("id")).head().getLong(0) == (0L until 80L).sum)
  }

  test("multimodal: binary payload + batched feature extraction") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val media = graft.operators.Multimodal.toMedia(docs)
    val feats = graft.operators.Multimodal.extractFeatures(media)
    val joined = feats.toDF().join(docs, "doc_id")
    assert(joined.count() == docs.count())
    // payload is the text bytes → n_bytes == n_chars (ascii corpus)
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).count() == 0)
    assert(feats.filter(col("entropy") <= 0 || col("mean_byte") <= 0).count() == 0)
    assert(media.toDF().schema("payload").dataType.typeName == "binary")
    // resize: payload bounded by w*h, metadata updated, row count kept
    val small = graft.operators.Multimodal.resize(media, 8, 8)
    assert(small.count() == docs.count())
    assert(small.filter(octet_length(col("payload")) > 64).count() == 0)
    assert(small.filter(col("width") =!= 8 || col("height") =!= 8).count() == 0)
    // frame sampling: ceil(len/stride) frames per doc, each ≤ frameLen
    val frames = graft.operators.Multimodal.sampleFrames(media, stride = 50, frameLen = 16)
    val perDoc = frames.groupBy("doc_id").count()
      .join(media.toDF().select(col("doc_id"), octet_length(col("payload")).as("n")), "doc_id")
    assert(perDoc.filter(col("count") =!= ceil(col("n") / 50.0)).count() == 0)
    assert(frames.filter(octet_length(col("frame")) > 16).count() == 0)
  }

  test("streaming content dedup keeps one doc per canonical text within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String)]
    val sdf = ms.toDF.toDF("doc_id", "ts", "text")
    val q = EventPipelines.dedupContent(sdf, "text", "ts").writeStream
      .format("memory").queryName("cdedup_out").outputMode("append").start()
    ms.addData(
      (1L, ts("2024-01-01 00:00:01"), "the quick   brown fox"),
      (2L, ts("2024-01-01 00:00:02"), "The Quick Brown\tFox"), // same canon
      (3L, ts("2024-01-01 00:00:03"), "a different document"))
    q.processAllAvailable()
    ms.addData((4L, ts("2024-01-01 00:10:00"), "the quick brown fox")) // replay inside horizon
    q.processAllAvailable(); q.stop()
    val kept = spark.table("cdedup_out").select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept.length == 2)                 // one fox, one other doc
    assert(kept.contains(3L))
    assert((kept.toSet - 3L).subsetOf(Set(1L, 2L)))
    // the fingerprint helper column must not leak into the output
    assert(!spark.table("cdedup_out").columns.contains("__fp"))
  }
}
