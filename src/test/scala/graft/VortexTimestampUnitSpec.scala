package graft

import java.nio.file.Files
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{VortexFileReader, VortexFormat}

/** Timestamp storage units in the vortex format (reference parity:
  * TIMESTAMP_S/MS/µs/NS are distinct round-tripping types in
  * /root/reference/test/sql/table.test:22-25, and cross-precision
  * comparison is exact in timestamp.test:28-37). Spark's in-memory
  * timestamp is always µs, so the unit is carried as field metadata
  * (VortexFormat.TsUnitKey) inside the footer schema; the file stores
  * unit-scaled longs.
  */
class VortexTimestampUnitSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("vortex_tsu_").toString

  // whole-second instants + one with µs residue
  private def df = spark.range(0, 50).selectExpr(
    "id",
    "timestampadd(SECOND, CAST(id AS INT), TIMESTAMP_NTZ '2020-01-01 00:00:00') AS ts_sec",
    "timestampadd(MICROSECOND, CAST(id * 1000001 AS INT), TIMESTAMP_NTZ '2020-01-01 00:00:00') AS ts_us")

  private def units(dir: String): Map[String, String] = {
    val conf = new Configuration()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val file = fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".vortex")).head
    val footer = VortexFileReader.readFooter(file, conf)
    footer.schema.fields.map(f => f.name -> VortexFormat.tsUnit(f)).toMap
  }

  test("ns unit round-trips µs values exactly; unit recorded in footer") {
    val dir = tmp()
    df.write.format("vortex").option("timestampUnits", "ts_us=ns").mode("append").save(dir)
    assert(units(dir)("ts_us") == "ns")
    assert(units(dir)("ts_sec") == "us")
    val back = spark.read.format("vortex").load(dir)
    assert(back.orderBy("id").select("ts_us").collect().toSeq ==
           df.orderBy("id").select("ts_us").collect().toSeq)
  }

  test("s/ms units truncate like a precision downcast") {
    val dir = tmp()
    df.write.format("vortex")
      .option("timestampUnits", "ts_us=ms, ts_sec=s").mode("append").save(dir)
    assert(units(dir) == Map("id" -> "us", "ts_sec" -> "s", "ts_us" -> "ms"))
    val back = spark.read.format("vortex").load(dir)
    val exp = df.select(col("id"),
      date_trunc("second", col("ts_sec")).cast("timestamp_ntz").as("ts_sec"),
      date_trunc("millisecond", col("ts_us")).cast("timestamp_ntz").as("ts_us"))
    assert(back.orderBy("id").collect().toSeq == exp.orderBy("id").collect().toSeq)
    // whole-second values are exact at unit s
    assert(back.orderBy("id").select("ts_sec").collect().toSeq ==
           df.orderBy("id").select("ts_sec").collect().toSeq)
  }

  test("read → write restores the original unit without re-declaring it") {
    val d1 = tmp(); val d2 = tmp()
    df.write.format("vortex").option("timestampUnits", "ts_sec=s,ts_us=ns")
      .mode("append").save(d1)
    val back = spark.read.format("vortex").load(d1)
    back.write.format("vortex").mode("append").save(d2) // no option
    assert(units(d2) == Map("id" -> "us", "ts_sec" -> "s", "ts_us" -> "ns"))
    assert(spark.read.format("vortex").load(d2).orderBy("id").collect().toSeq ==
           back.orderBy("id").collect().toSeq)
  }

  test("cross-precision equality (≙ reference timestamp.test:28-37)") {
    val dirs = Seq("s", "ms", "us", "ns").map { u =>
      val d = tmp()
      df.select("id", "ts_sec").write.format("vortex")
        .option("timestampUnits", s"ts_sec=$u").mode("append").save(d)
      d
    }
    val rows = dirs.map(d => spark.read.format("vortex").load(d)
      .orderBy("id").select("ts_sec").collect().toSeq)
    assert(rows.forall(_ == rows.head), "same instants must compare equal across units")
  }

  test("chunk pruning on a unit-scaled column never drops matching rows") {
    val dir = tmp()
    // many small chunks so min/max pruning actually has boundaries to cut
    df.write.format("vortex").option("chunkRows", "8")
      .option("timestampUnits", "ts_us=ms,ts_sec=s").mode("append").save(dir)
    val back = spark.read.format("vortex").load(dir)
    // constants deliberately NOT aligned to ms/s ticks → pruning must
    // fall back to no-skip, not skip wrongly
    for (cut <- Seq("2020-01-01 00:00:10.5", "2020-01-01 00:00:25.000001")) {
      val got = back.filter(col("ts_us") < lit(cut).cast("timestamp_ntz")).count()
      val expMs = df.select(date_trunc("millisecond", col("ts_us")).as("t"))
        .filter(col("t") < lit(cut).cast("timestamp_ntz")).count()
      assert(got == expMs, s"ms column at cut $cut")
      val got2 = back.filter(col("ts_sec") >= lit(cut).cast("timestamp_ntz")).count()
      val exp2 = df.filter(col("ts_sec") >= lit(cut).cast("timestamp_ntz")).count()
      assert(got2 == exp2, s"s column at cut $cut")
    }
    // aligned constants exercise the exact-conversion skip path
    val aligned = back.filter(col("ts_sec") < lit("2020-01-01 00:00:10").cast("timestamp_ntz")).count()
    assert(aligned == 10)
  }
}
