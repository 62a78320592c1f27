package graft

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{ColVec, PageCodec, VortexFormat}

/** Unit coverage for stats-based chunk skipping: every operator shape,
  * boundary inclusivity, null-count logic, And/Or composition, and the
  * never-skip fallback for unknown shapes.
  */
class FilterPruningSpec extends AnyFunSuite {
  import graft.sources.vortex.FilterPruning.canSkip

  private val schema = StructType(Seq(
    StructField("x", LongType), StructField("s", StringType),
    StructField("d", DoubleType)))

  /** chunk with x∈[10,20], s∈["bb","dd"], d∈[1.5,2.5], given null counts */
  private def chunk(xNulls: Int = 0, rows: Int = 100): VortexFormat.ChunkMeta = {
    def enc(vals: Array[Long], dt: DataType, nulls: Int): VortexFormat.ColumnChunkMeta = {
      val nullFlags = Array.tabulate(vals.length)(_ < nulls)
      val e = PageCodec.encode(new ColVec(vals.length, nullFlags, vals.clone(), null), dt)
      VortexFormat.ColumnChunkMeta(0, 0, e.encoding, e.compressed, e.nullCount, e.min, e.max)
    }
    def encS(vals: Array[String]): VortexFormat.ColumnChunkMeta = {
      val e = PageCodec.encode(new ColVec(vals.length, new Array[Boolean](vals.length),
        null, vals.map(_.getBytes("UTF-8"))), StringType)
      VortexFormat.ColumnChunkMeta(0, 0, e.encoding, e.compressed, e.nullCount, e.min, e.max)
    }
    val xs = Array.tabulate(rows)(i => 10L + (i % 11))
    val ds = Array.tabulate(rows)(i => java.lang.Double.doubleToLongBits(1.5 + (i % 2) * 1.0))
    VortexFormat.ChunkMeta(rows, Array(
      enc(xs, LongType, xNulls), encS(Array("bb", "cc", "dd")), enc(ds, DoubleType, 0)))
  }

  test("range operators with boundary inclusivity") {
    val c = chunk()
    assert(canSkip(EqualTo("x", 9L), c, schema))
    assert(!canSkip(EqualTo("x", 10L), c, schema))
    assert(!canSkip(EqualTo("x", 20L), c, schema))
    assert(canSkip(EqualTo("x", 21L), c, schema))
    assert(canSkip(GreaterThan("x", 20L), c, schema))      // max == v → skip
    assert(!canSkip(GreaterThanOrEqual("x", 20L), c, schema))
    assert(canSkip(GreaterThanOrEqual("x", 21L), c, schema))
    assert(canSkip(LessThan("x", 10L), c, schema))
    assert(!canSkip(LessThanOrEqual("x", 10L), c, schema))
    assert(canSkip(LessThanOrEqual("x", 9L), c, schema))
    assert(canSkip(In("x", Array(1L, 5L, 9L)), c, schema))
    assert(!canSkip(In("x", Array(1L, 15L)), c, schema))
  }

  test("string and double domains") {
    val c = chunk()
    assert(canSkip(EqualTo("s", "aa"), c, schema))
    assert(!canSkip(EqualTo("s", "cc"), c, schema))
    assert(canSkip(GreaterThan("s", "dd"), c, schema))
    assert(canSkip(EqualTo("d", 3.0), c, schema))
    assert(!canSkip(EqualTo("d", 2.0), c, schema))
  }

  test("null-count based skipping") {
    assert(canSkip(IsNull("x"), chunk(xNulls = 0), schema))
    assert(!canSkip(IsNull("x"), chunk(xNulls = 5), schema))
    assert(canSkip(IsNotNull("x"), chunk(xNulls = 100), schema))
    assert(!canSkip(IsNotNull("x"), chunk(xNulls = 99), schema))
  }

  test("And/Or composition and conservative fallbacks") {
    val c = chunk()
    assert(canSkip(And(EqualTo("x", 9L), EqualTo("s", "cc")), c, schema))
    assert(!canSkip(Or(EqualTo("x", 9L), EqualTo("s", "cc")), c, schema))
    assert(canSkip(Or(EqualTo("x", 9L), EqualTo("s", "aa")), c, schema))
    // unknown column (e.g. a partition col) or unknown shape → never skip
    assert(!canSkip(EqualTo("nope", 1L), c, schema))
    assert(!canSkip(StringContains("s", "c"), c, schema))
  }
}
