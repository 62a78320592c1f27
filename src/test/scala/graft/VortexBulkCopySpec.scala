package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{StatsManifest, VortexBulkCopy}

/** VortexBulkCopy: the COPY-style vectorized ingest path must be
  * indistinguishable from the DSv2 row path — same data, same stats
  * manifest (incl. exact SUM sums), same pruning behavior — and must
  * fall back to the row path for any plan that is not a bare columnar
  * scan. */
class VortexBulkCopySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("vortex_copy_").toString

  /** a parquet-backed frame (vectorized scan → columnar plan) covering
    * every fast-path type plus nulls and a nested column */
  private def sourceDf = {
    val pq = tmp() + "/src.parquet"
    spark.range(0, 10000).selectExpr(
      "CAST(id % 2 = 0 AS BOOLEAN) AS c_bool",
      "CAST(id % 100 AS TINYINT) AS c_byte",
      "CAST(id % 30000 AS SMALLINT) AS c_short",
      "CAST(id AS INT) AS c_int",
      "id AS c_long",
      "CAST(id AS FLOAT) / 3 AS c_float",
      "CAST(id AS DOUBLE) / 7 AS c_double",
      "CAST(id AS DECIMAL(18,2)) / 100 AS c_dec",
      "CAST(id AS DECIMAL(38,4)) * 1000000 AS c_bigdec",
      "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('row_', id) END AS c_str",
      "CAST(concat('b', id) AS BINARY) AS c_bin",
      "DATE_ADD(DATE'2024-01-01', CAST(id % 365 AS INT)) AS c_date",
      "TIMESTAMP_MICROS(id * 1000000) AS c_ts",
      "CASE WHEN id % 11 = 0 THEN NULL ELSE id END AS c_nullable_long",
      "array(id, id + 1) AS c_arr")
      .write.mode("overwrite").parquet(pq)
    spark.read.parquet(pq)
  }

  test("columnar path fires for a bare scan and matches the row path byte-for-byte") {
    val df = sourceDf
    assert(VortexBulkCopy.isColumnar(df), "bare parquet scan must take the vectorized path")

    val viaCopy = tmp()
    val viaRows = tmp()
    VortexBulkCopy.copy(df, viaCopy, chunkRows = 1024)
    df.write.format("vortex").option("chunkRows", "1024").mode("overwrite").save(viaRows)

    val a = spark.read.format("vortex").load(viaCopy)
    val b = spark.read.format("vortex").load(viaRows)
    assert(a.schema == b.schema)
    assert(a.count() == 10000 && b.count() == 10000)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    // identical stats manifests (modulo file names): recorded schema,
    // row counts, and the writers' exact column sums for SUM pushdown
    val hconf = spark.sessionState.newHadoopConf()
    def manifest(dir: String): (Option[org.apache.spark.sql.types.StructType],
                                Seq[StatsManifest.FileStats]) = {
      val (sch, m) = StatsManifest.readAll(new org.apache.hadoop.fs.Path(dir), hconf)
      (sch, m.values.toSeq)
    }
    val (schA, ma) = manifest(viaCopy)
    val (schB, mb) = manifest(viaRows)
    assert(ma.nonEmpty && mb.nonEmpty, "both paths must write a stats manifest")
    assert(schA == schB, "both paths must record the same manifest schema")
    assert(ma.map(_.rows).sum == mb.map(_.rows).sum)
    def colSums(m: Seq[StatsManifest.FileStats]): Map[String, Option[Long]] =
      m.flatMap(_.cols).groupBy(_.name).map { case (n, cs) =>
        n -> (if (cs.exists(_.sum.isEmpty)) None
              else Some(cs.flatMap(_.sum).sum))
      }
    assert(colSums(ma) == colSums(mb),
      "exact column sums must ride the bulk-copy manifest identically")
  }

  test("SUM/count pushdown answers from the bulk-copied manifest") {
    val df = sourceDf
    val dir = tmp()
    VortexBulkCopy.copy(df, dir)
    val back = spark.read.format("vortex").load(dir)
    val expect = df.agg(sum("c_long"), sum("c_nullable_long"), count(lit(1))).collect()(0)
    val got = back.agg(sum("c_long"), sum("c_nullable_long"), count(lit(1))).collect()(0)
    assert(got == expect)
  }

  test("non-columnar plans fall back to the row path with identical results") {
    val df = sourceDf.filter(col("c_long") % 3 === 0)
      .selectExpr("c_long", "c_str", "CAST(c_double AS DECIMAL(12,3)) AS d3")
    // a projection with casts is row-based above the scan
    val dir = tmp()
    VortexBulkCopy.copy(df, dir, chunkRows = 512)
    val back = spark.read.format("vortex").load(dir)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("overwrite replaces files and refreshes the manifest") {
    val dir = tmp()
    val df = sourceDf
    VortexBulkCopy.copy(df, dir)
    assert(spark.read.format("vortex").load(dir).count() == 10000)
    VortexBulkCopy.copy(df.limit(0), dir) // empty overwrite → empty dataset
    assert(spark.read.format("vortex").load(dir).count() == 0)
    VortexBulkCopy.copy(df, dir)
    assert(spark.read.format("vortex").load(dir).count() == 10000)
    val sums = spark.read.format("vortex").load(dir).agg(sum("c_long")).collect()(0).getLong(0)
    assert(sums == (0L until 10000L).sum)
  }

  test("fresh-write commit failure demotes promoted files (empty old state restored)") {
    val dir = tmp() + "/ds"
    new java.io.File(dir).mkdirs()
    // sabotage: occupy the manifest directory's name with a plain FILE
    // so StatsManifest.write inside commitJob fails AFTER the part
    // files were promoted. overwrite=false keeps the sabotage alive
    // (truncate would delete it first) — this is the append-into-empty
    // shape the advisor flagged: pre-fix, the promoted parts stayed
    // reader-visible via the footer fallback and a retried append
    // would have duplicated every row.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, graft.sources.vortex.StatsManifest.DirName),
      "not a directory")
    val df = sourceDf
    intercept[Exception] { VortexBulkCopy.copy(df, dir, overwrite = false) }
    val left = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty).map(_.getName)
    assert(!left.exists(_.endsWith(".vortex")),
      s"commit failure on a fresh write left reader-visible parts: ${left.mkString(", ")}")
  }

  test("tasks never rename: only driver-claimed files become data, tmp files are swept") {
    // exactly-once contract: tasks write dot-hidden `.…inprogress`
    // files and the DRIVER promotes exactly the claimed set at commit,
    // so a speculative/retried attempt can never land a readable
    // duplicate. Observable invariants: a stale tmp file (a crashed
    // prior job's leftover) stays invisible and untouched, this job's
    // tmp files are all gone, and the count is exact.
    val dir = tmp()
    val hconf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(hconf)
    fs.mkdirs(root)
    val stale = new org.apache.hadoop.fs.Path(root, ".part-00000-deadbeef-1.vortex.inprogress")
    fs.create(stale, true).close()
    VortexBulkCopy.copy(sourceDf, dir, overwrite = false)
    assert(spark.read.format("vortex").load(dir).count() == 10000)
    val leftovers = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.endsWith(".inprogress")).toSeq
    assert(leftovers == Seq(stale.getName),
      s"only the other job's stale tmp may remain, got $leftovers")
    // vacuum is the cleanup path for exactly such foreign leftovers:
    // a fresh tmp survives (TTL protects live writers), an aged one goes
    assert(graft.sources.vortex.VortexMaintenance.vacuum(spark, dir) == 0)
    assert(fs.exists(stale))
    assert(graft.sources.vortex.VortexMaintenance.vacuum(spark, dir, ttlMs = -1) == 1)
    assert(!fs.exists(stale))
    assert(spark.read.format("vortex").load(dir).count() == 10000)
  }

  test("empty input produces a readable zero-row dataset like the row path") {
    // a bare scan of an EMPTY parquet keeps the columnar path (a
    // filter would fall back to the row path and dodge the case)
    val pq = tmp() + "/empty.parquet"
    sourceDf.filter(lit(false)).write.parquet(pq)
    val df = spark.read.parquet(pq)
    assert(VortexBulkCopy.isColumnar(df), "empty bare scan must stay columnar")
    val dir = tmp()
    VortexBulkCopy.copy(df, dir)
    assert(spark.read.format("vortex").load(dir).count() == 0)
    assert(spark.read.format("vortex").load(dir).schema == df.schema)
  }

  test("bloom column validation does not depend on which path the plan takes") {
    val columnar = sourceDf                       // bare scan → vectorized path
    val rowPath = sourceDf.selectExpr("CAST(c_long AS STRING) AS c_long2") // cast → row path
    assert(VortexBulkCopy.isColumnar(columnar) && !VortexBulkCopy.isColumnar(rowPath))
    val e1 = intercept[IllegalArgumentException] {
      VortexBulkCopy.copy(columnar, tmp(), bloomCols = Set("no_such_col"))
    }
    assert(e1.getMessage.contains("not in schema"))
    val e2 = intercept[IllegalArgumentException] {
      VortexBulkCopy.copy(rowPath, tmp(), bloomCols = Set("no_such_col"))
    }
    assert(e2.getMessage.contains("not in schema"))
  }

  test("multi-chunk boundaries: batch larger than chunkRows splits exactly") {
    val dir = tmp()
    VortexBulkCopy.copy(sourceDf, dir, chunkRows = 100) // 10k rows → ≥100 chunks
    val back = spark.read.format("vortex").load(dir)
    assert(back.count() == 10000)
    assert(back.agg(sum("c_int")).collect()(0).getLong(0) == (0L until 10000L).sum)
    // null flags land in the right chunk-local slots
    assert(back.filter(col("c_str").isNull).count() ==
      sourceDf.filter(col("c_str").isNull).count())
  }
}
