package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Spark half of the randomized differential-testing harness
  * (tools/fuzz_diff.py): read a {name: sql} JSON of generated ANSI
  * queries, run each over the registered parquet tables, dump one
  * parquet per query for the DuckDB compare. Mirrors Verify exactly
  * (same session config, same failure convention) so a fuzz mismatch
  * is attributable to the query semantics, not the harness.
  * Usage: runMain graft.FuzzRun <sfDir> <outDir> <queries.json>
  */
object FuzzRun {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, qfile) = (args(0), args(1), args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // extra generator-built tables (nested/decimal coverage):
    // GRAFT_FUZZ_EXTRA = "name=/abs/file.parquet,name2=..." — registered
    // like the standard tables in both modes
    // fail fast on malformed entries: a missing '=' or a dangling path
    // would otherwise surface as a bare MatchError / a silent
    // length-0-mtime-0 cache-key contribution (stale vortex copy)
    val extras: Seq[(String, String)] = sys.env.get("GRAFT_FUZZ_EXTRA").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(n, p) if n.nonEmpty && p.nonEmpty =>
            require(new java.io.File(p).isFile,
              s"GRAFT_FUZZ_EXTRA entry '$kv': file does not exist: $p")
            (n, p)
          case _ => throw new IllegalArgumentException(
            s"GRAFT_FUZZ_EXTRA entry '$kv' is not of the form name=/abs/file.parquet")
        }
      }
    if (sys.env.get("GRAFT_FUZZ_VORTEX").contains("1")) {
      // vortex-mode: every table view is a vortex COPY of the parquet
      // original, so random predicates/projections exercise the whole
      // write → manifest → scan → pushdown stack while DuckDB still
      // reads the parquet originals — a storage-level differential.
      // cache key = canonical path + every table file's (size, mtime):
      // distinct sf dirs never collide on a basename, and testdata
      // REGENERATED IN PLACE (the driver does this each round) gets a
      // fresh copy instead of silently diffing stale vortex data
      // against fresh parquet
      val sig = (Tables.names.map { n =>
        val f = new java.io.File(sfDir, s"$n.parquet")
        s"$n:${f.length}:${f.lastModified}"
      } ++ extras.map { case (n, p) =>
        val f = new java.io.File(p)
        s"$n:${f.length}:${f.lastModified}"
      }).mkString("|")
      // collision-resistant digest — a 32-bit hashCode can collide
      // across signature strings and silently reuse a stale copy
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest((new java.io.File(sfDir).getCanonicalPath + "|" + sig).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val vroot = s"/tmp/fuzz_vortex_${new java.io.File(sfDir).getName}_$key"
      val srcs: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
        Tables.names.map(n => (n, () => Tables.t(spark, sfDir, n))) ++
          extras.map { case (n, p) => (n, () => spark.read.parquet(p)) }
      srcs.foreach { case (n, src) =>
        val dir = new java.io.File(s"$vroot/$n")
        // a crashed first copy leaves the dir without a committed
        // manifest — repair by recopying instead of failing every
        // query forever
        val committed = Option(new java.io.File(dir, "_manifests").listFiles())
          .exists(_.exists(_.getName.endsWith(".json")))
        if (!committed) {
          if (dir.exists()) {
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
            }
            rm(dir)
          }
          sources.vortex.VortexBulkCopy.copy(src(), dir.getPath)
        }
        spark.read.format("vortex").load(dir.getPath).createOrReplaceTempView(n)
      }
    } else {
      Tables.registerAll(spark, sfDir)
      extras.foreach { case (n, p) =>
        spark.read.parquet(p).createOrReplaceTempView(n) }
    }
    // tiny flat-JSON reader ({"k":"v",...}, values escaped by the
    // generator with json.dumps): no JSON library on the classpath
    val raw = Files.readString(Paths.get(qfile))
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    def unesc(s: String): String = {
      val b = new StringBuilder; var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => b.append('\n'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 'u' => b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case o   => b.append(o); i += 2
          }
        } else { b.append(c); i += 1 }
      }
      b.toString
    }
    entry.findAllMatchIn(raw).foreach { m =>
      val (name, sql) = (unesc(m.group(1)), unesc(m.group(2)))
      try spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        // fatal JVM errors (OOM, linkage) must kill the run — a JVM in
        // an undefined state would misattribute every later query
        System.err.println(s"[fuzz] $name failed: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    spark.stop()
  }
}
