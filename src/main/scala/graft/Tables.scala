package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access + temp-view registration for the driver tables
  * (see /root/repo/TESTDATA.md). All queries read parquet from the
  * sf directory passed by the driver; at 100 TB the same code reads
  * from a distributed FS path — nothing here is local-only.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // plan cache: avoids re-inferring parquet schemas on every query
  // (10 tables × ~40 ms adds up across a 70-query suite)
  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    dfCache.computeIfAbsent((spark, dir, name), _ => load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some
      // testdata generations (which Spark's vectorized reader rejects
      // outright — read nanos as long, normalize to µs) and as plain
      // µs in others: branch on the type actually read, so either
      // generation surfaces as the same NTZ µs column (matching how
      // DuckDB surfaces TIMESTAMP; SURVEY.md §1.3 timestamp rule).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val tsExpr = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // NTZ to match how Spark infers the other tables' timestamps
          // (and how DuckDB surfaces TIMESTAMP) — keeps oracle outputs
          // byte-identical under the UTC session.
          org.apache.spark.sql.functions.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        case _ =>
          org.apache.spark.sql.functions.expr("CAST(ts AS TIMESTAMP_NTZ)")
      }
      raw.withColumn("ts", tsExpr)
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views named exactly like the DuckDB
    * oracle's tables so the same SQL text runs on both engines. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registered.add((spark, dir)))
      names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
