package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.1 S1–S4 + P1/P2 over the custom `vortex` DataSource:
  * write → read round trips with count/projection/filter on top.
  * Oracles run the equivalent query on the original parquet tables —
  * round-trip identity makes them equal iff the format is lossless.
  */
object VortexQueries {
  val set = new QuerySet
  import set._

  /** Per-(query, sf) scratch dir for vortex files. */
  private def vdir(name: String, sfDir: String): String = {
    val sf = new java.io.File(sfDir).getName
    s"${sys.props("java.io.tmpdir")}/graft_vortex/$sf/$name"
  }

  private def writeRead(s: SparkSession, df: DataFrame, dir: String,
                        opts: Map[String, String] = Map.empty): DataFrame = {
    df.write.format("vortex").options(opts).mode("overwrite").save(dir)
    s.read.format("vortex").load(dir)
  }

  // S1: single-table round trip + scan aggregate
  spark("s1_vortex_count",
    (s, d) => {
      val v = writeRead(s, Tables.t(s, d, "lineitem"), vdir("s1", d))
      v.agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_key"))
    },
    "SELECT count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS sum_key FROM lineitem")

  // S2: multi-file write, glob read
  spark("s2_vortex_glob",
    (s, d) => {
      val dir = vdir("s2", d)
      Tables.t(s, d, "orders").repartition(2)
        .write.format("vortex").mode("overwrite").save(dir)
      s.read.format("vortex").load(s"$dir/*.vortex")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_key"))
    },
    "SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_key FROM orders")

  // S3: typed round trip (the reference's table.test shape over driver
  // data): full ordered dump of a multi-type projection after vortex
  // write→read, incl. the UBIGINT→DECIMAL(20,0) mapping.
  spark("s3_vortex_types",
    (s, d) => {
      val df = Tables.t(s, d, "orders").selectExpr(
        "o_orderkey",
        "CAST(o_orderkey AS DECIMAL(20,0)) AS c_ubig",
        "CAST(o_orderkey % 128 AS TINYINT) AS c_byte",
        "CAST(o_orderkey % 32000 AS SMALLINT) AS c_short",
        "CAST(o_orderkey AS INT) AS c_int",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS c_dec",
        "CAST(o_totalprice AS FLOAT) AS c_float",
        "o_totalprice AS c_double",
        "o_orderstatus AS c_str",
        "CAST(o_orderdate AS DATE) AS c_date",
        "o_orderdate AS c_ts",
        "CAST(o_orderkey % 2 = 0 AS BOOLEAN) AS c_bool")
      // decimal columns round-trip through the format as DECIMAL; only
      // the *surfaced* output is double (driver canon, see Relational)
      writeRead(s, df, vdir("s3", d))
        .withColumn("c_ubig", col("c_ubig").cast("double"))
        .withColumn("c_dec", col("c_dec").cast("double"))
        .orderBy("o_orderkey")
    },
    """SELECT o_orderkey,
      |  CAST(CAST(o_orderkey AS DECIMAL(20,0)) AS DOUBLE) AS c_ubig,
      |  CAST(o_orderkey % 128 AS TINYINT) AS c_byte,
      |  CAST(o_orderkey % 32000 AS SMALLINT) AS c_short,
      |  CAST(o_orderkey AS INT) AS c_int,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS c_dec,
      |  CAST(o_totalprice AS FLOAT) AS c_float,
      |  o_totalprice AS c_double,
      |  o_orderstatus AS c_str,
      |  CAST(o_orderdate AS DATE) AS c_date,
      |  o_orderdate AS c_ts,
      |  o_orderkey % 2 = 0 AS c_bool
      |FROM orders ORDER BY o_orderkey""".stripMargin)

  // S4: multi-chunk write (forced small chunks) + aggregate
  spark("s4_vortex_multichunk",
    (s, d) => {
      val v = writeRead(s, Tables.t(s, d, "lineitem").repartition(1), vdir("s4", d),
        Map("chunkRows" -> "8192"))
      v.agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
    },
    """SELECT count(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem""".stripMargin)

  // S5: nested types — the embeddings table (list<float>) through the
  // format; oracle reads the original parquet (round-trip identity).
  spark("s5_vortex_nested",
    (s, d) => {
      val v = writeRead(s, Tables.t(s, d, "embeddings"), vdir("s5", d))
      v.selectExpr("vec_id", "label",
          "CAST(size(embedding) AS BIGINT) AS dim",
          "CAST(CAST(element_at(embedding, 1) AS DECIMAL(18,6)) AS DOUBLE) AS e1")
        .orderBy("vec_id")
    },
    """SELECT vec_id, label, CAST(len(embedding) AS BIGINT) AS dim,
      |  CAST(CAST(embedding[1] AS DECIMAL(18,6)) AS DOUBLE) AS e1
      |FROM embeddings ORDER BY vec_id""".stripMargin)

  // S7: partitioned layout end-to-end — write lineitem partitioned by
  // returnflag, read back with a partition filter (pruned to one
  // directory subtree before any footer I/O).
  spark("s7_vortex_partitioned",
    (s, d) => {
      val dir = vdir("s7", d)
      Tables.t(s, d, "lineitem")
        .write.format("vortex").option("partitionBy", "l_returnflag")
        .mode("overwrite").save(dir)
      s.read.format("vortex").load(dir)
        .filter(col("l_returnflag") === "A")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_qty"))
    },
    """SELECT count(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem WHERE l_returnflag = 'A'""".stripMargin)

  // P1 over vortex: projection subset (column pruning reaches the scan)
  spark("p1_vortex_project",
    (s, d) => {
      val v = writeRead(s, Tables.t(s, d, "lineitem"), vdir("p1v", d))
      v.select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    },
    """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin)

  // P2 over vortex: timestamp filter over the scan (the reference's
  // timestamp.test:38-47 proof) — sorted write makes chunk stats
  // disjoint so the filter prunes chunks, not just rows.
  spark("p2_vortex_filter",
    (s, d) => {
      val dir = vdir("p2v", d)
      Tables.t(s, d, "events").repartition(1).sortWithinPartitions("ts")
        .write.format("vortex").option("chunkRows", "2048").mode("overwrite").save(dir)
      s.read.format("vortex").load(dir)
        .filter(col("ts") > expr("TIMESTAMP_NTZ '2024-01-15 00:00:00'"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_user"))
    },
    """SELECT count(*) AS n, CAST(sum(user_id) AS BIGINT) AS sum_user FROM events
      |WHERE ts > TIMESTAMP '2024-01-15 00:00:00'""".stripMargin)

  // S8: hash-bucketed layout (bucketBy role) — write orders bucketed by
  // o_custkey; the IN-filter read plans only the literals' buckets
  // (tier-0.5 pruning: 1/16 of files per key), then aggregates.
  // Oracle: same query on the original parquet (round-trip identity —
  // bucketing is layout, not semantics).
  spark("s8_vortex_bucketed",
    (s, d) => {
      val dir = vdir("s8", d)
      Tables.t(s, d, "orders")
        .write.format("vortex")
        .option("bucketBy", "o_custkey").option("buckets", "16")
        .mode("overwrite").save(dir)
      s.read.format("vortex").load(dir)
        .filter(col("o_custkey").isin(1L, 2L, 3L, 4L, 5L, 6L, 7L))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_price"))
    },
    """SELECT count(*) AS n, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_custkey IN (1,2,3,4,5,6,7)""".stripMargin)
}
