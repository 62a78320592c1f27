package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface coverage for the vortex DataSource (SURVEY.md §2.1 S7):
  * CREATE TABLE ... USING vortex, INSERT INTO ... SELECT, SELECT back —
  * the Spark equivalent of the reference's staging-table flow
  * (table.test:8-27,30-50).
  */
class VortexSqlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("CREATE TABLE USING vortex + INSERT INTO + SELECT round trip") {
    val dir = Files.createTempDirectory("vortex_sql_").toString
    spark.sql("DROP TABLE IF EXISTS vtx_stage")
    spark.sql(
      s"""CREATE TABLE vtx_stage (id BIGINT, label STRING, price DECIMAL(10,2))
         |USING vortex OPTIONS (path '$dir')""".stripMargin)
    spark.sql(
      """INSERT INTO vtx_stage
        |SELECT id, concat('Value ', id), CAST(id AS DECIMAL(10,2)) / 4
        |FROM range(0, 1000)""".stripMargin)
    val out = spark.sql(
      "SELECT count(*) AS n, sum(id) AS s, max(label) AS ml FROM vtx_stage").head()
    assert(out.getLong(0) == 1000L)
    assert(out.getLong(1) == (0L until 1000L).sum)
    assert(out.getString(2) == "Value 999")
    // second INSERT appends
    spark.sql("INSERT INTO vtx_stage SELECT id, 'x', 0.0 FROM range(0, 10)")
    assert(spark.sql("SELECT count(*) FROM vtx_stage").head().getLong(0) == 1010L)
    spark.sql("DROP TABLE vtx_stage")
  }

  test("filter + projection pushdown visible in SQL explain") {
    val dir = Files.createTempDirectory("vortex_sql2_").toString
    spark.range(0, 10000).selectExpr("id", "id * 2 AS y", "concat('s', id) AS s")
      .write.format("vortex").mode("append").save(dir)
    spark.read.format("vortex").load(dir).createOrReplaceTempView("vtx_view")
    val df = spark.sql("SELECT y FROM vtx_view WHERE id > 9000")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("GreaterThan(id,9000)"), s"pushdown missing in plan:\n$desc")
    assert(df.count() == 999)
  }
}
