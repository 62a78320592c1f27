package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t_pii_scrub: the email/IP patterns must redact real-world literals
  * (the corpus contains none by construction), the corpus-active
  * "customer <tok>" masking must fire, and replacement must be
  * non-overlapping leftmost-first so the DuckDB (RE2) twin agrees. */
class PiiScrubSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ip = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  private val name = "\\bcustomer [a-z]+"

  private def scrub(texts: Seq[String]): Seq[(String, Int, Int)] = {
    import spark.implicits._
    texts.toDF("text").select(
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          email, "<EMAIL>"), ip, "<IP>"), name, "customer <NAME>").as("t"),
        (regexp_count(col("text"), lit(email)) +
          regexp_count(col("text"), lit(ip))).cast("int").as("n_pii"),
        regexp_count(col("text"), lit(name)).cast("int").as("n_name"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
  }

  test("emails and IPv4 literals are redacted with exact counts") {
    val out = scrub(Seq(
      "contact alice.smith+x@mail.example.com or 10.0.0.1 today",
      "no identifiers here",
      "two mails a@b.co c.d@e.org and ip 192.168.1.255 end"))
    assert(out(0) == ("contact <EMAIL> or <IP> today", 2, 0))
    assert(out(1) == ("no identifiers here", 0, 0))
    assert(out(2) == ("two mails <EMAIL> <EMAIL> and ip <IP> end", 3, 0))
  }

  test("customer-name masking is leftmost-first non-overlapping") {
    val out = scrub(Seq(
      "customer alice met customer bob",
      // greedy first match consumes the second "customer" as the name;
      // the third has no following token -> stays unmasked (this is
      // the shared Java/RE2 semantics the oracle relies on)
      "customer customer customer"))
    assert(out(0) == ("customer <NAME> met customer <NAME>", 0, 2))
    assert(out(1) == ("customer <NAME> customer", 0, 1))
  }

  test("fires on the real corpus and hashes are stable") {
    val sfDir = "/root/testdata/sf0.001"
    val df = queries.TextOps.set.queries("t_pii_scrub")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the corpus has no emails/IPs but does contain "customer <tok>"
    assert(rows.map(_.getLong(1)).sum == 0L)
    assert(rows.map(_.getLong(2)).sum > 0L)
    assert(rows.forall(_.getString(3).matches("[0-9a-f]{32}")))
  }
}
