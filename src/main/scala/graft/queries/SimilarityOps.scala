package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** North-star similarity search over `embeddings` (SURVEY.md §2.11).
  *
  * Exactness discipline: dot products and squared norms are computed in
  * DECIMAL (inputs cast to DECIMAL(18,9) per element, order-independent
  * exact sums) so Spark and DuckDB agree bit-for-bit; thresholds are
  * evaluated as exact decimal predicates (cos ≥ τ ⟺ dot² ≥ τ²·|a|²·|b|²
  * for dot > 0) — no float boundary flakiness. Cosine is surfaced as
  * DECIMAL(18,4) for output only.
  *
  * Scale path: brute-force is the correctness baseline (O(n·q), fine
  * when the query set broadcasts); the IVF-style variant prunes by a
  * coarse partition (label) before scoring — the 100 TB shape where
  * each probe touches one bucket instead of the full corpus.
  */
object SimilarityOps {
  val set = new QuerySet
  import set._

  /** vec_id, e (array<double>), dot-with-self (decimal) per vector. */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
      .withColumn("saa", expr(dotExpr("e", "e")))

  /** Exact decimal dot product of two array<double> columns. */
  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DECIMAL(18,9)) * CAST(y AS DECIMAL(18,9))), " +
      "CAST(0 AS DECIMAL(38,18)), (acc, v) -> CAST(acc + v AS DECIMAL(38,18)))"

  private val oracleVecs =
    """v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |el AS (SELECT vec_id, i, CAST(e[CAST(i AS INTEGER) + 1] AS DECIMAL(18,9)) AS x
      |       FROM v, range(0, 64) r(i)),
      |nrm AS (SELECT vec_id, CAST(sum(x * x) AS DECIMAL(38,18)) AS saa FROM el GROUP BY vec_id)""".stripMargin

  // Near-duplicate pairs: cosine ≥ 0.95 via the exact decimal predicate.
  spark("v_cos_neardup",
    (s, d) => {
      val v = vecs(s, d).cache()
      v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
        .withColumn("dot", expr(dotExpr("a.e", "b.e")))
        .filter(col("dot") > 0 &&
          expr("CAST(dot AS DECIMAL(12,6)) * CAST(dot AS DECIMAL(12,6)) >= " +
               "(CAST(0.9025 AS DECIMAL(6,4)) * CAST(a.saa AS DECIMAL(12,6))) * CAST(b.saa AS DECIMAL(12,6))"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          expr("CAST(CAST(dot AS DOUBLE) / (sqrt(CAST(a.saa AS DOUBLE)) * sqrt(CAST(b.saa AS DOUBLE))) AS DECIMAL(18,4))").as("cos"))
        .orderBy("id_a", "id_b")
    },
    s"""WITH $oracleVecs,
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |             CAST(sum(ea.x * eb.x) AS DECIMAL(38,18)) AS dot
       |      FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id
       |        JOIN el ea ON ea.vec_id = a.vec_id
       |        JOIN el eb ON eb.vec_id = b.vec_id AND ea.i = eb.i
       |      GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  CAST(CAST(dot AS DOUBLE) / (sqrt(CAST(na.saa AS DOUBLE)) * sqrt(CAST(nb.saa AS DOUBLE))) AS DECIMAL(18,4)) AS cos
       |FROM p JOIN nrm na ON p.id_a = na.vec_id JOIN nrm nb ON p.id_b = nb.vec_id
       |WHERE dot > 0 AND CAST(dot AS DECIMAL(12,6)) * CAST(dot AS DECIMAL(12,6)) >=
       |      (CAST(0.9025 AS DECIMAL(6,4)) * CAST(na.saa AS DECIMAL(12,6))) * CAST(nb.saa AS DECIMAL(12,6))
       |ORDER BY id_a, id_b""".stripMargin)

  // Brute-force cosine top-5 for query vectors (vec_id < 20), excluding
  // self. Rank by the (bit-identical) double cosine, id tiebreak.
  spark("v_cos_topk",
    (s, d) => {
      val v = vecs(s, d).cache()
      val q = v.filter(col("vec_id") < 20)
      broadcast(q.as("q")).join(v.as("c"), col("q.vec_id") =!= col("c.vec_id"))
        .withColumn("dot", expr(dotExpr("q.e", "c.e")))
        .withColumn("cosd", expr("CAST(dot AS DOUBLE) / (sqrt(CAST(q.saa AS DOUBLE)) * sqrt(CAST(c.saa AS DOUBLE)))"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q.vec_id"))
            .orderBy(col("cosd").desc, col("c.vec_id"))))
        .filter(col("rnk") <= 5)
        .select(col("q.vec_id").as("id_q"), col("rnk").cast("long").as("rnk"),
          col("c.vec_id").as("id_n"), expr("CAST(cosd AS DECIMAL(18,4))").as("cos"))
        .orderBy("id_q", "rnk")
    },
    s"""WITH $oracleVecs,
       |p AS (SELECT q.vec_id AS id_q, c.vec_id AS id_n,
       |             CAST(sum(eq.x * ec.x) AS DECIMAL(38,18)) AS dot
       |      FROM nrm q JOIN nrm c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
       |        JOIN el eq ON eq.vec_id = q.vec_id
       |        JOIN el ec ON ec.vec_id = c.vec_id AND eq.i = ec.i
       |      GROUP BY 1, 2),
       |sc AS (SELECT id_q, id_n,
       |         CAST(dot AS DOUBLE) / (sqrt(CAST(nq.saa AS DOUBLE)) * sqrt(CAST(nc.saa AS DOUBLE))) AS cosd
       |       FROM p JOIN nrm nq ON p.id_q = nq.vec_id JOIN nrm nc ON p.id_n = nc.vec_id),
       |rk AS (SELECT id_q, id_n, cosd,
       |         row_number() OVER (PARTITION BY id_q ORDER BY cosd DESC, id_n) AS rnk
       |       FROM sc)
       |SELECT id_q, CAST(rnk AS BIGINT) AS rnk, id_n, CAST(cosd AS DECIMAL(18,4)) AS cos
       |FROM rk WHERE rnk <= 5 ORDER BY id_q, rnk""".stripMargin)

  // IVF-style partition-pruned ANN: probe only the query's coarse
  // bucket (label) — at 100 TB each probe scans one partition, not the
  // corpus. Exact within the bucket, so SQL-expressible.
  spark("v_cos_ivf",
    (s, d) => {
      val v = vecs(s, d).cache()
      val q = v.filter(col("vec_id") < 20)
      broadcast(q.as("q")).join(v.as("c"),
          col("q.label") === col("c.label") && col("q.vec_id") =!= col("c.vec_id"))
        .withColumn("dot", expr(dotExpr("q.e", "c.e")))
        .withColumn("cosd", expr("CAST(dot AS DOUBLE) / (sqrt(CAST(q.saa AS DOUBLE)) * sqrt(CAST(c.saa AS DOUBLE)))"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q.vec_id"))
            .orderBy(col("cosd").desc, col("c.vec_id"))))
        .filter(col("rnk") <= 3)
        .select(col("q.vec_id").as("id_q"), col("rnk").cast("long").as("rnk"),
          col("c.vec_id").as("id_n"))
        .orderBy("id_q", "rnk")
    },
    s"""WITH $oracleVecs,
       |p AS (SELECT q.vec_id AS id_q, c.vec_id AS id_n,
       |             CAST(sum(eq.x * ec.x) AS DECIMAL(38,18)) AS dot
       |      FROM v q JOIN v c ON q.label = c.label AND q.vec_id < 20 AND q.vec_id <> c.vec_id
       |        JOIN el eq ON eq.vec_id = q.vec_id
       |        JOIN el ec ON ec.vec_id = c.vec_id AND eq.i = ec.i
       |      GROUP BY 1, 2),
       |sc AS (SELECT id_q, id_n,
       |         CAST(dot AS DOUBLE) / (sqrt(CAST(nq.saa AS DOUBLE)) * sqrt(CAST(nc.saa AS DOUBLE))) AS cosd
       |       FROM p JOIN nrm nq ON p.id_q = nq.vec_id JOIN nrm nc ON p.id_n = nc.vec_id),
       |rk AS (SELECT id_q, id_n,
       |         row_number() OVER (PARTITION BY id_q ORDER BY cosd DESC, id_n) AS rnk
       |       FROM sc)
       |SELECT id_q, CAST(rnk AS BIGINT) AS rnk, id_n
       |FROM rk WHERE rnk <= 3 ORDER BY id_q, rnk""".stripMargin)

  // Random-hyperplane LSH bucketing (16 md5-derived planes → 16-bit
  // bucket), then exact scoring within bucket. Approximate recall →
  // rows-only check (not SQL-oracle-matched).
  sparkOnly("v_cos_lsh",
    (s, d) => {
      val v = vecs(s, d)
      // plane weights: ±1 per (plane, dim) from md5 parity — deterministic
      val planes = s.range(0, 16).toDF("p").crossJoin(s.range(0, 64).toDF("j"))
        .select(col("p"), col("j"),
          (expr("instr('0123456789abcdef', substr(md5(concat(p, ':', j)), 1, 1)) % 2") * 2 - 1)
            .cast("double").as("wgt"))
      val el = v.select(col("vec_id"), posexplode(col("e")).as(Seq("j", "x")))
      val sig = el.join(broadcast(planes), "j")
        .groupBy("vec_id", "p").agg(sum(col("x") * col("wgt")).as("proj"))
        .groupBy("vec_id")
        .agg(concat_ws("", transform(array_sort(collect_list(struct(col("p"), when(col("proj") >= 0, "1").otherwise("0").as("bit")))), x => x("bit"))).as("bucket"))
      val withB = v.join(sig, "vec_id")
      val q = withB.filter(col("vec_id") < 20)
      broadcast(q.as("q")).join(withB.as("c"),
          col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
        .withColumn("dot", expr(dotExpr("q.e", "c.e")))
        .withColumn("cosd", expr("CAST(dot AS DOUBLE) / (sqrt(CAST(q.saa AS DOUBLE)) * sqrt(CAST(c.saa AS DOUBLE)))"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q.vec_id"))
            .orderBy(col("cosd").desc, col("c.vec_id"))))
        .filter(col("rnk") <= 3)
        .select(col("q.vec_id").as("id_q"), col("rnk").cast("long").as("rnk"),
          col("c.vec_id").as("id_n"))
        .orderBy("id_q", "rnk")
    })
}
