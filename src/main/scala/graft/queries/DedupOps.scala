package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** North-star deduplication suite over `documents` (SURVEY.md §2.11):
  * exact (hash groupBy), n-gram/token Jaccard, MinHash+LSH banding,
  * SimHash. Every variant is shuffle-bounded: tokens/signatures are
  * computed map-side, candidate generation joins only on short keys
  * (band signatures / tokens), never on full text — the shape that
  * survives 100 TB (LSH turns O(n²) pair search into per-bucket work).
  */
object DedupOps {
  val set = new QuerySet
  import set._

  /** Distinct (doc_id, token) pairs — whitespace tokens. */
  private def tokens(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))

  private val tokSql =
    "SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents"

  // Exact dedup: group by content hash, keep the smallest doc_id.
  spark("d_exact",
    (s, d) => Tables.t(s, d, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .select("keep_id", "h", "dup_count")
      .orderBy("keep_id"),
    """SELECT min(doc_id) AS keep_id, md5(text) AS h, count(*) AS dup_count
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)

  // Exact dedup via dropDuplicates (retained row is arbitrary → expose
  // only the deterministic count).
  spark("d_exact_count",
    (s, d) => Tables.t(s, d, "documents").dropDuplicates("text")
      .agg(count(lit(1)).as("n_unique")),
    "SELECT count(DISTINCT text) AS n_unique FROM documents")

  // Token-set Jaccard near-dup: candidate pairs share ≥1 token; exact
  // Jaccard from |A∩B| and set sizes; report pairs ≥ 0.5.
  spark("d_jaccard",
    (s, d) => {
      val tok = tokens(s, d).cache()
      val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = tok.as("a").join(tok.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      inter.join(sz.as("sa"), col("id_a") === col("sa.doc_id"))
        .join(sz.as("sb"), col("id_b") === col("sb.doc_id"))
        .select(col("id_a"), col("id_b"),
          (col("inter").cast("double") / (col("sa.sz") + col("sb.sz") - col("inter"))).as("jac"))
        .filter(col("jac") >= 0.5)
        .orderBy("id_a", "id_b")
    },
    s"""WITH tok AS ($tokSql),
       |sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |      FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id_a, id_b, CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jac
       |FROM p JOIN sz sa ON p.id_a = sa.doc_id JOIN sz sb ON p.id_b = sb.doc_id
       |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin)

  // MinHash + LSH banding: 16 md5-derived hash functions, 4 bands × 4
  // rows; candidates = pairs sharing a full band signature. Both sides
  // use min(md5(i || ':' || token)) so signatures match exactly.
  spark("d_minhash_lsh",
    (s, d) => {
      val tok = tokens(s, d)
      val sig = tok.crossJoin(s.range(0, 16).toDF("i"))
        .select(col("doc_id"), col("i"),
          md5(concat(col("i").cast("string"), lit(":"), col("w"))).as("h"))
        .groupBy("doc_id", "i").agg(min(col("h")).as("mh"))
      val bands = sig
        .withColumn("band", expr("i DIV 4"))
        .groupBy("doc_id", "band")
        .agg(concat_ws("|",
          transform(array_sort(collect_list(struct(col("i"), col("mh")))), x => x("mh"))).as("bsig"))
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
        .orderBy("id_a", "id_b")
    },
    s"""WITH tok AS ($tokSql),
       |ih AS (SELECT doc_id, i, md5(CAST(i AS VARCHAR) || ':' || w) AS h
       |       FROM tok CROSS JOIN range(0, 16) r(i)),
       |sig AS (SELECT doc_id, i, min(h) AS mh FROM ih GROUP BY doc_id, i),
       |band AS (SELECT doc_id, i // 4 AS band, string_agg(mh, '|' ORDER BY i) AS bsig
       |         FROM sig GROUP BY doc_id, i // 4)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |FROM band a JOIN band b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
       |ORDER BY id_a, id_b""".stripMargin)

  // SimHash: 64-bit signature from per-token md5 bits (majority vote per
  // bit; tie → 0). Output as a 64-char '0'/'1' string.
  spark("d_simhash",
    (s, d) => {
      val tok = tokens(s, d).select(col("doc_id"), md5(col("w")).as("h"))
      val bits = tok.crossJoin(s.range(0, 64).toDF("b"))
        .select(col("doc_id"), col("b"),
          // hex digit at position b/4 (1-based), bit (3 - b%4) within it
          (expr("CAST(floor((instr('0123456789abcdef', substr(h, CAST(b DIV 4 AS INT) + 1, 1)) - 1) " +
                "/ power(2, 3 - b % 4)) AS BIGINT) % 2")).as("bit"))
      bits.groupBy("doc_id", "b")
        .agg(sum(col("bit") * 2 - 1).as("vote"))
        .withColumn("sb", when(col("vote") > 0, "1").otherwise("0"))
        .groupBy("doc_id")
        .agg(concat_ws("",
          transform(array_sort(collect_list(struct(col("b"), col("sb")))), x => x("sb"))).as("sim64"))
        .orderBy("doc_id")
    },
    s"""WITH tok AS (SELECT doc_id, md5(w) AS h FROM ($tokSql) t),
       |bits AS (SELECT doc_id, b,
       |           CAST(floor((instr('0123456789abcdef', substr(h, CAST(b // 4 AS INTEGER) + 1, 1)) - 1)
       |                / power(2, 3 - b % 4)) AS BIGINT) % 2 AS bit
       |         FROM tok CROSS JOIN range(0, 64) r(b)),
       |votes AS (SELECT doc_id, b, sum(bit * 2 - 1) AS vote FROM bits GROUP BY doc_id, b)
       |SELECT doc_id, string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS sim64
       |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
