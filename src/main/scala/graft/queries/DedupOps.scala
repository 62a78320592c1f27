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

  /** Distinct token sets: docs collapse to their token set (corpora are
    * heavily redundant), set-level work runs once per distinct set,
    * results expand back to doc pairs. `ids` are compact vocab indices
    * (sorted), `mask` a 64-bit set when the vocabulary fits. */
  final case class TokSet(toks: Array[String], ids: Array[Int], mask: Long,
                          members: Array[Long])

  private def distinctSets(s: SparkSession, d: String): Array[TokSet] =
    distinctSetsOf(s, tokens(s, d))

  /** docs tokens (doc_id, w) → distinct token sets */
  def distinctSetsOf(s: SparkSession, tok: DataFrame): Array[TokSet] = {
    import s.implicits._
    val sets = tok
      .groupBy("doc_id").agg(sort_array(collect_set(col("w"))).as("toks"))
      .groupBy("toks").agg(collect_list(col("doc_id")).as("members"))
      .as[(Seq[String], Seq[Long])].collect()
    val vocab = sets.flatMap(_._1).distinct.sorted.zipWithIndex.toMap
    val useMask = vocab.size <= 64
    sets.map { case (ts, ms) =>
      val ids = ts.map(vocab).toArray.sorted
      val mask = if (useMask) ids.foldLeft(0L)((m, i) => m | (1L << i)) else 0L
      TokSet(ts.toArray, ids, mask, ms.toArray.sorted)
    }
  }

  import graft.functions.Hashing.{md5bytes, byteLess, toHex}

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

  // Token-set Jaccard near-dup, ≥ 0.5. Scale shape: docs collapse to
  // DISTINCT token sets first (identical-set dedup — corpora are
  // heavily redundant), exact Jaccard runs once per distinct-set pair
  // (bitmask popcount when the vocabulary fits 64 bits, sorted-int
  // merge otherwise), then qualifying set pairs expand back to doc
  // pairs. Replaces the token self-join, whose high-df tokens explode
  // quadratically (the naive plan was 6× slower than this at sf0.1).
  spark("d_jaccard",
    (s, d) => {
      import s.implicits._
      val τ = 0.5
      val compact = distinctSets(s, d)
      val useMask = compact.forall(_.mask != 0L) && compact.flatMap(_.ids).distinct.length <= 64
      val bc = s.sparkContext.broadcast(compact)
      def inter(a: TokSet, b: TokSet): Int =
        if (useMask) java.lang.Long.bitCount(a.mask & b.mask)
        else {
          var i = 0; var j = 0; var c = 0
          while (i < a.ids.length && j < b.ids.length) {
            val d0 = a.ids(i) - b.ids(j)
            if (d0 == 0) { c += 1; i += 1; j += 1 } else if (d0 < 0) i += 1 else j += 1
          }
          c
        }
      s.sparkContext.parallelize(compact.indices, s.sparkContext.defaultParallelism)
        .flatMap { ai =>
          val all = bc.value
          val a = all(ai)
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
          // intra-set pairs: jaccard exactly 1
          var x = 0
          while (x < a.members.length) {
            var y = x + 1
            while (y < a.members.length) { out += ((a.members(x), a.members(y), 1.0)); y += 1 }
            x += 1
          }
          var bi = ai + 1
          while (bi < all.length) {
            val b = all(bi)
            val in = inter(a, b)
            val jac = in.toDouble / (a.ids.length + b.ids.length - in)
            if (jac >= τ) a.members.foreach { ma =>
              b.members.foreach { mb =>
                out += ((math.min(ma, mb), math.max(ma, mb), jac))
              }
            }
            bi += 1
          }
          out
        }.toDF("id_a", "id_b", "jac")
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

  // Character 3-gram Jaccard near-dup (bounded to doc_id < 200 so the
  // oracle's gram self-join stays tractable): same distinct-set kernel,
  // general sorted-int-merge path (gram vocabulary exceeds 64).
  spark("d_ngram_jaccard",
    (s, d) => {
      import s.implicits._
      val τ = 0.8
      val grams = Tables.t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          explode(array_distinct(expr(
            "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substr(text, i, 3))"))).as("w"))
      val compact = distinctSetsOf(s, grams)
      val bc = s.sparkContext.broadcast(compact)
      def inter(a: TokSet, b: TokSet): Int = {
        var i = 0; var j = 0; var c = 0
        while (i < a.ids.length && j < b.ids.length) {
          val d0 = a.ids(i) - b.ids(j)
          if (d0 == 0) { c += 1; i += 1; j += 1 } else if (d0 < 0) i += 1 else j += 1
        }
        c
      }
      s.sparkContext.parallelize(compact.indices, s.sparkContext.defaultParallelism)
        .flatMap { ai =>
          val all = bc.value
          val a = all(ai)
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
          var x = 0
          while (x < a.members.length) {
            var y = x + 1
            while (y < a.members.length) { out += ((a.members(x), a.members(y), 1.0)); y += 1 }
            x += 1
          }
          var bi = ai + 1
          while (bi < all.length) {
            val b = all(bi)
            val in = inter(a, b)
            val jac = in.toDouble / (a.ids.length + b.ids.length - in)
            if (jac >= τ) a.members.foreach { ma =>
              b.members.foreach { mb => out += ((math.min(ma, mb), math.max(ma, mb), jac)) }
            }
            bi += 1
          }
          out
        }.toDF("id_a", "id_b", "jac")
        .orderBy("id_a", "id_b")
    },
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
      |g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 3) AS w
      |      FROM docs, unnest(range(1, greatest(length(text) - 2, 1) + 1)) r(i)),
      |sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |      FROM g a JOIN g b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT id_a, id_b, CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jac
      |FROM p JOIN sz sa ON p.id_a = sa.doc_id JOIN sz sb ON p.id_b = sb.doc_id
      |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin)

  // MinHash + LSH banding: 16 md5-derived hash functions, 4 bands × 4
  // rows; candidates = pairs sharing a full band signature. Signatures
  // depend only on the token set, so they are computed once per
  // DISTINCT set (executor-parallel) and candidate set pairs expand to
  // doc pairs — no token×16 explode, no 10M-row distinct shuffle.
  // Both engines use min(md5(i || ':' || token)) so signatures match.
  /** MinHash+LSH candidate doc pairs from a (doc_id, w) token frame. */
  def minhashCandidates(s: SparkSession, tok: DataFrame): DataFrame = {
      import s.implicits._
      val compact = distinctSetsOf(s, tok)
      val bc = s.sparkContext.broadcast(compact)
      // per distinct set: 4 band signatures (mh 4b..4b+3 joined by '|'),
      // computed distributed, collected (4 short strings per DISTINCT
      // set — tiny) and broadcast so pair dedup needs no shuffle
      val bandSigs: Array[Array[String]] = s.sparkContext
        .parallelize(compact.indices, s.sparkContext.defaultParallelism)
        .map { si =>
          val ts = bc.value(si).toks
          val mh = Array.tabulate(16) { i =>
            toHex(ts.iterator.map(w => md5bytes(s"$i:$w")).reduceLeft((a, b) => if (byteLess(b, a)) b else a))
          }
          (si, Array.tabulate(4)(b => (0 until 4).map(r => mh(4 * b + r)).mkString("|")))
        }.collect().sortBy(_._1).map(_._2)
      val bcSigs = s.sparkContext.broadcast(bandSigs)
      val bandRows = s.sparkContext.parallelize(compact.indices, s.sparkContext.defaultParallelism)
        .flatMap { si => (0 until 4).iterator.map(b => (s"$b|${bcSigs.value(si)(b)}", (b, si))) }
      // bucket → candidate set pairs; each pair emitted only from the
      // FIRST band it collides in (checked against broadcast sigs) —
      // globally deduped without a distinct() shuffle
      val cross = bandRows.groupByKey()
        .flatMap { case (_, members) =>
          val items = members.toArray
          val band = items.head._1
          val sis = items.map(_._2).sorted
          val sigs = bcSigs.value
          for {
            i <- sis.indices.iterator
            j <- (i + 1 until sis.length).iterator
            if !(0 until band).exists(b0 => sigs(sis(i))(b0) == sigs(sis(j))(b0))
          } yield (sis(i), sis(j))
        }
        .flatMap { case (a, b) =>
          val sa = bc.value(a).members; val sb = bc.value(b).members
          for (x <- sa.iterator; y <- sb.iterator)
            yield (math.min(x, y), math.max(x, y))
        }
      val intra = s.sparkContext.parallelize(compact.indices, s.sparkContext.defaultParallelism)
        .flatMap { si =>
          val m = bc.value(si).members
          for (x <- m.indices.iterator; y <- (x + 1 until m.length).iterator)
            yield (m(x), m(y))
        }
      cross.union(intra).toDF("id_a", "id_b").orderBy("id_a", "id_b")
  }

  spark("d_minhash_lsh",
    (s, d) => minhashCandidates(s, tokens(s, d)),
    s"""WITH tok AS ($tokSql),
       |ih AS (SELECT doc_id, i, md5(CAST(i AS VARCHAR) || ':' || w) AS h
       |       FROM tok CROSS JOIN range(0, 16) r(i)),
       |sig AS (SELECT doc_id, i, min(h) AS mh FROM ih GROUP BY doc_id, i),
       |band AS (SELECT doc_id, i // 4 AS band, string_agg(mh, '|' ORDER BY i) AS bsig
       |         FROM sig GROUP BY doc_id, i // 4)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |FROM band a JOIN band b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
       |ORDER BY id_a, id_b""".stripMargin)

  // MinHash signatures via the typed Aggregator (partial+final merge —
  // the shape that scales to any token distribution). Same signature
  // scheme as the LSH query, oracle-matched per document.
  spark("d_minhash_sigs",
    (s, d) => {
      import s.implicits._
      val agg = new graft.functions.MinHashAgg(16).toColumn
      tokens(s, d).as[(Long, String)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg.name("sig"))
        .map { case (id, sig) => (id, sig) }
        .toDF("doc_id", "sig")
        .orderBy("doc_id")
    },
    s"""WITH tok AS ($tokSql),
       |ih AS (SELECT doc_id, i, md5(CAST(i AS VARCHAR) || ':' || w) AS h
       |       FROM tok CROSS JOIN range(0, 16) r(i)),
       |sig AS (SELECT doc_id, i, min(h) AS mh FROM ih GROUP BY doc_id, i)
       |SELECT doc_id, string_agg(mh, '|' ORDER BY i) AS sig
       |FROM sig GROUP BY doc_id ORDER BY doc_id""".stripMargin)

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
