package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** North-star text analysis over `documents` (SURVEY.md §2.11):
  * token counting (whitespace + regex tokenizer), quality scoring,
  * language-ID heuristic, rolling-shingle document fingerprinting.
  * All per-document map-side work — embarrassingly parallel, no
  * shuffle except the fingerprint min-aggregation (partial+final).
  */
object TextOps {
  val set = new QuerySet
  import set._

  /** Driver-state cap for the unigram-LM vocabulary broadcast
    * (UnigramLM.build): 256k types ≈ a large BPE tokenizer vocab,
    * a few tens of MB broadcast — far under any corpus vocabulary. */
  val UnigramVocabCap: Int = 1 << 18

  /** one-pass token count — exactly `size(split(text, " "))`: split
    * keeps empty tokens, so tokens = (#0x20 codepoints) + 1, counted by
    * the codegen byte scanner with no array materialization (the r13
    * BM25 SpaceTokenStats precedent; A/B at sf1: 0.25 -> 0.17 s per
    * tokenize pass, and the PrefixSum rows pay the pass twice). */
  private def nTokWs(c: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.GraftSqlBridge.column(
      graft.functions.CodepointRangeCount(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(c),
        0x20, 0x20)).cast("long") + lit(1L)

  // Token counting: whitespace tokens + a BPE-ish regex token count.
  // plan note: SortThroughProject pushes the ORDER BY below the
  // tokenizer-kernel projection (0.99 → 0.38 s at sf1 — the range
  // sampling otherwise re-ran the kernels over every document)
  spark("t_tokens",
    (s, d) => Tables.t(s, d, "documents").select(
        col("doc_id"),
        nTokWs("text").as("n_ws"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_char"))
      .orderBy("doc_id"),
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tok,
      |  CAST(length(text) AS BIGINT) AS n_char
      |FROM documents ORDER BY doc_id""".stripMargin)

  // Quality scoring: char count, word count, stopword ratio, mean word
  // length. Ratios are single double divisions of exact ints → bit-equal.
  spark("t_quality",
    (s, d) => Tables.t(s, d, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_char"),
        nTokWs("text").as("n_word"),
        (regexp_count(col("text"), lit("\\b(the|a|of|and|to)\\b")).cast("double") /
          nTokWs("text")).as("stop_ratio"),
        ((length(col("text")) - nTokWs("text") + 1).cast("double") /
          nTokWs("text")).as("mean_wlen"))
      .orderBy("doc_id"),
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_char,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_word,
      |  CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to)\b')) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stop_ratio,
      |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |    / len(string_split(text, ' ')) AS mean_wlen
      |FROM documents ORDER BY doc_id""".stripMargin)

  // Language-ID heuristic: marker-word scores per language, argmax with
  // a deterministic tie order (en > es > zh).
  spark("t_langid",
    (s, d) => {
      val docs = Tables.t(s, d, "documents")
      val en = regexp_count(col("text"), lit("\\b(the|a|and|of)\\b"))
      val es = regexp_count(col("text"), lit("\\b(el|la|de|los)\\b"))
      val zh = regexp_count(col("text"), lit("[\\x{4e00}-\\x{9fff}]"))
      docs.select(col("doc_id"), col("lang"),
          when(en >= es && en >= zh, "en").when(es >= zh, "es").otherwise("zh").as("pred"))
        .orderBy("doc_id")
    },
    """SELECT doc_id, lang,
      |  CASE WHEN en_s >= es_s AND en_s >= zh_s THEN 'en'
      |       WHEN es_s >= zh_s THEN 'es' ELSE 'zh' END AS pred
      |FROM (SELECT doc_id, lang,
      |        len(regexp_extract_all(text, '\b(the|a|and|of)\b')) AS en_s,
      |        len(regexp_extract_all(text, '\b(el|la|de|los)\b')) AS es_s,
      |        len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS zh_s
      |      FROM documents) t ORDER BY doc_id""".stripMargin)

  // Document fingerprinting: md5 of canonicalized text plus the minimum
  // 8-char rolling shingle hash (winnowing-style min fingerprint).
  // Tight per-partition kernel instead of a shingle explode — one md5
  // per shingle in a JVM loop, no 1.5M-row shuffle (5× faster at sf0.1,
  // same oracle: ASCII corpus ⇒ JVM lower/regex ≡ SQL lower/regexp).
  spark("t_fingerprint",
    (s, d) => {
      import s.implicits._
      import graft.functions.Hashing
      // range-partition BEFORE the rolling-hash map: the exchange (a)
      // spreads the md5-per-shingle compute across the session's
      // cores (the small parquet yields 1-2 input splits, so the map
      // otherwise runs near-serial), and (b) makes the trailing local
      // sort the global ORDER BY with no range-sampling job re-running
      // the map. Measured at sf1: 5.5 → 0.78 s.
      Tables.t(s, d, "documents")
        .repartitionByRange(org.apache.spark.sql.functions.col("doc_id"))
        .select("doc_id", "text").as[(Long, String)]
        .map { case (id, text) =>
          val canon = text.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT)
          val nSh = math.max(canon.length - 7, 1)
          var best: Array[Byte] = null
          var i = 0
          while (i < nSh) {
            val h = Hashing.md5bytes(canon.substring(i, math.min(i + 8, canon.length)))
            if (best == null || Hashing.byteLess(h, best)) best = h
            i += 1
          }
          (id, Hashing.md5hex(canon), Hashing.toHex(best))
        }
        .toDF("doc_id", "fp", "min_shingle")
        .sortWithinPartitions("doc_id")
    },
    """WITH c AS (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS canon FROM documents),
      |e AS (SELECT doc_id, canon, unnest(range(1, greatest(length(canon) - 7, 1) + 1)) AS i FROM c)
      |SELECT doc_id, md5(canon) AS fp, min(md5(substr(canon, CAST(i AS INTEGER), 8))) AS min_shingle
      |FROM e GROUP BY doc_id, canon ORDER BY doc_id""".stripMargin)

  // Multimodal pipeline end-to-end (binary payload + metadata struct +
  // partition-batched decode stub). The stub's features are pure
  // byte-math (Shannon entropy of the payload histogram + frame count)
  // so the whole pipeline is oracle-checkable in SQL: documents text
  // is ASCII, so the char histogram IS the byte histogram.
  spark("t_multimodal",
    (s, d) => {
      val media = graft.operators.Multimodal.toMedia(Tables.t(s, d, "documents"))
      graft.operators.Multimodal.extractFeatures(media).toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          col("entropy").cast("decimal(18,4)").cast("double").as("entropy"),
          col("frames_sampled").cast("long").as("frames"))
        .orderBy("doc_id")
    },
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
      |hist AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
      |base AS (SELECT doc_id, 'application/x-fake-' || lang AS mime,
      |                CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
      |         FROM documents),
      |ent AS (SELECT h.doc_id,
      |               -sum((CAST(h.k AS DOUBLE) / b.n_bytes) * ln(CAST(h.k AS DOUBLE) / b.n_bytes) / ln(2)) AS e
      |        FROM hist h JOIN base b ON h.doc_id = b.doc_id GROUP BY 1)
      |SELECT b.doc_id, b.mime, b.n_bytes,
      |       CAST(CAST(CASE WHEN b.n_bytes = 0 THEN 0.0 ELSE ent.e END AS DECIMAL(18,4)) AS DOUBLE) AS entropy,
      |       CAST(CASE WHEN b.n_bytes = 0 THEN 0 ELSE 1 + b.n_bytes // 4096 END AS BIGINT) AS frames
      |FROM base b LEFT JOIN ent ON b.doc_id = ent.doc_id
      |ORDER BY b.doc_id""".stripMargin)

  // Multimodal plumbing: byte length of the text payload as BLOB.
  spark("t_blob_len",
    (s, d) => Tables.t(s, d, "documents")
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("nbytes"))
      .orderBy("doc_id"),
    """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nbytes
      |FROM documents ORDER BY doc_id""".stripMargin)

  // Data-mixture curation: per-source token-budget selection — keep
  // each source's doc_id-ordered prefix while its cumulative token
  // count fits the budget (the mixing step that caps a source's
  // contribution to a training run). Exact integer cumsum, windowed
  // per source. Scale note: the window is one task per source; when a
  // single source is TB-sized, use PrefixSum.groupedCumSum (the
  // two-phase bucketed decomposition — t_token_budget_prefix below
  // proves it equal against the SAME oracle, and PrefixSumSpec proves
  // it on a skewed multi-bucket synthetic).
  spark("t_token_budget",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          nTokWs("text").as("n_tok"))
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .where(col("cum_tok") <= 600)
      // the budget bounds the output (≤ budget/min-doc-tokens rows per
      // source): TinyResult skips the range-sampling job that re-ran
      // the tokenize+window pipeline (0.92 → 0.61 s at sf1)
      graft.operators.TinyResult.globalSort(cum, col("doc_id"))
    },
    """WITH toks AS (SELECT doc_id, source,
      |                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |              FROM documents),
      |cum AS (SELECT doc_id, source, n_tok,
      |               CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
      |        FROM toks)
      |SELECT doc_id, source, n_tok, cum_tok
      |FROM cum WHERE cum_tok <= 600
      |ORDER BY doc_id""".stripMargin)

  // The SAME selection through the two-phase prefix decomposition
  // (operators/PrefixSum.scala): per-bucket partial sums -> tiny
  // bucket×source offset table -> local cumsum + broadcast offset.
  // Checked against the IDENTICAL oracle SQL as t_token_budget — the
  // driver hash-compare is the equality proof at sf0.01, and the
  // parallelism no longer degrades to one-task-per-source when a
  // single source dominates the corpus.
  spark("t_token_budget_prefix",
    (s, d) => {
      val toks = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          nTokWs("text").as("n_tok"))
      val cum = graft.operators.PrefixSum
        .groupedCumSum(toks, "source", "doc_id", "n_tok", "cum_tok")
        .where(col("cum_tok") <= 600)
      graft.operators.TinyResult.globalSort(cum, col("doc_id"))
    },
    """WITH toks AS (SELECT doc_id, source,
      |                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |              FROM documents),
      |cum AS (SELECT doc_id, source, n_tok,
      |               CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
      |        FROM toks)
      |SELECT doc_id, source, n_tok, cum_tok
      |FROM cum WHERE cum_tok <= 600
      |ORDER BY doc_id""".stripMargin)

  // The ONE production entry (Engine.tokenBudget): dispatches between
  // the two forms above on the Catalyst-stats gate — at this scale the
  // window branch — and must hash-match the same oracle either way.
  spark("t_token_budget_auto",
    (s, d) => {
      val toks = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          nTokWs("text").as("n_tok"))
      graft.operators.TinyResult.globalSort(
        graft.Engine(s).tokenBudget(toks, "source", "doc_id", "n_tok", budget = 600),
        col("doc_id"))
    },
    """WITH toks AS (SELECT doc_id, source,
      |                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |              FROM documents),
      |cum AS (SELECT doc_id, source, n_tok,
      |               CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
      |        FROM toks)
      |SELECT doc_id, source, n_tok, cum_tok
      |FROM cum WHERE cum_tok <= 600
      |ORDER BY doc_id""".stripMargin)

  // End-to-end curation pipeline — the composition a daily training-
  // data run executes: quality gate (length band + dup-word rate as
  // exact integer comparisons) -> exact dedup (min doc_id per distinct
  // text) -> per-source token budget. Every stage is individually
  // oracle-proven above; this row proves the COMPOSITION end to end.
  // Scale notes: the quality gate is map-side; the dedup stage groups
  // by (md5(text), length(text)) — t_fingerprint's canon — so only
  // 32-hex fingerprints move through the shuffle, never document
  // texts (round 8: this IS the shipped code on both engines, not a
  // comment; a 128-bit digest + exact length as the dedup identity is
  // the standard corpus-dedup trade and both sides compute it
  // identically); the budget window is one task per source
  // (two-phase prefix form: PrefixSum.groupedCumSum, proven at
  // t_token_budget_prefix).
  spark("t_curate",
    (s, d) => { Tables.registerAll(s, d)
      s.sql("""WITH stats AS (SELECT doc_id, source, text,
              |                      CAST(size(split(text, ' ')) AS BIGINT) AS n_tok,
              |                      CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_dist
              |               FROM documents),
              |quality AS (SELECT * FROM stats WHERE n_tok BETWEEN 20 AND 80 AND 2 * n_dist > n_tok),
              |uniq AS (SELECT min(doc_id) AS doc_id
              |         FROM quality GROUP BY md5(text), length(text)),
              |survivors AS (SELECT q.doc_id, q.source, q.n_tok
              |              FROM quality q JOIN uniq u ON q.doc_id = u.doc_id),
              |cum AS (SELECT doc_id, source, n_tok,
              |               sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
              |        FROM survivors)
              |SELECT doc_id, source, n_tok, cum_tok
              |FROM cum WHERE cum_tok <= 400
              |ORDER BY doc_id""".stripMargin) },
    """WITH stats AS (SELECT doc_id, source, text,
      |                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |                      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_dist
      |               FROM documents),
      |quality AS (SELECT * FROM stats WHERE n_tok BETWEEN 20 AND 80 AND 2 * n_dist > n_tok),
      |uniq AS (SELECT min(doc_id) AS doc_id
      |         FROM quality GROUP BY md5(text), length(text)),
      |survivors AS (SELECT q.doc_id, q.source, q.n_tok
      |              FROM quality q JOIN uniq u ON q.doc_id = u.doc_id),
      |cum AS (SELECT doc_id, source, n_tok,
      |               CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
      |        FROM survivors)
      |SELECT doc_id, source, n_tok, cum_tok
      |FROM cum WHERE cum_tok <= 400
      |ORDER BY doc_id""".stripMargin)

  // Repetition filter stats (the within-document repetition family of
  // Rae et al. 2021 §A.1.1, counts instead of fractions so every
  // column is exact BIGINT): words, distinct words, distinct bigrams
  // (instances are just n_words-1; the DISTINCT count is the one the
  // dup-bigram fraction needs) and the top bigram's multiplicity. One
  // typed map per document —
  // O(words) with a local count table, no shuffle anywhere (the
  // orderBy is the only exchange), the same per-row single-pass shape
  // as d_minhash_sigs. Fractions (dup-word rate, top-bigram coverage)
  // are ratios of these columns, left to the caller's thresholds.
  spark("t_repetition",
    (s, d) => {
      import s.implicits._
      // same range-partition-first shape as t_fingerprint: spread the
      // per-doc pass across cores and make the trailing local sort the
      // global ORDER BY (no range-sampling job re-running the map)
      Tables.t(s, d, "documents")
        .repartitionByRange(col("doc_id"))
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val toks = text.split(" ", -1)
          val distinct = new java.util.HashSet[String]()
          toks.foreach(distinct.add)
          val counts = new java.util.HashMap[String, Int]()
          var top = 0
          var i = 0
          while (i < toks.length - 1) {
            val b = toks(i) + " " + toks(i + 1)
            val c = counts.merge(b, 1, Integer.sum)
            if (c > top) top = c
            i += 1
          }
          (id, toks.length.toLong, distinct.size.toLong,
            counts.size.toLong, top.toLong)
        }
        .toDF("doc_id", "n_words", "n_distinct", "n_distinct_bg", "top_bigram")
        .sortWithinPartitions("doc_id")
    },
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
      |                CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct FROM words),
      |bg AS (SELECT doc_id, array_to_string(toks[g:g+1], ' ') AS b
      |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS g FROM words)),
      |bgc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_bg, CAST(max(c) AS BIGINT) AS top_bigram
      |        FROM (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b) GROUP BY doc_id)
      |SELECT base.doc_id AS doc_id, n_words, n_distinct,
      |       coalesce(n_distinct_bg, 0) AS n_distinct_bg, coalesce(top_bigram, 0) AS top_bigram
      |FROM base LEFT JOIN bgc ON base.doc_id = bgc.doc_id
      |ORDER BY doc_id""".stripMargin)

  // Deterministic hash-bucket sampling (training-data subsetting that
  // is reproducible across engines and runs): a Knuth multiplicative
  // hash of doc_id picks ~10% of the corpus. Pure map-side filter —
  // no shuffle, no RNG state, and the SAME rows come out of any
  // engine that can do exact bigint arithmetic (the oracle runs the
  // identical formula). The pre-mod by 2^31-1 keeps the product under
  // 2^63 for arbitrarily large ids. In production the filter column
  // would be xxhash64; the plan shape (scan → filter → project) is
  // identical.
  spark("t_hash_sample",
    (s, d) => Tables.t(s, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        ((col("doc_id") % 2147483647L) * 2654435761L % 4294967296L).as("bucket"))
      .where(col("bucket") < 429496730L)
      .orderBy("doc_id"),
    """SELECT doc_id, source, n_chars,
      |  ((doc_id % 2147483647) * 2654435761) % 4294967296 AS bucket
      |FROM documents
      |WHERE ((doc_id % 2147483647) * 2654435761) % 4294967296 < 429496730
      |ORDER BY doc_id""".stripMargin)

  // Deterministic train/val/test split assignment (80/10/10 by the
  // same engine-reproducible Knuth-hash bucket as t_hash_sample): a
  // document's split is a pure function of its id, so the assignment
  // is stable under corpus growth (new docs never move old ones
  // between splits — the property random shuffling loses), identical
  // on any engine/partitioning, and pure map-side. The per-source
  // counts audit that the hash stratifies evenly without explicit
  // stratification.
  spark("t_split_assign",
    (s, d) => Tables.t(s, d, "documents")
      .select(col("source"), graft.functions.SplitBucket.splitOf(col("doc_id")).as("split"))
      .groupBy("source", "split").agg(count(lit(1)).as("n"))
      .orderBy("source", "split"),
    s"""SELECT source,
      |  ${graft.functions.SplitBucket.splitSql("doc_id")} AS split,
      |  count(*) AS n
      |FROM documents
      |GROUP BY 1, 2 ORDER BY source, split""".stripMargin)

  // Temperature-flattened mixture sampling (the multilingual/multi-
  // source rebalancing step of mBERT / XLM-R, α = 0.5): a source's
  // keep-rate is base · √(m_min/m_s), where m_s is the source's total
  // CHARACTER mass (the token-mass proxy the real mixing step uses) —
  // larger sources are downsampled ∝ m^(α−1) toward the smallest,
  // flattening the mixture without upsampling. Selection is the same
  // deterministic Knuth-hash bucket as t_hash_sample compared against
  // a per-source integer threshold, so the EXACT row set reproduces on
  // any engine and any partitioning. Per-source masses are exact
  // BIGINT sums and the only cross-source reduction is min() of those
  // — no double summation whose order could drift on a cluster; the
  // double work (√, one multiply chain, floor) is per-source scalar
  // math with a bit-identical IEEE evaluation order on both engines.
  // Scale shape: tiny per-source aggregate → broadcast rates →
  // map-side filter; the corpus is never shuffled.
  spark("t_mix_temperature",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val masses = Tables.t(s, d, "documents")
        .groupBy("source").agg(sum(col("n_chars")).as("m_src"))
      // whole-frame window over the |sources|-row masses frame only
      val rates = masses
        .withColumn("m_min", min(col("m_src")).over(Window.partitionBy()))
        .withColumn("thr",
          floor(lit(0.75) * sqrt(col("m_min").cast("double") / col("m_src"))
            * lit(4294967296.0)).cast("long"))
        .select("source", "m_src", "thr")
      Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          ((col("doc_id") % 2147483647L) * 2654435761L % 4294967296L).as("bucket"))
        .join(broadcast(rates), "source")
        .where(col("bucket") < col("thr"))
        .select("doc_id", "source", "m_src", "thr", "bucket")
        .orderBy("doc_id")
    },
    """WITH masses AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS m_src
      |                FROM documents GROUP BY source),
      |rates AS (SELECT source, m_src,
      |                 CAST(floor(0.75 * sqrt(CAST((SELECT min(m_src) FROM masses) AS DOUBLE) / m_src)
      |                            * 4294967296.0) AS BIGINT) AS thr
      |          FROM masses)
      |SELECT d.doc_id, d.source, r.m_src, r.thr,
      |       ((d.doc_id % 2147483647) * 2654435761) % 4294967296 AS bucket
      |FROM documents d JOIN rates r ON d.source = r.source
      |WHERE ((d.doc_id % 2147483647) * 2654435761) % 4294967296 < r.thr
      |ORDER BY d.doc_id""".stripMargin)

  // Sequence packing, the concatenate-then-chunk form (the GPT/T5
  // pretraining step: stream all surviving documents in a fixed order,
  // cut the token stream into fixed-length training blocks). Each
  // document's placement is a pure function of the running token count
  // before it, so the whole operator is the grouped prefix sum again —
  // and here the group is the ENTIRE corpus (one stream), exactly the
  // case where a single-window plan serializes to one task. The
  // two-phase PrefixSum decomposition keeps parallelism = #buckets on
  // one global stream; at real scale the stream is sharded first and
  // this same operator runs per shard. Output: where each doc starts
  // in the stream and which 128-token blocks it spans (a doc spanning
  // >1 block is split across training sequences — the standard trade
  // the packing step accepts).
  spark("t_pack_blocks",
    (s, d) => {
      val B = 128L
      val toks = Tables.t(s, d, "documents")
        .select(col("doc_id"),
          nTokWs("text").as("n_tok"),
          lit(0).as("__g"))
      val cum = graft.operators.PrefixSum
        .groupedCumSum(toks, "__g", "doc_id", "n_tok", "cum_tok")
      cum
        .withColumn("start_tok", col("cum_tok") - col("n_tok"))
        .withColumn("blk_first", floor(col("start_tok") / B).cast("long"))
        .withColumn("blk_last", floor((col("cum_tok") - 1) / B).cast("long"))
        .withColumn("n_blocks", col("blk_last") - col("blk_first") + 1)
        .select("doc_id", "n_tok", "start_tok", "blk_first", "blk_last", "n_blocks")
        .orderBy("doc_id")
    },
    """WITH toks AS (SELECT doc_id,
      |                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |              FROM documents),
      |cum AS (SELECT doc_id, n_tok,
      |               CAST(sum(n_tok) OVER (ORDER BY doc_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
      |        FROM toks)
      |SELECT doc_id, n_tok,
      |       cum_tok - n_tok AS start_tok,
      |       (cum_tok - n_tok) // 128 AS blk_first,
      |       (cum_tok - 1) // 128 AS blk_last,
      |       (cum_tok - 1) // 128 - (cum_tok - n_tok) // 128 + 1 AS n_blocks
      |FROM cum ORDER BY doc_id""".stripMargin)

  // The loader-facing inverse of t_pack_blocks: the block manifest —
  // one row per (block, document) intersection telling a training
  // loader exactly which token slice of which document fills which
  // part of each fixed 128-token block. Derived by exploding each
  // document's block span (`sequence` + explode — rows ≈ docs +
  // blocks, never tokens) from the same two-phase prefix sum; every
  // column is exact BIGINT arithmetic on the prefix values.
  spark("t_pack_manifest",
    (s, d) => {
      val B = 128L
      val toks = Tables.t(s, d, "documents")
        .select(col("doc_id"),
          nTokWs("text").as("n_tok"),
          lit(0).as("__g"))
      val cum = graft.operators.PrefixSum
        .groupedCumSum(toks, "__g", "doc_id", "n_tok", "cum_tok")
        .withColumn("s0", col("cum_tok") - col("n_tok"))
      cum
        .withColumn("block_id",
          explode(sequence(floor(col("s0") / B).cast("long"),
            floor((col("cum_tok") - 1) / B).cast("long"))))
        .withColumn("slice_start", greatest(col("s0"), col("block_id") * B))
        .withColumn("slice_end", least(col("cum_tok"), (col("block_id") + 1) * B))
        .select(col("block_id"), col("doc_id"),
          (col("slice_start") - col("s0")).as("tok_from"),
          (col("slice_end") - col("slice_start")).as("n_toks"),
          (col("slice_start") - col("block_id") * B).as("blk_off"))
        .orderBy("block_id", "doc_id")
    },
    """WITH toks AS (SELECT doc_id,
      |                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |              FROM documents),
      |cum AS (SELECT doc_id, n_tok,
      |               CAST(sum(n_tok) OVER (ORDER BY doc_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
      |        FROM toks),
      |spans AS (SELECT doc_id, n_tok, cum_tok, cum_tok - n_tok AS s0,
      |                 unnest(generate_series((cum_tok - n_tok) // 128,
      |                                        (cum_tok - 1) // 128)) AS block_id
      |          FROM cum)
      |SELECT block_id, doc_id,
      |       greatest(s0, block_id * 128) - s0 AS tok_from,
      |       least(cum_tok, (block_id + 1) * 128) - greatest(s0, block_id * 128) AS n_toks,
      |       greatest(s0, block_id * 128) - block_id * 128 AS blk_off
      |FROM spans ORDER BY block_id, doc_id""".stripMargin)

  // Unigram language-model quality scoring (the CCNet/Wenzek et al.
  // 2020 shape with the corpus itself as the LM): pass 1 builds the
  // unigram distribution — a token-count groupBy whose shuffle moves
  // only vocab-sized partial counts (map-side combine), never (doc,
  // token) pairs; pass 2 re-scans the corpus and scores each document
  // map-side against the BROADCAST frequency table (vocab-bounded
  // driver collect, same bound class as the IVF centroids). Mean
  // negative log-probability per document; high = improbable tokens =
  // the filter signal. No per-token shuffle anywhere — at 100 TB the
  // cost is two corpus scans plus a vocab-sized exchange. The 1e-4
  // decimal rounding absorbs libm-vs-JVM ln() ulp differences and
  // summation-order drift (per-doc term count is bounded, so the
  // double error is ~1e-13 against a 1e-4 grid).
  spark("t_unigram_nll",
    (s, d) => {
      import s.implicits._
      val docs = Tables.t(s, d, "documents")
      val freq = docs
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      // Driver state is O(cap), not O(vocab): ≤cap types collect
      // exactly (bit-identical small-vocab path — 31 on this corpus);
      // beyond cap, top-cap by frequency + an <unk> tail bucket
      // (UnigramLM.build — TakeOrdered, the driver never sees the
      // full vocabulary).
      val bc = s.sparkContext.broadcast(
        graft.operators.UnigramLM.build(freq, UnigramVocabCap))
      docs
        .repartitionByRange(col("doc_id"))
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val toks = text.split(" ", -1)
          var acc = 0.0
          toks.foreach { t => acc += bc.value.nll(t) }
          (id, BigDecimal(acc / toks.length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
            toks.length.toLong)
        }
        .toDF("doc_id", "nll", "n_tok")
        .sortWithinPartitions("doc_id")
    },
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq)
      |SELECT t.doc_id,
      |       CAST(CAST(avg(-ln(CAST(f.c AS DOUBLE) / (SELECT n FROM tot))) AS DECIMAL(18,4)) AS DOUBLE) AS nll,
      |       CAST(count(*) AS BIGINT) AS n_tok
      |FROM toks t JOIN freq f ON t.tok = f.tok
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)

  // Corpus heavy-hitter n-grams: the top-20 most frequent trigrams —
  // the contamination/boilerplate audit that runs before and after a
  // dedup pass (a template phrase dominating the corpus shows up
  // here). Per-partition trigram counting happens in the partial
  // aggregate (map-side combine bounds the shuffle by the distinct-
  // trigram count, not the corpus), and the global top-k is Spark's
  // TakeOrderedAndProject — per-partition heaps, driver sees only
  // k·partitions candidates. Deterministic total order (count desc,
  // gram asc) makes the cut reproducible.
  spark("t_top_ngrams",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val grams = Tables.t(s, d, "documents")
        .select(col("text")).as[String]
        .flatMap { text =>
          val toks = text.split(" ", -1)
          if (toks.length < 3) Iterator.empty
          else toks.iterator.sliding(3).withPartial(false)
            .map(_.mkString(" "))
        }
        .toDF("gram")
      val top = grams.groupBy("gram").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), asc("gram"))
        .limit(20)
      // rank window runs over the already-limited 20-row frame only
      top.withColumn("rk",
          row_number().over(Window.orderBy(desc("c"), asc("gram"))).cast("long"))
        .select("rk", "gram", "c")
        .orderBy("rk")
    },
    """WITH w AS (SELECT string_split(text, ' ') AS toks FROM documents),
      |g AS (SELECT array_to_string(toks[i:i+2], ' ') AS gram
      |      FROM (SELECT toks, unnest(generate_series(1, len(toks)-2)) AS i FROM w)),
      |c AS (SELECT gram, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY gram)
      |SELECT CAST(row_number() OVER (ORDER BY c DESC, gram) AS BIGINT) AS rk, gram, c
      |FROM c ORDER BY c DESC, gram LIMIT 20""".stripMargin)

  // Per-source distribution shift: KL(P_source ‖ P_corpus) over the
  // unigram distributions — the domain-shift audit a mixture designer
  // runs before setting source weights (a source whose token
  // distribution diverges from the corpus is either valuable signal
  // or garbage; either way it needs eyes). Counts are exact BIGINTs
  // built from per-doc local maps, so the shuffle carries
  // (source, token, tf) partials bounded by |sources|·|vocab|, never
  // token instances; the KL sum is |vocab| double terms per source
  // against the broadcast corpus distribution, rounded at 1e-6 to
  // absorb summation-order drift.
  spark("t_source_kl",
    (s, d) => {
      import s.implicits._
      val pt = Tables.t(s, d, "documents")
        .select(col("source"), col("text"))
        // one input split otherwise → serial tokenize; the exchange
        // pays for itself here (JobCountProbe sf1: 0.64 → 0.52 s)
        // because the per-doc HashMap counting is heavy enough, unlike
        // the bm25 tf pass where the same lever measured a loss
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(String, String)]
        .flatMap { case (src, text) =>
          val counts = new java.util.HashMap[String, Long]()
          text.split(" ", -1).foreach(t => counts.merge(t, 1L, (a, b) => a + b))
          scala.jdk.CollectionConverters.IteratorHasAsScala(counts.entrySet().iterator())
            .asScala.map(e => (src, e.getKey, e.getValue))
        }
        .toDF("source", "tok", "tf")
        .groupBy("source", "tok").agg(sum("tf").as("c_st"))
      // every marginal as a window over the tiny aggregated frame
      // (|sources|·|vocab| rows): ONE execution of the heavy per-doc
      // pass instead of one per derived aggregate — the first form's
      // three side-aggregates each re-ran the flatMap+shuffle
      // (1.13 → 0.78 s at sf1, 2.6× vs the DuckDB twin)
      import org.apache.spark.sql.expressions.Window
      pt
        .withColumn("c_t", sum(col("c_st")).over(Window.partitionBy("tok")))
        .withColumn("n_s", sum(col("c_st")).over(Window.partitionBy("source")))
        .withColumn("n_vocab", count(lit(1)).over(Window.partitionBy("source")))
        .withColumn("n_c", sum(col("c_st")).over(Window.partitionBy()))
        .withColumn("term",
          (col("c_st").cast("double") / col("n_s")) *
            log((col("c_st").cast("double") / col("n_s")) /
              (col("c_t").cast("double") / col("n_c"))))
        .groupBy("source")
        .agg(first(col("n_s")).as("n_tok"), first(col("n_vocab")).as("n_vocab"),
          sum(col("term")).cast("decimal(18,6)").cast("double").as("kl"))
        .orderBy("source")
    },
    """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
      |pt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c_st FROM toks GROUP BY 1, 2),
      |corpus AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM pt GROUP BY tok),
      |nc AS (SELECT CAST(sum(c_st) AS BIGINT) AS n_c FROM pt),
      |st AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
      |              CAST(count(*) AS BIGINT) AS n_vocab
      |       FROM pt GROUP BY source)
      |SELECT p.source, st.n_s AS n_tok, st.n_vocab,
      |       CAST(CAST(sum((CAST(p.c_st AS DOUBLE) / st.n_s) *
      |              ln((CAST(p.c_st AS DOUBLE) / st.n_s) /
      |                 (CAST(c.c_t AS DOUBLE) / nc.n_c))) AS DECIMAL(18,6)) AS DOUBLE) AS kl
      |FROM pt p JOIN corpus c ON p.tok = c.tok JOIN st ON p.source = st.source, nc
      |GROUP BY p.source, st.n_s, st.n_vocab
      |ORDER BY p.source""".stripMargin)

  // Stratified (per-source) sampling with an exact quota: the k
  // hash-smallest docs of every source — the mixing primitive for
  // "N docs per domain" training subsets. Scale shape: a plain
  // row_number window would shuffle EVERY row to its source's
  // partition and sort it; instead phase 1 keeps a bounded heap per
  // source inside each input partition (k·|sources| entries, no
  // shuffle), so the exact-rank window in phase 2 sees at most
  // k·|sources|·partitions candidate rows — the only shuffled data.
  // Any global top-k row is a top-k row of its partition, so phase 1
  // drops no winner.
  spark("t_stratified_sample",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val k = 50
      val partial = Tables.t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          ((col("doc_id") % 2147483647L) * 2654435761L % 4294967296L).as("h"))
        .as[(Long, String, Long)]
        .mapPartitions { it =>
          // max-heap on (h, doc_id): head = current worst of the best
          // k, evicted when a smaller candidate arrives
          val ord = implicitly[Ordering[(Long, Long)]].reverse
          val heaps = scala.collection.mutable.Map.empty[String, java.util.PriorityQueue[(Long, Long)]]
          it.foreach { case (id, src, h) =>
            val q = heaps.getOrElseUpdate(src,
              new java.util.PriorityQueue[(Long, Long)](k + 1, ord))
            if (q.size < k) q.add((h, id))
            else if (ord.compare((h, id), q.peek()) > 0) { q.poll(); q.add((h, id)) }
          }
          heaps.iterator.flatMap { case (src, q) =>
            scala.jdk.CollectionConverters.IteratorHasAsScala(q.iterator).asScala
              .map(t => (t._2, src, t._1))
          }
        }
        .toDF("doc_id", "source", "h")
      val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      partial
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= k)
        .select(col("doc_id"), col("source"), col("rk"))
        .orderBy("source", "rk")
    },
    """SELECT doc_id, source, rk FROM (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source
      |         ORDER BY ((doc_id % 2147483647) * 2654435761) % 4294967296, doc_id) AS BIGINT) AS rk
      |  FROM documents) t
      |WHERE rk <= 50 ORDER BY source, rk""".stripMargin)

  // PII / entity scrubbing: redact email addresses, IPv4 addresses and
  // the token following "customer" (a stand-in for NER-lite name
  // masking that actually fires on this corpus — the email/IP patterns
  // are the real-world ones and are proven on literals in PiiScrubSpec).
  // Pure map-side regexp work over each document — embarrassingly
  // parallel, no shuffle; counts are taken on the ORIGINAL text so the
  // audit trail is independent of replacement order. Both engines use
  // leftmost-first non-overlapping replace semantics (Java regex /
  // RE2), so the masked text hashes are comparable.
  spark("t_pii_scrub",
    (s, d) => {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val ip = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
      val name = "\\bcustomer [a-z]+"
      // compute-then-pin-then-sort A/B (r15 optimization round):
      // measured WORSE at sf1 — 0.88 -> 2.62 s warm BenchOne. The
      // planner pulls this projection ABOVE the output sort, which
      // looks like it shuffles full texts needlessly, but it is the
      // better plan: the 6-regex pass runs once, post-exchange, at
      // shuffle parallelism, and the range sampler re-runs only the
      // bare scan. Pinning first forces the regex pass down to the
      // scan's split count (documents is one ~100 MB split at sf1 —
      // single-task regex). Left as the planner's shape deliberately.
      Tables.t(s, d, "documents").select(
          col("doc_id"),
          (regexp_count(col("text"), lit(email)) +
            regexp_count(col("text"), lit(ip))).cast("long").as("n_pii"),
          regexp_count(col("text"), lit(name)).cast("long").as("n_name"),
          md5(regexp_replace(regexp_replace(regexp_replace(col("text"),
              email, "<EMAIL>"), ip, "<IP>"), name, "customer <NAME>"))
            .as("scrub_md5"))
        .orderBy("doc_id")
    },
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) +
      |       len(regexp_extract_all(text, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_pii,
      |  CAST(len(regexp_extract_all(text, '\bcustomer [a-z]+')) AS BIGINT) AS n_name,
      |  md5(regexp_replace(regexp_replace(regexp_replace(text,
      |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |      '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
      |      '\bcustomer [a-z]+', 'customer <NAME>', 'g')) AS scrub_md5
      |FROM documents ORDER BY doc_id""".stripMargin)

  // Tokenizer vocabulary coverage: word frequencies ranked by count,
  // with the exact cumulative corpus share per rank — the curve a
  // tokenizer designer reads to size the vocab ("how many types cover
  // 95% of tokens"). Counting is the proven per-doc HashMap flatMap
  // (no token-instance shuffle, partials bounded by |vocab|); the
  // rank/cumsum windows run over the AGGREGATED vocab frame only —
  // orders of magnitude smaller than the corpus. For a 10M-type vocab
  // the single-partition window would serialize; swap in the
  // PrefixSum two-phase grouped cumsum (operators/PrefixSum.scala)
  // exactly as t_token_budget_prefix does. cum/total are exact
  // BIGINTs, so the share division is one deterministic double op.
  spark("t_vocab_coverage",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.t(s, d, "documents")
        .select(col("text"))
        // single-file parquet = one input split = a serial tokenize
        // pass; the exchange pays for itself because the per-doc
        // HashMap counting is heavy (same lever as t_source_kl,
        // 0.81 → ~0.5 s at sf1)
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[String]
        .flatMap { text =>
          val m = new java.util.HashMap[String, Long]()
          text.split(" ", -1).foreach(t => m.merge(t, 1L, (a, b) => a + b))
          scala.jdk.CollectionConverters.IteratorHasAsScala(m.entrySet().iterator())
            .asScala.map(e => (e.getKey, e.getValue))
        }
        .toDF("tok", "tf")
        .groupBy("tok").agg(sum("tf").as("c"))
      val w = Window.orderBy(desc("c"), asc("tok"))
      counts
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum", sum("c").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum("c").over(Window.partitionBy()))
        .withColumn("cum_share", col("cum").cast("double") / col("total"))
        .select(col("rk"), col("tok"), col("c"), col("cum_share"))
        .orderBy("rk")
    },
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok)
      |SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rk, tok, c,
      |  CAST(CAST(sum(c) OVER (ORDER BY c DESC, tok ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
      |    / (SELECT CAST(sum(c) AS BIGINT) FROM c) AS cum_share
      |FROM c ORDER BY rk""".stripMargin)

  // The 10M-type-vocab form of t_vocab_coverage: identical output
  // (same oracle SQL), but rank + cumulative count come from
  // PrefixSum.rankedCumSumDesc — value-range buckets on the count,
  // local windows with the full (c DESC, tok) tie-break, broadcast
  // offsets — instead of the one-task global window. Parallelism =
  // buckets instead of 1; this row EXECUTES the scale path the
  // single-window row documents (the t_token_budget_prefix pattern).
  spark("t_vocab_coverage_prefix",
    (s, d) => {
      import s.implicits._
      val counts = Tables.t(s, d, "documents")
        .select(col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[String]
        .flatMap { text =>
          val m = new java.util.HashMap[String, Long]()
          text.split(" ", -1).foreach(t => m.merge(t, 1L, (a, b) => a + b))
          scala.jdk.CollectionConverters.IteratorHasAsScala(m.entrySet().iterator())
            .asScala.map(e => (e.getKey, e.getValue))
        }
        .toDF("tok", "tf")
        .groupBy("tok").agg(sum("tf").as("c"))
      val total = counts.agg(sum("c")).as[Long].collect()(0) // one exact long
      graft.operators.PrefixSum.rankedCumSumDesc(counts, "c", "tok", "c", "rk", "cum")
        .withColumn("cum_share", col("cum").cast("double") / lit(total))
        .select(col("rk"), col("tok"), col("c"), col("cum_share"))
        .orderBy("rk")
    },
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok)
      |SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rk, tok, c,
      |  CAST(CAST(sum(c) OVER (ORDER BY c DESC, tok ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
      |    / (SELECT CAST(sum(c) AS BIGINT) FROM c) AS cum_share
      |FROM c ORDER BY rk""".stripMargin)

  // The ONE production entry (Engine.vocabCoverage): same stats-gated
  // dispatch over the aggregated vocab frame, same oracle as both
  // explicit forms above.
  spark("t_vocab_coverage_auto",
    (s, d) => {
      import s.implicits._
      val counts = Tables.t(s, d, "documents")
        .select(col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[String]
        .flatMap { text =>
          val m = new java.util.HashMap[String, Long]()
          text.split(" ", -1).foreach(t => m.merge(t, 1L, (a, b) => a + b))
          scala.jdk.CollectionConverters.IteratorHasAsScala(m.entrySet().iterator())
            .asScala.map(e => (e.getKey, e.getValue))
        }
        .toDF("tok", "tf")
        .groupBy("tok").agg(sum("tf").as("c"))
      graft.Engine(s).vocabCoverage(counts, "tok", "c").orderBy("rk")
    },
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok)
      |SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rk, tok, c,
      |  CAST(CAST(sum(c) OVER (ORDER BY c DESC, tok ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
      |    / (SELECT CAST(sum(c) AS BIGINT) FROM c) AS cum_share
      |FROM c ORDER BY rk""".stripMargin)

  // Percentile-clipping outlier filter (FineWeb-style): drop documents
  // whose length falls outside the exact (P1, P99) interval, report
  // per-source survivor counts and the kept length range. The bounds
  // come from Spark's EXACT interpolated percentile aggregate — its
  // partial state is a value→count map bounded by the number of
  // DISTINCT lengths (small by construction: doc sizes are bounded),
  // so it map-side combines and scales; the 1-row bounds frame is
  // broadcast into the filter, never shuffling the corpus. DuckDB's
  // quantile_cont uses the same (n-1)·p linear interpolation, so the
  // double bounds agree bit-for-bit on exact int inputs.
  spark("t_length_outliers",
    (s, d) => {
      val docs = Tables.t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars"))
      val bounds = docs.agg(
        expr("percentile(n_chars, 0.01)").as("lo"),
        expr("percentile(n_chars, 0.99)").as("hi"))
      docs.crossJoin(broadcast(bounds))
        .where(col("n_chars") > col("lo") && col("n_chars") < col("hi"))
        .groupBy("source")
        .agg(count(lit(1)).as("kept"),
          min("n_chars").as("min_c"), max("n_chars").as("max_c"))
        .orderBy("source")
    },
    """WITH b AS (SELECT quantile_cont(n_chars, 0.01) AS lo,
      |                  quantile_cont(n_chars, 0.99) AS hi FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS kept,
      |  CAST(min(n_chars) AS BIGINT) AS min_c, CAST(max(n_chars) AS BIGINT) AS max_c
      |FROM documents, b WHERE n_chars > b.lo AND n_chars < b.hi
      |GROUP BY source ORDER BY source""".stripMargin)
}
