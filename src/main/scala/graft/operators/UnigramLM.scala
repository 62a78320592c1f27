package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-side unigram frequency table for corpus-LM scoring
  * (the CCNet / Wenzek et al. 2020 quality-filter shape), with the
  * driver state CAPPED at `cap` types.
  *
  * Gating mirrors `ExactPercentile.computeMultiAuto`: a cheap
  * cardinality probe picks the path.
  *
  *   - vocab ≤ cap  → the EXACT table (every type, its full count):
  *     bit-identical to the uncapped behavior, so small-vocab oracle
  *     rows keep their hashes.
  *   - vocab > cap  → top-`cap` types by (count desc, token asc) via
  *     a TakeOrdered (per-partition heaps; the driver materializes
  *     exactly `cap` rows, never the vocabulary), plus an `<unk>`
  *     bucket holding the tail's total mass and type count. An
  *     out-of-table token scores with the tail's PER-TYPE share
  *     `tailMass / tailTypes / total` — probabilities still sum to 1
  *     over the full vocabulary, and the cut is deterministic (total
  *     order on the boundary ties).
  *
  * At 100 TB the frequency frame itself stays distributed either way —
  * only the table the executors score against is bounded: O(cap)
  * strings on the driver and in the broadcast, independent of corpus
  * vocabulary (a 10M-type tokenizer vocab no longer OOMs the driver).
  */
object UnigramLM {

  /** Broadcast-able scoring table. `counts` has ≤ cap entries;
    * `tailMass`/`tailTypes` describe everything cut from it. */
  final case class VocabTable(
      counts: Map[String, Long],
      total: Long,
      tailMass: Long,
      tailTypes: Long) {

    /** negative log-probability of one token under the table */
    def nll(tok: String): Double = counts.get(tok) match {
      case Some(c) => -math.log(c.toDouble / total)
      case None =>
        // per-type uniform share of the <unk> bucket; tailTypes > 0
        // whenever an out-of-table token can exist (the exact path
        // has tailTypes == 0 AND a complete table). Enforced: scoring
        // a token outside the build corpus against an exact table
        // must fail loudly, never return NaN (-log(0/0)).
        if (tailTypes == 0L)
          throw new IllegalStateException(
            s"UnigramLM: token '$tok' not in the exact vocabulary table " +
            "(tailTypes == 0): the scored corpus contains tokens absent " +
            "from the build corpus — build the table over a superset, or " +
            "raise the cap so the <unk> tail bucket exists")
        -math.log(tailMass.toDouble / tailTypes.toDouble / total.toDouble)
    }
  }

  /** Build the table from a `(tok: String, c: Long)` frequency frame.
    * Runs two tiny jobs (a count + either a full collect of ≤ cap rows
    * or a TakeOrdered of exactly cap rows + a 1-row sum). */
  def build(freq: DataFrame, cap: Int): VocabTable = {
    val spark = freq.sparkSession
    import spark.implicits._
    val typed = freq.select(col("tok").cast("string"), col("c").cast("long"))
      .as[(String, Long)]
      // the frequency frame is vocab-bounded (small by definition) and
      // feeds 2-3 actions here — persist it so the corpus tokenize
      // pass behind it runs ONCE, not once per action
      .persist()
    try {
      val vocabSize = typed.count()
      if (vocabSize <= cap) {
        val m = typed.collect().toMap
        VocabTable(m, m.values.sum, 0L, 0L)
      } else {
        val top = typed.orderBy(col("c").desc, col("tok").asc)
          .limit(cap).collect()
        val total = typed.toDF().agg(sum(col("c")).cast("long")).as[Long].head()
        val kept = top.map(_._2).sum
        VocabTable(top.toMap, total, total - kept, vocabSize - cap)
      }
    } finally typed.unpersist()
  }
}
