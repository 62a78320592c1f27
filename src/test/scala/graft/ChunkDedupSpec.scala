package graft

import org.scalatest.funsuite.AnyFunSuite

/** d_chunk_dedup (aligned 10-word chunk dedup with document
  * reconstruction, the Lee et al. 2022 sub-document granularity) must
  * equal an independent driver-side reference: first occurrence by
  * (doc_id, offset) wins, every later copy of the same chunk is cut,
  * and each document's surviving text is its kept chunks in offset
  * order. */
class ChunkDedupSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def referenceDedup(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, String)] = {
    def chunksOf(text: String): Vector[String] =
      text.split(" ", -1).grouped(10).map(_.mkString(" ")).toVector
    val seen = scala.collection.mutable.Set.empty[String]
    // first occurrence = lowest doc_id then lowest offset: scan docs
    // sorted by id, offsets in order
    docs.sortBy(_._1).map { case (id, text) =>
      val cs = chunksOf(text)
      val kept = cs.filter { c => if (seen.contains(c)) false else { seen.add(c); true } }
      (id, cs.size.toLong, kept.size.toLong, kept.mkString(" "))
    }
  }

  test("equals the driver reference on sf0.001 and dedup actually fires") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = referenceDedup(docs)
    val got = queries.DedupOps.set.queries("d_chunk_dedup")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == want)
    // the synthetic small-vocab corpus must contain repeated chunks,
    // otherwise this row proves nothing
    assert(got.map(x => x._2 - x._3).sum > 0, "no chunk was ever deduplicated")
  }

  test("kept chunks are globally unique and cover every distinct chunk") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val allChunks = docs.flatMap(_._2.split(" ", -1).grouped(10).map(_.mkString(" ")))
    val keptChunks = queries.DedupOps.set.queries("d_chunk_dedup")(spark, sfDir)
      .collect()
      .flatMap(r => r.getString(3) match {
        case "" => Seq.empty[String]
        case t  => t.split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
      })
    // note: reconstruction concatenates kept chunks, so re-chunking the
    // output at 10-word boundaries only re-yields the original chunks
    // when no full chunk was cut BEFORE a kept one in the same doc —
    // so compare as multisets of words per doc is too weak, and exact
    // re-chunking too strong; instead assert cardinalities, which the
    // winner-per-distinct-chunk construction pins exactly
    assert(keptChunks.length <= allChunks.length)
    val distinctAll = allChunks.distinct.length
    val keptTotal = queries.DedupOps.set.queries("d_chunk_dedup")(spark, sfDir)
      .collect().map(_.getLong(2)).sum
    assert(keptTotal == distinctAll,
      s"kept $keptTotal chunks but corpus has $distinctAll distinct chunks")
  }
}
