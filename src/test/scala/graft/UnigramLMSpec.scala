package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** UnigramLM.build: the driver table must be O(cap), not O(vocab),
  * and the ≤cap path must be the exact (uncapped) table so small-vocab
  * oracle rows stay bit-identical. */
class UnigramLMSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  /** zipf-ish frequency frame with `types` distinct tokens:
    * token t_i occurs (types - i) times, so ordering by count is the
    * natural index order and boundary ties can't occur. */
  private def freqFrame(types: Int) = {
    import spark.implicits._
    (0 until types).map(i => (f"t_$i%06d", (types - i).toLong))
      .toDF("tok", "c")
  }

  test("vocab <= cap: exact table, full mass, no tail") {
    val vt = operators.UnigramLM.build(freqFrame(31), cap = 1000)
    assert(vt.counts.size == 31)
    assert(vt.tailMass == 0L && vt.tailTypes == 0L)
    assert(vt.total == (1 to 31).map(_.toLong).sum)
    // exact per-type probability — identical to the uncapped formula
    assert(vt.nll("t_000000") == -math.log(31.0 / vt.total))
  }

  test("out-of-table token against an EXACT table fails loudly, never NaN") {
    val vt = operators.UnigramLM.build(freqFrame(31), cap = 1000)
    val e = intercept[IllegalStateException] { vt.nll("never_seen") }
    assert(e.getMessage.contains("never_seen"))
  }

  test("vocab > cap: driver state is exactly cap entries + unk bucket") {
    val types = 5000
    val cap = 64
    val vt = operators.UnigramLM.build(freqFrame(types), cap)
    assert(vt.counts.size == cap) // O(cap) driver state, not O(vocab)
    // top-cap by frequency = the first `cap` tokens of the zipf frame
    assert(vt.counts.contains("t_000000") && vt.counts.contains(f"t_${cap - 1}%06d"))
    assert(!vt.counts.contains(f"t_$cap%06d"))
    val total = (1 to types).map(_.toLong).sum
    val kept = ((types - cap + 1) to types).map(_.toLong).sum
    assert(vt.total == total)
    assert(vt.tailMass == total - kept)
    assert(vt.tailTypes == (types - cap).toLong)
    // in-table token: exact; out-of-table token: per-type tail share
    assert(vt.nll("t_000000") == -math.log(types.toDouble / total))
    val unkP = vt.tailMass.toDouble / vt.tailTypes / total
    assert(vt.nll("never-seen") == -math.log(unkP))
    // probabilities over the full vocabulary still sum to 1
    val mass = vt.counts.values.map(_.toDouble / total).sum +
      vt.tailTypes * unkP
    assert(math.abs(mass - 1.0) < 1e-9)
  }

  test("capped table scores every in-table token identically to uncapped") {
    val f = freqFrame(200)
    val exact = operators.UnigramLM.build(f, cap = 1000)
    val capped = operators.UnigramLM.build(f, cap = 50)
    capped.counts.keys.foreach { t =>
      assert(capped.nll(t) == exact.nll(t), s"token $t")
    }
  }
}
