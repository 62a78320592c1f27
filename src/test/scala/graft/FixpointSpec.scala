package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixpoint.recursiveUnion semantics: UNION-distinct termination on
  * cyclic graphs, the maxRounds cyclic-derivation guard, and the
  * empty-base degenerate case. (Value equality vs a real
  * `WITH RECURSIVE` is proven by the q_recursive oracle row.) */
class FixpointSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("cyclic graph reaches the fixpoint (distinct saturates the cycle)") {
    import spark.implicits._
    // 0→1→2→0 plus a tail 2→3: reachability from 0 must terminate and
    // cover the whole cycle even though derivations repeat forever
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)).toDF("src", "dst")
    val base = Seq(Tuple1(0L)).toDF("node")
    val got = operators.Fixpoint.recursiveUnion(base, fr =>
        edges.join(fr, col("src") === col("node")).select(col("dst").as("node")))
      .orderBy("node").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L))
  }

  test("non-converging derivation throws at maxRounds instead of truncating") {
    import spark.implicits._
    val base = Seq(Tuple1(0L)).toDF("n")
    val ex = intercept[IllegalStateException] {
      operators.Fixpoint.recursiveUnion(base,
        fr => fr.select((col("n") + 1).as("n")), maxRounds = 5)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("empty base returns an empty frame with the base schema") {
    import spark.implicits._
    val base = Seq.empty[Long].toDF("n")
    val out = operators.Fixpoint.recursiveUnion(base,
      fr => fr.select((col("n") + 1).as("n")))
    assert(out.columns.toSeq == Seq("n"))
    assert(out.count() == 0)
  }
}
