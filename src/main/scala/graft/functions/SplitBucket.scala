package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The deterministic 80/10/10 train/val/test assignment: a document's
  * split is a pure function of its id (Knuth multiplicative hash into
  * a 2^32 bucket space), so it is stable under corpus growth and
  * identical on any engine. SINGLE source of truth for the thresholds —
  * t_split_assign (the assignment query) and d_split_leakage (the
  * cross-split contamination audit) must always agree on the boundary,
  * in both their Spark plans and their DuckDB oracle SQL.
  */
object SplitBucket {
  /** ceil(0.80 * 2^32) and floor(0.90 * 2^32) — the exact shipped
    * boundaries (t_split_assign since round 8); changing them changes
    * which documents move split, so they are frozen here. */
  val TrainUpper = 3435973837L // bucket < this → train (0.8*2^32 = 3435973836.8)
  val ValUpper = 3865470566L   // bucket < this → val; else test (0.9*2^32 = 3865470566.4)

  def bucket(id: Column): Column =
    (id % 2147483647L) * 2654435761L % 4294967296L

  def splitOf(id: Column): Column = {
    val b = bucket(id)
    when(b < TrainUpper, "train").when(b < ValUpper, "val").otherwise("test")
  }

  /** the same function for typed kernels: 0=train, 1=val, 2=test */
  val SplitNames: Array[String] = Array("train", "val", "test")
  def splitIdx(id: Long): Int = {
    val b = (id % 2147483647L) * 2654435761L % 4294967296L
    if (b < TrainUpper) 0 else if (b < ValUpper) 1 else 2
  }

  /** the same function as DuckDB SQL over a column reference */
  def splitSql(idExpr: String): String =
    s"""CASE WHEN (($idExpr % 2147483647) * 2654435761) % 4294967296 < $TrainUpper THEN 'train'
       |     WHEN (($idExpr % 2147483647) * 2654435761) % 4294967296 < $ValUpper THEN 'val'
       |     ELSE 'test' END""".stripMargin
}
