package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (the manual complement to AQE's
  * skew-join splitting, for when one side must be replicated):
  * the skewed (large) side gets a random salt in [0, n); the small
  * side is replicated n× with every salt value; the join key becomes
  * (key, salt), spreading a hot key over n shuffle partitions.
  *
  * At 100 TB this is the difference between one straggler task holding
  * a 2 TB hash partition and n tasks holding 2 TB / n each. AQE covers
  * sort-merge skew automatically; salting remains the tool for skewed
  * aggregations and for joins AQE can't split (e.g. bucketed inputs).
  */
object SkewJoin {

  def saltedEquiJoin(skewed: DataFrame, small: DataFrame,
                     skewedKey: String, smallKey: String,
                     salts: Int = 16, joinType: String = "inner"): DataFrame = {
    val saltCol = (rand(seed = 7) * salts).cast("int")
    val l = skewed.withColumn("__salt", saltCol)
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(skewedKey) === r(smallKey) && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * count/sum-style aggregates pre-combine on (key, salt) before the
    * final combine on key — bounds any single reducer's input. */
  def saltedCountSum(df: DataFrame, key: String, sumCol: String,
                     salts: Int = 16): DataFrame = {
    df.withColumn("__salt", (rand(seed = 7) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as(s"sum_$sumCol"))
  }
}
