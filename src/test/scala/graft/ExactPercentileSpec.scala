package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ExactPercentile

/** Distributed exact percentile: histogram + targeted fetch must equal
  * the built-in exact `percentile` aggregate on every shape —
  * heavy-hitter skew (resolved with no fetch), forced recursion (tiny
  * fetchCap), nulls, single-value groups, interpolated ranks. */
class ExactPercentileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def reference(df: org.apache.spark.sql.DataFrame, p: Double): Map[String, Double] =
    df.groupBy("g").agg(org.apache.spark.sql.functions.expr(s"percentile(v, $p)").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def check(df: org.apache.spark.sql.DataFrame, ps: Seq[Double],
                    buckets: Int = 64, fetchCap: Int = 1 << 17): Unit = {
    val names = ps.indices.map(i => s"p$i")
    val got = ExactPercentile.compute(df, "g", "v", ps, names,
      buckets = buckets, fetchCap = fetchCap).collect()
      .map(r => r.getString(0) -> ps.indices.map(r.getDouble _ compose (_ + 1))).toMap
    ps.zipWithIndex.foreach { case (p, i) =>
      val ref = reference(df, p)
      ref.foreach { case (g, expect) =>
        val v = got(g)(i)
        assert(math.abs(v - expect) <= math.abs(expect) * 1e-12 + 1e-12,
          s"group $g p=$p: got $v expected $expect")
      }
    }
  }

  test("matches built-in percentile on mixed continuous data") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 20000).map(i => (s"g${i % 3}", rnd.nextGaussian() * 100)).toDF("g", "v")
    check(df, Seq(0.0, 0.25, 0.5, 0.9, 1.0))
  }

  test("heavy-hitter skew: dominant single value resolves without fetch") {
    import spark.implicits._
    val df = ((1 to 50000).map(_ => ("a", 42.0)) ++ (1 to 100).map(i => ("a", i.toDouble)))
      .toDF("g", "v")
    check(df, Seq(0.5, 0.99), buckets = 8)
  }

  test("tiny fetchCap forces recursive re-bucketing") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 30000).map(i => ("a", rnd.nextDouble())).toDF("g", "v")
    check(df, Seq(0.5), buckets = 4, fetchCap = 512)
  }

  test("nulls ignored; single-value and tiny groups exact") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
                 ("b", Some(7.0)), ("c", Some(2.0)), ("c", Some(4.0)))
      .toDF("g", "v")
    check(df, Seq(0.5))
  }

  test("-0.0 with positive subnormals: signed zero does not shift ranks") {
    import spark.implicits._
    // pre-fix, -0.0 landed in a different bit bucket than +0.0 but the
    // numeric fetch (v >= lo) pulled it back in, shifting the rank index
    val df = (Seq.fill(5)(-0.0) ++ Seq(Double.MinPositiveValue,
        Double.MinPositiveValue * 2, 1e-310, 0.5, 1.0, 2.0))
      .map(("a", _)).toDF("g", "v")
    check(df, Seq(0.25, 0.5, 0.75), buckets = 4, fetchCap = 3)
  }

  test("computeMultiAuto: small-path equals histogram path") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(i => (s"g${i % 4}", rnd.nextGaussian() * 10,
      rnd.nextDouble() * 100)).toDF("g", "a", "b")
    val specs = Seq(("a", Seq(0.5, 0.9), Seq("a50", "a90")), ("b", Seq(0.25), Seq("b25")))
    def m(r: org.apache.spark.sql.DataFrame) = r.collect()
      .map(x => x.getString(0) -> (1 to 3).map(x.getDouble)).toMap
    val small = m(ExactPercentile.computeMultiAuto(df, "g", specs))
    val hist = m(ExactPercentile.computeMultiAuto(df, "g", specs, maxSmallRows = 0))
    assert(small.keySet == hist.keySet)
    small.foreach { case (g, vs) =>
      vs.zip(hist(g)).foreach { case (x, y) =>
        assert(math.abs(x - y) <= math.abs(y) * 1e-12 + 1e-12, s"group $g: $x vs $y") }
    }
  }

  test("percentile_buf map mode, raw degrade and mixed merges are value-identical") {
    import spark.implicits._
    val ps = Array(0.0, 0.1, 0.5, 0.77, 1.0)
    def registerWithCap(cap: Int): Unit =
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "percentile_buf_capped", exprs => graft.functions.PercentileBuf(
          exprs.head, ps, mapCap = cap), "built-in")
    val rnd = new scala.util.Random(13)
    // 40 distinct repeated values + a continuous tail + -0.0/NaN-free
    // mix, across several partitions so merges cross modes: cap=8
    // degrades mid-partition, cap=1<<16 never degrades
    val vals = (1 to 20000).map(_ => (rnd.nextInt(40) + 1).toDouble) ++
               (1 to 5000).map(_ => rnd.nextDouble() * 1e6) ++ Seq.fill(30)(-0.0)
    val df = spark.createDataset(spark.sparkContext.parallelize(vals.map(("a", _)), 7))
      .toDF("g", "v")
    val expected = df.groupBy("g")
      .agg(org.apache.spark.sql.functions.expr(
        s"percentile(v, array(${ps.mkString(",")}))").as("r"))
      .collect()(0).getSeq[Double](1)
    Seq(8, 64, 1 << 16).foreach { cap =>
      registerWithCap(cap)
      val got = df.groupBy("g")
        .agg(org.apache.spark.sql.functions.expr(
          "percentile_buf_capped(CAST(v AS DOUBLE))").as("r"))
        .collect()(0).getSeq[Double](1)
      got.zip(expected).foreach { case (g, e) =>
        assert(math.abs(g - e) <= math.abs(e) * 1e-12 + 1e-12, s"cap=$cap: $got vs $expected")
      }
    }
  }

  test("driver-cells guard fails fast instead of collecting unbounded state") {
    import spark.implicits._
    val df = (1 to 200).map(i => (s"g$i", i.toDouble)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      ExactPercentile.computeMulti(df, "g", Seq(("v", Seq(0.5), Seq("p"))),
        materialize = false, maxDriverCells = 50)
    }
    assert(e.getMessage.contains("shard the group domain"))
  }

  test("double_sortable_bits is order-preserving, specials included") {
    import spark.implicits._
    graft.functions.DoubleSortableBits.register(spark)
    val rnd = new scala.util.Random(11)
    val vals = Seq(Double.NegativeInfinity, -1e300, -1.5, -Double.MinPositiveValue,
        -0.0, 0.0, Double.MinPositiveValue, 1.5, 1e300,
        Double.PositiveInfinity, Double.NaN) ++
      (1 to 2000).map(_ => rnd.nextGaussian() * math.pow(10, rnd.nextInt(20) - 10))
    val rows = vals.toDF("v")
      .selectExpr("v", "double_sortable_bits(v) AS s")
      .orderBy("v").collect()
    // Spark's double order (NaN last) must equal signed order of s
    val s = rows.map(_.getLong(1))
    assert(s.zip(s.tail).forall { case (a, b) => a <= b },
      "sortable bits not monotone w.r.t. Spark double ordering")
    // and equal doubles (incl. -0.0 vs 0.0 caveat: distinct bits but
    // adjacent) never invert
    assert(s.distinct.length >= s.length - vals.size / 2)
  }
}
