package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d_incremental decomposition (r16 VERDICT order #4: the #3/#4 bench
  * rows, 3.1-4.3 s clean, untouched since r12): attribute the row to
  * batch tokenize+hash vs corpus distinct-sets vs banding vs the
  * candidate band join vs the verification join vs finish, so the top
  * stage can be attacked with plan evidence.
  * Usage: runMain graft.IncProbe [sfDir] */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[6]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.DedupOps
    def timed(tag: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = Bench.force(f)
        println(f"[incprobe] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    def tok = DedupOps.tokensFor(spark, sfDir)
    def corpusTok = tok.filter(col("doc_id") % 7 =!= 0)
    def batchTok = tok.filter(col("doc_id") % 7 === 0)

    timed("tokens_all")(tok)
    timed("corpus_tok")(corpusTok)
    timed("corpus_sets")(DedupOps.distinctSetsDF(corpusTok))
    timed("batch_sets")(DedupOps.distinctSetsDF(batchTok))
    timed("corpus_bands")(DedupOps.setBands(spark, DedupOps.distinctSetsDF(corpusTok)))
    timed("batch_bands")(DedupOps.setBands(spark, DedupOps.distinctSetsDF(batchTok)))
    // candidate band join over uncached inputs (the real row caches
    // csets/bsets; this isolates join cost including recompute)
    timed("cand_join") {
      val csets = DedupOps.distinctSetsDF(corpusTok)
      val bsets = DedupOps.distinctSetsDF(batchTok)
      DedupOps.setBands(spark, bsets).select(col("sid").as("bsid"), col("band"), col("bkey"))
        .join(DedupOps.setBands(spark, csets).select(col("sid").as("csid"), col("band"), col("bkey")),
          Seq("band", "bkey"))
        .select("bsid", "csid").distinct()
    }
    // verification decomposition over PINNED inputs (mirrors the real
    // row's csets/bsets caches): isolate the intersect+filter from the
    // member explode from the final aggregate
    locally {
      val csets = DedupOps.distinctSetsDF(corpusTok).localCheckpoint(true)
      val bsets = DedupOps.distinctSetsDF(batchTok).localCheckpoint(true)
      val cand = DedupOps.setBands(spark, bsets).select(col("sid").as("bsid"), col("band"), col("bkey"))
        .join(DedupOps.setBands(spark, csets).select(col("sid").as("csid"), col("band"), col("bkey")),
          Seq("band", "bkey"))
        .select("bsid", "csid").distinct().localCheckpoint(true)
      def ver = cand
        .join(bsets.select(col("sid").as("bsid"), col("toks").as("tb"),
          size(col("toks")).as("nb"), col("members").as("bm")), "bsid")
        .join(csets.select(col("sid").as("csid"), col("toks").as("tc"),
          size(col("toks")).as("nc"), col("members").as("cm")), "csid")
        .withColumn("inter", size(array_intersect(col("tb"), col("tc"))))
        .withColumn("jac", col("inter").cast("double") / (col("nb") + col("nc") - col("inter")))
        .filter(col("jac") >= 0.5)
      timed("pinned_verify")(ver.select("bsid", "csid", "jac"))
      timed("pinned_verify_explode")(ver
        .select(explode(col("bm")).as("bid"), col("cm"), col("jac"))
        .select(col("bid"), explode(col("cm")).as("cid"), col("jac")))
      timed("pinned_cand_distinct_only")(cand)
      // A/B: join cost without any intersect (inter replaced by a size sum)
      timed("pinned_join_only")(cand
        .join(bsets.select(col("sid").as("bsid"), size(col("toks")).as("nb")), "bsid")
        .join(csets.select(col("sid").as("csid"), size(col("toks")).as("nc")), "csid")
        .select(col("bsid"), (col("nb") + col("nc")).as("x")))
      // A/B: intersect on xxhash64-transformed sorted LONG arrays (builtin)
      locally {
        val bh = bsets.select(col("sid").as("bsid"),
          sort_array(expr("transform(toks, t -> xxhash64(t))")).as("hb"),
          size(col("toks")).as("nb"), col("members").as("bm")).localCheckpoint(true)
        val ch = csets.select(col("sid").as("csid"),
          sort_array(expr("transform(toks, t -> xxhash64(t))")).as("hc"),
          size(col("toks")).as("nc"), col("members").as("cm")).localCheckpoint(true)
        timed("pinned_verify_longs")(cand
          .join(bh, "bsid").join(ch, "csid")
          .withColumn("inter", size(array_intersect(col("hb"), col("hc"))))
          .withColumn("jac", col("inter").cast("double") / (col("nb") + col("nc") - col("inter")))
          .filter(col("jac") >= 0.5)
          .select("bsid", "csid", "jac"))
        // typed merge-count over the sorted long arrays
        import spark.implicits._
        timed("pinned_verify_typed") {
          cand.join(bh, "bsid").join(ch, "csid")
            .select(col("hb"), col("nb"), col("hc"), col("nc"))
            .as[(Array[Long], Int, Array[Long], Int)]
            .mapPartitions { it =>
              it.flatMap { case (hb, nb, hc, nc) =>
                var i = 0; var j = 0; var inter = 0
                while (i < hb.length && j < hc.length) {
                  val a = hb(i); val b = hc(j)
                  if (a == b) { inter += 1; i += 1; j += 1 }
                  else if (a < b) i += 1 else j += 1
                }
                val jac = inter.toDouble / (nb + nc - inter)
                if (jac >= 0.5) Iterator.single(jac) else Iterator.empty
              }
            }.toDF("jac")
        }
      }
    }
    // the full row, as benched
    timed("full_d_incremental")(SparkEntry.queries("d_incremental")(spark, sfDir))
    spark.stop()
  }
}
