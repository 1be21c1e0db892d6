package graft.demo

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.SparkEntry

/** Scale rehearsal: benches the headline queries PLUS the newer operator
  * families (crawl/link-graph, sketches, retrieval, RDF-star, events,
  * near-dup, text) at sf0.1 and at the 10× sf1 replication
  * (graft.demo.MakeSf1), then runs a Zipf-skewed shuffle-join rehearsal
  * with AQE skew-join on vs off. Writes one JSON artifact.
  *
  * Usage: Test/runMain graft.demo.BenchSf1 [sf1Dir] [outJson]
  * (sf1Dir must already exist — run MakeSf1 first).
  */
object BenchSf1 {

  /** Newer families not in SparkEntry.benchQueries — every name must be
    * a key of SparkEntry.queries (checked at startup). */
  private val extraQueries: Seq[String] = Seq(
    // crawl + link graph
    "q_warc", "q_html_links", "q_anchor_text", "q_host_edges",
    "q_pagerank", "q_hits",
    // sketches
    "q_cms", "q_heavy_hitters", "q_approx_distinct", "q_approx_quantile",
    // retrieval
    "q_bm25", "q_rrf", "q_maxsim", "q_text_index", "q_hard_negatives",
    "q_binary_knn", "q_pq",
    // RDF-star
    "q_rdf_star",
    // events
    "q_events_asof", "q_events_sessions",
    // near-dup beyond minhash
    "q_dedup_ngram", "q_span_dedup", "q_semantic_dedup", "q_contamination",
    // text analysis
    "q_tfidf", "q_quality_score", "q_lang_id", "q_curate",
    // published filter rulesets + C4 line-span dedup (r14)
    "q_c4_filter", "q_gopher_quality", "q_gopher_repetition",
    "q_fineweb_quality", "q_c4_span_dedup")

  def main(args: Array[String]): Unit = {
    val sf1Dir = args.headOption.getOrElse("/tmp/sf1")
    val outJson = args.lift(1).getOrElse("/root/repo/BENCH_sf1_r12.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")

    val names = (SparkEntry.benchQueries ++ extraQueries).distinct
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: $missing")

    def benchDir(sfDir: String): Seq[(String, Seq[Double], Option[String])] = {
      // same warmup as graft.Bench
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      SparkEntry.queries("q_filter_in")(spark, sfDir).count()
      SparkEntry.queries("q_groupby_count")(spark, sfDir).count()
      SparkEntry.warmGraphs(spark, sfDir)
      graft.pipeline.Dedup.minhashDedupPairs(
        spark.read.parquet(s"$sfDir/documents.parquet").limit(50),
        "doc_id", "text", threshold = 0.8, k = 3, numHashes = 32, bands = 8)
        .count()
      names.map { name =>
        val fn = SparkEntry.queries(name)
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        var err: Option[String] = None
        var r = 0
        while (r < 3 && err.isEmpty) {
          val t0 = System.nanoTime()
          err = try { fn(spark, sfDir).count(); None } catch {
            case e: Throwable => Some(
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
          }
          times += (System.nanoTime() - t0) / 1e9
          r += 1
        }
        println(f"[bench] $sfDir $name%-22s min=${times.min}%.3f" +
          err.map(e => s" ERROR $e").getOrElse(""))
        (name, times.toSeq, err)
      }
    }

    /** Zipf-ish skewed shuffle join: ~24% of the 20M fact rows share one
      * key (pow-law via rand^8), dim too big to matter but broadcast is
      * DISABLED so the join is a shuffle join with one hot partition.
      * AQE skew-join must split it; we record on vs off. */
    def skewRehearsal(skewOn: Boolean): Double = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      val fact = spark.range(20000000L).select(
        (F.pow(F.rand(42), F.lit(8.0)) * 100000).cast("long").as("k"),
        (F.col("id") % 1000).as("v"))
      val dim = spark.range(100000L)
        .select(F.col("id").as("k"), (F.col("id") * 2).as("w"))
      val t0 = System.nanoTime()
      fact.join(dim, "k").agg(F.sum(F.col("v") + F.col("w"))).collect()
      val t = (System.nanoTime() - t0) / 1e9
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", true)
      t
    }

    val r01 = benchDir("/root/testdata/sf0.1")
    val r1 = benchDir(sf1Dir)
    // skew: run each mode twice, keep the best (shared-box noise)
    val skewOff = Seq(skewRehearsal(false), skewRehearsal(false)).min
    val skewOn = Seq(skewRehearsal(true), skewRehearsal(true)).min

    def med(ts: Seq[Double]): Double = {
      val s = ts.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def block(rs: Seq[(String, Seq[Double], Option[String])], dir: String)
        : String = {
      val ok = rs.filter(_._3.isEmpty)
      val qs = ok.map { case (n, ts, _) => f""""$n":${ts.min}%.3f""" }
        .mkString("{", ",", "}")
      val ms = ok.map { case (n, ts, _) => f""""$n":${med(ts)}%.3f""" }
        .mkString("{", ",", "}")
      val errs = rs.collect { case (n, _, Some(e)) =>
        s""""$n":"${e.replace("\"", "'")}"""" }
      val errField =
        if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
      f""" {"total":${ok.map(_._2.min).sum}%.3f,"queries":$qs,"medians":$ms$errField,"sf_dir":"$dir"}"""
    }
    val ratios = r01.zip(r1).collect {
      case ((n, t0, None), (_, t1, None)) => (n, t1.min / math.max(t0.min, 1e-9))
    }
    val worst = ratios.maxBy(_._2)
    val totalRatio = r1.filter(_._3.isEmpty).map(_._2.min).sum /
      r01.filter(_._3.isEmpty).map(_._2.min).sum
    val json =
      s"""{
  "note": "QUIET-BOX scale rehearsal (standing protocol since r15: nothing else runs on the box — no concurrent sbt, tests, or fuzz jobs — one artifact carries BOTH best-of-3 totals and medians; any scale claim cites only artifacts produced this way) over the FULL current surface: the 12 headline queries plus ${extraQueries.length} newer-family queries (crawl/link-graph, sketches, retrieval, RDF-star, events, near-dup, text). sf1 = 10x key-shifted replication of sf0.1 (graft.demo.MakeSf1). best-of-3 with medians, local[32], AQE + skew-join enabled, same JVM settings as the driver bench. Skew rehearsal: 20M-row Zipf-skewed fact (~24% of rows on one key) shuffle-joined (broadcast disabled) to a 100k dim, AQE skew-join on vs off, best of 2.",
  "sf0_1":${block(r01, "/root/testdata/sf0.1")},
  "sf1":${block(r1, sf1Dir)},
  "scaling": "10x data -> ${f"$totalRatio%.2f"}x total; worst query ${worst._1} ${f"${worst._2}%.2f"}x",
  "skew_rehearsal": {"rows": 20000000, "hot_key_share": 0.24, "skewjoin_off_sec": ${f"$skewOff%.3f"}, "skewjoin_on_sec": ${f"$skewOn%.3f"}}
}
"""
    java.nio.file.Files.writeString(java.nio.file.Path.of(outJson), json)
    println(s"[bench] wrote $outJson")
    println(json)
    spark.stop()
  }
}
