package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.CmsAgg
import graft.pipeline.Sketches

/** Count-Min sketch aggregate + exact heavy hitters
  * ([[graft.pipeline.Sketches]]): estimate bounds, partitioning
  * invariance, the composed-SQL bucket recipe parity, and exactness of
  * the two-pass heavy-hitter scan against plain GROUP BY … HAVING. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // a Zipf-ish corpus: token t{k} appears 2^(9-k) times for k in 0..9,
  // plus a long unique tail
  private lazy val corpus: Seq[String] =
    (0 until 10).flatMap(k => Seq.fill(1 << (9 - k))(s"t$k")) ++
      (0 until 500).map(i => s"tail$i")

  test("bucket recipe equals the composed SQL form") {
    val toks = Seq("alpha", "βeta", "x y/z", "", "t7#3")
    for (t <- toks; d <- 0 until 4) {
      val sql = spark.sql(
        s"""SELECT CAST(conv(substr(md5(concat('${t.replace("'", "''")}',
            '#$d')), 1, 15), 16, 10) AS BIGINT) % 128""").head().getLong(0)
      assert(CmsAgg.bucket(UTF8String.fromString(t), d, 128) === sql,
        s"tok='$t' d=$d")
    }
  }

  test("estimates never under-count; exact for distinct-bucket tokens") {
    val df = corpus.toDF("tok")
    val sk = Sketches.cmsSketch(df, "tok", depth = 4, width = 2048)
    val truth = corpus.groupBy(identity).view.mapValues(_.size).toMap
    val est = df.distinct()
      .select(F.col("tok"),
        Sketches.cmsEstimate(F.col("tok"), sk, 4, 2048).as("e"))
      .as[(String, Long)].collect().toMap
    for ((t, c) <- truth) assert(est(t) >= c, s"under-count on $t")
    // with 2048 buckets and ~1010 rows the heavy tokens are near-exact
    assert(est("t0") < 512 + 32)
  }

  test("sketch is bit-identical across partitionings (merge order free)") {
    val a = Sketches.cmsSketch(corpus.toDF("tok").repartition(1), "tok")
    val b = Sketches.cmsSketch(
      corpus.reverse.toDF("tok").repartition(7), "tok")
    assert(a.toSeq === b.toSeq)
    assert(a.sum === 4L * corpus.size) // every row hits each depth row once
  }

  test("heavyHitters equals GROUP BY ... HAVING exactly") {
    val df = corpus.toDF("tok")
    for (threshold <- Seq(1L, 2L, 17L, 64L, 300L, 1000L)) {
      val got = Sketches.heavyHitters(df, "tok", threshold)
        .as[(String, Long)].collect().toMap
      val want = corpus.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= threshold).toMap
      assert(got === want, s"threshold=$threshold")
    }
  }

  test("xxhash64 bucket mode: same exact answer, probe matches the agg") {
    // the fast production recipe (md5Buckets = false): exactness is
    // hash-agnostic — CMS never under-counts in either mode — so the
    // prefiltered result equals GROUP BY ... HAVING identically
    val df = corpus.toDF("tok")
    for (threshold <- Seq(2L, 64L, 300L)) {
      val got = Sketches.heavyHitters(df, "tok", threshold,
          md5Buckets = false)
        .as[(String, Long)].collect().toMap
      val want = corpus.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= threshold).toMap
      assert(got === want, s"xx mode threshold=$threshold")
    }
    // and the column-side probe regenerates the aggregate's buckets:
    // estimates never under-count the true frequency
    val sk = Sketches.cmsSketch(df, "tok", md5Buckets = false)
    val est = df.groupBy("tok").count()
      .withColumn("est",
        Sketches.cmsEstimate(F.col("tok"), sk, md5Buckets = false))
      .where(F.col("est") < F.col("count"))
    assert(est.isEmpty, "xx-mode estimate under-counted")
  }

  test("null tokens contribute nothing and never surface") {
    val df = (corpus.map(Option(_)) ++ Seq.fill(50)(None)).toDF("tok")
    val sk = Sketches.cmsSketch(df, "tok")
    assert(sk.sum === 4L * corpus.size)
    val hh = Sketches.heavyHitters(df, "tok", 40L).as[(String, Long)]
      .collect().toMap
    assert(!hh.contains(null) && hh("t3") === 64L)
  }

  test("SQL registration: cms_agg matrix matches the Scala path") {
    corpus.toDF("tok").createOrReplaceTempView("cms_in")
    val viaSql = spark.sql(
      "SELECT cms_agg(tok, 4, 512) FROM cms_in").head().getSeq[Long](0)
    val viaScala = Sketches.cmsSketch(corpus.toDF("tok"), "tok", 4, 512)
    assert(viaSql.toArray.toSeq === viaScala.toSeq)
  }

  test("heavy-hitter plan: probe stage is a narrow filter, no extra agg") {
    val df = corpus.toDF("tok")
    val plan = Sketches.heavyHitters(df, "tok", 64L)
      .queryExecution.executedPlan.toString
    // exactly one aggregate pair (partial+final) downstream of the probe
    assert("HashAggregate".r.findAllIn(plan).size <= 4, plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"))
  }
}
