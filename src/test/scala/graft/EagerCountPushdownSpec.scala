package graft

import org.apache.spark.sql.{DataFrame, functions => F}

/** The eager COUNT(*) pushdown rule (graft.optimizer.EagerCountPushdown):
  * fires only for inner equi-joins that will SHUFFLE the counted side,
  * and the rewritten plan returns exactly the unrewritten results —
  * including duplicate join keys on both sides, non-matching keys, the
  * empty global group, and counts nested in larger expressions. */
class EagerCountPushdownSpec extends SparkSpec {

  import spark.implicits._

  private def fact: DataFrame =
    Seq((1L, "x"), (1L, "y"), (2L, "z"), (2L, "w"), (2L, "v"), (4L, "q"))
      .toDF("fk", "payload")
  // duplicate dim keys on purpose: the join multiplies, the rewrite must too
  private def dim: DataFrame =
    Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c")).toDF("k", "name")

  private def grouped(withHint: Boolean): DataFrame = {
    val d = if (withHint) dim.hint("shuffle_hash") else dim
    fact.join(d, F.col("fk") === F.col("k"))
      .groupBy("name").agg(F.count(F.lit(1)).as("cnt"))
  }

  private def firedIn(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("__graft_c0")

  test("fires under a shuffle hint; results identical to the broadcast plan") {
    val rewritten = grouped(withHint = true)
    val baseline = grouped(withHint = false)
    assert(firedIn(rewritten), "expected the pushdown to fire under shuffle_hash")
    assert(!firedIn(baseline), "small dim should stay broadcast, no pushdown")
    val got = rewritten.orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    val want = baseline.orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got === want)
    assert(got.toSeq === Seq(("a", 2L), ("b", 3L), ("b2", 3L)))
  }

  test("global count over an empty shuffled join is 0, not null") {
    // Range-backed fact so the no-match filter can't constant-fold the
    // side to an empty LocalRelation before the rule sees the join
    val noMatch = spark.range(6).select((F.col("id") + 100).as("fk"))
      .join(dim.hint("shuffle_hash"), F.col("fk") === F.col("k"))
      .agg(F.count(F.lit(1)).as("cnt"))
    assert(firedIn(noMatch))
    assert(noMatch.collect().map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("count nested in an expression is rewritten consistently") {
    val df = fact.join(dim.hint("shuffle_hash"), F.col("fk") === F.col("k"))
      .groupBy("name").agg((F.count(F.lit(1)) * 10 + 1).as("c10"))
    assert(firedIn(df))
    assert(df.orderBy("name").collect().map(_.getLong(1)).toSeq ===
      Seq(21L, 31L, 31L))
  }

  test("does not fire for non-count aggregates or outer joins") {
    val sums = fact.join(dim.hint("shuffle_hash"), F.col("fk") === F.col("k"))
      .groupBy("name").agg(F.count(F.lit(1)).as("cnt"), F.max("payload").as("m"))
    assert(!firedIn(sums), "a MAX over the pushed side must block the rewrite")
    val outer = fact.join(dim.hint("shuffle_hash"), F.col("fk") === F.col("k"),
      "left_outer").groupBy("name").agg(F.count(F.lit(1)).as("cnt"))
    assert(!firedIn(outer), "outer joins must not be rewritten")
  }

  test("does not fire when group keys come from the counted side") {
    val df = fact.join(dim.hint("shuffle_hash"), F.col("fk") === F.col("k"))
      .groupBy("payload").agg(F.count(F.lit(1)).as("cnt"))
    assert(!firedIn(df))
  }

  test("SPARQL grouped count through a forced-shuffle join stays exact") {
    // drive the engine path end-to-end with broadcast disabled so the
    // rule fires inside a compiled SPARQL plan (the q_path_seq shape)
    val ttl = new StringBuilder("@prefix : <http://e/> .\n")
    for (i <- 0 until 50; j <- 0 until (i % 3) + 1)
      ttl.append(s":l${i}_$j :ref :o${i % 7} .\n")
    for (i <- 0 until 7) ttl.append(s""":o$i :name "n${i % 2}" .\n""")
    val e = Engine.inline(ttl.toString)
    val q = """PREFIX : <http://e/>
      SELECT ?n (COUNT(*) AS ?c) { ?l :ref ?o . ?o :name ?n }
      GROUP BY ?n ORDER BY ?n"""
    val before = e.select(q).collect().map(r => (r.getString(0), r.getLong(1)))
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val after = e.select(q).collect().map(r => (r.getString(0), r.getLong(1)))
      assert(after === before)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }
}
