package graft

import org.apache.spark.sql.{functions => F}

import graft.pipeline.TextAnalysis

/** Plan-shape pins for the r14 corpus operators, so a future change
  * cannot silently regress their 100-TB posture:
  *
  *  - the published filter rulesets (C4 / Gopher / FineWeb) must stay
  *    NARROW — single-stage plans with zero exchanges, evaluated inside
  *    the scan;
  *  - c4SpanDedup must keep its shape: no cartesian or nested-loop
  *    join anywhere, the first-occurrence aggregate partial-aggregated
  *    (map-side combined) on the fixed-width md5 key.
  */
class PipelinePlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val docs = (1L to 64L)
    .map(i => (i, s"Doc $i line one.\nDoc $i line two.\nShared tail."))
    .toDF("id", "text")

  test("filter rulesets are single-stage: zero exchanges, no joins") {
    val narrow = Seq(
      "c4" -> TextAnalysis.c4Filter(docs, "id", "text"),
      "gopher" -> docs.select(
        TextAnalysis.gopherQuality(F.col("text")).getField("passes")),
      "repetition" -> docs.select(
        TextAnalysis.gopherRepetition(F.col("text")).getField("passes")),
      "fineweb" -> docs.select(
        TextAnalysis.finewebQuality(F.col("text")).getField("passes")),
      "sentences" -> docs.select(TextAnalysis.sentences(F.col("text"))))
    for ((name, df) <- narrow) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"$name gained a shuffle:\n$p")
      assert(!p.contains("Join"), s"$name gained a join:\n$p")
    }
  }

  test("c4SpanDedup: no cartesians; map-side-combined first-occurrence agg") {
    val p = plan(TextAnalysis.c4SpanDedup(docs, "id", "text"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"span dedup plan grew a cartesian:\n$p")
    // the groupBy(md5).agg(min(struct), count) must keep a partial
    // (map-side) aggregate below its exchange — ObjectHashAggregate or
    // SortAggregate appearing BOTH above and below the shuffle
    val aggs = "(ObjectHashAggregate|SortAggregate|HashAggregate)".r
      .findAllIn(p).size
    assert(aggs >= 4, s"expected partial+final aggregate pairs:\n$p")
  }
}
