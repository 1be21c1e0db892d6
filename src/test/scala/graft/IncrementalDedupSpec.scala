package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.Dedup

/** Incremental (snapshot-vs-snapshot) exact dedup: bloom-prefiltered
  * anti-join semantics, exactness regardless of fpp, within-batch
  * duplicates kept, and the one-anti-join plan shape. */
class IncrementalDedupSpec extends SparkSpec {

  test("equals plain anti-join semantics on overlapping corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val seenTexts = (0 until 200).map(i => s"seen doc ${rnd.nextInt(80)}")
    val incoming = (0 until 300).map(i =>
      (i.toLong, s"seen doc ${rnd.nextInt(160)}")) // ~half overlap the seen space
    val seenDf = seenTexts.map(Tuple1(_)).toDF("text")
    val incDf = incoming.toDF("doc_id", "text")
    val got = Dedup.dedupAgainstSeen(incDf, seenDf, "text",
        expectedSeen = 500, fpp = 0.05)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val seenSet = seenTexts.toSet
    val want = incoming.filterNot(r => seenSet(r._2)).sorted
    assert(got == want)
  }

  test("keeps within-batch duplicates and survives an empty seen side") {
    import spark.implicits._
    val inc = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val empty = Seq.empty[Tuple1[String]].toDF("text")
    val got = Dedup.dedupAgainstSeen(inc, empty, "text", expectedSeen = 10)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L)) // both "a" rows stay: not a batch dedup
    val seen = Seq(Tuple1("a")).toDF("text")
    val got2 = Dedup.dedupAgainstSeen(inc, seen, "text", expectedSeen = 10)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got2 == Seq(3L))
  }

  test("exact even at absurd fpp: false positives die in the verify join") {
    import spark.implicits._
    val seen = (0 until 50).map(i => Tuple1(s"s$i")).toDF("text")
    val inc = (0 until 100).map(i => (i.toLong, s"n$i")).toDF("doc_id", "text")
    // fpp 0.5 and an undersized filter → many bloom positives, all of
    // which the anti-join must clear since no text truly overlaps
    val got = Dedup.dedupAgainstSeen(inc, seen, "text",
        expectedSeen = 10, fpp = 0.5)
    assert(got.count() == 100)
  }

  test("plan shape: one anti-join branch, one join-free narrow branch") {
    import spark.implicits._
    // parquet-backed inputs: a LocalRelation would let the optimizer
    // fold the whole thing into a LocalTableScan and hide the shape
    val dir = java.nio.file.Files.createTempDirectory("inc-dedup")
    (0 until 20).map(i => Tuple1(s"s$i")).toDF("text")
      .write.parquet(s"$dir/seen")
    (0 until 20).map(i => (i.toLong, s"n$i")).toDF("doc_id", "text")
      .write.parquet(s"$dir/inc")
    val seen = spark.read.parquet(s"$dir/seen")
    val inc = spark.read.parquet(s"$dir/inc")
    val plan = Dedup.dedupAgainstSeen(inc, seen, "text", expectedSeen = 100)
      .queryExecution.executedPlan.toString
    val antiJoins = "LeftAnti".r.findAllIn(plan).length
    assert(antiJoins == 1, s"expected exactly one anti join:\n$plan")
    assert(plan.contains("bloom_might_contain"), plan)
  }
}
