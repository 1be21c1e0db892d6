package graft.demo

import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.util.sketch.BloomFilter
import java.nio.file.{Files, Paths}

/** Plan evidence for the GraphStore ingest-split rewrite (VERDICT r17
  * task 4): the per-row duplicate gate — previously an interpreted
  * Scala UDF — is now the codegen'd `ingest_bloom_probe` expression.
  * Builds the exact split shape mergeBatchLocked uses (directory-key +
  * xxhash64 row hash against broadcast blooms) over a sample batch and
  * dumps the formatted plan: the filter must appear INSIDE a
  * WholeStageCodegen span with no BatchEvalPython / ScalaUDF node. */
object R18IngestPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val batch = spark.range(100000).select(
      F.concat(F.lit("p"), (F.col("id") % 50).cast("string")).as("k"),
      F.xxhash64(F.col("id")).as("__h"))
    val blooms: Map[String, BloomFilter] = (0 until 10).map { i =>
      val b = BloomFilter.create(1000, 0.01)
      (0 until 100).foreach(j => b.putLong(j * 37L + i))
      s"p$i" -> b
    }.toMap
    val existingB = spark.sparkContext.broadcast(
      (0 until 25).map(i => s"p$i").toSet)
    val bloomsB = spark.sparkContext.broadcast(blooms)
    val mightExist = graft.expressions.ColumnBridge.column(
      graft.expressions.IngestBloomProbe(
        graft.expressions.ColumnBridge.expression(F.col("k")),
        graft.expressions.ColumnBridge.expression(F.col("__h")),
        existingB, bloomsB))
    val split = batch.where(mightExist)
    val n = split.count()
    val txt = split.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) +
      "\n\n===== executed =====\n" +
      split.queryExecution.executedPlan.toString
    Files.createDirectories(Paths.get("plans/r18"))
    Files.writeString(Paths.get("plans/r18/ingest_split_probe.txt"), txt)
    println(s"maybe-dup rows: $n")
    println("codegen span contains probe: " +
      txt.contains("ingest_bloom_probe"))
    println("interpreted UDF present: " + txt.contains("UDF"))
    spark.stop()
  }
}
