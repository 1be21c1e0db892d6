package graft

import java.nio.file.Files
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{UserEvent, UserTotals}

/** Structured Streaming behavior: the batch/stream twin property (same
  * windowedAgg logic, identical results), watermarked file-source
  * streaming, and explicit state via mapGroupsWithState. */
class StreamingSpec extends SparkSpec {

  private lazy val events =
    Tables.read(spark, "/root/testdata/sf0.001", "events")

  test("windowed agg: streaming over file source matches batch result") {
    val dir = Files.createTempDirectory("graft-stream").toFile.getAbsolutePath
    // watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    // cast is stable
    events.withColumn("ts", F.col("ts").cast("timestamp"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val q = EventStreams.startWindowedStream(spark, dir, "winstream",
      window = "1 hour", watermark = "2 hours")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("winstream")
    val batch = EventStreams.windowedAgg(spark.read.parquet(dir), "1 hour")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("mapGroupsWithState accumulates per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = EventStreams.runningUserTotals(input.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("totals")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    input.addData(UserEvent(1, 2.0), UserEvent(1, 3.0), UserEvent(2, 10.0))
    q.processAllAvailable()
    input.addData(UserEvent(1, 5.0))
    q.processAllAvailable()
    q.stop()
    // memory sink in Update mode appends each update; take the latest per user
    val rows = spark.table("totals").as[UserTotals].collect()
      .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n) }
    assert(rows(1L).n == 3 && math.abs(rows(1L).total - 10.0) < 1e-9)
    assert(rows(2L).n == 1 && math.abs(rows(2L).total - 10.0) < 1e-9)
  }

  test("streaming session windows match the batch twin") {
    val dir = Files.createTempDirectory("graft-sess").toFile.getAbsolutePath
    events.withColumn("ts", F.col("ts").cast("timestamp"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val q = EventStreams.startSessionStream(spark, dir, "sessstream",
      gap = "30 minutes", watermark = "2 hours")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessstream")
    val batch = EventStreams.sessionized(spark.read.parquet(dir), "30 minutes")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming dedup within watermark drops in-horizon duplicates") {
    val dir = Files.createTempDirectory("graft-dedup").toFile.getAbsolutePath
    val base = events.withColumn("ts", F.col("ts").cast("timestamp")).limit(200)
    // duplicate every event once (same key), all within the horizon
    base.union(base).coalesce(1).write.mode("overwrite").parquet(dir)
    val q = EventStreams.startDedupStream(spark, dir, "dedupstream",
      keyCols = Seq("event_id"), watermark = "10 days")
    q.processAllAvailable()
    q.stop()
    val survived = spark.table("dedupstream")
    val distinctKeys = base.select("event_id").distinct().count()
    assert(survived.count() == distinctKeys)
    assert(survived.groupBy("event_id").count()
      .where(F.col("count") > 1).count() == 0)
  }

  test("stream-static enrichment matches the batch join") {
    val dir = Files.createTempDirectory("graft-enrich").toFile.getAbsolutePath
    events.withColumn("ts", F.col("ts").cast("timestamp"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val dim = Tables.read(spark, "/root/testdata/sf0.001", "customer")
      .select(F.col("c_custkey"), F.col("c_name"))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStreams.enrich(stream, dim, "user_id", "c_custkey")
      .select("event_id", "user_id", "c_name")
      .writeStream.outputMode("append").format("memory")
      .queryName("enriched").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("enriched")
    val batch = EventStreams.enrich(spark.read.parquet(dir), dim,
      "user_id", "c_custkey").select("event_id", "user_id", "c_name")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("watermarked stream-stream attribution matches the batch interval join") {
    val dir = Files.createTempDirectory("graft-attr").toFile.getAbsolutePath
    events.withColumn("ts", F.col("ts").cast("timestamp"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    def sideStream(t: String) = spark.readStream.schema(schema).parquet(dir)
      .where(F.col("event_type") === t)
    val q = EventStreams.attributed(sideStream("click"), sideStream("purchase"))
      .writeStream.outputMode("append").format("memory")
      .queryName("attributed").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attributed")
    def sideBatch(t: String) = spark.read.parquet(dir)
      .where(F.col("event_type") === t)
    val batch = EventStreams.attributed(sideBatch("click"), sideBatch("purchase"))
    assert(streamed.count() > 0)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("session windows (batch twin) group by gap") {
    val s = EventStreams.sessionized(events, "30 minutes")
    assert(s.count() > 0)
    // sessions never overlap per user
    val overlaps = s.alias("a").join(s.alias("b"),
      F.col("a.user_id") === F.col("b.user_id") &&
        F.col("a.session_start") < F.col("b.session_start") &&
        F.col("b.session_start") < F.col("a.session_end")).count()
    assert(overlaps == 0)
  }

  test("streaming curation matches its batch twin on an ordered feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good =
      "the cat sat on the mat and it was happy with that state of affairs " +
        "for the rest of the day in the sun by the window with a warm blanket"
    val good2 = good + " and then some more distinct words arrived"
    val german =
      "der hund ist nicht mit der katze und das haus ist auf dem berg " +
        "und die sonne ist mit den wolken auf dem himmel für den tag"
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      (1L, good, ts(0)),   // survives
      (2L, good + "\t ", ts(1)), // whitespace variant: only the
                           // normalize stage makes it a dup → dropped
      (3L, "tiny", ts(2)), // quality gate
      (4L, german, ts(3)), // language gate
      (5L, good2, ts(4)))  // survives
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    input.addData(rows: _*) // before start: AvailableNow snapshots offsets
    val q = graft.pipeline.Curation.curateStream(
        input.toDF().toDF("doc_id", "text", "ts"),
        "doc_id", "text", "ts", watermark = "30 minutes",
        minQuality = 0.7, chunkSize = 8, chunkStride = 4,
        normalize = true)
      .writeStream.outputMode("append").format("memory")
      .queryName("curstream").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("curstream")
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
    // the batch twin on the same rows: first arrival == min id here,
    // so the two dedup contracts agree
    val batch = graft.pipeline.Curation.curate(
      rows.toDF("doc_id", "text", "ts"), "doc_id", "text",
      minQuality = 0.7, chunkSize = 8, chunkStride = 4,
      normalize = true)
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    assert(streamed.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(1L, 5L))
  }

  test("streaming curation rejects a batch frame") {
    import spark.implicits._
    val batch = Seq((1L, "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("doc_id", "text", "ts")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Curation.curateStream(batch, "doc_id", "text")
    }
    assert(e.getMessage.contains("streaming"))
  }

  test("N-Triples streaming ingest: incremental files, strict grammar, no dedup") {
    val dir = Files.createTempDirectory("graft-ntstream").toFile.getAbsolutePath
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.nt"),
      "<http://e.com/C\\u00F3rdoba> <http://e.com/p> \"x\"@en.\n" +
        "<http://e.com/s> <http://e.com/p> _:b.\n")
    val q = sources.NTriples.readStream(spark, dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("ntstream").start()
    q.processAllAvailable()
    assert(spark.table("ntstream").count() == 2)
    // a later-landing file appends; a repeated line is NOT deduped — the
    // streaming contract leaves set semantics to a downstream watermark
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b.nt"),
      "<http://e.com/s2> <http://e.com/p> \"y\" .\n" +
        "<http://e.com/s> <http://e.com/p> _:b.\n")
    q.processAllAvailable()
    val rows = spark.table("ntstream").collect()
    q.stop()
    assert(rows.length == 4)
    // UCHAR in the IRI unescaped on the streaming path too
    assert(rows.exists(_.getStruct(0).getString(1) == "http://e.com/Córdoba"))
  }

  test("strict streaming ingest fails the query on a malformed line; lenient skips") {
    val dir = Files.createTempDirectory("graft-ntbad").toFile.getAbsolutePath
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "bad.nt"),
      "<http://e.com/s> <http://e.com/p> \"ok\" .\n" +
        "<http://e.com/s> <http://e.com/p> <http://e.com/o> extra .\n")
    val strict = sources.NTriples.readStream(spark, dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("ntstrict").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      strict.processAllAvailable()
      if (strict.exception.isDefined) throw strict.exception.get
    }
    assert(e.toString.contains("malformed") || e.getCause != null)
    strict.stop()
    val lenient = sources.NTriples.readStream(spark, dir, lenient = true)
      .writeStream.outputMode("append").format("memory")
      .queryName("ntlenient").start()
    lenient.processAllAvailable()
    lenient.stop()
    assert(spark.table("ntlenient").count() == 1)
  }

  test("N-Quads streaming ingest: graph labels arrive, default graph is null") {
    val dir = Files.createTempDirectory("graft-nqstream").toFile.getAbsolutePath
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.nq"),
      "<http://e.com/s> <http://e.com/p> \"default\" .\n" +
        "<http://e.com/s> <http://e.com/p> \"named\" <http://e.com/g1> .\n")
    val q = sources.NQuads.readStream(spark, dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("nqstream").start()
    q.processAllAvailable()
    val rows = spark.table("nqstream").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows.count(_.isNullAt(3)) == 1)
    assert(rows.exists(r => !r.isNullAt(3) &&
      r.getStruct(3).getString(1) == "http://e.com/g1"))
  }
}
