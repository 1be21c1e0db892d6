package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import graft.rdf.{RdfGraph, Terms}

/** Persistent RDF graph layout: parquet PARTITIONED BY PREDICATE — the
  * S2RDF vertical partitioning made physical (SURVEY.md §1.4). Writing
  * materializes one directory per predicate; loading rebuilds the
  * vertical index as partition-pruned scans, so a constant-predicate
  * triple pattern reads exactly one directory's row groups (the 100 TB
  * access path: predicate selectivity becomes file skipping, not a
  * filter over an exploded triple table).
  *
  * The prefix environment rides along as a JSON sidecar so a reloaded
  * graph keeps its QName display behavior.
  */
object GraphStore {

  private val PRED_COL = "__pred"
  private val PREFIX_FILE = "_prefixes.json"
  private val STATS_FILE = "_stats.json"

  /** Write the graph predicate-partitioned. One RANGE shuffle on
    * (predicate, subject): consecutive subjects of one predicate stay
    * together (so most write tasks emit into few predicate directories —
    * no sliver-file explosion), but a Zipf-hot predicate like `rdf:type`
    * (often 15–25% of a real graph) SPLITS across as many tasks as its
    * row share demands instead of hash-landing in one straggler task
    * writing one giant file. The within-partition sort on subject then
    * gives parquet row-group min/max stats that skip on subject lookups. */
  def save(g: RdfGraph, path: String, mode: String = "overwrite"): Unit = {
    // a QUAD store additionally partitions by graph (outermost): a
    // GRAPH <g> scan then prunes to one graph directory's predicate
    // subdirectories — graph selectivity becomes file skipping too
    val quads = g.isQuads
    val partCols =
      if (quads) Seq(Terms.GPART_COL, PRED_COL) else Seq(PRED_COL)
    val withParts0 = g.triples.withColumn(PRED_COL, F.col("p.value"))
    val withParts =
      if (quads) withParts0.withColumn(
        Terms.GPART_COL, Terms.gPartition(F.col("g")))
      else withParts0
    withParts
      .repartitionByRange(partCols.map(F.col) :+ F.col("s.value"): _*)
      .sortWithinPartitions(partCols.map(F.col) :+ F.col("s.value"): _*)
      .write.mode(mode).partitionBy(partCols: _*).parquet(path)
    val json = g.prefixes.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + esc(k) + "\": \"" + esc(v) + "\""
    }.mkString("{", ", ", "}")
    Files.writeString(Paths.get(path, PREFIX_FILE), json)
    // predicate-cardinality sidecar: one aggregate over data we just
    // wrote anyway; `load` feeds it to the BGP join-order heuristic
    // without running any job. Driver memory is |predicates|, the same
    // order as the partition listing itself.
    val counts = g.triples.groupBy(F.col("p.value")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val statsJson = counts.map { case (p, n) =>
      "\"" + esc(p) + "\": " + n
    }.mkString("{", ", ", "}")
    Files.writeString(Paths.get(path, STATS_FILE), statsJson)
  }

  /** Load a saved graph. The vertical index maps every predicate to a
    * partition-pruned (s, o) scan; the full triple view stays available
    * for var-predicate patterns.
    *
    * The index is LAZY: loading runs zero Spark jobs and materializes
    * zero per-predicate plans — a real graph has 10⁴–10⁵ predicates
    * (DBpedia: 60,649), and eagerly building one DataFrame per predicate
    * at load made `load` O(|predicates|) driver work before the first
    * query. Each predicate's pruned scan is built (and cached) on first
    * lookup instead. */
  def load(spark: SparkSession, path: String): RdfGraph = {
    val df = spark.read.parquet(path)
    // a saved QUAD store keeps its graph column — dropping it here
    // would silently merge every named graph into the default graph
    // (the compiler bypasses the vertical index for quad stores, so
    // keeping `g` costs the index nothing). The `__g` PARTITION column
    // rides along too: the compiler mirrors its graph-scope conditions
    // onto it, so a GRAPH <g> scan prunes to one graph directory.
    val cols = Seq("s", "p", "o") ++
      (if (df.columns.contains("g")) Seq("g") else Nil) ++
      (if (df.columns.contains(Terms.GPART_COL)) Seq(Terms.GPART_COL)
       else Nil)
    RdfGraph(df.select(cols.map(F.col): _*),
      RdfGraph.defaultPrefixes ++ readPrefixes(path),
      predIndex = new LazyPredIndex(df),
      predCounts = readStats(path))
  }

  /** Continuous N-Triples ingest INTO a persisted store: watches
    * `landingDir` for new .nt / .nt.gz files ([[NTriples.readStream]])
    * and per micro-batch appends the batch's NEW triples — batch-internal
    * dedup plus one anti-join against the current store, so re-delivered
    * lines keep set semantics — into the predicate-partitioned parquet
    * at `storePath`. The predicate-count sidecar is merged per batch, so
    * the BGP join-order heuristic keeps seeing fresh cardinalities.
    *
    * Trigger is AvailableNow: one call processes every file that has
    * landed and stops — with `checkpointDir` set, the next call resumes
    * AFTER the already-processed files, which is the cron-shaped
    * continuous-ingest loop (run it from a scheduler as often as data
    * lands). The merge itself is batch-idempotent: replaying a batch
    * adds nothing, so a retried micro-batch cannot duplicate triples.
    *
    * Scale: the anti-join probes the store's parquet with the SMALL
    * batch broadcast (AQE picks the broadcast side), and the append
    * writes only the batch's predicate directories. */
  def startNtIngest(spark: SparkSession, landingDir: String,
      storePath: String, queryName: String, lenient: Boolean = false,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = NTriples.readStream(spark, landingDir, lenient)
    val writer = stream.writeStream
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeTriplesBatch(batch, storePath)
      }
    checkpointDir.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  /** One micro-batch of the ingest merge (triples-only stores). */
  private def mergeTriplesBatch(batch0: DataFrame, path: String): Unit = {
    val spark = batch0.sparkSession
    val batch = batch0.dropDuplicates("s", "p", "o")
    val storeExists = Files.exists(Paths.get(path, PREFIX_FILE))
    val fresh =
      (if (storeExists)
         batch.join(spark.read.parquet(path).select("s", "p", "o"),
           Seq("s", "p", "o"), "left_anti")
       else batch).localCheckpoint(true) // count + write read it twice
    val perPred = fresh.groupBy(F.col("p.value")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    if (perPred.nonEmpty) {
      fresh.withColumn(PRED_COL, F.col("p.value"))
        .write.mode("append").partitionBy(PRED_COL).parquet(path)
      val merged = (readStats(path).toSeq ++ perPred)
        .groupBy(_._1).map { case (p, ns) => p -> ns.map(_._2).sum }
        .toSeq.sortBy(_._1)
      Files.writeString(Paths.get(path, STATS_FILE),
        merged.map { case (p, n) => "\"" + esc(p) + "\": " + n }
          .mkString("{", ", ", "}"))
      if (!storeExists) {
        val json = RdfGraph.defaultPrefixes.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + esc(k) + "\": \"" + esc(v) + "\"" }
          .mkString("{", ", ", "}")
        Files.writeString(Paths.get(path, PREFIX_FILE), json)
      }
    }
  }

  /** On-demand vertical index over the predicate-partitioned layout.
    * `get` needs NO predicate listing: a lookup of a predicate with no
    * partition directory prunes to an empty scan, which IS that
    * predicate's (empty) extension — so every lookup is answerable
    * without a job, and `load` never runs the distinct the eager build
    * paid. Iteration (diagnostics/tests only) derives the key set from
    * the partition column — a listing-only scan, no row data. */
  private final class LazyPredIndex(df: DataFrame)
      extends scala.collection.immutable.Map[String, DataFrame] {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
    private def scan(p: String): DataFrame =
      cache.computeIfAbsent(p, p2 =>
        df.where(F.col(PRED_COL) === p2).select(F.col("s"), F.col("o")))

    override def get(p: String): Option[DataFrame] = Some(scan(p))
    override def contains(p: String): Boolean = true
    override def iterator: Iterator[(String, DataFrame)] =
      df.select(PRED_COL).distinct().collect().iterator
        .map { r => val p = r.getString(0); p -> scan(p) }
    override def removed(key: String): Map[String, DataFrame] =
      iterator.filter(_._1 != key).toMap
    override def updated[V1 >: DataFrame](key: String,
        value: V1): Map[String, V1] =
      iterator.toMap.updated(key, value)
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private def readPrefixes(path: String): Map[String, String] = {
    val f = Paths.get(path, PREFIX_FILE)
    if (!Files.exists(f)) return Map.empty
    val text = Files.readString(f).trim.stripPrefix("{").stripSuffix("}")
    // sidecar is written by `save` above — flat string map, no nesting
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    entry.findAllMatchIn(text).map { m =>
      unesc(m.group(1)) -> unesc(m.group(2))
    }.toMap
  }

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Predicate counts from the `_stats.json` sidecar; empty for stores
    * written before the sidecar existed (the heuristic degrades to the
    * static constant-shape score). */
  private def readStats(path: String): Map[String, Long] = {
    val f = Paths.get(path, STATS_FILE)
    if (!Files.exists(f)) return Map.empty
    val text = Files.readString(f).trim.stripPrefix("{").stripSuffix("}")
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*(\d+)""".r
    entry.findAllMatchIn(text).map { m =>
      unesc(m.group(1)) -> m.group(2).toLong
    }.toMap
  }
}
