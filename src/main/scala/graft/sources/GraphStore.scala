package graft.sources

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
    writePrefixes(g.triples.sparkSession, path, g.prefixes)
    // predicate-cardinality sidecar: one aggregate over data we just
    // wrote anyway; `load` feeds it to the BGP join-order heuristic
    // without running any job. Driver memory is |predicates|, the same
    // order as the partition listing itself.
    val counts = g.triples.groupBy(F.col("p.value")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val statsJson = counts.map { case (p, n) =>
      "\"" + esc(p) + "\": " + n
    }.mkString("{", ", ", "}")
    writeSidecar(g.triples.sparkSession, path, STATS_FILE, statsJson)
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
      RdfGraph.defaultPrefixes ++ readPrefixes(spark, path),
      predIndex = new LazyPredIndex(df),
      predCounts = readStats(spark, path))
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
    * adds nothing, so a retried micro-batch cannot duplicate triples —
    * the existence probe keys on committed PARTITION DATA, never on the
    * sidecars written after it, so the guarantee survives a crash
    * anywhere between the parquet commit and the sidecar writes.
    *
    * Scale: Spark builds (and, under the threshold, broadcasts) the
    * RIGHT side of a `left_anti` join — the STORE side — so the probe
    * is pruned to the partitions whose predicates appear in the batch
    * before it ever reaches the join. Per-batch merge cost is bounded
    * by the touched predicate directories' data plus the batch itself,
    * not by total store size, and the append writes only those same
    * directories. */
  def startNtIngest(spark: SparkSession, landingDir: String,
      storePath: String, queryName: String, lenient: Boolean = false,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startIngest(NTriples.readStream(spark, landingDir, lenient),
      queryName, checkpointDir)(mergeTriplesBatch(_, storePath))

  /** Continuous N-Quads ingest into a persisted QUAD store — the
    * named-graph twin of [[startNtIngest]] ([[NQuads.readStream]] over
    * `landingDir`, merging into the `__g`-outer / `__pred`-inner
    * partition layout [[save]] writes). Same checkpoint/AvailableNow
    * contract, same batch-idempotent set semantics — the anti-join
    * treats the default graph (g NULL) as its own graph via null-safe
    * equality — and the probe prunes on BOTH partition levels: only
    * the (graph, predicate) directories the batch touches are read. */
  def startNqIngest(spark: SparkSession, landingDir: String,
      storePath: String, queryName: String, lenient: Boolean = false,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startIngest(NQuads.readStream(spark, landingDir, lenient),
      queryName, checkpointDir)(mergeQuadsBatch(_, storePath))

  private def startIngest(stream: DataFrame, queryName: String,
      checkpointDir: Option[String])(merge: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => merge(batch) }
    checkpointDir.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  /** One micro-batch of the ingest merge (triples-only stores). */
  private def mergeTriplesBatch(batch0: DataFrame, path: String): Unit = {
    val spark = batch0.sparkSession
    // dedup within the batch, then pin it: the driver collects its
    // predicate set and the frame feeds the anti-join afterwards
    val batch = batch0.dropDuplicates("s", "p", "o").localCheckpoint(true)
    val preds = batch.select(F.col("p.value")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (preds.isEmpty) return // empty batch: nothing to merge
    val fresh =
      prunedProbe(spark, path, preds)
        .map(probe => batch.join(probe, Seq("s", "p", "o"), "left_anti"))
        .getOrElse(batch) // no touched directory yet: all rows are new
        .localCheckpoint(true) // count + write read it twice
    if (fresh.count() > 0)
      fresh.withColumn(PRED_COL, F.col("p.value"))
        .write.mode("append").partitionBy(PRED_COL).parquet(path)
    finishMerge(spark, path, preds)
  }

  /** One micro-batch of the quad-store ingest merge. */
  private def mergeQuadsBatch(batch0: DataFrame, path: String): Unit = {
    val spark = batch0.sparkSession
    val batch =
      batch0.dropDuplicates("s", "p", "o", "g").localCheckpoint(true)
    // both partition levels the batch touches, collected in one pass
    val keys = batch.select(F.col("p.value"),
        Terms.gPartition(F.col("g"))).distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    if (keys.isEmpty) return
    val preds = keys.map(_._1).distinct.toSeq
    val gparts = keys.map(_._2).distinct.toSeq
    val fresh =
      prunedProbe(spark, path, preds, Some(gparts))
        // g is NULL for the default graph: the join must treat NULL as
        // a key value (<=>), or every default-graph line re-appends
        .map(probe => batch.as("b").join(probe.as("st"),
          F.col("b.s") === F.col("st.s") &&
            F.col("b.p") === F.col("st.p") &&
            F.col("b.o") === F.col("st.o") &&
            F.col("b.g") <=> F.col("st.g"),
          "left_anti"))
        .getOrElse(batch)
        .localCheckpoint(true)
    if (fresh.count() > 0)
      fresh.withColumn(Terms.GPART_COL, Terms.gPartition(F.col("g")))
        .withColumn(PRED_COL, F.col("p.value"))
        .write.mode("append")
        .partitionBy(Terms.GPART_COL, PRED_COL).parquet(path)
    finishMerge(spark, path, preds)
  }

  /** TRUE only when the store holds committed partition data. The
    * sidecars are written AFTER the parquet commit, so probing one of
    * them (as this path once did) let a crash in between replay the
    * first batch WITHOUT the anti-join — duplicating every triple. A
    * partition directory exists iff a write committed, so this probe
    * is crash-safe on both sides of that window. */
  private def storeHasData(spark: SparkSession, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(root) && fs.listStatus(root).exists { st =>
      val n = st.getPath.getName
      n.startsWith(PRED_COL + "=") || n.startsWith(Terms.GPART_COL + "=")
    }
  }

  /** The store-side probe for one ingest batch: ONLY the touched
    * partition directories are handed to the reader (basePath keeps
    * the partition columns), so per-batch cost — including the FILE
    * LISTING, which `read.parquet(root)` pays over the whole store
    * even when the scan prunes — stays proportional to the batch's
    * predicates (× its graphs on a quad store). None = no touched
    * directory exists yet, so every batch row is new. The first
    * IngestRehearsal draft pruned the scan but not the listing, and a
    * 10× store with identical touched partitions still cost 2.3×. */
  private[graft] def prunedProbe(spark: SparkSession, path: String,
      preds: Seq[String], gparts: Option[Seq[String]] = None)
      : Option[DataFrame] = {
    val quad = gparts.isDefined
    val dirs = gparts match {
      case Some(gs) => for (g <- gs; p <- preds)
        yield s"${Terms.GPART_COL}=${escDir(g)}/$PRED_COL=${escDir(p)}"
      case None => preds.map(p => s"$PRED_COL=${escDir(p)}")
    }
    readDirs(spark, path, dirs).map { df =>
      if (quad) df.select("s", "p", "o", "g") else df.select("s", "p", "o")
    }
  }

  /** Read exactly `dirs` (store-relative partition directories),
    * skipping ones that don't exist. */
  private def readDirs(spark: SparkSession, path: String,
      dirs: Seq[String]): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = dirs
      .map(d => new org.apache.hadoop.fs.Path(root, d))
      .filter(fs.exists(_))
      .map(_.toString)
    if (existing.isEmpty) None
    else Some(spark.read.option("basePath", path).parquet(existing: _*))
  }

  /** Spark's partition-directory name escaping (the inverse of what
    * `partitionBy` writes — `urn:p/x` → `urn%3Ap%2Fx`). */
  private def escDir(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(v)

  /** Post-append sidecar maintenance, shared by both merge paths. The
    * stats for the touched predicates are recomputed FROM THE STORE
    * (reading only those predicates' directories — one glob per
    * predicate on a quad store, where a predicate spans graph dirs),
    * never merged incrementally from batch counts: a replayed batch
    * then heals a sidecar a crash left stale instead of undercounting
    * it forever. */
  private def finishMerge(spark: SparkSession, path: String,
      preds: Seq[String]): Unit = {
    if (!storeHasData(spark, path)) return // batch empty, no store yet
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val quads = fs.listStatus(root)
      .exists(_.getPath.getName.startsWith(Terms.GPART_COL + "="))
    val dirs: Seq[String] =
      if (!quads) preds.map(p => s"$PRED_COL=${escDir(p)}")
      else preds.flatMap { p =>
        fs.globStatus(new org.apache.hadoop.fs.Path(root,
            s"${Terms.GPART_COL}=*/$PRED_COL=${escDir(p)}"))
          .map(st => s"${st.getPath.getParent.getName}/${st.getPath.getName}")
      }
    val touched = readDirs(spark, path, dirs) match {
      case None => Map.empty[String, Long]
      case Some(df) => df.groupBy(F.col("p.value")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val merged = (readStats(spark, path) ++ touched).toSeq.sortBy(_._1)
    writeSidecar(spark, path, STATS_FILE,
      merged.map { case (p, n) => "\"" + esc(p) + "\": " + n }
        .mkString("{", ", ", "}"))
    if (readSidecar(spark, path, PREFIX_FILE).isEmpty)
      writePrefixes(spark, path, RdfGraph.defaultPrefixes)
  }

  private def writePrefixes(spark: SparkSession, path: String,
      prefixes: Map[String, String]): Unit = {
    val json = prefixes.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + esc(k) + "\": \"" + esc(v) + "\""
    }.mkString("{", ", ", "}")
    writeSidecar(spark, path, PREFIX_FILE, json)
  }

  // Sidecar IO goes through the store path's Hadoop FileSystem, never
  // java.nio — a 100 TB store lives on HDFS/S3, and the parquet data
  // already travels that API. Local paths resolve to RawLocalFileSystem,
  // so single-box behavior is unchanged.
  private def writeSidecar(spark: SparkSession, path: String,
      name: String, text: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSidecar(spark: SparkSession, path: String,
      name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
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

  private def readPrefixes(spark: SparkSession,
      path: String): Map[String, String] = {
    val text = readSidecar(spark, path, PREFIX_FILE) match {
      case None => return Map.empty
      case Some(t) => t.trim.stripPrefix("{").stripSuffix("}")
    }
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
  private def readStats(spark: SparkSession,
      path: String): Map[String, Long] = {
    val text = readSidecar(spark, path, STATS_FILE) match {
      case None => return Map.empty
      case Some(t) => t.trim.stripPrefix("{").stripSuffix("}")
    }
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*(\d+)""".r
    entry.findAllMatchIn(text).map { m =>
      unesc(m.group(1)) -> m.group(2).toLong
    }.toMap
  }
}
