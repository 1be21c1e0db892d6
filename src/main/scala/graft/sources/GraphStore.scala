package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.util.sketch.BloomFilter
import graft.GraftException
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
  * graph keeps its QName display behavior. Two more sidecars serve the
  * continuous-ingest path: `_stats.json` (predicate cardinalities for
  * the BGP join-order heuristic) and a per-directory `_bloom.bin`
  * (membership filter over the directory's (s, o[, g]) hashes, so an
  * ingest micro-batch of mostly-new rows skips the store-side
  * anti-join read entirely — without it, every batch touching a
  * Zipf-hot predicate like rdf:type re-reads that predicate's full
  * multi-TB extension).
  */
object GraphStore {

  private val PRED_COL = "__pred"
  private val PREFIX_FILE = "_prefixes.json"
  private val STATS_FILE = "_stats.json"
  private val BLOOM_FILE = "_bloom.bin"
  private val BLOOM_FPP = 0.01
  /** Floor for a directory bloom's expected-item sizing (≈5 KB of
    * bits): below this the sidecar overhead dominates the filter. */
  private val BLOOM_MIN_EXPECTED = 4096L
  /** Ceiling (~38 MB of bits at 1% fpp): each merge reads and rewrites
    * the touched blooms, so sidecar size is per-batch cost and must not
    * track a hot directory's extension forever. Past the cap the bloom
    * saturates and its false-positive rate degrades GRADUALLY — extra
    * rows just take the anti-join path, where the subject-range
    * row-group pruning (sorted files) still bounds the read. */
  private val BLOOM_MAX_EXPECTED = 1L << 25

  private def bloomSize(rows: Long): Long =
    (2 * rows).max(BLOOM_MIN_EXPECTED).min(BLOOM_MAX_EXPECTED)

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
    val spark = g.triples.sparkSession
    // per-DIRECTORY counts in one aggregate over the committed data
    // (so `mode=append` on an existing store counts the union, not
    // just this write): the predicate-cardinality sidecar feeds the
    // BGP join-order heuristic without running any job at `load`,
    // and the same counts size the per-directory membership blooms.
    val back = spark.read.parquet(path)
      .select(Seq("s", "p", "o") ++ (if (quads) Seq("g") else Nil)
        map F.col: _*)
    val keyed = back.groupBy(bloomKey(quads).as("k")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val counts = keyed.groupBy(kv => predOfKey(kv._1))
      .view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val statsJson = counts.map { case (p, n) =>
      "\"" + esc(p) + "\": " + n
    }.mkString("{", ", ", "}")
    writeSidecar(spark, path, STATS_FILE, statsJson)
    val expected = keyed.map { case (k, n) => k -> bloomSize(n) }.toMap
    rebuildBlooms(spark, path, back, quads, expected)
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
    * Scale: each touched directory's `_bloom.bin` membership filter
    * splits the batch BEFORE any store read — rows the bloom excludes
    * are definitely new and skip the anti-join; only the ~fpp false
    * positives (plus genuine redeliveries) probe the store, and only
    * THEIR directories are listed or scanned, filtered to the rows'
    * subject range so the subject-sorted files prune at the row-group
    * level. A steady stream of fresh data therefore merges without
    * reading the store at all — per-batch cost is flat in every
    * predicate's extension, including rdf:type-shaped hot ones.
    *
    * `sourceOptions` forwards Spark file-source knobs to the landing
    * directory reader: set `maxFilesPerTrigger` to bound one
    * micro-batch (bulk backfills otherwise arrive as ONE giant batch),
    * and `cleanSource=delete` (or `archive` + `sourceArchiveDir`) so
    * the landing directory — re-listed every trigger — doesn't grow
    * without bound across months of ticks. */
  def startNtIngest(spark: SparkSession, landingDir: String,
      storePath: String, queryName: String, lenient: Boolean = false,
      checkpointDir: Option[String] = None,
      sourceOptions: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startIngest(
      NTriples.readStream(spark, landingDir, lenient, sourceOptions),
      queryName, checkpointDir)(mergeBatch(_, storePath, quads = false))

  /** Continuous N-Quads ingest into a persisted QUAD store — the
    * named-graph twin of [[startNtIngest]] ([[NQuads.readStream]] over
    * `landingDir`, merging into the `__g`-outer / `__pred`-inner
    * partition layout [[save]] writes). Same checkpoint/AvailableNow
    * contract, same batch-idempotent set semantics — the anti-join
    * treats the default graph (g NULL) as its own graph via null-safe
    * equality — and the probe prunes on BOTH partition levels: only
    * the exact (graph, predicate) directories with a possible
    * duplicate are read. */
  def startNqIngest(spark: SparkSession, landingDir: String,
      storePath: String, queryName: String, lenient: Boolean = false,
      checkpointDir: Option[String] = None,
      sourceOptions: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    startIngest(
      NQuads.readStream(spark, landingDir, lenient, sourceOptions),
      queryName, checkpointDir)(mergeBatch(_, storePath, quads = true))

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

  /** The (s, o[, g]) membership hash a directory's bloom filter is
    * keyed on. The predicate is NOT hashed — the bloom is per
    * predicate directory, so it carries no information. */
  private def rowHash(quads: Boolean): Column =
    if (quads) F.xxhash64(F.col("s"), F.col("o"), F.col("g"))
    else F.xxhash64(F.col("s"), F.col("o"))

  /** The partition-directory key of a row: the predicate value, with
    * the graph-partition value prefixed (space-separated — a space can
    * appear in neither an IRI nor a blank-node label, so the split is
    * unambiguous) on quad stores. Computable both from raw batch rows
    * and from store rows read back (gPartition of a NULL g is the
    * default-graph bucket). */
  private def bloomKey(quads: Boolean): Column =
    if (quads) F.concat(Terms.gPartition(F.col("g")), F.lit(" "),
      F.col("p.value"))
    else F.col("p.value")

  private def predOfKey(key: String): String = {
    val i = key.indexOf(' ')
    if (i < 0) key else key.substring(i + 1)
  }

  /** Store-relative partition directory of a bloom key. */
  private def keyDir(key: String): String = {
    val i = key.indexOf(' ')
    if (i < 0) s"$PRED_COL=${escDir(key)}"
    else s"${Terms.GPART_COL}=${escDir(key.substring(0, i))}/" +
      s"$PRED_COL=${escDir(key.substring(i + 1))}"
  }

  /** Inverse of [[keyDir]] for a store-relative leaf directory. */
  private def dirKey(dir: String): String = {
    val parts = dir.split('/')
    val pred = unescDir(parts.last.stripPrefix(PRED_COL + "="))
    if (parts.length == 1) pred
    else unescDir(parts(0).stripPrefix(Terms.GPART_COL + "=")) +
      " " + pred
  }

  /** One micro-batch of the ingest merge, shared by the triples and
    * quad flavors. Order of durability (crash anywhere is safe):
    *   1. fresh-row hashes merge into the touched blooms and the
    *      sidecars are REWRITTEN — before the data lands, so a crash
    *      leaves phantom bloom entries (resolved by the anti-join on
    *      the replay) and never missing ones (which would let a
    *      redelivery re-append);
    *   2. the parquet append commits the fresh rows;
    *   3. [[finishMerge]] recomputes stats from parquet footers and
    *      builds/doubles any absent or saturated blooms from the
    *      committed data — so a replayed batch heals whatever a crash
    *      destroyed. */
  private def mergeBatch(batch0: DataFrame, path: String,
      quads: Boolean): Unit = {
    val spark = batch0.sparkSession
    requireLayout(spark, path, quads)
    val dedupCols = if (quads) Seq("s", "p", "o", "g") else Seq("s", "p", "o")
    // dedup within the batch, then pin it: several driver-side passes
    // (key collection, split, range bounds) read it below
    val batch = batch0.dropDuplicates(dedupCols).localCheckpoint(true)
    val keys = batch.select(bloomKey(quads).as("k")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (keys.isEmpty) return // empty batch: nothing to merge
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = keys.filter(k => fs.exists(new Path(root, keyDir(k)))).toSet
    // the membership blooms of the touched directories that have one
    // (absent on a not-yet-migrated dir → every row of that key is a
    // possible duplicate, the pre-bloom behavior)
    val blooms: Map[String, (Long, BloomFilter)] = existing.iterator
      .flatMap(k => readBloom(spark, path, keyDir(k)).map(k -> _)).toMap
    val bloomsB = spark.sparkContext.broadcast(
      blooms.map { case (k, (_, b)) => k -> b })
    val existingB = spark.sparkContext.broadcast(existing)
    val hashed = batch.withColumn("__h", rowHash(quads))
    // the split: a row whose directory doesn't exist, or whose bloom
    // definitely excludes its hash, is NEW without any store read
    val mightExist = F.udf((k: String, h: Long) =>
      existingB.value.contains(k) &&
        bloomsB.value.get(k).forall(_.mightContainLong(h)))
      .apply(bloomKey(quads), F.col("__h"))
    val maybe = hashed.where(mightExist)
    val defNew = hashed.where(!mightExist)
    // probe ONLY the directories with at least one maybe-duplicate row;
    // in the steady fresh-data state this set is empty and the store is
    // never listed, let alone read
    val maybeKeys = maybe.select(bloomKey(quads).as("k")).distinct()
      .collect().map(_.getString(0)).toSeq
    val survivors =
      if (maybeKeys.isEmpty) None
      else readDirs(spark, path, maybeKeys.map(keyDir)).map { probe0 =>
        // the maybe rows' subject range prunes the probe's row groups:
        // the directory files are subject-sorted, so min/max stats skip
        // everything outside the batch's subject window
        val rng = maybe
          .agg(F.min(F.col("s.value")), F.max(F.col("s.value"))).head()
        val probe = probe0
          .where(F.col("s.value").between(rng.getString(0), rng.getString(1)))
        if (quads)
          // g is NULL for the default graph: the join must treat NULL
          // as a key value (<=>), or every default-graph line re-appends
          maybe.as("b").join(probe.select("s", "p", "o", "g").as("st"),
            F.col("b.s") === F.col("st.s") &&
              F.col("b.p") === F.col("st.p") &&
              F.col("b.o") === F.col("st.o") &&
              F.col("b.g") <=> F.col("st.g"),
            "left_anti")
        else maybe.join(probe.select("s", "p", "o"),
          Seq("s", "p", "o"), "left_anti")
      }
    val fresh = (survivors match {
      case None => hashed // no possible duplicate anywhere: all new
      case Some(s) => defNew.unionByName(s)
    }).localCheckpoint(true) // bloom update + write + count read it
    if (fresh.count() > 0) {
      if (blooms.nonEmpty) {
        // durability step 1: fresh hashes into the existing blooms,
        // written BEFORE the parquet append (see the method scaladoc)
        val params = blooms.map { case (k, (e, _)) => k -> e }
        collectBlooms(
          fresh.where(bloomKey(quads).isInCollection(params.keys)),
          quads, params)
          .foreach { case (k, fb) =>
            val (e, b) = blooms(k)
            b.mergeInPlace(fb)
            writeBloom(spark, path, keyDir(k), e, b)
          }
      }
      val out = fresh.drop("__h").withColumn(PRED_COL, F.col("p.value"))
      if (quads)
        out.withColumn(Terms.GPART_COL, Terms.gPartition(F.col("g")))
          .write.mode("append")
          .partitionBy(Terms.GPART_COL, PRED_COL).parquet(path)
      else out.write.mode("append").partitionBy(PRED_COL).parquet(path)
    }
    finishMerge(spark, path, keys.map(predOfKey).distinct)
  }

  /** Fail fast when the ingest flavor doesn't match the store's layout
    * (ADVICE r15: an N-Quads ingest into a triples-layout store found
    * none of its probed directories, treated every row as new, and
    * appended a second conflicting partition scheme that Spark's
    * partition discovery then chokes on — silent store corruption). */
  private def requireLayout(spark: SparkSession, path: String,
      quads: Boolean): Unit =
    storeLayout(spark, path).foreach { isQuads =>
      if (isQuads != quads) throw new GraftException(
        if (quads) s"startNqIngest into a triples-layout store at $path" +
          " — the store was written without named graphs; save it as a" +
          " quad store (a graph with a g column) first"
        else s"startNtIngest into a quad-layout store at $path" +
          " — use startNqIngest (N-Triples lines land in the default graph)")
    }

  /** Some(isQuads) when the store holds committed partition data, None
    * when it doesn't exist yet. Keyed on PARTITION DIRECTORIES, never
    * on the sidecars written after the data commit, so the answer is
    * crash-safe (see [[mergeBatch]]'s ordering note). */
  private def storeLayout(spark: SparkSession,
      path: String): Option[Boolean] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else {
      val names = fs.listStatus(root).map(_.getPath.getName)
      if (names.exists(_.startsWith(Terms.GPART_COL + "="))) Some(true)
      else if (names.exists(_.startsWith(PRED_COL + "="))) Some(false)
      else None
    }
  }

  /** Read exactly `dirs` (store-relative partition directories),
    * skipping ones that don't exist. `basePath` keeps the partition
    * columns, so per-batch cost — including the FILE LISTING, which
    * `read.parquet(root)` pays over the whole store even when the scan
    * prunes — stays proportional to the directories named. */
  private def readDirs(spark: SparkSession, path: String,
      dirs: Seq[String]): Option[DataFrame] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = dirs
      .map(d => new Path(root, d))
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

  private def unescDir(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(v)

  /** Post-append sidecar maintenance, shared by both merge paths. The
    * stats for the touched predicates are recomputed FROM THE STORE —
    * from parquet FOOTER row counts (one listing plus one footer read
    * per file, zero data pages: the layout guarantees the partition
    * value is constant per directory, so footer sums are exact) —
    * never merged incrementally from batch counts: a replayed batch
    * then heals a sidecar a crash left stale instead of undercounting
    * it forever. Blooms with no sidecar (pre-bloom stores, deleted
    * files) or more rows than their sizing are (re)built from the
    * committed data here, doubling their capacity. */
  private def finishMerge(spark: SparkSession, path: String,
      preds: Seq[String]): Unit = {
    val quads = storeLayout(spark, path) match {
      case None => return // batch empty, no store yet
      case Some(q) => q
    }
    val root = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    // every leaf directory of a touched predicate — on a quad store a
    // predicate's count spans all its graph directories, so the stats
    // glob is per predicate even though the batch touched exact pairs
    val dirs: Seq[String] =
      if (!quads) preds.map(p => s"$PRED_COL=${escDir(p)}")
        .filter(d => fs.exists(new Path(root, d)))
      else preds.flatMap { p =>
        fs.globStatus(new Path(root,
            s"${Terms.GPART_COL}=*/$PRED_COL=${escDir(p)}"))
          .map(st => s"${st.getPath.getParent.getName}/${st.getPath.getName}")
      }
    val dirCounts: Map[String, Long] =
      dirs.map(d => d -> dirRowCount(fs, conf, new Path(root, d))).toMap
    val touched = dirCounts.groupBy { case (d, _) => predOfKey(dirKey(d)) }
      .view.mapValues(_.values.sum).toMap
    val merged = (readStats(spark, path) ++ touched).toSeq.sortBy(_._1)
    writeSidecar(spark, path, STATS_FILE,
      merged.map { case (p, n) => "\"" + esc(p) + "\": " + n }
        .mkString("{", ", ", "}"))
    // (re)build: absent bloom, or saturated AND still below the cap —
    // a capped bloom must never re-trigger a full-directory read every
    // batch; it stays capped and degrades gradually instead
    val rebuild = dirs.filter { d =>
      readBloomExpected(spark, path, d) match {
        case None => dirCounts(d) > 0
        case Some(e) => dirCounts(d) > e && e < BLOOM_MAX_EXPECTED
      }
    }
    if (rebuild.nonEmpty)
      readDirs(spark, path, rebuild).foreach { rows =>
        val expected = rebuild.map { d =>
          dirKey(d) -> bloomSize(dirCounts(d))
        }.toMap
        rebuildBlooms(spark, path, rows, quads, expected)
      }
    if (readSidecar(spark, path, PREFIX_FILE).isEmpty)
      writePrefixes(spark, path, RdfGraph.defaultPrefixes)
  }

  /** Exact row count of one partition directory from parquet footers —
    * no data pages are read (r15 this was a full re-read of the touched
    * directories' DATA per batch, the stats step scaling with directory
    * size). */
  private def dirRowCount(fs: FileSystem, conf: Configuration,
      dir: Path): Long =
    fs.listStatus(dir).iterator
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map { st =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, conf))
        try r.getRecordCount finally r.close()
      }.sum

  /** Rewrite each (graph,) predicate directory's accumulated sliver
    * files — continuous ingest appends a few files per micro-batch, so
    * a long-running stream leaves thousands — into `targetBytes`-sized
    * subject-sorted files. Contents are untouched (same rows, same
    * subject sort, so row-group min/max stats keep skipping); only the
    * file layout changes. Per directory: read → one range shuffle on
    * subject into ⌈bytes/target⌉ partitions → write to a hidden temp
    * directory → two renames swap it in (the bloom sidecar is copied
    * across — the row set is identical, so it stays exact).
    *
    * Run it BETWEEN ingest ticks (AvailableNow returns between calls);
    * it never touches the stream's checkpoint, so ingest resumes
    * unaffected. Crash-safe: a crash mid-swap leaves the directory's
    * previous content under a hidden `.compact-old-*` name, and the
    * next call restores it before doing anything else. Returns the
    * number of directories rewritten.
    *
    * Each qualifying directory is rewritten WHOLE (that is what makes
    * the two-rename swap atomic without a manifest/transaction log);
    * on a store whose hot directory has grown to terabytes, raise
    * `minFiles` and run compaction less often — the cost is one
    * read+write of the directories rewritten, and a directory below
    * `minFiles` files is never touched. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20, minFiles: Int = 4): Int = {
    val quads = storeLayout(spark, path) match {
      case None => return 0
      case Some(q) => q
    }
    val root = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    healCompact(fs, root)
    val leaves: Seq[Path] =
      if (!quads) fs.listStatus(root).map(_.getPath).toSeq
        .filter(_.getName.startsWith(PRED_COL + "="))
      else fs.globStatus(new Path(root,
        s"${Terms.GPART_COL}=*/$PRED_COL=*")).map(_.getPath).toSeq
    var done = 0
    for (dir <- leaves) {
      val files = fs.listStatus(dir).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      val bytes = files.map(_.getLen).sum
      if (files.length >= minFiles && bytes > 0) {
        val rel = if (quads) s"${dir.getParent.getName}/${dir.getName}"
          else dir.getName
        val nParts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        val dataCols = Seq("s", "p", "o") ++ (if (quads) Seq("g") else Nil)
        val tmp = new Path(dir.getParent, ".compact-tmp-" + dir.getName)
        fs.delete(tmp, true) // stale temp from an older crash
        readDirs(spark, path, Seq(rel)).get
          .select(dataCols.map(F.col): _*)
          .repartitionByRange(nParts, F.col("s.value"))
          .sortWithinPartitions(F.col("s.value"))
          .write.parquet(tmp.toString)
        // the bloom sidecar describes the same row set: carry it over
        val bloom = new Path(dir, BLOOM_FILE)
        if (fs.exists(bloom))
          org.apache.hadoop.fs.FileUtil.copy(fs, bloom,
            fs, new Path(tmp, BLOOM_FILE), false, conf)
        val old = new Path(dir.getParent, ".compact-old-" + dir.getName)
        fs.delete(old, true)
        if (!fs.rename(dir, old) || !fs.rename(tmp, dir))
          throw new GraftException(s"compact: atomic swap failed for $dir")
        fs.delete(old, true)
        done += 1
      }
    }
    done
  }

  /** Restore any directory a crashed [[compact]] left mid-swap: a
    * `.compact-old-X` sibling with no live `X` means the crash hit
    * between the two renames — the old content is intact, put it back.
    * A `.compact-old-X` WITH a live `X` means the swap completed and
    * only the cleanup was lost. Temp dirs are deleted either way. */
  private def healCompact(fs: FileSystem, root: Path): Unit = {
    val parents = root +: fs.listStatus(root)
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(Terms.GPART_COL + "="))
      .map(_.getPath).toSeq
    for (parent <- parents; st <- fs.listStatus(parent)) {
      val n = st.getPath.getName
      if (n.startsWith(".compact-old-")) {
        val live = new Path(parent, n.stripPrefix(".compact-old-"))
        if (!fs.exists(live)) fs.rename(st.getPath, live)
        else fs.delete(st.getPath, true)
      } else if (n.startsWith(".compact-tmp-")) fs.delete(st.getPath, true)
    }
  }

  // ---- membership blooms ------------------------------------------------

  /** Build one bloom per (graph-partition,) predicate directory over
    * `rows` and overwrite those directories' `_bloom.bin` sidecars.
    * One distributed pass: per-partition partial blooms, merged by key
    * in a small shuffle, streamed to the driver one shuffle partition
    * at a time (`toLocalIterator`) — driver memory holds one
    * partition's blooms, not the store's predicate count. */
  private def rebuildBlooms(spark: SparkSession, path: String,
      rows: DataFrame, quads: Boolean,
      expected: Map[String, Long]): Unit = {
    partialBlooms(rows, quads, expected)
      .reduceByKey { (a, b) => a.mergeInPlace(b); a }
      .toLocalIterator
      .foreach { case (k, bloom) =>
        writeBloom(spark, path, keyDir(k),
          expected.getOrElse(k, BLOOM_MIN_EXPECTED), bloom)
      }
  }

  /** [[rebuildBlooms]]' small-result twin: collect the per-key blooms
    * (for merging fresh-batch hashes into existing sidecars — the key
    * set is the batch's touched directories, inherently small). */
  private def collectBlooms(rows: DataFrame, quads: Boolean,
      expected: Map[String, Long]): Map[String, BloomFilter] =
    partialBlooms(rows, quads, expected)
      .reduceByKey { (a, b) => a.mergeInPlace(b); a }
      .collect().toMap

  private def partialBlooms(rows: DataFrame, quads: Boolean,
      expected: Map[String, Long])
      : org.apache.spark.rdd.RDD[(String, BloomFilter)] = {
    val expB = rows.sparkSession.sparkContext.broadcast(expected)
    rows.select(bloomKey(quads).as("k"), rowHash(quads).as("h"))
      .rdd.mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap[String, BloomFilter]()
        it.foreach { r =>
          val k = r.getString(0)
          acc.getOrElseUpdate(k, BloomFilter.create(
            expB.value.getOrElse(k, BLOOM_MIN_EXPECTED), BLOOM_FPP))
            .putLong(r.getLong(1))
        }
        acc.iterator
      }
  }

  /** `_bloom.bin` layout: 8-byte big-endian expected-item sizing (the
    * `create` parameter — needed to build mergeable partials and to
    * detect saturation), then [[BloomFilter]]'s own stream format. */
  private def writeBloom(spark: SparkSession, path: String, dir: String,
      expected: Long, bloom: BloomFilter): Unit = {
    val p = new Path(path, dir + "/" + BLOOM_FILE)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try { out.writeLong(expected); bloom.writeTo(out) } finally out.close()
  }

  /** The sidecar's (expected, filter); None when absent or unreadable —
    * an unreadable bloom degrades to "every row might exist", never to
    * an error. */
  private def readBloom(spark: SparkSession, path: String,
      dir: String): Option[(Long, BloomFilter)] = {
    val p = new Path(path, dir + "/" + BLOOM_FILE)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else scala.util.Try {
      val in = fs.open(p)
      try (in.readLong(), BloomFilter.readFrom(in)) finally in.close()
    }.toOption
  }

  /** Just the sizing header (saturation check without deserializing
    * the bit array). */
  private def readBloomExpected(spark: SparkSession, path: String,
      dir: String): Option[Long] = {
    val p = new Path(path, dir + "/" + BLOOM_FILE)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else scala.util.Try {
      val in = fs.open(p)
      try in.readLong() finally in.close()
    }.toOption
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
    val p = new Path(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSidecar(spark: SparkSession, path: String,
      name: String): Option[String] = {
    val p = new Path(path, name)
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

  /** Test seam: the store-side probe for one batch's touched directory
    * keys ((gpart SP) pred — see [[bloomKey]]); the specs pin that
    * only those directories are listed. */
  private[graft] def prunedProbe(spark: SparkSession, path: String,
      keys: Seq[String]): Option[DataFrame] =
    readDirs(spark, path, keys.map(keyDir))

  /** Test seam: merge `rows`' hashes into one directory's bloom
    * WITHOUT appending the rows — reproduces the exact state a crash
    * between the bloom write and the parquet append leaves behind, so
    * the spec can pin that phantom entries never lose data. */
  private[graft] def poisonBloomForTest(spark: SparkSession,
      path: String, dir: String, rows: DataFrame): Unit = {
    val (expected, bloom) = readBloom(spark, path, dir).get
    rows.select(rowHash(quads = false).as("h"))
      .collect().foreach(r => bloom.putLong(r.getLong(0)))
    writeBloom(spark, path, dir, expected, bloom)
  }
}
