package graft

import scala.util.Random
import org.apache.spark.sql.{functions => F}
import graft.pipeline.Dedup

/** Random differential net for the banded dedup pipelines: seeded random
  * corpora run through the DISTRIBUTED pipeline, and a naive in-memory
  * replay of the same contract — banding, bucket cap (smallest ids
  * kept), ordered pair expansion, exact verification — must produce the
  * IDENTICAL pair set. The replay consumes the engine's own signature /
  * hash frames (those primitives are pinned against independent
  * recomputations in PipelineSpec), so what this net exercises is
  * everything distributed AROUND them: the band explode, the bucket
  * grouping, the bounded-buffer cap, the local pair expansion, the
  * cross-bucket distinct, and the verification joins.
  *
  * Corpora include the hostile shapes: exact duplicate blobs larger than
  * the bucket cap, near-duplicates one token apart, empty and
  * single-token documents, unicode tokens.
  *
  * Deepen with GRAFT_MODEL_SEEDS_EXTRA (comma-separated extra seeds). */
class DedupModelSpec extends SparkSpec {
  import spark.implicits._

  private def extraSeeds: Seq[Int] =
    sys.env.get("GRAFT_MODEL_SEEDS_EXTRA").toSeq
      .flatMap(_.split(',')).filter(_.nonEmpty).map(_.trim.toInt)

  // ------------------------------------------------- corpus generator

  private def genCorpus(rnd: Random): Seq[(Long, String)] = {
    val vocab = (1 to 24).map(i => s"tok$i") ++ Seq("中文", "naïve", "x")
    def doc(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    var id = 0L
    def nextId(): Long = { id += 1; id }
    val bases = Seq.fill(18)(doc(rnd.nextInt(22)))  // includes empty docs
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    bases.foreach { b =>
      rows += ((nextId(), b))
      // exact duplicate with some probability
      if (rnd.nextInt(3) == 0) rows += ((nextId(), b))
      // near-duplicate: swap one token
      if (b.nonEmpty && rnd.nextInt(2) == 0) {
        val toks = b.split(" ")
        val t2 = toks.updated(rnd.nextInt(toks.length),
          vocab(rnd.nextInt(vocab.size)))
        rows += ((nextId(), t2.mkString(" ")))
      }
    }
    // a duplicate blob LARGER than the bucket cap used below (cap = 8)
    val blob = doc(12 max 1)
    (1 to 12).foreach(_ => rows += ((nextId(), blob)))
    rows.toSeq
  }

  // --------------------------------------------- minhash banded replay

  for (seed <- Seq(5, 17) ++ extraSeeds) {
    test(s"minhash pipeline == in-memory banding/cap/verify replay (seed $seed)") {
      val rnd = new Random(seed)
      val corpus = genCorpus(rnd)
      val df = corpus.toDF("doc_id", "text")
      val (numHashes, bands, cap, threshold) = (16, 4, 8, 0.5)

      val got = Dedup.minhashDedupPairs(df, "doc_id", "text",
          threshold = threshold, k = 3, numHashes = numHashes,
          bands = bands, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap

      // the engine's own primitive frames (independently pinned)
      val shingles = df.select(F.col("doc_id"),
          Dedup.shingleHashes(F.col("text"), 3).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val sigs = Dedup.minhashSignatures(df, "doc_id", "text", 3, numHashes)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap

      // replay: band slices → buckets keyed by the slice VALUE (the
      // engine hashes the slice; equal slices collide identically, and a
      // cross-value hash collision would only ADD a candidate that the
      // verify step then filters the same way)
      val rows = numHashes / bands
      val buckets = scala.collection.mutable.Map
        .empty[(Int, Vector[Long]), List[Long]]
      // empty shingle sets are dropped before banding (engine contract)
      val nonEmptyIds = sigs.keys.filter(id => shingles(id).nonEmpty)
      for (rid <- nonEmptyIds; b <- 0 until bands) {
        val key = (b, sigs(rid).slice(b * rows, b * rows + rows))
        buckets(key) = rid :: buckets.getOrElse(key, Nil)
      }
      val candidates = buckets.values.flatMap { members =>
        val kept = members.sorted.take(cap)
        for (i <- kept.indices; j <- i + 1 until kept.size)
          yield (kept(i), kept(j))
      }.toSet
      val want = candidates.flatMap { case (a, b) =>
        val (sa, sb) = (shingles(a), shingles(b))
        val inter = (sa & sb).size.toDouble
        val union = sa.size + sb.size - inter
        val j = if (union > 0) inter / union else 0.0
        if (j >= threshold) Some((a, b) -> j) else None
      }.toMap

      assert(got.keySet == want.keySet,
        s"pair sets differ (seed $seed):\nengine-only=${got.keySet -- want.keySet}" +
          s"\nmodel-only=${want.keySet -- got.keySet}")
      for ((p, j) <- want)
        assert(math.abs(got(p) - j) < 1e-12, s"jaccard differs at $p: ${got(p)} vs $j")
    }
  }

  // ------------------------------------- prefix-filter (PPJoin) replay

  for (seed <- Seq(11, 43) ++ extraSeeds.map(_ + 5000)) {
    test(s"ngram prefix-filter pipeline == in-memory replay (seed $seed)") {
      val rnd = new Random(seed)
      val corpus = genCorpus(rnd)
      val df = corpus.toDF("doc_id", "text")
      val (cap, threshold) = (6, 0.5)

      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text",
          threshold = threshold, k = 3, maxDocsPerShingle = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap

      val shingles = df.select(F.col("doc_id"),
          Dedup.shingleHashes(F.col("text"), 3).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

      // replay: global df (singletons tie at 1), rarest-first prefix of
      // n - ceil(t*n) + 1 elements per doc, df-capped postings keeping
      // the smallest ids, pairs within postings, exact-jaccard verify —
      // the same double arithmetic for the prefix length as the engine
      val dfreq = shingles.values.flatten.groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val postings = scala.collection.mutable.Map.empty[Long, List[Long]]
      for ((rid, sh) <- shingles; if sh.nonEmpty) {
        val n = sh.size
        val prefixLen = (n - math.ceil(threshold * n) + 1).toInt
        val prefix = sh.toSeq
          .sortBy(k => (if (dfreq(k) >= 2) dfreq(k) else 1L, k))
          .take(prefixLen)
        prefix.foreach(k => postings(k) = rid :: postings.getOrElse(k, Nil))
      }
      val candidates = postings.values.flatMap { members =>
        val kept = members.sorted.take(cap)
        for (i <- kept.indices; j <- i + 1 until kept.size)
          yield (kept(i), kept(j))
      }.toSet
      val want = candidates.flatMap { case (a, b) =>
        val (sa, sb) = (shingles(a), shingles(b))
        val inter = (sa & sb).size.toDouble
        val union = sa.size + sb.size - inter
        val j = if (union > 0) inter / union else 0.0
        if (j >= threshold) Some((a, b) -> j) else None
      }.toMap

      assert(got.keySet == want.keySet,
        s"pair sets differ (seed $seed):\nengine-only=${got.keySet -- want.keySet}" +
          s"\nmodel-only=${want.keySet -- got.keySet}")
      for ((p, j) <- want)
        assert(math.abs(got(p) - j) < 1e-12, s"jaccard differs at $p: ${got(p)} vs $j")
      // the duplicate blob overflows at least one posting list, so the
      // df-cap path genuinely executes
      assert(postings.values.exists(_.size > cap),
        "generator must overflow at least one posting list")
    }
  }

  // --------------------------------------------- hamming banded replay

  for (seed <- Seq(7, 29) ++ extraSeeds.map(_ + 9000)) {
    test(s"hamming banded core == exact in-memory replay (seed $seed)") {
      val rnd = new Random(seed)
      // random 64-bit hashes with planted near-duplicates and a hot
      // bucket: many values sharing one 16-bit band
      val base = Seq.fill(40)(rnd.nextLong())
      val near = base.take(15).map(h => h ^ (1L << rnd.nextInt(64)))
      val hot = Seq.fill(14)((rnd.nextLong() & ~0xffffL) | 0xabcdL)
      val all = (base ++ near ++ hot).zipWithIndex
        .map { case (h, i) => (i.toLong + 1, h) }
      val df = all.toDF("rid", "sh")
      val (maxBits, cap) = (3, 8)

      val got = Dedup.hammingNearDupPairs(df, maxBits, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

      // exact replay of the even 64-bit band split + cap + popcount
      val nBands = maxBits + 1
      val buckets = scala.collection.mutable.Map
        .empty[(Int, Long), List[Long]]
      val byId = all.toMap
      for ((rid, h) <- all; b <- 0 until nBands) {
        val lo = b * 64 / nBands
        val width = (b + 1) * 64 / nBands - lo
        val mask = if (width == 64) -1L else (1L << width) - 1L
        val key = (b, (h >> lo) & mask)
        buckets(key) = rid :: buckets.getOrElse(key, Nil)
      }
      val want = buckets.values.flatMap { members =>
        val kept = members.sorted.take(cap)
        for {
          i <- kept.indices; j <- i + 1 until kept.size
          d = java.lang.Long.bitCount(byId(kept(i)) ^ byId(kept(j)))
          if d <= maxBits
        } yield (kept(i), kept(j)) -> d
      }.toMap

      assert(got == want,
        s"hamming pairs differ (seed $seed):\nengine-only=${got.toSet -- want.toSet}" +
          s"\nmodel-only=${want.toSet -- got.toSet}")
      // the hot bucket genuinely overflowed the cap, so the cap path ran
      assert(buckets.values.exists(_.size > cap),
        "generator must produce at least one over-cap bucket")
    }
  }
}
