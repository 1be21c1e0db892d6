package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.TextAnalysis

/** Deterministic shuffle + sharding: local-reference parity of the
  * (shard, pos) assignment, dense per-shard positions, partitioning
  * invariance, actual shuffled-ness, and the sharded export layout. */
class ShuffleShardSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Local reference of the engine's 60-bit order key. */
  private def orderKey(id: Long, seed: Long): Long =
    java.lang.Long.parseLong(md5Hex(s"$seed:$id").take(15), 16)

  test("(shard, pos) equals the local md5 reference exactly") {
    import spark.implicits._
    val ids = (0L until 300L)
    val df = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val got = TextAnalysis.shuffleShards(df, "doc_id", numShards = 7, seed = 3)
      .select("doc_id", "shard", "pos")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val want = ids.map { i =>
      val h = orderKey(i, 3)
      (i, h, (h % 7).toInt)
    }.groupBy(_._3).flatMap { case (shard, rows) =>
      rows.sortBy(r => (r._2, r._1)).zipWithIndex.map {
        case ((id, _, s), pos) => id -> ((s, pos.toLong))
      }
    }
    assert(got == want)
  }

  test("positions are dense per shard and the cover is exact") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, i % 13)).toDF("doc_id", "x")
    val out = TextAnalysis.shuffleShards(df, "doc_id", numShards = 8)
    assert(out.count() == 500)
    val perShard = out.groupBy("shard")
      .agg(F.count(F.lit(1)).as("n"), F.min("pos").as("lo"),
        F.max("pos").as("hi"), F.count_distinct(F.col("pos")).as("d"))
      .collect()
    assert(perShard.length == 8)
    perShard.foreach { r =>
      assert(r.getLong(4) == r.getLong(1)) // distinct == count
      assert(r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1)
    }
  }

  test("assignment is invariant to input partitioning and genuinely shuffled") {
    import spark.implicits._
    val rows = (0L until 400L).map(i => (i, s"t$i"))
    val a = TextAnalysis.shuffleShards(rows.toDF("doc_id", "text")
        .repartition(1), "doc_id", 4, seed = 9)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = TextAnalysis.shuffleShards(
        scala.util.Random.shuffle(rows).toDF("doc_id", "text")
          .repartition(11), "doc_id", 4, seed = 9)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
    // shuffled-ness: within a shard, id order and pos order must differ
    // wildly — count adjacent-pos pairs whose ids are consecutive
    val shard0 = a.filter(_._2 == 0).sortBy(_._3).map(_._1)
    val adjacent = shard0.sliding(2).count {
      case Seq(x, y) => y == x + 1
      case _ => false
    }
    assert(adjacent < shard0.length / 10,
      s"$adjacent of ${shard0.length} adjacent pairs consecutive")
    // different seeds deal different orders
    val c = TextAnalysis.shuffleShards(rows.toDF("doc_id", "text"),
        "doc_id", 4, seed = 10)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a != c)
  }

  test("writeShuffledShards lays out shard dirs with rows in pos order") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString + "/out"
    TextAnalysis.writeShuffledShards(df, "doc_id", dir, numShards = 4, seed = 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 200)
    // the on-disk assignment equals the in-memory operator
    val want = TextAnalysis.shuffleShards(df, "doc_id", 4, seed = 1)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = back.select(F.col("doc_id"), F.col("shard").cast("int"),
        F.col("pos")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
    // within each shard's files, parquet row order is pos order
    val d0 = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
    assert(d0.length == 4)
    d0.foreach { sd =>
      val positions = spark.read.parquet(sd.toString).select("pos")
        .collect().map(_.getLong(0)).toSeq
      assert(positions == positions.sorted, s"unsorted in ${sd.getName}")
    }
  }
}
