package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.expressions.ZorderKey

/** Z-order key + layout ([[graft.expressions.ZorderKey]],
  * [[Tables.writeZordered]]): bit-level parity with a naive reference,
  * the SQL magic-number restatement the oracle uses, the null/codegen
  * contracts, and the actual data-skipping property — a z-ordered
  * layout confines a second-column predicate to few files where a
  * single-column sort spreads it over all of them. */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def naive(vals: Seq[Long], bits: Int): Long = {
    var out = 0L
    for (bit <- 0 until bits; i <- vals.indices)
      out |= ((vals(i) >> bit) & 1L) << (bit * vals.size + i)
    out
  }

  test("interleave parity with the naive bit loop, k = 2/3/4") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val a = rnd.nextLong() & 0xffffffffL
      val b = rnd.nextLong() & 0xffffffffL
      assert(ZorderKey.interleave2(a, b) === naive(Seq(a, b), 32))
      val c = rnd.nextLong() & 0x1fffffL
      assert(ZorderKey.interleave3(a & 0x1fffffL, b & 0x1fffffL, c) ===
        naive(Seq(a & 0x1fffffL, b & 0x1fffffL, c), 21))
      val d = rnd.nextLong() & 0xffffL
      assert(ZorderKey.interleave4(a & 0xffffL, b & 0xffffL, c & 0xffffL, d)
        === naive(Seq(a & 0xffffL, b & 0xffffL, c & 0xffffL, d), 16))
    }
    // order sanity: nearby points in both dims have nearby keys
    assert(ZorderKey.interleave2(0, 0) === 0L)
    assert(ZorderKey.interleave2(1, 0) === 1L)
    assert(ZorderKey.interleave2(0, 1) === 2L)
    assert(ZorderKey.interleave2(1, 1) === 3L)
  }

  test("the SQL magic-number restatement regenerates the key (oracle recipe)") {
    val df = (0 until 200).map(i => (i.toLong * 7919 % 100000,
      i.toLong * 104729 % 100000)).toDF("a", "b")
    df.createOrReplaceTempView("z_in")
    val composed = spark.sql("""
      WITH s AS (SELECT a, b,
        CAST(a AS BIGINT) & 4294967295 AS xa, CAST(b AS BIGINT) & 4294967295 AS xb
        FROM z_in),
      sp AS (SELECT a, b, xa, xb FROM s),
      e1 AS (SELECT a, b,
        (xa | shiftleft(xa, 16)) & 281470681808895 AS xa,
        (xb | shiftleft(xb, 16)) & 281470681808895 AS xb FROM sp),
      e2 AS (SELECT a, b,
        (xa | shiftleft(xa, 8)) & 71777214294589695 AS xa,
        (xb | shiftleft(xb, 8)) & 71777214294589695 AS xb FROM e1),
      e3 AS (SELECT a, b,
        (xa | shiftleft(xa, 4)) & 1085102592571150095 AS xa,
        (xb | shiftleft(xb, 4)) & 1085102592571150095 AS xb FROM e2),
      e4 AS (SELECT a, b,
        (xa | shiftleft(xa, 2)) & 3689348814741910323 AS xa,
        (xb | shiftleft(xb, 2)) & 3689348814741910323 AS xb FROM e3),
      e5 AS (SELECT a, b,
        (xa | shiftleft(xa, 1)) & 6148914691236517205 AS xa,
        (xb | shiftleft(xb, 1)) & 6148914691236517205 AS xb FROM e4)
      SELECT a, b, xa | shiftleft(xb, 1) AS z FROM e5""")
      .select("a", "b", "z").as[(Long, Long, Long)].collect().toMap2
    val native = df.select(F.col("a"), F.col("b"),
      Tables.zorderKey(F.col("a"), F.col("b")).as("z"))
      .as[(Long, Long, Long)].collect().toMap2
    assert(native === composed)
  }

  test("SQL registration and null contract") {
    val z = spark.sql("SELECT zorder_key(5L, 3L), zorder_key(5L, CAST(NULL AS BIGINT))")
      .head()
    assert(z.getLong(0) === ZorderKey.interleave2(5, 3))
    assert(z.isNullAt(1))
  }

  test("z-ordered layout skips files a single-column sort cannot") {
    val n = 40000
    val rnd = new scala.util.Random(5)
    val df = (0 until n).map(_ => (rnd.nextInt(1000).toLong,
      rnd.nextInt(1000).toLong, rnd.nextInt())).toDF("a", "b", "payload")
    val dir = Files.createTempDirectory("zorder").toString
    // layout 1: classic sort by a
    df.repartitionByRange(16, F.col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$dir/by_a")
    // layout 2: z-order on (a, b)
    Tables.writeZordered(df, Seq("a", "b"), s"$dir/z", numFiles = 16)

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .where(F.col("b").between(100, 140))
        .select(F.input_file_name()).distinct().count()

    val zFiles = filesTouched(s"$dir/z")
    val aFiles = filesTouched(s"$dir/by_a")
    // sorted-by-a spreads a b-slice over every file; z-order confines it
    assert(aFiles >= 14, s"by-a layout unexpectedly clustered b: $aFiles")
    assert(zFiles <= aFiles / 2, s"z=$zFiles vs a=$aFiles")
    // and the data itself round-trips
    assert(spark.read.parquet(s"$dir/z").count() === n.toLong)
    assert(spark.read.parquet(s"$dir/z").agg(F.sum("payload")).head().getLong(0)
      === df.agg(F.sum("payload")).head().getLong(0))
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
