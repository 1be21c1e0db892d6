package graft

import org.apache.spark.sql.{functions => F}

import graft.expressions.CdcChunks
import graft.pipeline.Dedup

/** Content-defined chunking ([[graft.expressions.CdcChunks]]) and
  * binary near-dup detection: the boundary-realignment property that
  * justifies CDC, size bounds, determinism, degenerate content, and
  * the composed pair detection. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(b: Array[Byte], avgBits: Int = 8): Seq[(Long, Int, Long)] = {
    val a = CdcChunks.split(b, avgBits)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 3)
      (r.getLong(0), r.getInt(1), r.getLong(2))
    }
  }

  private def randBytes(seed: Int, n: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  test("chunks tile the input exactly; sizes respect min/max bounds") {
    val data = randBytes(1, 50000)
    val cs = chunksOf(data)
    assert(cs.head._1 === 0L)
    assert(cs.map(_._2.toLong).sum === data.length.toLong)
    for (w <- cs.sliding(2) if w.size == 2)
      assert(w(1)._1 === w(0)._1 + w(0)._2, "chunks must be contiguous")
    // all but the final chunk obey the bounds (min 64, max 1024 @ avg 256)
    for ((_, len, _) <- cs.dropRight(1)) {
      assert(len >= 64 && len <= 1024, s"len=$len")
    }
    // the average is in the right ballpark (loose: within 4x)
    val avg = data.length.toDouble / cs.size
    assert(avg > 64 && avg < 1024, s"avg=$avg")
  }

  test("THE CDC property: a prefix edit leaves later chunks identical") {
    val base = randBytes(7, 40000)
    val edited = randBytes(99, 37) ++ base // insert 37 bytes at the front
    val a = chunksOf(base).map(_._3)
    val b = chunksOf(edited).map(_._3)
    val shared = a.toSet.intersect(b.toSet).size
    // all but the first few boundary-disturbed chunks re-align
    assert(shared >= a.size - 3, s"shared=$shared of ${a.size}")
    // fixed-size blocking would share ZERO blocks after an unaligned
    // insert — the reason CDC exists
    val fixedA = base.grouped(256).map(_.toSeq).toSet
    val fixedB = edited.grouped(256).map(_.toSeq).toSet
    assert(fixedA.intersect(fixedB).isEmpty)
  }

  test("determinism, empty, null, and the all-zeros pathological case") {
    val d = randBytes(3, 9999)
    assert(chunksOf(d) === chunksOf(d.clone()))
    assert(chunksOf(Array.emptyByteArray) === Seq.empty)
    assert(CdcChunks.split(null, 8) === null ||
      CdcChunks.split(Array.emptyByteArray, 8).numElements() === 0)
    // gear hash of constant zeros never fires a boundary: the max-size
    // hard cut still chunks it (1024 at avgBits 8)
    val zeros = chunksOf(new Array[Byte](5000))
    assert(zeros.dropRight(1).forall(_._2 === 1024))
    // identical content → identical hashes (dedup works on zeros too)
    assert(zeros.dropRight(1).map(_._3).distinct.size === 1)
  }

  test("binaryNearDupPairs: edited blob pairs with its original") {
    val base = randBytes(11, 30000)
    val blobs = Seq(
      (1L, base),
      (2L, randBytes(5, 40) ++ base),          // near-dup of 1
      (3L, randBytes(21, 30000)),              // unrelated
      (4L, base.take(15000) ++ randBytes(6, 50) ++ base.drop(15000)))
      .toDF("doc_id", "data")
    val pairs = Dedup.binaryNearDupPairs(blobs, "doc_id", "data",
      threshold = 0.5, avgBits = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // deterministic across partitionings
    val again = Dedup.binaryNearDupPairs(blobs.repartition(7), "doc_id",
      "data", threshold = 0.5, avgBits = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(again === pairs)
  }

  test("binaryDedup keeps each group's smallest id; unrelated blobs stay") {
    val base = randBytes(17, 20000)
    val blobs = Seq(
      (5L, base),
      (2L, randBytes(3, 30) ++ base),   // same group — smaller id wins
      (9L, base ++ randBytes(4, 30)),   // same group
      (7L, randBytes(8, 20000)))        // unrelated, kept
      .toDF("doc_id", "data")
    val kept = Dedup.binaryDedup(blobs, "doc_id", "data",
      threshold = 0.5, avgBits = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 7L))
  }

  test("SQL registration") {
    val d = randBytes(2, 2000)
    val viaSql = Seq(Tuple1(d)).toDF("b").createOrReplaceTempView("cdc_in")
    val n = spark.sql(
      "SELECT size(cdc_chunks(b, 8)), cdc_chunks(b, 8)[0].offset FROM cdc_in")
      .head()
    assert(n.getInt(0) === chunksOf(d).size)
    assert(n.getLong(1) === 0L)
  }
}
