package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.Dedup

/** The native expressions are SQL-callable through the standard
  * SparkSessionExtensions injection (spark.sql.extensions=
  * graft.GraftExtensions, set by the test/bench/verify sessions), and
  * the SQL path produces the same values as the DataFrame path. */
class ExtensionsSpec extends SparkSpec {

  test("simhash64 / shingle_hashes / minhash_sig resolve in spark.sql") {
    val sql = spark.sql(
      """SELECT simhash64(split('alpha beta gamma', ' ')) AS sh,
                shingle_hashes(split('alpha beta gamma delta', ' '), 3) AS g,
                minhash_sig(shingle_hashes(split('alpha beta gamma delta', ' '), 3), 8) AS m
      """).collect()(0)
    val df = spark.range(1).select(
        Dedup.simhash(F.lit("alpha beta gamma")).as("sh"),
        Dedup.shingleHashes(F.lit("alpha beta gamma delta"), 3).as("g"),
        Dedup.minhashSigColumn(
          Dedup.shingleHashes(F.lit("alpha beta gamma delta"), 3), 8).as("m"))
      .collect()(0)
    assert(sql.getLong(0) == df.getLong(0))
    assert(sql.getSeq[Long](1) == df.getSeq[Long](1))
    assert(sql.getSeq[Long](2) == df.getSeq[Long](2))
  }

  test("non-literal size argument is rejected with a clear error") {
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(split('a b', ' '), id + 1) FROM range(1)")
        .collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
