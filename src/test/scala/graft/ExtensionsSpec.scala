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

  test("audio_header_meta resolves in spark.sql") {
    // minimal canonical WAV: mono 8-bit 8 kHz, 8000-byte data = 1 s
    val r = spark.sql(
      """SELECT audio_header_meta(unhex(concat(
           '52494646', '24000000', '57415645',
           '666D7420', '10000000', '0100', '0100', '401F0000', '401F0000',
           '0100', '0800', '64617461', '401F0000'))) AS m""").collect()(0)
    val m = r.getStruct(0)
    assert(m.getString(0) == "audio/wav" && m.getInt(1) == 1 &&
      m.getInt(2) == 8000 && m.getInt(3) == 8 && m.getLong(4) == 1000L)
  }

  test("cosine_sim and image_header_meta resolve in spark.sql") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
                image_header_meta(unhex(concat(
                  '89504E470D0A1A0A0000000D49484452',
                  '0000000200000003', '0806000000'))) AS m
      """).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    val m = r.getStruct(1)
    assert(m.getString(0) == "image/png" && m.getInt(1) == 2 && m.getInt(2) == 3)
  }

  test("image_decode and resize_image resolve in spark.sql") {
    // the 1×1 stored-DEFLATE PNG (rgb 10,20,30) from the Drive demo:
    // decode it, and resize it (identity at maxSide 8, PNG re-encode)
    val png =
      "'89504E470D0A1A0A', '0000000D'," +
      "'494844520000000100000001', '0802000000', '907753DE'," +
      "'0000000F', '49444154', '7801', '010400FBFF', '000A141E'," +
      "'0068003D', 'E80CBB83', '0000000049454E44AE426082'"
    val r = spark.sql(
      s"""SELECT image_decode(unhex(concat($png))) AS d,
                 image_decode(resize_image(unhex(concat($png)), 8)) AS t
       """).collect()(0)
    for (i <- 0 to 1) {
      val d = r.getStruct(i)
      assert(d.getString(0) == "image/png" && d.getInt(1) == 1 &&
        d.getInt(2) == 1 && d.getDouble(3) == 10.0 &&
        d.getDouble(4) == 20.0 && d.getDouble(5) == 30.0)
    }
  }

  test("image_embedding and audio_embedding resolve in spark.sql") {
    // 1×1 stored-DEFLATE PNG (10,20,30) → one-hot bins 0/0/0 at bins=4;
    // constant-sample µ-law WAV → all band energy at DC
    val r = spark.sql(
      """SELECT image_embedding(unhex(concat(
           '89504E470D0A1A0A', '0000000D',
           '494844520000000100000001', '0802000000', '907753DE',
           '0000000F', '49444154', '7801', '010400FBFF', '000A141E',
           '0068003D', 'E80CBB83', '0000000049454E44AE426082')), 4) AS iv,
                audio_embedding(unhex(concat(
           '52494646', '64000000', '57415645',
           '666D7420', '10000000', '0700', '0100', '401F0000', '401F0000',
           '0100', '0800', '64617461', '40000000', repeat('90', 64))), 5) AS av
      """).collect()(0)
    val iv = r.getSeq[Float](0)
    assert(iv.length == 12 && iv(0) == 1.0f && iv(4) == 1.0f && iv(8) == 1.0f)
    val av = r.getSeq[Float](1)
    assert(av.length == 5 && av(0) > 0.9f)
  }

  test("warc_records and http_message resolve in spark.sql") {
    val r = spark.sql(
      """SELECT warc_records(encode(concat(
           'WARC/1.0\r\nWARC-Type: response\r\n',
           'WARC-Target-URI: http://a/x\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n'),
           'UTF-8')) AS recs,
           http_message(encode(concat(
             'HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n',
             'Transfer-Encoding: chunked\r\n\r\n2\r\nok\r\n0\r\n\r\n'),
             'UTF-8')) AS m""").collect()(0)
    val rec = r.getSeq[org.apache.spark.sql.Row](0).head
    assert(rec.getString(0) == "response" && rec.getString(1) == "http://a/x")
    assert(new String(rec.getAs[Array[Byte]](5), "UTF-8") == "hi")
    val m = r.getStruct(1)
    assert(m.getInt(0) == 200 &&
      new String(m.getAs[Array[Byte]](3), "UTF-8") == "ok")
  }

  test("unzstd resolves in spark.sql") {
    // raw-block frame: magic, FHD, window, block header (len 5, raw,
    // last), "hello"
    val r = spark.sql(
      """SELECT decode(unzstd(unhex('28B52FFD0000290000' ||
           hex(encode('hello', 'UTF-8')))), 'UTF-8') AS t""").collect()(0)
    assert(r.getString(0) == "hello")
  }

  test("non-literal size argument is rejected with a clear error") {
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(split('a b', ' '), id + 1) FROM range(1)")
        .collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
