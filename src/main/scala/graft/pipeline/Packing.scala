package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types._

/** Sequence packing: greedy first-fit of documents into fixed
  * token-budget training sequences — the batching stage between dedup/
  * filtering and tokenized shard writing in an LLM data pipeline.
  *
  * Distributed shape: documents are hash-distributed across partitions,
  * sorted within each partition by id, and packed per-partition with a
  * single-pass greedy fold (`mapPartitions` — the legitimate use: a
  * stateful sequential algorithm over each partition's stream, no
  * cross-partition state). No shuffle beyond the one repartition; bin
  * ids are (partition « 32 | local), unique without coordination.
  *
  * Determinism: hash-partitioning on the id and the within-partition
  * sort make the packing independent of input order and previous
  * partitioning — reruns produce identical bins.
  *
  * At 100 TB: packing is per-partition streaming (O(1) state per open
  * bin), so executors never hold more than one partition's iterator;
  * the waste bound of greedy first-fit-on-sorted-stream is the usual
  * ≤ maxTokens-per-bin slack, acceptable for training shards. Documents
  * longer than the budget get a singleton (overflow) bin rather than
  * being silently dropped — the caller decides whether to truncate.
  */
object Packing {

  private val outSchema = StructType(Seq(
    StructField("seq_id", LongType, nullable = false),
    StructField("doc_ids", ArrayType(LongType, containsNull = false)),
    StructField("total_tokens", LongType, nullable = false)))

  /** Pack (id, tokenCount) rows into bins of at most `maxTokens` tokens.
    * Returns (seq_id, doc_ids, total_tokens). */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      maxTokens: Long, partitions: Int = 0): DataFrame = {
    require(maxTokens > 0)
    val spark = df.sparkSession
    val nPart = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val prepared = df
      .select(F.col(idCol).cast(LongType).as("id"),
        F.col(tokenCol).cast(LongType).as("n"))
      .repartition(nPart, F.col("id"))
      .sortWithinPartitions("id")
    val packed = prepared.rdd.mapPartitionsWithIndex { (pidx, rows) =>
      new Iterator[Row] {
        private var nextLocal = 0L
        private val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
        private var bufTokens = 0L

        private def emit(): Row = {
          val r = Row((pidx.toLong << 32) | nextLocal, buf.toSeq, bufTokens)
          nextLocal += 1
          buf.clear(); bufTokens = 0L
          r
        }

        def hasNext: Boolean = rows.hasNext || buf.nonEmpty

        def next(): Row = {
          while (rows.hasNext) {
            val ir = rows.next()
            val id = ir.getLong(0)
            val n = ir.getLong(1)
            if (bufTokens + n > maxTokens && buf.nonEmpty) {
              // close the current bin; the new doc starts the next one
              val closed = emit()
              buf += id; bufTokens = n
              return closed
            }
            buf += id; bufTokens += n
            if (bufTokens >= maxTokens) return emit()
          }
          emit() // trailing partial bin
        }
      }
    }
    spark.createDataFrame(packed, outSchema)
  }
}
