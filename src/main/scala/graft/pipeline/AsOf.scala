package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Point-in-time (as-of) join — feature-store-style enrichment: each fact
  * row sees the most recent state row at-or-before its own timestamp,
  * never a later one (no training-time leakage). */
object AsOf {

  /** For each left row, attach `valueCols` from the MOST RECENT right row
    * with the same `key` and right.`ts` <= left.`ts` (DuckDB/kdb "ASOF
    * LEFT JOIN" semantics; nulls where no prior right row exists).
    *
    * Spark has no native as-of join, and the naive encodings fail at
    * scale (a range-condition join degenerates to a per-key cross
    * product; a per-row subquery doesn't distribute). The scalable
    * encoding: tag and union both sides, then carry each value column
    * forward with last-non-null over a (key, ts) running window — ONE
    * shuffle on the key, linear work per partition. Right rows sort
    * before left rows at equal ts, so same-instant state is visible
    * (inclusive, matching DuckDB ASOF).
    *
    * Contract: right (key, ts) pairs are unique (pre-aggregate if not);
    * a NULL in a right value column is treated as absent (the window
    * looks further back). `valueCols` must not collide with left column
    * names. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must not be empty")
    require(valueCols.forall(!left.columns.contains(_)),
      s"valueCols ${valueCols.mkString(",")} collide with left columns")
    require(!left.columns.contains("__side") && !valueCols.contains("__side"),
      "left/valueCols must not contain the internal marker column __side")
    val lCols = left.columns.toSeq
    val l = valueCols.foldLeft(left.withColumn("__side", F.lit(1))) {
      (df, c) => df.withColumn(c, F.lit(null).cast(right.schema(c).dataType))
    }
    // NULL keys/timestamps never match under join semantics, but
    // Window.partitionBy groups NULL keys into one partition — drop
    // such right rows so null-keyed left rows keep null values (the
    // DuckDB ASOF oracle's behavior)
    val r = right.select((key +: ts +: valueCols).map(F.col): _*)
      .where(F.col(key).isNotNull && F.col(ts).isNotNull)
      .withColumn("__side", F.lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(F.col(ts), F.col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(u)((df, c) =>
      df.withColumn(c, F.last(F.col(c), ignoreNulls = true).over(w)))
    filled.where(F.col("__side") === 1)
      .select((lCols ++ valueCols).map(F.col): _*)
  }
}
