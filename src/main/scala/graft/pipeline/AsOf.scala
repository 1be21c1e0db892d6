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

  /** Interval (range) join at scale: each left row (key, `ts`) joins
    * right rows (key, [`start`, `end`)) containing its timestamp —
    * campaign attribution, session assignment, validity-window
    * enrichment.
    *
    * Spark has no range-join optimization: the naive
    * `l.join(r, lk === rk && s <= t && t < e)` plans a per-key cross
    * product (every left row compared against every same-key interval).
    * The scalable encoding is bucketing: intervals explode to the
    * `bucket`-sized time buckets they overlap, points map to their ONE
    * bucket, and the join runs on (key, bucket) equality with the exact
    * range predicate as a post-filter. An interval appears once per
    * overlapped bucket but a point lives in exactly one, so results
    * need no dedup. One hash shuffle each side; per-row fan-out =
    * ceil(interval/bucket), bounded by `maxSpan` buckets (a corrupt
    * open-ended interval raises instead of exploding the stage).
    *
    * `bucket` trades fan-out vs selectivity: pick roughly the median
    * interval length. Returns left columns + `valueCols` (inner join;
    * points in no interval drop — left-join semantics are the caller's
    * `unionByName` of the anti-join). Timestamps are integral
    * (epoch-ms or any monotone long); `end` is exclusive. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      ts: String, start: String, end: String, valueCols: Seq[String],
      bucket: Long, maxSpan: Int = 4096): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    require(valueCols.nonEmpty, "valueCols must not be empty")
    require(valueCols.forall(!left.columns.contains(_)),
      s"valueCols ${valueCols.mkString(",")} collide with left columns")
    require(!left.columns.contains(start) && !left.columns.contains(end),
      s"left must not contain the right-side bound columns $start/$end")
    require(!left.columns.contains("__bucket"),
      "left must not contain the internal marker column __bucket")
    require(!valueCols.exists(c => c == "__bucket" || c == "__off"),
      "valueCols must not contain the internal columns __bucket/__off")
    val lCols = left.columns.toSeq
    val t = F.col(ts).cast("long")
    val s = F.col(start).cast("long")
    val e = F.col(end).cast("long")
    // exact integral floor division (`div` truncates toward zero; shift
    // negatives) — no double arithmetic, full 64-bit timestamp range
    def idiv(a: org.apache.spark.sql.Column, b: Long) =
      F.call_function("div", a, F.lit(b))
    def floorDiv(c: org.apache.spark.sql.Column) =
      F.when(c >= 0, idiv(c, bucket))
        .otherwise(-idiv(-c + (bucket - 1), bucket))
    val nBuckets = floorDiv(e - 1) - floorDiv(s) + 1
    val spans = F.when(e <= s, F.array()) // empty interval: no buckets
      .when(nBuckets <= maxSpan, F.sequence(F.lit(0L), nBuckets - 1))
      .otherwise(F.raise_error(F.lit(
        s"interval spans more than $maxSpan buckets of $bucket; " +
          "raise bucket or maxSpan")))
    val r = right
      .select((Seq(key, start, end) ++ valueCols).map(F.col): _*)
      // NULL (or non-castable) bounds never match under the naive range
      // join this replaces — drop them BEFORE the span guard, so they
      // can't fall through its CaseWhen into the raise branch
      .where(s.isNotNull && e.isNotNull)
      .withColumn("__off", F.explode(spans))
      .withColumn("__bucket", F.col("__off") + floorDiv(s))
      .drop("__off")
    val l = left.withColumn("__bucket", floorDiv(t))
    l.join(r, Seq(key, "__bucket"))
      .where(s <= t && t < e)
      .select((lCols ++ valueCols).map(F.col): _*)
  }
}
