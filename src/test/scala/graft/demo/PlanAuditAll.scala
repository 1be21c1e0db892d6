package graft.demo

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Whole-surface plan audit: builds EVERY `SparkEntry.queries` entry at the
  * given scale factor and inspects its physical plan for the two node types
  * that never survive a 100× scale-up — `CartesianProduct` and
  * `BroadcastNestedLoopJoin` — plus a shuffle (Exchange) census per query.
  *
  * Unlike `PlanAudit` (deep manual read of a few headline plans), this is a
  * breadth gate: one row per query, machine-checkable, written as JSON to
  * the path in arg(0) (default `PLANAUDIT.json`). Queries whose builders
  * execute internal actions (index fits, fixpoints) still end in a single
  * result DataFrame — the audit reads that DataFrame's executedPlan string
  * (the AQE-initial plan: join strategies are the statically chosen ones).
  *
  * Exit code 1 if any query's plan contains a forbidden node that is not in
  * the documented allowlist below.
  */
object PlanAuditAll {
  /** Queries allowed to carry a forbidden node, each with the audited
    * reason. Every entry here is a `BroadcastNestedLoopJoin Cross
    * BuildRight` whose BUILD side is bounded by construction — the
    * standard Spark shape for attaching a scalar/tiny relation to a big
    * scan without a shuffle (a plain `join` has no key to hash on, so
    * Catalyst picks BNLJ; with a one-row or few-row broadcast side the
    * "nested loop" is a single pass). Audited in this session's plans. */
  val allow: Map[String, String] = Map(
    "q_bm25" -> ("cross with a ONE-ROW broadcast aggregate of corpus " +
      "stats (N, total length, per-term df) — scalar attach, no shuffle"),
    "q_boilerplate" -> ("cross with a ONE-ROW broadcast count(*) used in " +
      "the boilerplate-line df >= ceil(n*frac) threshold"),
    "q_mixture" -> ("cross with a ONE-ROW broadcast total used to turn " +
      "per-source counts into mixture weights"),
    "q_hard_negatives" -> ("cross of the candidate scan with the " +
      "BROADCAST few-row query-vector set (pushed filter pins it small) " +
      "— brute-force scoring before the per-query WindowGroupLimit top-k"))

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "PLANAUDIT.json"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var bad = List.empty[String]
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val res =
        try {
          val p = fn(spark, sfDir).queryExecution.executedPlan.toString
          val cart = p.contains("CartesianProduct")
          val bnlj = p.contains("BroadcastNestedLoopJoin")
          val exch = "Exchange".r.findAllIn(p).size
          val bcast = "BroadcastHashJoin".r.findAllIn(p).size
          if ((cart || bnlj) && !allow.contains(name)) bad ::= name
          f"""{"q":"$name","cartesian":$cart,"bnlj":$bnlj,"exchanges":$exch,"broadcast_joins":$bcast}"""
        } catch {
          case e: Throwable =>
            bad ::= name
            s"""{"q":"$name","error":${ujson(e.toString.take(200))}}"""
        }
      System.err.println(s"[planaudit] $name done")
      res
    }
    val doc = rows.mkString("[\n", ",\n", "\n]\n")
    Files.writeString(Paths.get(out), doc)
    println(s"[planaudit] ${rows.size} queries audited, ${bad.size} flagged: ${bad.sorted.mkString(", ")}")
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }

  private def ujson(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
