package graft

/** Bucketed co-location (Tables.bucketize): at 100 TB a dim side can
  * outgrow broadcast, and the sort-merge join that replaces it only
  * avoids shuffling both sides when the tables are pre-bucketed on their
  * join keys. These tests pin the whole chain: bucketized catalog copies
  * → vertical scans whose `__nk:` companions alias the bucket columns →
  * alias-aware output partitioning → SortMergeJoin with ZERO Exchange. */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val P = "PREFIX gp: <urn:graft:p/>\n"

  test("pre-bucketed fact-dim chain joins with zero exchanges") {
    Tables.bucketize(spark, dir, 4, "lineitem", "orders")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // emulate the at-scale case: dim too big to broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Engine.fromGraph(Tables.graph(spark, dir, "lineitem", "orders"))
        .selectRaw(P +
          """SELECT ?l ?price {
               ?l gp:l_order_ref ?ord . ?ord gp:o_totalprice ?price }""")
      val n = df.count() // materialize so AQE finalizes the plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"expected the bucketed join to plan with zero exchanges:\n$plan")
      assert(n == Tables.read(spark, dir, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Tables.unbucketize(spark, dir, "lineitem", "orders")
    }
  }

  test("re-bucketize with a different count writes a fresh copy") {
    Tables.bucketize(spark, dir, 2, "region")
    Tables.unbucketize(spark, dir, "region")
    Tables.bucketize(spark, dir, 3, "region")
    try {
      // the 3-bucket copy must be active: its scan reports 3 buckets
      val scan = Tables.read(spark, dir, "region")
        .queryExecution.sparkPlan.collectLeaves().head.toString
      assert(scan.contains("Bucketed: true"), scan)
      assert(scan.contains("3 out of 3") || !scan.contains("2 out of 2"), scan)
      assert(Tables.read(spark, dir, "region").count() ==
        spark.read.parquet(s"$dir/region.parquet").count())
    } finally Tables.unbucketize(spark, dir, "region")
  }

  test("bucketized read returns the same rows as the parquet path") {
    Tables.bucketize(spark, dir, 4, "nation")
    try {
      val bucketed = Tables.read(spark, dir, "nation").collect().toSet
      Tables.unbucketize(spark, dir, "nation")
      val plain = Tables.read(spark, dir, "nation").collect().toSet
      assert(bucketed == plain)
    } finally Tables.unbucketize(spark, dir, "nation")
  }
}
