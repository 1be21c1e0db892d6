package graft.demo

import org.apache.spark.sql.{Column, SparkSession, functions => F}
import graft.rdf._

/** Scale probe for the Reasoner operators: build the q_rdfs_closure /
  * q_sameas_smush fixture graphs from the customer dim at two scales
  * (sf0.1 → the 10× sf1 rehearsal) and time the full materializations.
  * The closure's fixpoints are schema-sized (constant across scales);
  * the instance-side cost is the broadcast rule joins — the ratio
  * should track data volume, not blow up.
  *
  *   SPARK_GRAFT_SF_DIRS=/root/testdata/sf0.1,/tmp/sf1 \
  *     sbt "Test/runMain graft.demo.ReasonerScale"
  */
object ReasonerScale {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SF_DIRS",
      "/root/testdata/sf0.1,/tmp/sf1").split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import Terms._

    def fixtureRdfs(dir: String): RdfGraph = {
      def read(t: String) = spark.read.parquet(s"$dir/$t.parquet")
      def ir(prefix: String, k: Column) =
        iri(F.concat(F.lit(prefix), k.cast("string")))
      val region = read("region"); val customer = read("customer")
      val subC = iri(RDFS.subClassOf); val subP = iri(RDFS.subPropertyOf)
      val chainC = region.where(F.col("r_regionkey") > 0).select(
        ir("urn:graft:c/R", F.col("r_regionkey")).as("s"), subC.as("p"),
        ir("urn:graft:c/R", F.col("r_regionkey") - 1).as("o"))
      val natC = read("nation").select(
        ir("urn:graft:c/N", F.col("n_nationkey")).as("s"), subC.as("p"),
        ir("urn:graft:c/R", F.col("n_regionkey")).as("o"))
      val chainP = region.where(F.col("r_regionkey") > 0).select(
        ir("urn:graft:p/P", F.col("r_regionkey")).as("s"), subP.as("p"),
        ir("urn:graft:p/P", F.col("r_regionkey") - 1).as("o"))
      val domRng = region.where(F.col("r_regionkey") === 2).select(
          iri("urn:graft:p/P2").as("s"), iri(RDFS.domain).as("p"),
          iri("urn:graft:c/Dom").as("o"))
        .unionByName(region.where(F.col("r_regionkey") === 3).select(
          iri("urn:graft:p/P3").as("s"), iri(RDFS.range).as("p"),
          iri("urn:graft:c/Rng").as("o")))
      val inst = customer.select(
        ir("urn:graft:e/c", F.col("c_custkey")).as("s"),
        ir("urn:graft:p/P", F.col("c_custkey") % 5).as("p"),
        ir("urn:graft:e/n", F.col("c_nationkey")).as("o"))
      val types = customer.select(
        ir("urn:graft:e/c", F.col("c_custkey")).as("s"),
        iri(RDF.typ).as("p"),
        ir("urn:graft:c/N", F.col("c_nationkey")).as("o"))
      RdfGraph(chainC.unionByName(natC).unionByName(chainP)
        .unionByName(domRng).unionByName(inst).unionByName(types), Map.empty)
    }

    def fixtureSameAs(dir: String): RdfGraph = {
      def read(t: String) = spark.read.parquet(s"$dir/$t.parquet")
      val customer = read("customer")
      def en(k: Column) =
        iri(F.concat(F.lit("urn:graft:e/"), k.cast("string")))
      val sameAs = customer.where(F.col("c_custkey") % 4 =!= 0).select(
        en(F.col("c_custkey")).as("s"), iri(OWL.sameAs).as("p"),
        en(F.col("c_custkey") - F.col("c_custkey") % 4).as("o"))
      val knows = customer.select(en(F.col("c_custkey")).as("s"),
        iri("urn:graft:p/knows").as("p"),
        en(F.col("c_custkey") * 7 % 997).as("o"))
      RdfGraph(sameAs.unionByName(knows), Map.empty)
    }

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    dirs.foreach { dir =>
      // warm file metadata
      spark.read.parquet(s"$dir/customer.parquet").count()
      val reps = 2
      val closure = (1 to reps).map { _ =>
        val (t, n) = time(Reasoner.rdfsClosure(fixtureRdfs(dir))
          .triples.count())
        (t, n)
      }
      val smush = (1 to reps).map { _ =>
        val (t, n) = time(Reasoner.smushSameAs(fixtureSameAs(dir))
          .triples.count())
        (t, n)
      }
      println(f"""{"dir":"$dir","rdfs_closure_sec":${
        closure.map(_._1).min}%.3f,"closure_triples":${closure.head._2},""" +
        f""""smush_sec":${smush.map(_._1).min}%.3f,"smush_triples":${
          smush.head._2}}""")
    }
    spark.stop()
  }
}
