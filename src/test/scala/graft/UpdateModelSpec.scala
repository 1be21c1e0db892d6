package graft

import graft.rdf._
import scala.util.Random

/** Model-based check of the UPDATE surface: random op sequences
  * (INSERT/DELETE DATA with GRAPH blocks, CLEAR/DROP/CREATE,
  * ADD/MOVE/COPY, SILENT variants) run against BOTH the engine and a
  * ~40-line in-memory reference model of SPARQL 1.1 Update §3
  * semantics; dataset states must match after every op. Catches the
  * class of bugs example-based tests miss — op interactions,
  * default-graph vs named-graph aliasing, error-then-no-change
  * contracts — across 3 seeded runs × 40 ops. */
class UpdateModelSpec extends SparkSpec {

  private val EX = "http://example.com/"

  /** Reference model: graph name (None = default) → triple set. A
    * named graph exists iff it has a triple (the engine's documented
    * posture). Ops raise on the same conditions the engine must. */
  private final class Model {
    var state: Map[Option[String], Set[(String, String, String)]] =
      Map(None -> Set.empty)
    private def get(g: Option[String]) = state.getOrElse(g, Set.empty)
    private def exists(g: String) = get(Some(g)).nonEmpty
    private def put(g: Option[String],
        ts: Set[(String, String, String)]): Unit =
      state = if (ts.isEmpty && g.isDefined) state - g
      else state + (g -> ts)

    def insert(g: Option[String], t: (String, String, String)): Unit =
      put(g, get(g) + t)
    def delete(g: Option[String], t: (String, String, String)): Unit =
      put(g, get(g) - t)
    def clear(target: Option[Option[String]], silent: Boolean): Unit =
      target match {
        case None => // ALL
          state = Map(None -> Set.empty)
        case Some(None) => put(None, Set.empty)
        case Some(Some(g)) =>
          if (!exists(g) && !silent) sys.error("no such graph")
          put(Some(g), Set.empty)
      }
    def clearNamed(): Unit = state = Map(None -> get(None))
    def create(g: String, silent: Boolean): Unit =
      if (exists(g) && !silent) sys.error("exists")
    def copyLike(from: Option[String], to: Option[String],
        silent: Boolean, dropTo: Boolean, dropFrom: Boolean): Unit = {
      if (from == to) return
      from match {
        case Some(g) if !exists(g) =>
          if (!silent) sys.error("no such graph"); return
        case _ => ()
      }
      val src = get(from)
      val dst = if (dropTo) src else get(to) ++ src
      put(to, dst)
      if (dropFrom) put(from, Set.empty)
    }
    def dataset: Set[(String, String, String, Option[String])] =
      state.toSeq.flatMap { case (g, ts) =>
        ts.map(t => (t._1, t._2, t._3, g))
      }.toSet

    /** Modify (§3.1.3): WHERE = one pattern `?s/const <p> ?o/const`
      * under a graph scope (default / GRAPH <g> / GRAPH ?gv); both
      * templates instantiate per solution against the PRE-state, then
      * deletes apply before inserts. */
    def modify(sC: Option[String], oC: Option[String],
        whereG: Either[Option[String], Unit], // Left(g) | Right(?gv)
        del: Option[Either[Option[String], Unit]],
        ins: Option[Either[Option[String], Unit]],
        insO: String): Unit = {
      def matches(g: Option[String]): Seq[(String, String)] =
        get(g).toSeq.collect {
          case (s, p, o) if p == s"${EX}p" &&
            sC.forall(_ == s) && oC.forall(_ == o) => (s, o)
        }
      // solutions: (s, o, bound graph name when WHERE used ?gv)
      val sols: Seq[(String, String, Option[String])] = whereG match {
        case Left(g) => matches(g).map { case (s, o) => (s, o, None) }
        case Right(_) => state.keys.toSeq.flatten.flatMap(g =>
          matches(Some(g)).map { case (s, o) => (s, o, Some(g)) })
      }
      def target(t: Either[Option[String], Unit],
          gv: Option[String]): Option[Option[String]] = t match {
        case Left(g) => Some(g)
        case Right(_) => gv.map(Some(_)) // ?gv unbound → quad skipped
      }
      val dels = del.toSeq.flatMap(t => sols.flatMap { case (s, o, gv) =>
        target(t, gv).map(g => (g, (s, s"${EX}p", o)))
      })
      val inss = ins.toSeq.flatMap(t => sols.flatMap { case (s, _, gv) =>
        target(t, gv).map(g => (g, (s, s"${EX}p", insO)))
      })
      dels.foreach { case (g, t) => delete(g, t) }
      inss.foreach { case (g, t) => insert(g, t) }
    }
  }

  private def engineDataset(e: Engine)
      : Set[(String, String, String, Option[String])] =
    e.graph.triples.collect().toSet.map { r: org.apache.spark.sql.Row =>
      (r.getStruct(0).getString(1), r.getStruct(1).getString(1),
        r.getStruct(2).getString(1),
        if (r.isNullAt(3)) None else Some(r.getStruct(3).getString(1)))
    }


  private val extraSeeds: Seq[Int] =
    sys.env.get("GRAFT_MODEL_SEEDS_EXTRA").toSeq
      .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt))

  for (seed <- Seq(11, 23, 47) ++ extraSeeds) {
    test(s"random op sequences match the reference model (seed $seed)") {
      val rnd = new Random(seed)
      val graphs = Seq(s"${EX}g1", s"${EX}g2", s"${EX}g3")
      def someGraph() = graphs(rnd.nextInt(graphs.length))
      def gRef(): Option[String] =
        if (rnd.nextInt(4) == 0) None else Some(someGraph())
      def triple() = (s"${EX}s${rnd.nextInt(4)}", s"${EX}p",
        s"v${rnd.nextInt(4)}")
      def gSql(g: Option[String]) =
        g.map(x => s"GRAPH <$x>").getOrElse("DEFAULT")

      val model = new Model
      val e = Engine.fromGraph(
        RdfGraph.fromQuads(spark, Seq.empty, Map("ex" -> EX)))
      var applied = 0
      for (step <- 1 to 40) {
        val silent = rnd.nextBoolean()
        val sil = if (silent) "SILENT " else ""
        val (sql, modelOp): (String, () => Unit) = rnd.nextInt(8) match {
          case 0 =>
            val (g, t) = (gRef(), triple())
            val block = s"<${t._1}> <${t._2}> '${t._3}'"
            (s"INSERT DATA { ${g.map(x => s"GRAPH <$x> { $block }")
              .getOrElse(block)} }",
              () => model.insert(g, t))
          case 1 =>
            val (g, t) = (gRef(), triple())
            val block = s"<${t._1}> <${t._2}> '${t._3}'"
            (s"DELETE DATA { ${g.map(x => s"GRAPH <$x> { $block }")
              .getOrElse(block)} }",
              () => model.delete(g, t))
          case 2 =>
            rnd.nextInt(3) match {
              case 0 =>
                val g = someGraph()
                (s"CLEAR $sil GRAPH <$g>",
                  () => model.clear(Some(Some(g)), silent))
              case 1 => (s"CLEAR ${sil}DEFAULT",
                () => model.clear(Some(None), silent))
              case 2 => (s"CLEAR ${sil}NAMED", () => model.clearNamed())
            }
          case 3 =>
            val g = someGraph()
            (s"DROP $sil GRAPH <$g>",
              () => model.clear(Some(Some(g)), silent))
          case 4 =>
            val g = someGraph()
            (s"CREATE $sil GRAPH <$g>", () => model.create(g, silent))
          case 5 =>
            val (f, t) = (gRef(), gRef())
            (s"ADD $sil ${gSql(f)} TO ${gSql(t)}",
              () => model.copyLike(f, t, silent,
                dropTo = false, dropFrom = false))
          case 6 =>
            val (f, t) = (gRef(), gRef())
            val mv = rnd.nextBoolean()
            (s"${if (mv) "MOVE" else "COPY"} $sil ${gSql(f)} TO ${gSql(t)}",
              () => model.copyLike(f, t, silent,
                dropTo = true, dropFrom = mv))
          case 7 =>
            // DELETE/INSERT WHERE with graph-scoped patterns and
            // graph-targeted templates (incl. a VARIABLE graph slot)
            val sC = if (rnd.nextBoolean()) Some(s"${EX}s${rnd.nextInt(4)}")
              else None
            val oC = if (rnd.nextInt(3) == 0) Some(s"v${rnd.nextInt(4)}")
              else None
            val useGv = rnd.nextInt(3) == 0
            val whereG: Either[Option[String], Unit] =
              if (useGv) Right(()) else Left(gRef())
            def tmplTarget(): Either[Option[String], Unit] =
              if (useGv && rnd.nextBoolean()) Right(()) else Left(gRef())
            val del = if (rnd.nextBoolean()) Some(tmplTarget()) else None
            val ins = if (del.isEmpty || rnd.nextBoolean())
              Some(tmplTarget()) else None
            val insO = s"v${rnd.nextInt(4)}"
            def slotS = sC.map(s => s"<$s>").getOrElse("?s")
            def slotO = oC.map(o => s"'$o'").getOrElse("?o")
            def wrap(t: Either[Option[String], Unit], body: String) =
              t match {
                case Left(None) => body
                case Left(Some(g)) => s"GRAPH <$g> { $body }"
                case Right(_) => s"GRAPH ?gv { $body }"
              }
            val delPart = del.map(t =>
              s"DELETE { ${wrap(t, s"$slotS <${EX}p> $slotO")} } ")
              .getOrElse("")
            val insPart = ins.map(t =>
              s"INSERT { ${wrap(t, s"$slotS <${EX}p> '$insO'")} } ")
              .getOrElse("")
            (s"$delPart${insPart}WHERE { ${wrap(whereG,
              s"$slotS <${EX}p> $slotO")} }",
              () => model.modify(sC, oC, whereG, del, ins, insO))
        }
        val engineErr =
          try { e.update(sql); false }
          catch { case _: GraftException => true }
        val modelErr =
          try { modelOp(); false }
          catch { case _: RuntimeException => true }
        assert(engineErr == modelErr,
          s"step $step: error disagreement on `$sql` " +
            s"(engine=$engineErr model=$modelErr)")
        if (!engineErr) applied += 1
        // an erroring op must leave the store unchanged — compare
        // either way
        assert(engineDataset(e) == model.dataset,
          s"step $step: state diverged after `$sql`")
      }
      assert(applied > 10, s"too few ops applied ($applied) — generator bug?")
    }
  }
}
