package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Connected components over the near-dup graph (ops.Graph). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("components: edge-consistent, representative-minimal, total") {
    val comp = Graph.components(spark, sf0001).cache()
    val edges = Graph.nearDupEdges(spark, sf0001)

    // total: every document labeled exactly once
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(comp.count() == nDocs)
    assert(comp.select("doc_id").distinct().count() == nDocs)

    // edge consistency: both endpoints of every edge share a component
    // (the defining property of the transitive closure's fixed point)
    val lab = comp.select(col("doc_id"), col("component"))
    val split = edges
      .join(lab.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("component", "ca"), "a_id")
      .join(lab.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("component", "cb"), "b_id")
      .where(col("ca") =!= col("cb"))
      .count()
    assert(split == 0, s"$split edges cross components")

    // representative minimality: component id == min member id
    val badRep = comp.groupBy("component").agg(min("doc_id").as("m"))
      .where(col("component") =!= col("m")).count()
    assert(badRep == 0)

    // comp_size agrees with the actual group census
    val badSize = comp.groupBy("component", "comp_size").count()
      .where(col("comp_size") =!= col("count")).count()
    assert(badSize == 0)
    comp.unpersist()
  }

  test("leakage-safe split never places a component across splits") {
    val sp = Graph.leakageSafeSplit(spark, sf0001).cache()
    assert(sp.count() == Tables.documents(spark, sf0001).count())
    // the defining property: one split per component
    val straddling = sp.groupBy("component")
      .agg(countDistinct(col("split")).as("n_splits"))
      .where(col("n_splits") > 1).count()
    assert(straddling == 0)
    // and therefore no near-dup edge crosses the train/test fence
    val e = Graph.nearDupEdges(spark, sf0001)
    val lab = sp.select(col("doc_id"), col("split"))
    val crossing = e
      .join(lab.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("split", "sa"), "a_id")
      .join(lab.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("split", "sb"), "b_id")
      .where(col("sa") =!= col("sb")).count()
    assert(crossing == 0)
    sp.unpersist()
  }

  test("pagerank: total, teleport-bounded, mass-conserving, deterministic") {
    val pr = Graph.pagerank(spark, sf0001).cache()
    val n = pr.count()

    // totality: one row per graph vertex, both kinds present
    assert(pr.select("kind", "key").distinct().count() == n)
    assert(pr.select("kind").distinct().count() == 2)

    // every vertex keeps at least its teleport share (the damping update
    // adds a non-negative neighbor sum on top of tele)
    val tele = ((Graph.PrBase / n) * 15) / 100
    assert(pr.where(col("rank_ppt") < tele).count() == 0)

    // integer floor-division loses < 1 unit per edge contribution and
    // < 2 per node per round — total mass stays within 0.1% of base
    val mass = pr.agg(sum(col("rank_ppt"))).head().getLong(0)
    assert(mass <= Graph.PrBase, s"mass $mass exceeds base")
    assert(mass >= (Graph.PrBase * 999L) / 1000L, s"mass $mass leaked >0.1%")

    // pure function of the edge set: a second evaluation is bit-identical
    val again = Graph.pagerank(spark, sf0001)
    assert(pr.exceptAll(again).count() == 0 && again.exceptAll(pr).count() == 0)

    // plan shape: the cached edge/degree tables are reused across the
    // unrolled iterations (InMemoryTableScan), and nothing degenerates
    // to a cartesian product (the consts crossJoin is a 1-row broadcast)
    val p = Graph.pagerank(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
    pr.unpersist()
  }

  test("g03: degree-ordered enumeration equals the naive triple join") {
    val e = Graph.nearDupEdges(spark, sf0001).cache()
    // naive a<b<c closure — the oracle's formulation, rebuilt in Spark
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.a_id") === col("e1.b_id"))
      .join(e.as("e3"),
        col("e3.a_id") === col("e1.a_id") && col("e3.b_id") === col("e2.b_id"))
      .count()
    val rep = Graph.triangleStats(spark, sf0001).head()
    assert(rep.getAs[Long]("n_triangles") == naive,
      s"degree-ordered=${rep.getAs[Long]("n_triangles")} naive=$naive")
    assert(rep.getAs[Long]("n_edges") == e.count())
    e.unpersist()

    val tv = Graph.triangles(spark, sf0001).cache()
    // handshake: per-vertex incidences sum to 3 triangles each
    val s3 = tv.agg(sum(col("n_tri"))).head().getLong(0)
    assert(s3 == 3 * rep.getAs[Long]("n_triangles"), s"sum n_tri = $s3")
    // lcc is a probability; deg-1 vertices have no wedges, lcc = 0
    val bad = tv.where(col("lcc") < 0 || col("lcc") > 1 ||
      (col("deg") === 1 && col("lcc") =!= 0.0)).count()
    assert(bad == 0)
    val trans = rep.getAs[Double]("transitivity")
    assert(trans >= 0 && trans <= 1, trans.toString)
    tv.unpersist()
  }

  test("g04: assortativity is a bounded correlation over the same graph") {
    val rep = Graph.queries("g04_assortativity")(spark, sf0001).head()
    val r = rep.getAs[Double]("assortativity")
    assert(r >= -1.0 && r <= 1.0, r.toString)
    // the census must agree with g03's over the shared cached edge list
    val g3 = Graph.triangleStats(spark, sf0001).head()
    assert(rep.getAs[Long]("n_vertices") == g3.getAs[Long]("n_vertices"))
    assert(rep.getAs[Long]("n_edges") == g3.getAs[Long]("n_edges"))
    // mean degree = 2E/V to 6dp
    val md = rep.getAs[Double]("mean_deg")
    val expect = BigDecimal(2.0 * rep.getAs[Long]("n_edges") /
      rep.getAs[Long]("n_vertices")).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(math.abs(md - expect.toDouble) < 1e-9, s"$md vs $expect")
  }

  test("star contraction: logarithmic rounds and exact labels on a path") {
    // A 64-vertex path is the adversarial case for min-label propagation
    // (information moves one hop per round → ~63 rounds); large-star/
    // small-star must collapse it in O(log n) rounds with every vertex
    // labeled by the path minimum.
    val n = 64L
    val edges = spark.range(n - 1)
      .select(col("id").as("u"), (col("id") + 1).as("v"))
    val lab = ops.Graph.starContractLabels(spark, edges).cache()
    // the component minimum (vertex 0) is absent by contract — callers
    // coalesce it to itself
    assert(lab.count() == n - 1)
    assert(lab.where(col("vertex") === 0L).count() == 0)
    assert(lab.where(col("label") =!= 0L).count() == 0,
      "every non-minimum path vertex must label to the minimum id")
    assert(ops.Graph.lastStarRounds <= 10,
      s"path-64 took ${ops.Graph.lastStarRounds} star rounds (want O(log n))")
    lab.unpersist()

    // empty edge set: terminates immediately, yields no labels
    val none = ops.Graph.starContractLabels(spark,
      spark.range(0).select(col("id").as("u"), col("id").as("v")))
    assert(none.count() == 0)
  }

  test("two independent labeling engines agree (star vs min-propagation)") {
    // The engine-side correctness gate for the components family where
    // the DuckDB oracle is infeasible (sf1): star contraction and plain
    // min-label propagation share no code, so their fixed points
    // agreeing certifies the labels the way triple agreement certifies
    // exact KNN. Asserted here on the real near-dup graph at the graded
    // tier and on an adversarial path; at sf1 by tools.ScaleCheck.
    val edges = ops.Graph.nearDupEdges(spark, sf0001)
      .select(col("a_id").as("u"), col("b_id").as("v"))
    val star = ops.Graph.componentMapOf(spark, edges, "star")
    val prop = ops.Graph.componentMapOf(spark, edges, "minprop")
    assert(star.except(prop).count() == 0 && prop.except(star).count() == 0,
      "star-contraction and min-propagation labels disagree")

    // the path graph: min propagation's worst case still converges to
    // the same (all-zero) labels
    val n = 48L
    val path = spark.range(n - 1)
      .select(col("id").as("u"), (col("id") + 1).as("v"))
    val propPath = ops.Graph.minPropagationLabels(spark, path)
    assert(propPath.count() == n)
    assert(propPath.where(col("label") =!= 0L).count() == 0,
      "every path vertex must label to the minimum id")
  }

  test("pagerank law: a vertex with no in-edges keeps its teleport mass") {
    // Directed toy graph: 3-cycle plus a source vertex 4 that points in
    // but receives nothing. Before the round-9 guard, 4 silently fell
    // out of the ranking after round 1 (the in-sum aggregate only emits
    // vertices that RECEIVE contributions).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("u", "v")
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val r = ops.Graph.pagerankRanks(edges, deg).cache()
    assert(r.count() == 4, "all four vertices must stay ranked")
    val tele = ((ops.Graph.PrBase / 4) * 15) / 100
    assert(r.where(col("u") === 4).head().getAs[Long]("r") == tele,
      "a no-in-edge vertex holds exactly its teleport share")
    // nothing is created from nowhere: total mass stays under base
    assert(r.agg(sum(col("r"))).head().getLong(0) <= ops.Graph.PrBase)
    r.unpersist()
  }

  test("fixed point is stable: one more propagation round changes nothing") {
    // Idempotence distinguishes a true fixed point from a bounded-round
    // scheme (c10's 3-round propagation is NOT idempotent in general).
    val comp = Graph.components(spark, sf0001)
      .select(col("doc_id"), col("component"))
    val e = Graph.nearDupEdges(spark, sf0001)
    val bi = e.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionAll(e.select(col("b_id").as("u"), col("a_id").as("v")))
    val nbrMin = bi.join(comp, bi("v") === comp("doc_id"))
      .groupBy(col("u")).agg(min(col("component")).as("nm"))
    val moved = comp.join(nbrMin, comp("doc_id") === nbrMin("u"))
      .where(col("nm") < col("component")).count()
    assert(moved == 0, s"$moved labels would still move")
  }

  test("s11: folds partition the corpus and never split a component") {
    val out = Graph.groupKfold(spark, sf0001)
    // partition: per-(fold,lang) doc counts sum to the corpus
    val nDocs = out.agg(sum(col("n_docs"))).head().getLong(0)
    assert(nDocs == Tables.documents(spark, sf0001).count())
    // GroupKFold contract: a component id maps to exactly one fold —
    // re-derive the per-doc assignment and count folds per component
    val comp = Graph.components(spark, sf0001)
      .select(col("doc_id"), col("component"))
    val fold = pmod(graft.functions.HashExpressions.fnv1a64(spark,
      concat(lit("fold:"), col("component").cast("string"))),
      lit(ops.Graph.KFolds.toLong))
    val straddle = comp.withColumn("fold", fold)
      .groupBy(col("component"))
      .agg(countDistinct(col("fold")).as("nf"))
      .where(col("nf") > 1).count()
    assert(straddle == 0, s"$straddle components straddle folds")
    // every fold is populated at this corpus size
    assert(out.select(col("fold")).distinct().count() == ops.Graph.KFolds)
  }

  test("g05 lpa: bridged triangles stay separate communities (where CC " +
    "merges them) and isolated vertices keep their own label") {
    // two triangles {1,2,3} and {4,5,6} joined by the bridge 3–4,
    // plus the isolated vertex 7
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L)).toDF("u", "v")
    val bi = e.unionAll(e.select(col("v"), col("u")))
    val verts = (1L to 7L).toDF("v")
    val lbl = Graph.lpaLabels(bi, verts).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("lbl")).toMap
    assert(Set(1L, 2L, 3L).map(lbl) == Set(1L),
      s"left triangle labels: $lbl")
    assert(Set(4L, 5L, 6L).map(lbl) == Set(3L),
      s"right triangle labels: $lbl")
    assert(lbl(7L) == 7L, s"isolated vertex moved: $lbl")
  }

  test("g05 lpa: rollup is a partition of the corpus and every community " +
    "stays inside one connected component") {
    val out = Graph.labelPropagation(spark, sf0001).collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(out.map(_.getAs[Long]("size")).sum == nDocs)
    out.foreach { r =>
      assert(r.getAs[Long]("min_doc") <= r.getAs[Long]("max_doc"))
      assert(r.getAs[Long]("size") >= 1L)
    }
    // a vertex's final label is a ≤LpaRounds-hop-reachable vertex, so
    // each community must be contained in one connected component
    val comp = Graph.components(spark, sf0001)
      .select(col("doc_id"), col("component"))
    val lbl = Graph.labelPropagation(spark, sf0001)
      .select(col("lbl"), col("min_doc"), col("max_doc"))
    val straddle = comp.join(lbl,
        col("doc_id") === col("min_doc") || col("doc_id") === col("max_doc"))
      .groupBy(col("lbl"))
      .agg(countDistinct(col("component")).as("nc"))
      .where(col("nc") > 1).count()
    assert(straddle == 0, s"$straddle communities straddle components")
  }

  test("g06 kcore: the tail peels outward-in, the triangle survives, " +
    "and peeling is monotone in the round number") {
    // triangle {1,2,3} with the tail 3–4–5: the 2-core is exactly the
    // triangle; 5 (degree 1) peels in round 1, which drops 4 to degree
    // 1 so it peels in round 2
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val bi = e.unionAll(e.select(col("v"), col("u")))
    val out = Graph.kcoreAudit(bi).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("deg0"), r.getAs[Long]("peel_round"))).toMap
    assert(out(5L) == (1L, 1L), s"tail end: $out")
    assert(out(4L) == (2L, 2L), s"tail middle: $out")
    assert(Set(1L, 2L).map(v => out(v)._2) == Set(0L), s"triangle: $out")
    assert(out(3L) == (3L, 0L), s"junction: $out")
  }

  test("g06 kcore: survivors of a converged peel all keep degree >= k " +
    "within the surviving set") {
    val out = Graph.kcore(spark, sf0001)
    val survivors = out.where(col("peel_round") === 0L)
      .select(col("doc_id").as("sv"))
    // if the peel converged before the round budget, every survivor is
    // a true >=k-core member: recompute each survivor's degree within
    // the surviving subgraph
    val lastRound = out.agg(max(col("peel_round"))).head().getLong(0)
    if (lastRound < ops.Graph.KcorePeels) {
      val ed = Graph.nearDupEdges(spark, sf0001)
      val bi = ed.select(col("a_id").as("u"), col("b_id").as("v"))
        .unionAll(ed.select(col("b_id").as("u"), col("a_id").as("v")))
      val alive = bi.join(survivors.select(col("sv").as("u")), Seq("u"))
        .join(survivors.select(col("sv").as("v")), Seq("v"))
      val bad = alive.groupBy(col("u")).agg(count(lit(1)).as("dg"))
        .where(col("dg") < ops.Graph.KcoreK).count()
      assert(bad == 0, s"$bad survivors below k after convergence")
    } else info("peel budget exhausted before convergence — law vacuous")
  }
}
