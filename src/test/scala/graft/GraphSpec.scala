package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String, Long)],
                      iterations: Int = 10): Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iterations = iterations)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("hits: star graph separates hubs from the authority; L2 norms hold") {
    // h1,h2,h3 -> A: A is the pure authority (score 1), the three
    // hubs split hub mass equally (1/sqrt(3) each), roles disjoint
    val got = Graph.hits(
        Seq(("h1", "A", 1L), ("h2", "A", 1L), ("h3", "A", 1L))
          .toDF("src", "dst", "w"), "src", "dst", "w", iterations = 10)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(got("A")._2 - 1.0) < 1e-9)
    assert(got("A")._1 == 0.0)
    for (h <- Seq("h1", "h2", "h3")) {
      assert(math.abs(got(h)._1 - 1.0 / math.sqrt(3.0)) < 1e-6, s"$h ${got(h)}")
      assert(got(h)._2 == 0.0)
    }
    // weighted separation: one hub pointing at two authorities with
    // 9:1 weight -> authority ratio 9:1 (one round fixes it; ten keep it)
    val w2 = Graph.hits(Seq(("h", "A", 9L), ("h", "B", 1L))
        .toDF("src", "dst", "w"), "src", "dst", "w")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(w2("A")._2 / w2("B")._2 - 9.0) < 1e-6)
    assert(math.abs(w2("h")._1 - 1.0) < 1e-9)
    // L2 norm of each score vector is 1
    val a2 = w2.values.map(_._2).map(x => x * x).sum
    assert(math.abs(a2 - 1.0) < 1e-9)
  }

  test("pageRank: 2-cycle is the fixed point 1/2 each, mass conserved") {
    val got = ranksOf(Seq(("a", "b", 1L), ("b", "a", 1L)))
    assert(math.abs(got("a") - 0.5) < 1e-12 && math.abs(got("b") - 0.5) < 1e-12)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: hub attracts rank, dangling mass redistributes, deterministic") {
    // a, b, c all point at hub; hub has no out-edges (dangling)
    val edges = Seq(("a", "hub", 1L), ("b", "hub", 1L), ("c", "hub", 1L))
    val got = ranksOf(edges)
    assert(got.size == 4)
    assert(got("hub") > got("a") && got("a") == got("b") && got("b") == got("c"))
    // dangling redistribution keeps total mass at 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // bit-identical across runs (decimal partials, fixed op order)
    val again = ranksOf(edges)
    assert(got.forall { case (k, v) =>
      java.lang.Double.doubleToRawLongBits(again(k)) ==
        java.lang.Double.doubleToRawLongBits(v) })
  }

  test("pageRank: weight ratios steer rank, zero/negative weights drop") {
    // s splits 9:1 between x and y; x and y both return to s
    val got = ranksOf(Seq(("s", "x", 9L), ("s", "y", 1L),
      ("x", "s", 1L), ("y", "s", 1L), ("s", "dead", 0L)))
    assert(!got.contains("dead"))          // w=0 edge contributes no node
    assert(got("x") > got("y"))
    val shareX = (got("x") - 0.15 / 3) / (got("x") + got("y") - 2 * 0.15 / 3)
    assert(shareX > 0.8 && shareX < 0.95)  // damped toward 0.9
  }

  test("pageRank: parameter validation fails at construction") {
    val e = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException](
      Graph.pageRank(e, "src", "dst", "w", iterations = 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(e, "src", "dst", "w", damping = 1.0))
  }

  private def trianglesOf(edges: Seq[(String, String)]): Set[(String, String, String)] =
    Graph.triangles(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("modularity: two cliques over a weak bridge score well above chance") {
    import spark.implicits._
    def clique(p: String) = for {
      i <- 1 to 4; j <- (i + 1) to 4
    } yield (s"$p$i", s"$p$j", 10L)
    val edges = (clique("a") ++ clique("b") :+ (("a1", "b1", 1L)))
      .toDF("src", "dst", "w")
    val got = Graph.modularity(edges, "src", "dst", "w", rounds = 5)
      .collect().map(r => r.getAs[String]("community") -> r).toMap
    assert(got.size == 2)
    // W = 121; each clique: intra 60, strength 121 (bridge counted once)
    got.values.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 4L)
      assert(r.getAs[Double]("w_intra") == 60.0)
      assert(r.getAs[Double]("strength") == 121.0)
      assert(math.abs(r.getAs[Double]("q_contribution") - (60.0 / 121.0 - 0.25)) < 1e-12)
    }
  }

  test("assortativity: star is -1, regular ring is NULL, duplicates/orientation ignored") {
    import spark.implicits._
    // perfect star K1,3: every edge pairs degree 3 with degree 1 -> r = -1
    val star = Seq(("h", "a"), ("h", "b"), ("h", "c"), ("b", "h"), ("h", "a"))
      .toDF("s", "t")
    val r1 = Graph.assortativity(star, "s", "t").head
    assert(r1.getAs[Long]("n_nodes") == 4L && r1.getAs[Long]("n_edges") == 3L)
    assert(math.abs(r1.getAs[Double]("assortativity") - (-1.0)) < 1e-12)
    // 4-ring: every node degree 2, zero degree variance -> NULL
    val ring = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")).toDF("s", "t")
    val r2 = Graph.assortativity(ring, "s", "t").head
    assert(r2.isNullAt(r2.fieldIndex("assortativity")))
  }

  test("degreeDistribution: histogram counts by out-degree, duplicate edges collapse") {
    import spark.implicits._
    // a->{1,2,3}, b->{1,2}, c->{1}, d->{1} (the a->1 duplicate must not
    // inflate a's degree): degrees 3,2,1,1 -> hist {1:2, 2:1, 3:1}
    val e = Seq(("a", "1"), ("a", "2"), ("a", "3"), ("a", "1"),
      ("b", "1"), ("b", "2"), ("c", "1"), ("d", "1")).toDF("s", "t")
    val got = Graph.degreeDistribution(e, "s", "t").orderBy("degree")
      .collect().map(r => (r.getAs[Long]("degree"), r.getAs[Long]("n_nodes"),
        r.getAs[Double]("node_share")))
    assert(got.map(g => g._1 -> g._2).toSeq == Seq(1L -> 2L, 2L -> 1L, 3L -> 1L))
    assert(math.abs(got.head._3 - 0.5) < 1e-12)
    // heavy tail (more low-degree nodes) -> negative log-log slope
    val slope = Graph.degreeDistribution(e, "s", "t")
      .collect().head.getAs[Double]("powerlaw_slope")
    assert(slope < 0.0)
    // a regular graph (one distinct degree) has a degenerate fit -> NULL
    val reg = Seq(("a", "1"), ("b", "1")).toDF("s", "t")
    val rr = Graph.degreeDistribution(reg, "s", "t").collect().head
    assert(rr.isNullAt(rr.fieldIndex("powerlaw_slope")))
  }

  test("triangles: one closed triad found once, the open tail excluded") {
    val got = trianglesOf(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")))
    assert(got == Set(("a", "b", "c")))
  }

  test("triangles: K4 has its four triangles, each emitted exactly once") {
    val nodes = Seq("a", "b", "c", "d")
    val k4 = for (u <- nodes; v <- nodes if u < v) yield (u, v)
    val got = trianglesOf(k4)
    assert(got == Set(("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"), ("b", "c", "d")))
    val n = Graph.triangles(k4.toDF("src", "dst"), "src", "dst").count()
    assert(n == 4L)
  }

  test("triangles: direction, duplicate edges and self-loops do not change the result") {
    val noisy = Seq(("b", "a"), ("a", "b"), ("c", "b"), ("a", "c"),
      ("c", "a"), ("a", "a"), ("b", "a"))
    assert(trianglesOf(noisy) == Set(("a", "b", "c")))
  }

  test("labelPropagation: two dense cliques joined by one weak bridge split cleanly") {
    // cliques {a1,a2,a3} and {b1,b2,b3} (weight-5 internal edges), one
    // weight-1 bridge a3-b1: LPA must label each clique by its own
    // minimum member, the bridge too weak to merge them
    val edges = Seq(
      ("a1", "a2", 5.0), ("a1", "a3", 5.0), ("a2", "a3", 5.0),
      ("b1", "b2", 5.0), ("b1", "b3", 5.0), ("b2", "b3", 5.0),
      ("a3", "b1", 1.0)).toDF("src", "dst", "w")
    val got = Graph.labelPropagation(edges, "src", "dst", "w", rounds = 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Set("a1", "a2", "a3").map(got) == Set("a1"))
    assert(Set("b1", "b2", "b3").map(got) == Set("b1"))
  }

  test("labelPropagation: weight outvotes count; min-label tie-break; isolated self-label") {
    // x's neighbors: y (weight 10) vs {p, q} (1 each) -> after round 1
    // x takes y's label (10 > 2 summed only per-label: p and q carry
    // DIFFERENT labels round 1, 1 each)
    val edges = Seq(
      ("x", "y", 10.0), ("x", "p", 1.0), ("x", "q", 1.0)).toDF("src", "dst", "w")
    val r1 = Graph.labelPropagation(edges, "src", "dst", "w", rounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r1("x") == "y")
    // exact tie (equal decimal sums): smallest candidate label wins
    val tie = Seq(("m", "z", 2.0), ("m", "c", 2.0)).toDF("src", "dst", "w")
    val rt = Graph.labelPropagation(tie, "src", "dst", "w", rounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rt("m") == "c")
    // zero/negative-weight edges drop entirely -> their endpoints are
    // absent; self-loops drop; a node seen only via dropped edges is
    // not in the output by contract
    val weird = Seq(("s", "s", 5.0), ("s", "t", 3.0), ("u", "v", 0.0))
      .toDF("src", "dst", "w")
    val rw = Graph.labelPropagation(weird, "src", "dst", "w", rounds = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rw.keySet == Set("s", "t"))
    assert(rw("s") == "s" || rw("s") == "t") // 2-cycle oscillation truncated
  }

  test("labelPropagation: deterministic bits under repartition") {
    val edges = Seq(
      ("a", "b", 2.5), ("b", "c", 1.5), ("c", "d", 3.0), ("d", "a", 0.5),
      ("e", "a", 2.0), ("e", "c", 2.0)).toDF("src", "dst", "w")
    val x = Graph.labelPropagation(edges, "src", "dst", "w", rounds = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    val y = Graph.labelPropagation(edges.repartition(7), "src", "dst", "w", rounds = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(x.toSeq == y.toSeq)
  }

  test("clusteringCoeff: triangle with a pendant — exact per-node values") {
    // a-b-c closed triad, d hangs off a: deg(a)=3 with one of its
    // three wedges closed -> 1/3; b,c fully clustered; d degree-1 -> 0
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"))
      .toDF("src", "dst")
    val got = Graph.clusteringCoeff(edges, "src", "dst").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("a") == (3L, 1L, 2.0 / 6.0))
    assert(got("b") == (2L, 1L, 1.0) && got("c") == (2L, 1L, 1.0))
    assert(got("d") == (1L, 0L, 0.0))
  }

  test("linkPrediction: path endpoints scored, adjacent pairs excluded, exact panels") {
    def g6(x: Double) = math.floor(x * 1e6) / 1e6
    // path a-b-c: only non-adjacent pair (a,c) shares b
    val path = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val p = Graph.linkPrediction(path, "src", "dst").collect()
    assert(p.length == 1)
    val r = p(0)
    assert(r.getAs[String]("node_a") == "a" && r.getAs[String]("node_b") == "c")
    assert(r.getAs[Long]("n_common") == 1L)
    assert(r.getAs[Long]("deg_a") == 1L && r.getAs[Long]("deg_b") == 1L)
    assert(r.getAs[Double]("jaccard") == 1.0) // 1 / (1 + 1 - 1)
    assert(r.getAs[Double]("adamic_adar") == g6(1.0 / math.log(2.0)))
  }

  test("linkPrediction: square's diagonals share two neighbors; triangle predicts nothing") {
    def g6(x: Double) = math.floor(x * 1e6) / 1e6
    // square a-b-c-d-a: diagonals (a,c) and (b,d) each share 2
    // degree-2 neighbors -> jaccard 2/(2+2-2)=1, AA = 2·g6(1/ln 2)
    val sq = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val got = Graph.linkPrediction(sq, "src", "dst").collect()
      .map(r => (r.getAs[String]("node_a"), r.getAs[String]("node_b")) -> r).toMap
    assert(got.keySet == Set(("a", "c"), ("b", "d")))
    val ac = got(("a", "c"))
    assert(ac.getAs[Long]("n_common") == 2L && ac.getAs[Double]("jaccard") == 1.0)
    assert(math.abs(ac.getAs[Double]("adamic_adar") - 2 * g6(1.0 / math.log(2.0))) < 1e-12)
    // a closed triangle has no non-adjacent pairs: empty result
    val tri = Seq(("x", "y"), ("y", "z"), ("x", "z")).toDF("src", "dst")
    assert(Graph.linkPrediction(tri, "src", "dst").count() == 0L)
    // direction + duplicate edges are inert (canonicalized distinct)
    val dup = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("b", "c")).toDF("src", "dst")
    val d = Graph.linkPrediction(dup, "src", "dst").collect()
    assert(d.length == 1 && d(0).getAs[Long]("n_common") == 1L)
  }

  test("linkPrediction: hub neighbor weighs less than a rare shared neighbor") {
    // (p,q) share rare (degree-2) neighbor r; (x,y) share hub h that
    // also serves 4 spokes (degree 6) — same n_common, AA must rank
    // the rare-neighbor pair higher
    val edges = Seq(
      ("p", "r"), ("q", "r"),
      ("x", "h"), ("y", "h"), ("s1", "h"), ("s2", "h"), ("s3", "h"), ("s4", "h"))
      .toDF("src", "dst")
    val got = Graph.linkPrediction(edges, "src", "dst").collect()
      .map(r => (r.getAs[String]("node_a"), r.getAs[String]("node_b")) ->
        r.getAs[Double]("adamic_adar")).toMap
    assert(got(("p", "q")) > got(("x", "y")))
  }

  test("kCore: pendant chains peel transitively, the dense core survives") {
    // triangle 1-2-3 plus chain 3-4-5: at k=2 node 5 peels first,
    // then 4 (its degree drops to 1 only AFTER 5 leaves) — the
    // transitive cascade a single degree filter would miss
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("ia", "ib")
    val got = Graph.kCore(edges, "ia", "ib", k = 2, rounds = 4)
      .collect().map(r => r.getAs[Long]("node") ->
        (r.getAs[Boolean]("in_core"),
          if (r.isNullAt(r.fieldIndex("core_degree"))) -1L
          else r.getAs[Long]("core_degree"))).toMap
    assert(got(1L) == ((true, 2L)) && got(2L) == ((true, 2L)) &&
      got(3L) == ((true, 2L)))
    assert(got(4L) == ((false, -1L)) && got(5L) == ((false, -1L)))
    // k above the max degree empties the core but keeps every node row
    val none = Graph.kCore(edges, "ia", "ib", k = 5, rounds = 3).collect()
    assert(none.length == 5 && none.forall(!_.getAs[Boolean]("in_core")))
  }

  test("bfsHops: directed chain distances, shortcuts win, unreachable absent") {
    // a → b → c → d plus shortcut a → c; e → a makes e a pure
    // ancestor (unreachable FROM a); isolated direction matters
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("e", "a"))
      .toDF("s", "t")
    val got = Graph.bfsHops(edges, "s", "t", source = "a")
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("hops")).toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
  }

  test("bfsHops: cycle terminates; missing source yields an empty panel") {
    val cyc = Seq(("x", "y"), ("y", "z"), ("z", "x")).toDF("s", "t")
    val got = Graph.bfsHops(cyc, "s", "t", source = "x")
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("hops")).toMap
    assert(got == Map("x" -> 0L, "y" -> 1L, "z" -> 2L))
    assert(Graph.bfsHops(cyc, "s", "t", source = "nope").collect().isEmpty)
  }

  test("betweenness: directed chain and diamond match hand-computed Brandes") {
    // chain a → b → c → d: b brokers (a,c) and (a,d); c brokers
    // (a,d) and (b,d) — both score 2; endpoints score 0
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("s", "t")
    val got = Graph.betweenness(chain, "s", "t").collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("betweenness")).toMap
    assert(got == Map("a" -> 0.0, "b" -> 2.0, "c" -> 2.0, "d" -> 0.0))
    // diamond a → {b1, b2} → c: two shortest a→c paths split the
    // dependency — each middle node scores 1/2
    val diamond = Seq(("a", "b1"), ("a", "b2"), ("b1", "c"), ("b2", "c"))
      .toDF("s", "t")
    val d = Graph.betweenness(diamond, "s", "t").collect()
      .map(r => r.getAs[String]("node") ->
        (r.getAs[Double]("betweenness"), r.getAs[Double]("betweenness_norm"))).toMap
    assert(d("b1")._1 == 0.5 && d("b2")._1 == 0.5)
    assert(d("a")._1 == 0.0 && d("c")._1 == 0.0)
    // directed normalization: bc / ((n-1)(n-2)) with n = 4
    assert(math.abs(d("b1")._2 - 0.5 / 6.0) < 1e-8)
    // a pure-ancestor node brokers nothing it is an endpoint of
    val withTail = Seq(("z", "a"), ("a", "b"), ("b", "c")).toDF("s", "t")
    val t2 = Graph.betweenness(withTail, "s", "t").collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("betweenness")).toMap
    // a brokers (z,b),(z,c); b brokers (z,c),(a,c)
    assert(t2 == Map("z" -> 0.0, "a" -> 2.0, "b" -> 2.0, "c" -> 0.0))
  }

  test("betweenness: depth overflow fails loudly, cycle converges") {
    val deep = (1 to 10).map(i => (s"n$i", s"n${i + 1}")).toDF("s", "t")
    val ex = intercept[IllegalStateException] {
      Graph.betweenness(deep, "s", "t", maxDepth = 4).collect()
    }
    assert(ex.getMessage.contains("maxDepth"))
    // a graph whose deepest level is EXACTLY maxDepth is complete and
    // must succeed (only a frontier still expanding BEYOND the unroll
    // is an error) — chain depth 4 at maxDepth 4
    val exact = (1 to 4).map(i => (s"m$i", s"m${i + 1}")).toDF("s", "t")
    val ok = Graph.betweenness(exact, "s", "t", maxDepth = 4).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("betweenness")).toMap
    // interior chain nodes broker (left x right) endpoint pairs
    assert(ok == Map("m1" -> 0.0, "m2" -> 3.0, "m3" -> 4.0,
      "m4" -> 3.0, "m5" -> 0.0))
    // a 3-cycle reaches every node in 2 hops: each node brokers the
    // one 2-hop pair through it
    val cyc = Seq(("x", "y"), ("y", "z"), ("z", "x")).toDF("s", "t")
    val got = Graph.betweenness(cyc, "s", "t").collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("betweenness")).toMap
    assert(got == Map("x" -> 1.0, "y" -> 1.0, "z" -> 1.0))
  }

  test("closeness: chain and disconnected components match hand values") {
    // chain a → b → c: a reaches {b:1, c:2}, b reaches {c:1}, c nothing
    val chain = Seq(("a", "b"), ("b", "c")).toDF("s", "t")
    val got = Graph.closeness(chain, "s", "t").collect().map(r =>
      r.getAs[String]("node") -> ((r.getAs[Long]("n_reached"),
        r.getAs[Long]("total_dist"), r.getAs[Double]("harmonic"),
        r.getAs[Double]("closeness_wf")))).toMap
    assert(got("a") == ((2L, 3L, 1.5,
      math.floor((2.0 / 2.0) * (2.0 / 3.0) * 1e9) / 1e9)))
    assert(got("b") == ((1L, 1L, 1.0, 0.5)))
    assert(got("c") == ((0L, 0L, 0.0, 0.0))) // isolated sink: 0, not NULL
    // two components (n = 4): the Wasserman-Faust reach-share factor
    // scales a's perfect-but-tiny reach down by 1/(n-1)
    val two = Seq(("a", "b"), ("c", "d")).toDF("s", "t")
    val t2 = Graph.closeness(two, "s", "t").collect().map(r =>
      r.getAs[String]("node") -> r.getAs[Double]("closeness_wf")).toMap
    assert(math.abs(t2("a") - 1.0 / 3.0) < 1e-8)
    assert(t2("b") == 0.0 && t2("d") == 0.0)
  }

  test("eccentricity: chain extremes, isolated sink, diameter and radius") {
    // a → b → c → d: ecc(a)=3 (the diameter), ecc(b)=2, ecc(c)=1,
    // d reaches nothing (ecc 0, excluded from the radius)
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("s", "t")
    val got = Graph.eccentricity(chain, "s", "t").collect()
      .map(r => r.getAs[String]("node") ->
        ((r.getAs[Long]("n_reached"), r.getAs[Long]("eccentricity"),
          r.getAs[Long]("diameter"), r.getAs[Long]("radius")))).toMap
    assert(got("a") == ((3L, 3L, 3L, 1L)))
    assert(got("b") == ((2L, 2L, 3L, 1L)))
    assert(got("c") == ((1L, 1L, 3L, 1L)))
    assert(got("d") == ((0L, 0L, 3L, 1L)))
    // a 3-cycle is distance-regular: every ecc 2, diameter == radius
    val cyc = Seq(("x", "y"), ("y", "z"), ("z", "x")).toDF("s", "t")
    val c = Graph.eccentricity(cyc, "s", "t").collect()
    assert(c.forall(_.getAs[Long]("eccentricity") == 2L))
    assert(c.head.getAs[Long]("diameter") == 2L &&
      c.head.getAs[Long]("radius") == 2L)
  }

  test("minSpanningForest: hand forest, two components, cycle edge dropped") {
    val edges = Seq(
      (1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 3L, 3.0), (3L, 4L, 4.0),
      (10L, 11L, 5.0))
      .toDF("u", "v", "w")
    val got = Graph.minSpanningForest(edges, "u", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, 2L, 1.0, 1L), (2L, 3L, 2.0, 1L), (3L, 4L, 4.0, 1L),
      (10L, 11L, 5.0, 10L)))
  }

  test("minSpanningForest: weight ties resolve by the (w,u,v) total order") {
    // all three triangle edges weigh 1 — the unique tie-broken MST
    // keeps the two lowest-(u,v) edges
    val tri = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0)).toDF("u", "v", "w")
    val got = Graph.minSpanningForest(tri, "u", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L)))
    // parallel edges collapse to their minimum weight first
    val par = Seq((1L, 2L, 9.0), (2L, 1L, 4.0)).toDF("u", "v", "w")
    val p = Graph.minSpanningForest(par, "u", "v", "w").collect()
    assert(p.length == 1 && p.head.getDouble(2) == 4.0)
  }

  test("minSpanningForest: tied CROSS-component edges cannot form a cycle") {
    // regression: components {1,4} and {2,3} are linked by two tied
    // w=5 edges; with an orientation-dependent tie-break each side
    // picks a different one and the output acquires a 4-edge cycle.
    // The (w, min-endpoint, max-endpoint) order must pick exactly one.
    val es = Seq((1L, 4L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0), (2L, 4L, 5.0))
      .toDF("u", "v", "w")
    val got = Graph.minSpanningForest(es, "u", "v", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.size == 3, s"expected a 3-edge forest, got $got")
    assert(got == Set((1L, 4L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0)))
  }

  test("minSpanningForest: seeded random graphs match driver-side Kruskal") {
    def kruskalTotal(es: Seq[(Long, Long, Double)]): (Double, Int) = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      var total = 0.0; var picked = 0
      for ((u, v, w) <- es.sortBy(e => (e._3, e._1, e._2))) {
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) { parent(math.max(ru, rv)) = math.min(ru, rv)
          total += w; picked += 1 }
      }
      (total, picked)
    }
    for (seed <- 1 to 4) {
      val rng = new scala.util.Random(seed)
      val es = for {
        u <- 1L to 10L; v <- (u + 1) to 10L
        if rng.nextDouble() < 0.35
      } yield (u, v, (rng.nextInt(9) + 1).toDouble) // heavy ties
      if (es.nonEmpty) {
        val (expTotal, expCount) = kruskalTotal(es)
        val got = Graph.minSpanningForest(es.toDF("u", "v", "w"), "u", "v", "w")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        assert(got.length == expCount, s"seed $seed edge count")
        assert(got.map(_._3).sum == expTotal, s"seed $seed total weight")
      }
    }
  }
}
