package graft

import org.apache.spark.sql.functions._

import graft.operators.AnalyticsPack

/** Semantic assertions for the gold analytics pack (reference:
  * docs/queries/01-05 shapes). The oracle gate pins full values; these
  * specs pin the semantics that the hash alone would not explain.
  */
class AnalyticsPackSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // user, date_sk, tipo_dia, slot, mode, value
    ("u1", 20240108, "LABORAL", 10, "CLICK", 10.0),
    ("u1", 20240108, "LABORAL", 11, "CLICK", 10.0),
    ("u1", 20240109, "LABORAL", 10, "VIEW", 20.0),
    ("u1", 20240110, "LABORAL", 10, "VIEW", 20.0),
    ("u2", 20240108, "LABORAL", 10, "CLICK", 5.0),
    ("u2", 20240109, "LABORAL", 10, "CLICK", 5.0),
    ("u2", 20240110, "LABORAL", 10, "CLICK", 5.0),
    ("u2", 20240110, "LABORAL", 11, "CLICK", 5.0),
    ("u3", 20240113, "SABADO", 20, "VIEW", 7.0),
    ("u3", 20240114, "DOMINGO", 10, "VIEW", 4.0))
    .toDF("user_id", "date_sk", "tipo_dia", "time_30m_sk", "event_type_norm", "value")

  test("giniDemand: equality -> 0, known unequal split matches closed form") {
    // LABORAL per-stop totals: u1=60, u2=20 -> sorted [20,60]
    // G = (2*(1*20+2*60) - 3*80) / (2*80) = (280-240)/160 = 0.25
    val got = AnalyticsPack.giniDemand(events).collect()
      .map(r => r.getAs[String]("tipo_dia") ->
        (r.getAs[Long]("n_stops"), r.getAs[Double]("gini"))).toMap
    assert(got("LABORAL") == (2L, 0.25))
    // single-stop day types: G = (2*x - 2*x) / x = 0 exactly
    assert(got("SABADO") == (1L, 0.0) && got("DOMINGO") == (1L, 0.0))
  }

  test("theilSen: median pairwise slope resists the outlier OLS chases") {
    // days y = [10, 12, 14, 16, 1000]: all clean pairwise slopes ~2,
    // the poisoned day only contributes 4 of 10 pairs -> median stays 2
    val poisoned = Seq(
      (20240101, 10.0), (20240102, 12.0), (20240103, 14.0),
      (20240104, 16.0), (20240105, 1000.0))
      .map { case (d, v) => ("u1", d, "LABORAL", 10, "CLICK", v) }
      .toDF("user_id", "date_sk", "tipo_dia", "time_30m_sk", "event_type_norm", "value")
    val ts = AnalyticsPack.theilSen(poisoned).collect().head
    assert(ts.getAs[Long]("n_pairs") == 10L)
    assert(ts.getAs[Double]("ts_slope") == 2.0)
    val ols = AnalyticsPack.trendSlope(poisoned).collect().head
    assert(ols.getAs[Double]("slope") > 100.0) // OLS dragged by the outlier
  }

  test("mutualInfo: independence -> zero terms, determinism -> ln(2) bits") {
    import graft.operators.Profiling
    val indep = (for (x <- Seq("A", "B"); y <- Seq("1", "2"); _ <- 1 to 5)
      yield (x, y)).toDF("u", "v")
    val gotI = Profiling.mutualInfo(indep, "u", "v").collect()
    assert(gotI.length == 4)
    assert(gotI.forall(r => r.getAs[Double]("pmi") == 0.0 &&
      r.getAs[Double]("mi_term") == 0.0))
    val dep = ((1 to 10).map(_ => ("A", "1")) ++ (1 to 10).map(_ => ("B", "2")))
      .toDF("u", "v")
    val gotD = Profiling.mutualInfo(dep, "u", "v").collect()
    val pmiQ = math.floor(math.log(2.0) * 1e4) / 1e4
    assert(gotD.length == 2 && gotD.forall(_.getAs[Double]("pmi") == pmiQ))
    val mi = gotD.map(_.getAs[Double]("mi_term")).sum
    assert(math.abs(mi - math.log(2.0)) < 1e-3) // two 0.5·ln2 terms, grid noise
  }

  test("marketBasket: hand-computed support/confidence/lift, canonical pairs") {
    import graft.operators.AnalyticsPack
    // baskets: {A,B} x3, {A,C} x1, {B,C} x1, {A} x1 -> N=6
    val rows = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (3L, "B"),
      (4L, "A"), (4L, "C"), (5L, "B"), (5L, "C"), (6L, "A"),
      (1L, "A")) // duplicate line in a basket must not double-count
      .toDF("bk", "item")
    val got = AnalyticsPack.marketBasket(rows, "bk", "item", minPairCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(6),
          r.getDouble(7), r.getDouble(8))).toMap
    // (A,B): n_ab=3, n_a=5, n_b=4 -> conf 3/5, lift 3*6/20 = 0.9
    assert(got(("A", "B")) == (3L, 5L, 4L, 3.0 / 6, 3.0 / 5, 18.0 / 20))
    assert(got(("A", "C")) == (1L, 5L, 2L, 1.0 / 6, 1.0 / 5, 6.0 / 10))
    assert(got(("B", "C")) == (1L, 4L, 2L, 1.0 / 6, 1.0 / 4, 6.0 / 8))
    assert(!got.contains(("B", "A"))) // canonical orientation only
  }

  test("topPaths: counts every sliding 3-window per user, ordered cut") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-08 10:00:00")
    def at(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val ev = Seq(
      (1L, at(1), 100L, "VIEW"), (2L, at(2), 100L, "CLICK"),
      (3L, at(3), 100L, "BUY"), (4L, at(4), 100L, "VIEW"),
      (5L, at(1), 200L, "VIEW"), (6L, at(2), 200L, "CLICK"),
      (7L, at(3), 200L, "BUY"),
      (8L, at(1), 300L, "VIEW"), (9L, at(2), 300L, "CLICK")) // only 2 events
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = AnalyticsPack.topPaths(ev, topN = 5).collect()
    val byPath = got.map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
      (r.getLong(3), r.getLong(4))).toMap
    // user 100 contributes VIEW,CLICK,BUY and CLICK,BUY,VIEW; user 200 the first
    assert(byPath(("VIEW", "CLICK", "BUY")) == (2L, 2L))
    assert(byPath(("CLICK", "BUY", "VIEW")) == (1L, 1L))
    assert(got.length == 2) // user 300's 2-event stream yields no path
    assert((got.head.getString(0), got.head.getString(1), got.head.getString(2)) ==
      ("VIEW", "CLICK", "BUY"))
  }

  test("coverageQuartile: quartile ranks cover 1..4 and categories map the rank") {
    val orders = Seq((1L, 1L, 100.0), (2L, 2L, 200.0), (3L, 3L, 50.0), (4L, 4L, 400.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("c_custkey", "c_nationkey")
    val nation = Seq((10L, "A"), (20L, "B"), (30L, "C"), (40L, "D"))
      .toDF("n_nationkey", "n_name")
    val got = AnalyticsPack.coverageQuartile(orders, customer, nation)
      .orderBy("cuartil_cobertura").collect()
    assert(got.map(_.getAs[Int]("cuartil_cobertura")).toSeq == Seq(1, 2, 3, 4))
    // lowest per-order revenue (C, 50) is quartile 1 = Sub-servida
    val q1 = got.head
    assert(q1.getAs[String]("n_name") == "C" && q1.getAs[String]("categoria") == "Sub-servida")
    assert(got.last.getAs[String]("categoria") == "Bien servida")
  }

  test("waitPercentiles: exact median/p90 per group, conditional day-type averages") {
    val got = AnalyticsPack.waitPercentiles(events)
      .where($"mode_code" === "CLICK").collect().head
    // CLICK values sorted: 5,5,5,5,10,10 -> median interpolates 5..5 = 5.0; avg 40/6 = 6.67
    assert(got.getAs[Double]("espera_mediana_min") == 5.0)
    assert(got.getAs[Double]("espera_p90_min") == 10.0)
    assert(got.getAs[Double]("espera_promedio_min") == 6.67)
    assert(got.getAs[Long]("validaciones") == 6L)
    // all CLICKs are LABORAL; DOMINGO average must be null, not 0
    assert(got.getAs[Double]("espera_laboral") == 6.67)
    assert(got.isNullAt(got.fieldIndex("espera_domingo")))
  }

  test("userSegments: HAVING days>=3 gate and pct-of-total sums to 100") {
    val got = AnalyticsPack.userSegments(events).collect()
    // u1: 3 active days avg 4/3=1.33 -> '1 (esporadico)'; u2: 3 days avg 4/3=1.33;
    // u3: 1 LABORAL day -> filtered by HAVING
    assert(got.map(_.getAs[Long]("tarjetas")).sum == 2L)
    assert(math.abs(got.map(_.getAs[Double]("pct_tarjetas")).sum - 100.0) < 1e-9)
  }

  test("pctOfTotal: shares sum to 100 and per-group share is count-proportional") {
    val li = Seq((1, 1.0, 10.0, 0.1), (1, 2.0, 10.0, 0.1), (2, 3.0, 10.0, 0.0),
      (3, 4.0, 10.0, 0.0)).toDF("l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
    val got = AnalyticsPack.pctOfTotal(li).orderBy("num_etapas").collect()
    assert(got.map(_.getAs[Double]("pct_total")).sum == 100.0)
    assert(got.head.getAs[Double]("pct_total") == 50.0)
  }

  test("demandPivot30m: pivot columns split by day type; ratio null when domingo=0") {
    val got = AnalyticsPack.demandPivot30m(events).orderBy("time_30m_sk").collect()
    val slot10 = got.find(_.getAs[Int]("time_30m_sk") == 10).get
    assert(slot10.getAs[Double]("subidas_laboral") == 65.0)
    assert(slot10.getAs[Double]("subidas_domingo") == 4.0)
    // 100*65/4 - 100 = 1525
    assert(slot10.getAs[Double]("pct_laboral_vs_domingo") == 1525.0)
    val slot11 = got.find(_.getAs[Int]("time_30m_sk") == 11).get
    assert(slot11.isNullAt(slot11.fieldIndex("pct_laboral_vs_domingo")))
  }

  test("dailyDelta: LAG delta vs previous day, first day null") {
    val got = AnalyticsPack.dailyDelta(events).orderBy("date_sk").collect()
    assert(got.head.isNullAt(got.head.fieldIndex("delta_vs_dia_anterior")))
    val d9 = got.find(_.getAs[Int]("date_sk") == 20240109).get
    // 20240108 demand 25.0 -> 20240109 demand 25.0 -> delta 0
    assert(d9.getAs[Double]("delta_vs_dia_anterior") == 0.0)
    val d8 = got.find(_.getAs[Int]("date_sk") == 20240108).get
    assert(d8.getAs[Long]("tarjetas_unicas") == 2L)
  }

  test("pctOfPeak: peak slot reads 100, shares relative to the max") {
    val got = AnalyticsPack.pctOfPeak(events).orderBy("time_30m_sk").collect()
    // LABORAL slots: 10 -> 65.0, 11 -> 15.0; peak = 65
    assert(got.map(r => (r.getAs[Int]("time_30m_sk"), r.getAs[Double]("pct_del_pico"))).toSeq
      == Seq((10, 100.0), (11, 23.1)))
  }

  test("deviationBuckets: CASE bucket is both grouping key and label, noise floor applied") {
    val li = Seq(
      (6.0, 3000.0),   // ratio 500  -> Muy directo
      (6.0, 9000.0),   // ratio 1500 -> Directo
      (10.0, 40000.0), // ratio 4000 -> Alto desvio
      (1.0, 99999.0))  // below the qty floor -> excluded
      .toDF("l_quantity", "l_extendedprice")
    val got = AnalyticsPack.deviationBuckets(li).collect()
      .map(r => r.getAs[String]("categoria_desvio") -> r.getAs[Long]("viajes")).toMap
    assert(got == Map("Muy directo (<1000)" -> 1L, "Directo (1000-2000)" -> 1L,
      "Alto desvio (>=3400)" -> 1L))
  }

  test("userModeCombos: MAX(CASE) flags classify users, pct sums to 100") {
    val got = AnalyticsPack.userModeCombos(events).collect()
    val m = got.map(r => r.getAs[String]("tipo_uso") ->
      r.getAs[Long]("usuarios")).toMap
    // u1: CLICK+VIEW; u2: only CLICK; u3: only VIEW
    assert(m == Map("Click + View" -> 1L, "Solo Click" -> 1L, "Solo View" -> 1L))
    // each share is rounded to 2dp, so the sum is 100 +- rounding slack
    assert(math.abs(got.map(_.getAs[Double]("pct_usuarios")).sum - 100.0) < 0.02)
    val u2 = got.find(_.getAs[String]("tipo_uso") == "Solo Click").get
    assert(u2.getAs[Double]("eventos_promedio") == 4.0)
    assert(u2.getAs[Double]("eventos_mediana") == 4.0)
  }

  test("coverageAudit: coverage share, conditional average, compliance flag") {
    val df = Seq(
      ("CLICK", "LABORAL", Some(1), 10.0),
      ("CLICK", "LABORAL", None, 20.0),
      ("VIEW", "LABORAL", Some(2), 30.0))
      .toDF("event_type_norm", "tipo_dia", "prop_k", "value")
    val got = AnalyticsPack.coverageAudit(df).collect()
      .map(r => r.getAs[String]("mode_code") -> r).toMap
    val click = got("CLICK")
    assert(click.getAs[Long]("con_dato") == 1L && click.getAs[Long]("sin_dato") == 1L)
    assert(click.getAs[Double]("pct_con_dato") == 50.0)
    // conditional average sees only the covered row's value
    assert(click.getAs[Double]("valor_promedio_con_dato") == 10.0)
    assert(click.getAs[String]("estado") == "INCUMPLE")
    assert(got("VIEW").getAs[String]("estado") == "OK")
  }

  test("revenueCoverageGap: scaled estimate, signed-gap split, §7 state machine") {
    // base window = day 1 only; full window = days 1-2.
    // CLICK/LABORAL: base day total 100 -> profile 100/day x 2 cal days
    //   = 200 estimated; observed 100+40 = 140 -> under-validation 60.
    // PURCHASE/LABORAL: base 10 -> estimated 20; observed 10+50=60 ->
    //   cobertura 3.0 > 1.5 -> base subdimensionada, sobrevalidacion 40.
    // VIEW: non-comparable mode; SIGNUP/SABADO: no base day -> sin base
    //   would need comparability first (non-comparable mode wins).
    val ev = Seq(
      ("CLICK", "LABORAL", 20240101, 100.0),
      ("CLICK", "LABORAL", 20240102, 40.0),
      ("PURCHASE", "LABORAL", 20240101, 10.0),
      ("PURCHASE", "LABORAL", 20240102, 50.0),
      ("VIEW", "LABORAL", 20240101, 7.0),
      ("CLICK", "SABADO", 20240102, 5.0)) // no base-day data -> SIN_BASE
      .toDF("event_type_norm", "tipo_dia", "date_sk", "value")
    val got = AnalyticsPack.revenueCoverageGap(ev,
        baseFrom = 20240101, baseTo = 20240101,
        winFrom = 20240101, winTo = 20240102,
        comparableModes = Seq("CLICK", "PURCHASE")).collect()
      .map(r => (r.getAs[String]("mode_code"), r.getAs[String]("tipo_dia")) -> r)
      .toMap
    val cl = got(("CLICK", "LABORAL"))
    assert(cl.getAs[Double]("pasajeros_estimados") == 200.0)
    assert(cl.getAs[Double]("validaciones") == 140.0)
    assert(cl.getAs[Double]("brecha_signed") == 60.0)
    assert(cl.getAs[Double]("brecha_no_validada") == 60.0)
    assert(cl.getAs[Double]("sobrevalidacion") == 0.0)
    assert(cl.getAs[Double]("cobertura") == 0.7)
    assert(cl.getAs[String]("estado_comparabilidad") == "COMPARABLE")
    assert(cl.getAs[Int]("bandera_calidad") == 0) // 200 < 500 volume floor
    assert(cl.getAs[Double]("recuperacion_pot_10") == 6.0)
    assert(cl.getAs[Double]("gap_vs_meta") == 0.25)
    val pu = got(("PURCHASE", "LABORAL"))
    assert(pu.getAs[Double]("cobertura") == 3.0)
    assert(pu.getAs[String]("estado_comparabilidad")
      == "NO_COMPARABLE_BASE_SUBDIMENSIONADA")
    assert(pu.getAs[Double]("sobrevalidacion") == 40.0
      && pu.getAs[Double]("brecha_no_validada") == 0.0)
    val vw = got(("VIEW", "LABORAL"))
    assert(vw.getAs[String]("estado_comparabilidad") == "NO_COMPARABLE_MODO")
    assert(vw.isNullAt(vw.fieldIndex("pasajeros_estimados")))
    assert(vw.getAs[Double]("validaciones") == 7.0) // base measure ungated
    val sb = got(("CLICK", "SABADO"))
    assert(sb.getAs[String]("estado_comparabilidad") == "NO_COMPARABLE_SIN_BASE")
    assert(sb.isNullAt(sb.fieldIndex("cobertura")))
  }

  private def tsOf(s: String) = java.sql.Timestamp.valueOf(s)

  test("retentionCohort: offsets from first-seen day, pct of day-0 cohort") {
    val ev = Seq(
      (1L, tsOf("2024-01-01 10:00:00")), (1L, tsOf("2024-01-02 09:00:00")),
      (1L, tsOf("2024-01-03 09:00:00")),
      (4L, tsOf("2024-01-01 11:00:00")),
      (2L, tsOf("2024-01-02 08:00:00")), (2L, tsOf("2024-01-02 20:00:00")))
      .toDF("user_id", "ts")
    val got = AnalyticsPack.retentionCohort(ev).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_date").toString, r.getAs[Int]("offset_days")) ->
        ((r.getAs[Long]("retained_users"), r.getAs[Double]("pct_retained")))).toMap
    // cohort Jan-1 = {u1, u4}: only u1 returns -> 50% on offsets 1..2
    assert(got(("2024-01-01", 0)) == ((2L, 100.0)))
    assert(got(("2024-01-01", 1)) == ((1L, 50.0)))
    assert(got(("2024-01-01", 2)) == ((1L, 50.0)))
    // two same-day events of u2 count once
    assert(got(("2024-01-02", 0)) == ((1L, 100.0)))
    assert(got.size == 4)
  }

  test("funnelSteps: steps count only when reached in order") {
    val ev = Seq(
      (1L, tsOf("2024-01-01 10:00:00"), 1L, "view"),
      (1L, tsOf("2024-01-01 11:00:00"), 2L, "click"),
      (1L, tsOf("2024-01-01 12:00:00"), 3L, "purchase"),
      (2L, tsOf("2024-01-01 10:00:00"), 4L, "click"),    // click BEFORE view
      (2L, tsOf("2024-01-01 11:00:00"), 5L, "view"),
      (3L, tsOf("2024-01-01 10:00:00"), 6L, "view"),
      (3L, tsOf("2024-01-01 11:00:00"), 7L, "purchase"), // no click in between
      (4L, tsOf("2024-01-01 09:00:00"), 8L, "purchase"), // purchase BEFORE click
      (4L, tsOf("2024-01-01 10:00:00"), 9L, "view"),
      (4L, tsOf("2024-01-01 11:00:00"), 10L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = AnalyticsPack.funnelSteps(ev).collect().head
    assert(got.getAs[Long]("users_total") == 4L)
    assert(got.getAs[Long]("users_view") == 4L)
    assert(got.getAs[Long]("users_click_after_view") == 2L)    // u1, u4
    assert(got.getAs[Long]("users_purchase_after_click") == 1L) // u1 only
    assert(got.getAs[Double]("pct_view_to_click") == 50.0)
    assert(got.getAs[Double]("pct_click_to_purchase") == 50.0)
  }

  test("rollingDemand: ROWS window sums and averages over the daily series") {
    val ev = Seq(
      (tsOf("2024-01-01 08:00:00"), 1.0), (tsOf("2024-01-01 09:00:00"), 2.0),
      (tsOf("2024-01-02 08:00:00"), 4.0),
      (tsOf("2024-01-03 08:00:00"), 5.0))
      .toDF("ts", "value")
    val got = AnalyticsPack.rollingDemand(ev).orderBy("day").collect()
    assert(got.map(_.getAs[Long]("viajes")).toSeq == Seq(2L, 1L, 1L))
    assert(got.map(_.getAs[Double]("demanda")).toSeq == Seq(3.0, 4.0, 5.0))
    assert(got.map(_.getAs[Double]("demanda_7d")).toSeq == Seq(3.0, 7.0, 12.0))
    assert(got.map(_.getAs[Long]("dias_en_ventana")).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getAs[Double]("demanda_7d_avg")).toSeq == Seq(3.0, 3.5, 4.0))
  }

  test("anomalyZscore: flags only the planted outlier; singleton groups dropped") {
    val rows = (1L to 19L).map(i => (i, "A", 10.0)) :+ ((20L, "A", 1000.0)) :+ ((21L, "B", 5.0))
    val ev = rows.toDF("event_id", "event_type", "value")
    val got = AnalyticsPack.anomalyZscore(ev).collect()
    // group A: mean 59.5, std ~221.4 -> z(1000) ~ 4.25; the 10.0 rows
    // sit at z ~ -0.22; group B has n=1 -> no stats, no rows
    assert(got.length == 1)
    assert(got.head.getAs[Long]("event_id") == 20L)
    assert(got.head.getAs[Double]("z") > 3)
  }

  test("odMatrix: intra-zone flows excluded, ranked by demand desc") {
    val li = Seq((1L, 100L, 2.0, 50.0), (2L, 200L, 4.0, 300.0), (3L, 100L, 1.0, 10.0))
      .toDF("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val orders = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("o_orderkey", "o_custkey")
    val customer = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("c_custkey", "c_nationkey")
    val supplier = Seq((100L, 30L), (200L, 10L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((10L, "A"), (20L, "B"), (30L, "C")).toDF("n_nationkey", "n_name")
    val got = AnalyticsPack.odMatrix(li, orders, customer, supplier, nation).collect()
    // order 3: supplier nation C -> customer nation C = intra-zone, excluded
    assert(got.length == 2)
    assert(got.head.getAs[String]("zona_origen") == "A") // 300 > 50
    assert(got.head.getAs[Double]("demanda_expandida") == 300.0)
  }

  test("dowSeasonality: weekday means and residuals; residuals cancel per weekday") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 12:00:00")
    // Mondays Mar 4 and 11 (demand 10 and 30 -> mean 20), Tuesday Mar 5
    val ev = Seq(
      (ts(4), 10.0), (ts(11), 30.0), (ts(5), 7.0))
      .toDF("ts", "value")
    val got = AnalyticsPack.dowSeasonality(ev).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("2024-03-04", 1, 10.0, 20.0, -10.0),
      ("2024-03-05", 2, 7.0, 7.0, 0.0),
      ("2024-03-11", 1, 30.0, 20.0, 10.0)))
  }

  test("abtestReadout: rates, lift and z from hand-computed counts") {
    import spark.implicits._
    // A: users 1,2 (1 converts). B: users 3,4,5 (3 convert... 2 convert)
    val ev = Seq(
      (1L, "A", "PURCHASE"), (1L, "A", "VIEW"), (2L, "A", "VIEW"),
      (3L, "B", "PURCHASE"), (4L, "B", "PURCHASE"), (5L, "B", "VIEW"))
      .toDF("user_id", "variant", "event_type")
    val r = AnalyticsPack.abtestReadout(ev, "variant", "A", "B",
      upper(trim(col("event_type"))) === "PURCHASE").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 3L, 1L, 2L)))
    assert(r.getDouble(4) == 0.5 && math.abs(r.getDouble(5) - 2.0 / 3) < 1e-15)
    assert(math.abs(r.getDouble(6) - (2.0 / 3 - 0.5)) < 1e-15)
    // z = lift / sqrt(p(1-p)(1/2+1/3)) with pooled p = 3/5
    val p = 3.0 / 5
    val z = (2.0 / 3 - 0.5) / math.sqrt(p * (1 - p) * (1.0 / 2 + 1.0 / 3))
    assert(math.abs(r.getDouble(7) - z) < 1e-12)
  }

  test("globalOrderedMax equals the naive running-max window; ranks dense") {
    import spark.implicits._
    import graft.operators.PrefixSum
    val df = Seq((5L, 3.0), (1L, 9.0), (3L, 2.0), (2L, 4.0), (4L, 11.0))
      .toDF("k", "v").repartition(3)
    val got = PrefixSum.globalOrderedMax(df, Seq(col("k")), "v", nRangeParts = 2)
      .orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("prefix_max"),
        r.getAs[Long]("row_rank")))
    assert(got.toSeq == Seq((1L, 9.0, 1L), (2L, 9.0, 2L), (3L, 9.0, 3L),
      (4L, 11.0, 4L), (5L, 11.0, 5L)))
  }

  test("skyline2d: dominated rows flagged, duplicates both survive, frontier exact") {
    import spark.implicits._
    import graft.operators.AnalyticsPack
    val pts = Seq(
      (1L, 1.0, 5L),  // frontier (cheapest)
      (2L, 2.0, 7L),  // frontier (better y for more x)
      (3L, 2.0, 6L),  // dominated by id 2 (same x, higher y)
      (4L, 3.0, 7L),  // dominated by id 2 (smaller x, equal y)
      (5L, 3.0, 9L),  // frontier
      (6L, 4.0, 9L),  // dominated by id 5 (smaller x, equal y)
      (7L, 1.0, 5L))  // exact duplicate of id 1: neither dominates -> both stay
      .toDF("id", "x", "y")
    val got = AnalyticsPack.skyline2d(pts, "x", "y")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_skyline")).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      5L -> true, 6L -> false, 7L -> true))
  }

  test("cupedReadout: hand-computed theta, equal means, shrunk variance") {
    import spark.implicits._
    // y ~= 2x + arm effect + small noise -> theta = Sxy/Sxx = 810/400
    val ev = Seq(
      (1L, "A", 10.0, 1), (1L, "A", 21.0, 0),
      (2L, "A", 20.0, 1), (2L, "A", 39.0, 0),
      (3L, "A", 30.0, 1), (3L, "A", 62.0, 0),
      (4L, "B", 10.0, 1), (4L, "B", 26.0, 0),
      (5L, "B", 20.0, 1), (5L, "B", 44.0, 0),
      (6L, "B", 30.0, 1), (6L, "B", 66.0, 0))
      .toDF("user_id", "variant", "value", "pre")
    val r = AnalyticsPack.cupedReadout(ev, "variant", col("value"),
        col("pre") === 1)
      .orderBy("arm").collect()
    assert(r.length == 2)
    val a = r(0); val b = r(1)
    assert(a.getAs[String]("arm") == "A" && a.getAs[Long]("n_users") == 3L)
    assert(math.abs(a.getAs[Double]("theta") - 2.025) < 1e-12)
    // per-arm x means equal the pooled mean here, so the adjustment
    // preserves each arm's mean (up to the 1e-6 grid)
    assert(math.abs(a.getAs[Double]("mean_adj") - a.getAs[Double]("mean_raw")) < 1e-5)
    assert(math.abs(b.getAs[Double]("mean_adj") - b.getAs[Double]("mean_raw")) < 1e-5)
    // the correlated covariate soaks up most of the variance
    assert(a.getAs[Double]("var_adj") < a.getAs[Double]("var_raw") / 10)
    assert(a.getAs[Double]("var_reduction") > 0.9)
    assert(b.getAs[Double]("var_reduction") > 0.9)
  }

  test("cupedReadout: zero pre-period variance yields NULL theta, not an error") {
    import spark.implicits._
    val ev = Seq(
      (1L, "A", 5.0, 1), (1L, "A", 9.0, 0),
      (2L, "B", 5.0, 1), (2L, "B", 11.0, 0))
      .toDF("user_id", "variant", "value", "pre")
    val r = AnalyticsPack.cupedReadout(ev, "variant", col("value"),
        col("pre") === 1)
      .orderBy("arm").collect()
    assert(r.forall(_.isNullAt(r.head.fieldIndex("theta"))))
    assert(r.forall(_.isNullAt(r.head.fieldIndex("var_reduction"))))
    // raw stats still present
    assert(r.forall(!_.isNullAt(r.head.fieldIndex("mean_raw"))))
  }

  test("newVsReturning: first day is new, later active days are returning") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-02-$day%02d 09:00:00")
    val ev = Seq(
      (ts(1), 1L), (ts(1), 2L),          // day 1: both new
      (ts(2), 1L), (ts(2), 3L),          // day 2: u1 returning, u3 new
      (ts(5), 1L), (ts(5), 2L))          // day 5: both returning
      .toDF("ts", "user_id")
    val got = AnalyticsPack.newVsReturning(ev).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-02-01", 2L, 0L), ("2024-02-02", 1L, 1L), ("2024-02-05", 0L, 2L)))
  }

  test("cumulativeUsers: first-seen days, new counts and running total") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-02-$day%02d 09:00:00")
    val ev = Seq(
      (ts(1), 1L), (ts(1), 2L),          // day 1: u1, u2 first seen
      (ts(2), 1L), (ts(2), 3L),          // day 2: only u3 is new
      (ts(5), 1L), (ts(5), 2L),          // day 5: nobody new → no row
      (ts(6), 4L))                       // day 6: u4 first seen
      .toDF("ts", "user_id")
    val got = AnalyticsPack.cumulativeUsers(ev).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-02-01", 2L, 2L), ("2024-02-02", 1L, 3L), ("2024-02-06", 1L, 4L)))
  }

  test("globalOrdered prefix sum equals the naive global window, ranks dense") {
    import spark.implicits._
    import graft.operators.PrefixSum
    val rnd = new scala.util.Random(3)
    val df = rnd.shuffle((1L to 500L).toList).map(k => (k, (k % 7 + 1).toDouble))
      .toDF("k", "v").repartition(7)
    val got = PrefixSum.globalOrdered(df, Seq(col("k")), "v", nRangeParts = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    // expected: running sum in k order, rank = k
    var acc = 0.0
    (1L to 500L).zip(got).foreach { case (k, (gk, gv, gsum, grank)) =>
      acc += (k % 7 + 1).toDouble
      assert(gk == k && gv == (k % 7 + 1).toDouble)
      assert(gsum == acc, s"prefix at k=$k: $gsum != $acc")
      assert(grank == k)
    }
  }

  test("rollingActiveUsers: trailing-7-day distinct users per observed day") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    val ev = Seq(
      (ts(1), 1L), (ts(1), 2L), (ts(1), 1L), // day 1: u1 u2 (u1 twice)
      (ts(2), 2L),                           // day 2: u2
      (ts(9), 1L))                           // day 9: u1; days 1-2 out of window
      .toDF("ts", "user_id")
    val got = AnalyticsPack.rollingActiveUsers(ev).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L, 2L),
      ("2024-01-02", 1L, 2L),  // u2 today, u1+u2 in [dec 27..jan 2]
      ("2024-01-09", 1L, 1L))) // window [jan 3..9] contains only day 9
  }

  test("trendSlope: exact slope/intercept on a linear ramp, NULL on one day") {
    import spark.implicits._
    // type A: y = 2x + 5 over 6 days — exact moments, exact OLS
    val a = (0 to 5).map(x => (20240110 + x, "A", 2.0 * x + 5.0))
    // type B: a single day -> zero x-variance -> NULL slope
    val b = Seq((20240110, "B", 9.0))
    val ev = (a ++ b).toDF("date_sk", "event_type_norm", "value")
    val got = AnalyticsPack.trendSlope(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), Option(r.get(2)), Option(r.get(3))))
      .toMap
    assert(got("A")._1 == 6)
    assert(got("A")._2.contains(2.0) && got("A")._3.contains(5.0))
    assert(got("B")._2.isEmpty && got("B")._3.isEmpty)
  }

  test("changepointCusum: |CUSUM| peaks exactly at a planted mean shift") {
    import spark.implicits._
    // level 10 for five days, then level 20: the shift boundary is day 5
    val ev = (1 to 10).map(d =>
      (20240100 + d, if (d <= 5) 10.0 else 20.0)).toDF("date_sk", "value")
    val got = AnalyticsPack.changepointCusum(ev).orderBy("date_sk").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(3), r.getBoolean(4)))
    assert(got.length == 10)
    // mean 15: deviations -5 then +5; cusum walks to -25 at day 5, back to 0
    assert(got(4)._3 == -25.0 && got(9)._3 == 0.0)
    assert(got.filter(_._4).map(_._1).toSeq == Seq(20240105))
    // flat series: every day ties at |cusum| = 0, all flagged, none peaks
    val flat = (1 to 4).map(d => (20240100 + d, 7.0)).toDF("date_sk", "value")
    val flatGot = AnalyticsPack.changepointCusum(flat).collect()
    assert(flatGot.forall(_.getBoolean(4)))
  }

  test("periodogram: a planted 7-day cycle dominates; a flat series has zero power") {
    import spark.implicits._
    // 56 days of a pure 7-day cosine (+ offset — centering removes it)
    val ev = (0 until 56).map { d =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      val dsk = date.getYear * 10000 + date.getMonthValue * 100 + date.getDayOfMonth
      (dsk, 100.0 + 50.0 * math.cos(2 * math.Pi * d / 7.0))
    }.toDF("date_sk", "value")
    val got = AnalyticsPack.periodogram(ev).collect()
      .map(r => r.getAs[Int]("period_days") ->
        (r.getAs[Double]("power"), r.getAs[Boolean]("is_dominant"))).toMap
    assert(got.size == 13 && got.keySet == (2 to 14).toSet)
    assert(got(7)._2, s"expected period 7 dominant, got ${got.filter(_._2._2)}")
    // the true period's power dwarfs an off-period bin
    assert(got(7)._1 > 10 * got(3)._1)
    // flat series: centering leaves all-zero terms -> zero power everywhere
    val flat = (0 until 28).map { d =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      (date.getYear * 10000 + date.getMonthValue * 100 + date.getDayOfMonth, 10.0)
    }.toDF("date_sk", "value")
    assert(AnalyticsPack.periodogram(flat).collect()
      .forall(_.getAs[Double]("power") == 0.0))
  }

  test("hurstExponent: a trending ramp is persistent (~1), an alternating series anti-persistent (~0)") {
    import spark.implicits._
    def mkSeries(f: Int => Double, n: Int) = (0 until n).map { d =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      (date.getYear * 10000 + date.getMonthValue * 100 + date.getDayOfMonth, f(d))
    }.toDF("date_sk", "value")
    val ws = Seq(4, 8, 16, 32)
    // linear ramp: cumulative deviations scale ~w, R/S ~ c*w -> H ~ 1
    val trend = AnalyticsPack.hurstExponent(
      mkSeries(d => d.toDouble, 64), ws).collect()
    assert(trend.length == 4)
    assert(trend.map(_.getAs[Int]("window_days")).toSet == ws.toSet)
    // 64 days -> 16, 8, 4, 2 complete blocks
    assert(trend.map(r => r.getAs[Int]("window_days") -> r.getAs[Long]("n_blocks"))
      .toMap == Map(4 -> 16L, 8 -> 8L, 16 -> 4L, 32 -> 2L))
    val h1 = trend.head.getAs[Double]("hurst_h")
    assert(h1 > 0.8, s"trending H was $h1")
    // perfect alternation: R/S is flat in w -> H ~ 0
    val alt = AnalyticsPack.hurstExponent(
      mkSeries(d => if (d % 2 == 0) 10.0 else 20.0, 64), ws).collect()
    val h0 = alt.head.getAs[Double]("hurst_h")
    assert(h0 < 0.3, s"alternating H was $h0")
    // every row carries the same broadcast H
    assert(trend.forall(_.getAs[Double]("hurst_h") == h1))
  }

  test("quantileSketchError: sketch ranks stay inside the 1/accuracy envelope; exact data is exact") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val got = graft.operators.Profiling.quantileSketchError(df, "v",
        ps = Seq(0.25, 0.5, 0.9), accuracy = 100)
      .collect().map(r => r.getAs[Double]("quantile") -> r).toMap
    assert(got.size == 3)
    got.values.foreach { r =>
      // the documented percentile_approx guarantee is on RANK
      assert(r.getAs[Boolean]("within_bound"),
        s"rank error ${r.getAs[Double]("rank_error")} breaches 1/accuracy")
      // on 1..1000 the sketch answer must itself be one of the values
      val a = r.getAs[Double]("approx_value")
      assert(a >= 1.0 && a <= 1000.0 && a == math.rint(a))
    }
    // exact side replays the interpolated bracket: p50 of 1..1000
    assert(math.abs(got(0.5).getAs[Double]("exact_value") - 500.5) < 1e-9)
  }

  test("trimmedMean: outlier dragged out of the bracket; boundaries kept") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // 1..10 plus a 1e6 glitch row: raw mean is wrecked, the 10-90%
    // bracket [q10, q90] of 11 values = [2, 10] keeps 1..10 minus 1
    val vals = (1 to 10).map(_.toDouble) :+ 1e6
    val df = vals.map(v => ("A", v)).toDF("g", "v")
    val r = AnalyticsPack.trimmedMean(df, col("g"), "v", 0.1, 0.9)
      .collect().head
    assert(r.getAs[Long]("n_total") == 11L)
    // pos_lo = 0.1*10 = 1 -> q_lo = 2.0 (exact); pos_hi = 9 -> q_hi = 10.0
    assert(r.getAs[Double]("q_lo") == 2.0 && r.getAs[Double]("q_hi") == 10.0)
    assert(r.getAs[Long]("n_kept") == 9L) // 2..10 inclusive — boundaries kept
    assert(math.abs(r.getAs[Double]("trimmed_mean") - 6.0) < 1e-9)
    assert(r.getAs[Double]("raw_mean") > 1000.0)
  }

  test("changepointBinseg: max SSE reduction lands exactly on the planted boundary") {
    import spark.implicits._
    // level 10 for five days, then 20 for five: best split after day 5,
    // gain = n_l·n_r/n · (Δmean)² = 5·5/10 · 100 = 250
    val ev = (1 to 10).map(d =>
      (20240100 + d, if (d <= 5) 10.0 else 20.0)).toDF("date_sk", "value")
    val got = AnalyticsPack.changepointBinseg(ev).orderBy("split_after_date_sk")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(got.length == 9) // the last day has no right side
    val best = got.filter(_._7)
    assert(best.map(_._1).toSeq == Seq(20240105))
    assert(best.head._2 == 5L && best.head._3 == 5L)
    assert(best.head._4 == 10.0 && best.head._5 == 20.0)
    assert(math.abs(best.head._6 - 250.0) < 1e-9)
    // flat series: every split gains exactly 0, all tie as best
    val flat = (1 to 4).map(d => (20240100 + d, 7.0)).toDF("date_sk", "value")
    assert(AnalyticsPack.changepointBinseg(flat).collect().forall(_.getBoolean(6)))
  }

  test("ewmaDemand: fold replays the recurrence exactly; first day seeds the level") {
    import spark.implicits._
    val ev = Seq((20240101, 8.0), (20240102, 16.0), (20240103, 4.0))
      .toDF("date_sk", "value")
    val got = AnalyticsPack.ewmaDemand(ev).orderBy("date_sk").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    // s1 = 8; s2 = 0.25*16 + 0.75*8 = 10; s3 = 0.25*4 + 0.75*10 = 8.5
    // (all dyadic-exact, so == comparison is legitimate)
    assert(got.toSeq == Seq(
      (20240101, 8.0, 8.0), (20240102, 16.0, 10.0), (20240103, 4.0, 8.5)))
    // multiple rows per day collapse before the fold
    val dup = Seq((20240101, 4.0), (20240101, 4.0), (20240102, 16.0))
      .toDF("date_sk", "value")
    val g2 = AnalyticsPack.ewmaDemand(dup).orderBy("date_sk").collect()
    assert(g2.map(_.getDouble(2)).toSeq == Seq(8.0, 10.0))
  }

  test("holtDemand: two-state fold replays the recurrence; tracks a linear ramp") {
    import spark.implicits._
    val ev = Seq((20240101, 8.0), (20240102, 16.0), (20240103, 24.0))
      .toDF("date_sk", "value")
    val got = AnalyticsPack.holtDemand(ev).orderBy("date_sk").collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // l1=8, b1=0; l2=.25*16+.75*8=10, b2=.125*2+.875*0=0.25
    // l3=.25*24+.75*10.25=13.6875, b3=.125*3.6875+.875*.25=0.6796875
    assert(got.toSeq == Seq(
      (20240101, 8.0, 0.0, 8.0),
      (20240102, 10.0, 0.25, 10.25),
      (20240103, 13.6875, 0.6796875, 13.6875 + 0.6796875)))
    // the single-state EWMA lags a steady ramp; Holt's trend state
    // keeps the forecast strictly ahead of the EWMA level
    val ramp = (1 to 40).map(i => (20240100 + i, 10.0 + 2 * i)).toDF("date_sk", "value")
    val h = AnalyticsPack.holtDemand(ramp).orderBy("date_sk").collect()
    val e = AnalyticsPack.ewmaDemand(ramp).orderBy("date_sk").collect()
    assert(h.last.getDouble(2) > e.last.getDouble(2))         // level ahead
    assert(math.abs(h.last.getDouble(3) - 2.0) < 0.2)         // trend -> slope
  }

  test("anomalyMad: catches the outlier that inflates its own z-score; zero-MAD guard") {
    import spark.implicits._
    // group A: tight cluster at ~10 plus one 1000. The 1000 inflates
    // the std so much its z is only ~2.85 — the z-score detector
    // misses it; median=10, MAD=0.5 flag it at robust_z ≈ 1335.
    val a = Seq(9.0, 9.0, 10.0, 10.0, 10.0, 10.0, 10.0, 11.0, 11.0, 1000.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
    // group B: constant majority -> MAD 0 -> NULL scores, no flags
    val b = Seq(5.0, 5.0, 5.0, 5.0, 100.0)
      .zipWithIndex.map { case (v, i) => (100L + i, "b", v) }
    val ev = (a ++ b).toDF("event_id", "event_type", "value")
    val madFlags = AnalyticsPack.anomalyMad(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(madFlags.length == 1)
    val f = madFlags.head
    assert(f._1 == 9L && f._2 == "A" && f._3 == 1000.0)
    assert(f._4 == 10.0 && f._5 == 0.5)                  // median, MAD
    assert(math.abs(f._6 - 990.0 / (0.5 * 1.4826)) < 0.001)
    // the z-score twin misses the same outlier (breakdown in action)
    assert(AnalyticsPack.anomalyZscore(ev).count() == 0)
  }

  test("seasonalDecompose: pure weekly pattern decomposes with ~zero interior residual") {
    // 21 days, demand depends ONLY on iso-dow: trend = weekly mean,
    // seasonal = dow offset, residual ~ 0 wherever trend is defined
    val pattern = Map(1 -> 70.0, 2 -> 10.0, 3 -> 20.0, 4 -> 30.0,
      5 -> 40.0, 6 -> 50.0, 7 -> 60.0)
    val ev = (0 until 21).map { i =>
      val day = java.time.LocalDate.parse("2024-01-01").plusDays(i)  // a Monday
      val dow = ((i % 7) + 1)
      (java.sql.Timestamp.valueOf(day.atTime(12, 0)), pattern(dow))
    }.toDF("ts", "value")
    val got = AnalyticsPack.seasonalDecompose(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (Option(r.getAs[Any]("trend")), r.getAs[Double]("seasonal"),
          Option(r.getAs[Any]("residual")))).toMap
    assert(got.size == 21)
    // 3-day edges have no full window: trend and residual NULL
    assert(got("2024-01-01")._1.isEmpty && got("2024-01-21")._3.isEmpty)
    val weeklyMean = pattern.values.sum / 7.0
    got.filter(_._2._1.nonEmpty).foreach { case (day, (trend, seasonal, resid)) =>
      assert(math.abs(trend.get.asInstanceOf[Double] - weeklyMean) < 1e-9, day)
      assert(math.abs(resid.get.asInstanceOf[Double]) < 1e-6, day)
    }
    // seasonal offsets recover the pattern shape around the mean
    val monday = got("2024-01-08")._2
    assert(math.abs(monday - (70.0 - weeklyMean)) < 1e-6)
  }

  test("anomalySeasonal: a planted spike is the only flagged day") {
    val pattern = Map(1 -> 70.0, 2 -> 10.0, 3 -> 20.0, 4 -> 30.0,
      5 -> 40.0, 6 -> 50.0, 7 -> 60.0)
    val ev = (0 until 28).map { i =>
      val day = java.time.LocalDate.parse("2024-01-01").plusDays(i)
      val dow = (i % 7) + 1
      // big spike on day 10 breaks the otherwise-pure weekly pattern;
      // tiny dow-dependent jitter keeps MAD nonzero
      val v = pattern(dow) + (if (i == 10) 500.0 else 0.0) + i % 3 * 0.01
      (java.sql.Timestamp.valueOf(day.atTime(12, 0)), v)
    }.toDF("ts", "value")
    val got = AnalyticsPack.anomalySeasonal(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (Option(r.getAs[Any]("is_anomaly")), r.getAs[Double]("robust_z"))).toMap
    // edges (trend NULL) are absent; the spike day is flagged with
    // the extreme robust z (days whose MA window contains the spike
    // legitimately co-flag — the MA smears the level shift ±3 days)
    assert(!got.contains("2024-01-01") && !got.contains("2024-01-28"))
    assert(got("2024-01-11")._1 == Some(true))
    val maxAbsZ = got.values.map(v => math.abs(v._2)).max
    assert(math.abs(got("2024-01-11")._2) == maxAbsZ)
    // days far from the spike stay quiet
    assert(got("2024-01-05")._1 == Some(false) && got("2024-01-24")._1 == Some(false))
  }

  test("cohortLtv: hand-computed revenue, cumulative and per-member value") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // cohort 2024-01-01: u1 + u2 (size 2). age 0 revenue 10+2=12,
    // age 1 revenue 5 (u1 only). cohort 2024-01-02: u3 alone, 7.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, ts("2024-01-01 11:00:00"), 2.0),
      (1L, ts("2024-01-02 09:00:00"), 5.0),
      (3L, ts("2024-01-02 12:00:00"), 7.0))
      .toDF("user_id", "ts", "value")
    val got = AnalyticsPack.cohortLtv(ev).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got(("2024-01-01", 0)) == (2L, 12.0, 12.0, 6.0))
    assert(got(("2024-01-01", 1)) == (1L, 5.0, 17.0, 8.5))
    assert(got(("2024-01-02", 0)) == (1L, 7.0, 7.0, 7.0))
    // null values contribute zero revenue but keep the user active
    val withNull = ev.unionAll(Seq((2L, ts("2024-01-02 10:00:00"),
      null.asInstanceOf[java.lang.Double]))
      .map(t => (t._1, t._2, t._3: java.lang.Double)).toDF("user_id", "ts", "value"))
    val g2 = AnalyticsPack.cohortLtv(withNull).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(g2(("2024-01-01", 1)) == (2L, 5.0))
  }

  test("missingnessPairs: coupled nulls phi=1, independent ~0, constant NULL") {
    import graft.operators.Profiling
    // a,b null together on half the rows -> phi = 1; c null on an
    // independent half -> phi ~ 0 vs a; d never null -> NULL phi
    val rows = (1 to 100).map { i =>
      val ab = if (i % 2 == 0) Some(1.0) else None
      val c = if ((i / 2) % 2 == 0) Some(1.0) else None
      (ab.map(_ => "x").orNull, ab, c, i)
    }
    val df = rows.toDF("a", "b", "c", "d")
    val got = Profiling.missingnessPairs(df, Seq("a", "b", "c", "d")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = got(("a", "b"))
    assert(ab.getAs[Long]("n_null_x") == 50L && ab.getAs[Long]("n_both_null") == 50L)
    assert(ab.getAs[Double]("phi") == 1.0)
    assert(math.abs(got(("a", "c")).getAs[Double]("phi")) < 0.1)
    val ad = got(("a", "d"))
    assert(ad.isNullAt(ad.fieldIndex("phi"))) // d never null: no variance
    assert(got.size == 6) // C(4,2) pairs
  }

  test("peakConcurrency: hand-built overlap, closed-end touch counts, earliest peak wins") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // timeline: a[10:00-10:30] b[10:10-10:40] c[10:20-10:50] overlap
    // 3-deep at 10:20; d starts exactly when a ends (10:30) — closed
    // intervals make the instant 10:30 FOUR-deep (a still open at its
    // own end + b + c + d); half-open semantics would say 3
    val iv = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      (2L, 1L, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:40:00")),
      (3L, 1L, ts("2024-01-01 10:20:00"), ts("2024-01-01 10:50:00")),
      (4L, 1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:35:00")),
      (5L, 1L, ts("2024-01-01 15:00:00"), ts("2024-01-01 15:10:00")))
      .toDF("uid", "seq", "s", "e")
    val got = AnalyticsPack.peakConcurrency(iv, "s", "e", Seq("uid", "seq"))
      .collect()(0)
    assert(got.getAs[Long]("peak_concurrency") == 4L)
    assert(got.getAs[java.sql.Timestamp]("at_ts") == ts("2024-01-01 10:30:00"))
    assert(got.getAs[Long]("n_intervals") == 5L)
    // layout-stable (distributed prefix sum, total sweep order)
    val again = AnalyticsPack.peakConcurrency(iv.repartition(7), "s", "e",
      Seq("uid", "seq")).collect()(0)
    assert(again.getAs[Long]("peak_concurrency") == 4L &&
      again.getAs[java.sql.Timestamp]("at_ts") == ts("2024-01-01 10:30:00"))
    // inverted/null intervals drop by contract
    val withBad = iv.unionAll(Seq(
      (9L, 1L, ts("2024-01-01 10:25:00"), ts("2024-01-01 10:00:00")))
      .toDF("uid", "seq", "s", "e"))
    assert(AnalyticsPack.peakConcurrency(withBad, "s", "e", Seq("uid", "seq"))
      .collect()(0).getAs[Long]("n_intervals") == 5L)
  }

  test("holtWinters: bit-exact vs a sequential replay; seasonal state learns the weekly dip") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 12:00:00")
    // three weeks: base 100 with a -40 dip every 7th day, +2/day trend
    val ys = (1 to 21).map(i =>
      100.0 + 2.0 * i + (if (i % 7 == 0) -40.0 else 0.0))
    val ev = ys.zipWithIndex.map { case (y, i) =>
      (i.toLong, 1L, "VIEW", ts(i + 1), y) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .withColumn("date_sk",
        (lit(20240100) + dayofmonth(col("ts"))).cast("int"))
      .withColumn("event_type_norm", col("event_type"))
    val got = AnalyticsPack.holtWinters(ev)
      .orderBy("date_sk").collect()
    assert(got.length == 21)
    // sequential driver replay, identical op order and coefficients
    var (l, t) = (0.0, 0.0)
    val seas = Array.fill(22)(0.0)
    got.zipWithIndex.foreach { case (r, i0) =>
      val i = i0 + 1
      val y = r.getAs[Double]("daily_value")
      val sprev = if (i >= 8) seas(i - 7) else 0.0
      val snext = if (i >= 7) seas(i - 6) else 0.0
      val (nl, nt) =
        if (i == 1) (y, 0.0)
        else (0.25 * (y - sprev) + 0.75 * (l + t),
          0.125 * ((0.25 * (y - sprev) + 0.75 * (l + t)) - l) + 0.875 * t)
      val ns = if (i == 1) 0.0 else 0.25 * (y - nl) + 0.75 * sprev
      assert(r.getAs[Double]("level") == nl, s"level day $i")
      assert(r.getAs[Double]("trend") == nt, s"trend day $i")
      assert(r.getAs[Double]("seasonal") == ns, s"seasonal day $i")
      assert(r.getAs[Double]("forecast_next") == nl + nt + snext, s"fore day $i")
      l = nl; t = nt; seas(i) = ns
    }
    // by week 3 the dip day's seasonal state is decidedly negative and
    // the smallest of its week — the pattern lives in s, not in trend
    val day21 = got.last
    assert(day21.getAs[Double]("seasonal") < -10.0)
    val week3Seas = got.slice(14, 21).map(_.getAs[Double]("seasonal"))
    assert(week3Seas.min == day21.getAs[Double]("seasonal"))
  }

  test("forecastEvalModels: seasonal model beats Holt on a strongly weekly series") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(
      f"2024-${1 + (i - 1) / 28}%02d-${1 + (i - 1) % 28}%02d 12:00:00")
    // eight weeks of a pure weekly pattern: HW learns it, Holt cannot
    val ys = (1 to 56).map(i => 100.0 + (if (i % 7 == 0) -40.0 else 0.0))
    val ev = ys.zipWithIndex.map { case (y, i) =>
      (i.toLong, 1L, "VIEW", ts(i + 1), y) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .withColumn("date_sk",
        (lit(20240000) + month(col("ts")) * 100 + dayofmonth(col("ts"))).cast("int"))
      .withColumn("event_type_norm", col("event_type"))
    val got = AnalyticsPack.forecastEvalModels(ev)
      .collect().map(r => r.getAs[String]("method") ->
        (r.getAs[Long]("n_eval"), r.getAs[Double]("mae"))).toMap
    assert(got.keySet == Set("holt_linear", "holt_winters"))
    // both evaluate every day but the last
    assert(got.values.forall(_._1 == 55L))
    // the seasonal state pays off: HW's one-step MAE beats Holt's
    assert(got("holt_winters")._2 < got("holt_linear")._2,
      s"hw=${got("holt_winters")._2} holt=${got("holt_linear")._2}")
  }

  test("abtestPower: hand-computed n, MDE monotonicity, unreachable target NULLs") {
    // arm A: 100 users, 10 converters (p = 0.1); arm B: 80 users
    val ev = ((1 to 100).map(u => (s"a$u", "VIEW", 0.0)) ++
      (1 to 10).map(u => (s"a$u", "BUY", 1.0)) ++
      (101 to 180).map(u => (s"b$u", "VIEW", 0.0)))
      .toDF("user_id", "et", "conv")
      .withColumn("split", when(col("user_id").startsWith("a"), "A").otherwise("B"))
    val got = AnalyticsPack.abtestPower(ev, "split", "A", "B",
        col("et") === "BUY", mdes = Seq(0.5, 1.0, 20.0))
      .collect().map(r => r.getAs[Double]("mde_rel") -> r).toMap
    assert(got.keySet == Set(0.5, 1.0, 20.0))
    val m5 = got(0.5)
    assert(m5.getAs[Double]("p_control") == 0.1)
    assert(m5.getAs[Double]("p_target") == 0.1 * 1.5)
    // closed form: 7.848879734349088*(0.1*0.9+0.15*0.85)/(0.05^2)
    val expected = math.ceil(7.848879734349088 * (0.1 * 0.9 + 0.15 * 0.85)
      / (0.05 * 0.05)).toLong
    assert(m5.getAs[Long]("required_n_per_arm") == expected)
    assert(m5.getAs[Long]("available_n_per_arm") == 80L)
    assert(!m5.getAs[Boolean]("feasible")) // ~682 needed, 80 available
    // a bigger MDE needs fewer users
    assert(got(1.0).getAs[Long]("required_n_per_arm") <
      m5.getAs[Long]("required_n_per_arm"))
    // p2 = 0.1*21 = 2.1 >= 1: unreachable — NULLs, not an error
    val unreach = got(20.0)
    assert(unreach.isNullAt(unreach.fieldIndex("p_target")) &&
      unreach.isNullAt(unreach.fieldIndex("required_n_per_arm")))
  }

  test("sessionStats: exact panel over a hand-built session table") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val sess = Seq(
      ("u1", 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 5L, 10.0),
      ("u1", 2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 1L, 0.0),
      ("u2", 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"), 4L, 20.0))
      .toDF("user_id", "session_seq", "session_start", "session_end",
        "n_events", "value_sum")
    val r = AnalyticsPack.sessionStats(sess, "user_id").collect()(0)
    assert(r.getAs[Long]("n_sessions") == 3L && r.getAs[Long]("n_users") == 2L)
    // durations ms: 600000, 0, 1200000 -> p50 = 600000
    assert(r.getAs[Double]("p50_duration_ms") == 600000.0)
    assert(r.getAs[Double]("avg_events") == 10.0 / 3.0)
    assert(math.abs(r.getAs[Double]("bounce_rate") - 1.0 / 3.0) < 1e-15)
    assert(r.getAs[Double]("avg_value") == 10.0)
  }

  test("attributionModels: first/last/linear credits, window bound, conservation") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: two clicks (day 1, day 2), purchase 100 on day 2
      (1L, "u1", "CLICK", ts("2024-01-01 10:00:00"), null.asInstanceOf[java.lang.Double]),
      (2L, "u1", "CLICK", ts("2024-01-02 10:00:00"), null.asInstanceOf[java.lang.Double]),
      (3L, "u1", "PURCHASE", ts("2024-01-02 12:00:00"), java.lang.Double.valueOf(100.0)),
      // u2: click OUTSIDE the 72h window — purchase has no credits
      (4L, "u2", "CLICK", ts("2024-01-01 00:00:00"), null.asInstanceOf[java.lang.Double]),
      (5L, "u2", "PURCHASE", ts("2024-01-10 00:00:00"), java.lang.Double.valueOf(50.0)))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = AnalyticsPack.attributionModels(ev, windowSec = 72 * 3600)
      .collect().map(r => (r.getAs[String]("model"),
        r.getAs[java.sql.Date]("click_day").toString) ->
        (r.getAs[Long]("n_credits"), r.getAs[Double]("attributed_value"))).toMap
    // first touch: all 100 to day 1; last touch: all to day 2
    assert(got(("first_touch", "2024-01-01")) == (1L, 100.0))
    assert(got(("last_touch", "2024-01-02")) == (1L, 100.0))
    // linear: 50 to each click day
    assert(got(("linear", "2024-01-01")) == (1L, 50.0))
    assert(got(("linear", "2024-01-02")) == (1L, 50.0))
    // u2's out-of-window click earns nothing under any model
    assert(!got.keySet.exists(_._2 == "2024-01-10") &&
      got.keySet.forall(k => k._2 != "2024-01-01" || got(k)._2 <= 100.0))
    // conservation: every model distributes exactly the purchase value
    val byModel = got.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._2).sum).toMap
    assert(byModel.values.forall(v => math.abs(v - 100.0) < 1e-9))
  }

  test("funnelWindowed: in-window converts, late steps drop, boundary is inclusive") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: full funnel inside 1h windows
      (1L, "u1", "VIEW", ts("2024-01-01 10:00:00")),
      (2L, "u1", "CLICK", ts("2024-01-01 10:30:00")),
      (3L, "u1", "PURCHASE", ts("2024-01-01 11:00:00")),
      // u2: click LATE (2h after view) — drops from the windowed count
      (4L, "u2", "VIEW", ts("2024-01-01 10:00:00")),
      (5L, "u2", "CLICK", ts("2024-01-01 12:00:00")),
      // u3: click exactly AT the boundary (inclusive)
      (6L, "u3", "VIEW", ts("2024-01-01 10:00:00")),
      (7L, "u3", "CLICK", ts("2024-01-01 11:00:00")),
      // u4: purchase before any click — never counts
      (8L, "u4", "VIEW", ts("2024-01-01 10:00:00")),
      (9L, "u4", "PURCHASE", ts("2024-01-01 10:10:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = AnalyticsPack.funnelWindowed(ev, windowSec = 3600).collect()(0)
    assert(r.getAs[Long]("users_total") == 4L)
    assert(r.getAs[Long]("users_view") == 4L)
    assert(r.getAs[Long]("users_click_in_window") == 2L) // u1, u3 (boundary)
    assert(r.getAs[Long]("users_purchase_in_window") == 1L) // u1
    assert(r.getAs[Double]("pct_view_to_click") == 50.0)
    // the unbounded ladder would count u2's late click: the window is
    // the semantic difference, not an implementation detail
    val unbounded = AnalyticsPack.funnelSteps(ev).collect()(0)
    assert(unbounded.getAs[Long]("users_click_after_view") == 3L)
  }

  test("forecastBacktest: calendar lags, exact MAE/bias, gap days yield no forecast") {
    // one type, 8 consecutive days 10,20,30,...,80 then a GAP and day
    // +2 with 90: lag1 evaluates days 2..8 (err +10 each); the
    // post-gap day has no d-1 neighbor -> excluded from lag1
    val rows =
      (1 to 8).map(i => ("A", 20240100 + i, i * 10.0)) :+ (("A", 20240110, 90.0))
    val ev = rows.toDF("event_type_norm", "date_sk", "value")
    val got = AnalyticsPack.forecastBacktest(ev)
      .collect().map(r => r.getAs[String]("method") -> r).toMap
    val l1 = got("naive_lag1")
    assert(l1.getAs[Long]("n_eval") == 7L) // days 2..8; the gap day drops
    assert(l1.getAs[Double]("mae") == 10.0)
    assert(l1.getAs[Double]("bias") == 10.0) // y grows: actual - forecast = +10
    val l7 = got("seasonal_lag7")
    // day 8 <- day 1 (err 70) and day 10 <- day 3 (err 60)
    assert(l7.getAs[Long]("n_eval") == 2L)
    assert(l7.getAs[Double]("mae") == 65.0)
    // mape of lag1 = mean over days 2..8 of 10/y, grid-quantized
    def g6(x: Double) = math.floor(x * 1e6) / 1e6
    val expMape = (2 to 8).map(i => g6(10.0 / (i * 10.0))).sum / 7.0
    assert(math.abs(l1.getAs[Double]("mape") - expMape) < 1e-12)
  }

  test("rfmSegments: exact panels, quartile scores, first-match segment ladder") {
    // anchor = 2024-01-31. Four customers spanning the quartile grid:
    //  c1: recent + frequent + big  -> CHAMPION
    //  c2: old + frequent           -> AT_RISK (r<=2, f>=3)
    //  c3: recent, one small order  -> REGULAR-ish band
    //  c4: old, one small order     -> low everything
    val orders = Seq(
      ("c1", "2024-01-31", 100.0), ("c1", "2024-01-30", 100.0),
      ("c1", "2024-01-29", 100.0),
      ("c2", "2023-06-01", 90.0), ("c2", "2023-06-02", 90.0),
      ("c2", "2023-06-03", 90.0),
      ("c3", "2024-01-25", 10.0),
      ("c4", "2023-01-01", 5.0))
      .toDF("k", "d", "amt")
    val got = AnalyticsPack.rfmSegments(orders, "k", "d", "amt")
      .collect().map(r => r.getAs[String]("custkey") -> r).toMap
    val c1 = got("c1")
    assert(c1.getAs[Long]("recency_days") == 0L)
    assert(c1.getAs[Long]("frequency") == 3L)
    assert(c1.getAs[Double]("monetary") == 300.0)
    assert(c1.getAs[Int]("r_score") == 4 && c1.getAs[Int]("f_score") == 4 &&
      c1.getAs[Int]("m_score") == 4)
    assert(c1.getAs[String]("segment") == "CHAMPION")
    val c2 = got("c2")
    assert(c2.getAs[Int]("r_score") <= 2 && c2.getAs[Int]("f_score") >= 3)
    assert(c2.getAs[String]("segment") == "AT_RISK")
    assert(got("c4").getAs[Long]("recency_days") == 395L)
    // every customer lands in exactly one segment; scores in 1..4
    assert(got.values.forall { r =>
      val s = Seq(r.getAs[Int]("r_score"), r.getAs[Int]("f_score"), r.getAs[Int]("m_score"))
      s.forall(x => x >= 1 && x <= 4) && r.getAs[String]("segment").nonEmpty
    })
    // layout-stable (broadcast panels, no windows)
    val again = AnalyticsPack.rfmSegments(orders.repartition(5), "k", "d", "amt")
      .collect().map(r => r.getAs[String]("custkey") -> r.getAs[String]("segment")).toMap
    assert(again == got.view.mapValues(_.getAs[String]("segment")).toMap)
  }

  test("intervalUnion: overlap merges, touch merges (closed), gap splits; exact lengths") {
    // key A: [1,5] ∪ [3,8] overlap -> [1,8]; [9,12] touches 8+1?
    // closed semantics merge only on lo <= running max hi — 9 > 8
    // starts a NEW block; [9,12] ∪ [12,14] touch AT 12 -> merge.
    // key B: one interval.
    val iv = Seq(
      ("A", 1L, 5L), ("A", 3L, 8L), ("A", 9L, 12L), ("A", 12L, 14L),
      ("A", 20L, 21L),
      ("B", 100L, 100L),
      ("C", 7L, 3L)) // inverted: dropped by contract
      .toDF("k", "lo", "hi")
    val got = AnalyticsPack.intervalUnion(iv, "k", "lo", "hi")
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(!got.contains("C"))
    val a = got("A")
    assert(a.getAs[Long]("n_intervals") == 5L)
    assert(a.getAs[Long]("n_blocks") == 3L) // [1,8], [9,14], [20,21]
    assert(a.getAs[Long]("covered_units") == 8L + 6L + 2L)
    assert(a.getAs[Long]("span_lo") == 1L && a.getAs[Long]("span_hi") == 21L)
    assert(a.getAs[Long]("span_units") == 21L)
    assert(math.abs(a.getAs[Double]("coverage_ratio") - 16.0 / 21.0) < 1e-15)
    val b = got("B")
    assert(b.getAs[Long]("n_blocks") == 1L &&
      b.getAs[Long]("covered_units") == 1L &&
      b.getAs[Double]("coverage_ratio") == 1.0)
    // a containing interval swallows later ones (running max, not LAG)
    val nest = Seq(("N", 1L, 100L), ("N", 2L, 3L), ("N", 50L, 60L))
      .toDF("k", "lo", "hi")
    val n = AnalyticsPack.intervalUnion(nest, "k", "lo", "hi").collect()(0)
    assert(n.getAs[Long]("n_blocks") == 1L &&
      n.getAs[Long]("covered_units") == 100L)
    // layout-stable: key-bounded windows, no global order
    val again = AnalyticsPack.intervalUnion(iv.repartition(7), "k", "lo", "hi")
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("covered_units")).toMap
    assert(again == Map("A" -> 16L, "B" -> 1L))
  }

  test("topValues: exact counts, deterministic ties, shares of non-null rows") {
    import graft.operators.Profiling
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"), ("b", null), ("b", "y"),
      ("c", "z"), ("c", "z"), ("c", "z"), ("d", "w"))
      .toDF("k", "v")
    val got = Profiling.topValues(df, Seq("k", "v"), k = 2).collect()
      .map(r => (r.getAs[String]("column_name"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("value"), r.getAs[Long]("n_rows"), r.getAs[Double]("share"))).toMap
    // k: c ×3, a ×3 — tie broken on value asc: a first
    assert(got(("k", 1)) == ("a", 3L, 3.0 / 9.0))
    assert(got(("k", 2)) == ("c", 3L, 3.0 / 9.0))
    // v: z ×3 of 8 NON-NULL rows (the null drops from count and share)
    assert(got(("v", 1)) == ("z", 3L, 3.0 / 8.0))
    assert(got(("v", 2))._1 == "x" || got(("v", 2))._1 == "y")
    assert(got.size == 4) // two columns × top-2
    // layout-stable (salted two-phase rank, total order)
    val again = Profiling.topValues(df.repartition(5), Seq("k", "v"), k = 2)
      .collect().map(r => (r.getAs[String]("column_name"), r.getAs[Int]("rank")) ->
        r.getAs[String]("value")).toMap
    assert(again == got.view.mapValues(_._1).toMap)
  }

  test("histogram2d: known cells, clamped top edge, shares sum to 1") {
    import graft.operators.Profiling
    val df = Seq((0.0, 0.0), (0.1, 9.9), (9.9, 0.1), (10.0, 10.0), (5.0, 5.0))
      .toDF("x", "y")
    val got = Profiling.histogram2d(df, "x", "y", kx = 10, ky = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // max values land in the TOP bucket (LEAST clamp), not bucket k
    assert(got.keySet == Set((0, 0), (0, 9), (9, 0), (9, 9), (5, 5)))
    assert(got.values.forall(_._1 == 1L))
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12)
  }

  test("diffInDiff: shared trend cancels; empty cell -> NULL estimate") {
    val df = Seq(
      ("T", "pre", 10.0), ("T", "pre", 20.0), ("T", "post", 30.0),
      ("C", "pre", 5.0), ("C", "post", 10.0),
      ("X", "post", 999.0)) // outside both groups -> ignored
      .toDF("grp", "period", "value")
    val r = AnalyticsPack.diffInDiff(df, "grp", "T", "C", col("value"),
      col("period") === "post").collect().head
    // (30 - 15) - (10 - 5) = 10
    assert(r.getAs[Double]("mean_treat_pre") == 15.0)
    assert(r.getAs[Double]("did_estimate") == 10.0)
    assert(r.getAs[Long]("n_treat_pre") == 2L && r.getAs[Long]("n_ctrl_post") == 1L)
    val r2 = AnalyticsPack.diffInDiff(
      df.filter(!(col("grp") === "C" && col("period") === "post")),
      "grp", "T", "C", col("value"), col("period") === "post").collect().head
    assert(r2.isNullAt(r2.fieldIndex("mean_ctrl_post")))
    assert(r2.isNullAt(r2.fieldIndex("did_estimate")))
  }

  test("quantileNormalize: groups align to rank means, ordering preserved") {
    val df = Seq(
      ("A", 20240101, 10.0), ("A", 20240102, 30.0),
      ("B", 20240101, 20.0), ("B", 20240102, 40.0))
      .toDF("event_type_norm", "date_sk", "value")
    val got = AnalyticsPack.quantileNormalize(df)
      .collect().map(r => (r.getAs[String]("event_type_norm"),
        r.getAs[Int]("date_sk")) ->
        (r.getAs[Int]("rank"), r.getAs[Double]("y_qnorm"))).toMap
    // rank-1 mean (10+20)/2 = 15, rank-2 mean (30+40)/2 = 35
    assert(got(("A", 20240101)) == ((1, 15.0)))
    assert(got(("A", 20240102)) == ((2, 35.0)))
    assert(got(("B", 20240101)) == ((1, 15.0)))
    assert(got(("B", 20240102)) == ((2, 35.0)))
  }

  test("autocorrelation: alternating series has negative lag-1, positive lag-2 ACF") {
    // 6 consecutive days alternating 10/0: ybar = 5, dev = ±5
    // lag1: 5 pairs x (-25) / (6 x 25) = -5/6; lag2: 4 x 25 / 150 = 2/3
    val df = (0 until 6).map(i => ("E", 20240101 + i, if (i % 2 == 0) 10.0 else 0.0))
      .toDF("event_type_norm", "date_sk", "value")
    val got = AnalyticsPack.autocorrelation(df, maxLag = 3)
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    assert(got(1) == ((5L, -125.0 / 150.0)))
    assert(got(2) == ((4L, 100.0 / 150.0)))
    assert(got(3) == ((3L, -75.0 / 150.0)))
  }

  test("ljungBox: strongly autocorrelated series rejects whiteness, iid-ish noise does not") {
    def dsk(i: Int): Int = {
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
    }
    // alternating series: |r_k| large at every lag -> Q huge, p ~ 0
    val alt = (0 until 40).map(i =>
      ("ALT", dsk(i), if (i % 2 == 0) 10.0 else 0.0))
    // a fixed white-ish sequence (seeded uniform draws; Q=5.24,
    // p=0.513 verified against a python replay of the exact statistic)
    val noise = Seq(8.4, 7.6, 4.2, 2.6, 5.1, 4.0, 7.8, 3.0, 4.8, 5.8,
      9.1, 5.0, 2.8, 7.6, 6.2, 2.5, 9.1, 9.8, 8.1, 9.0,
      3.1, 7.3, 9.0, 6.8, 4.7, 1.0, 4.3, 6.1, 9.1, 9.7,
      4.8, 8.7, 2.6, 8.1, 5.5, 0.1, 7.2, 4.0, 8.2, 6.7)
      .zipWithIndex.map { case (v, i) => ("NSE", dsk(i), v) }
    val df = (alt ++ noise).toDF("event_type_norm", "date_sk", "value")
    val got = AnalyticsPack.ljungBox(df, maxLag = 6)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("ALT")
    assert(a.getAs[Long]("n_days") == 40L && a.getAs[Long]("n_lags") == 6L)
    assert(a.getAs[Long]("dof") == 6L)
    assert(a.getAs[Double]("q_stat") > 100.0)
    assert(a.getAs[Double]("p_value") < 1e-4)
    assert(!a.getAs[Boolean]("white_noise"))
    val nse = got("NSE")
    assert(nse.getAs[Double]("p_value") > 0.05,
      s"noise p=${nse.getAs[Double]("p_value")}")
    assert(nse.getAs[Boolean]("white_noise"))
    // constant series: all-NULL ACF must keep its row with NULL
    // verdicts (n_lags 0), not vanish
    val cst = (0 until 10).map(i => ("CST", dsk(i), 5.0))
    // gappy series {d, d+3, d+6}: a non-NULL lag-3 ACF with n_days=3
    // used to divide by zero in the n-k term — must yield NULL
    // verdicts, not a crash or a partial Q
    val gap = Seq(0, 3, 6).map(i => ("GAP", dsk(i), (i + 1).toDouble * 2))
    val got2 = AnalyticsPack.ljungBox((cst ++ gap)
        .toDF("event_type_norm", "date_sk", "value"), maxLag = 6)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got2("CST").getAs[Long]("n_lags") == 0L)
    assert(got2("CST").isNullAt(got2("CST").fieldIndex("q_stat")))
    assert(got2("CST").isNullAt(got2("CST").fieldIndex("p_value")))
    assert(got2("GAP").getAs[Long]("n_days") == 3L)
    assert(got2("GAP").getAs[Long]("n_lags") < 6L)
    assert(got2("GAP").isNullAt(got2("GAP").fieldIndex("q_stat")))
    // textbook replay of Q on the ALT series from the ACF panel
    val acf = AnalyticsPack.autocorrelation(df.filter($"event_type_norm" === "ALT"), 6)
      .collect().map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf")).toMap
    def q12(v: Double) = math.floor(v * 1e12) / 1e12
    val s = BigDecimal((1 to 6).map(k => BigDecimal(q12(acf(k) * acf(k) / (40 - k)))).sum.toString)
    val expQ = 40.0 * 42.0 * s.toDouble
    assert(math.abs(a.getAs[Double]("q_stat") - expQ) < 1e-9)
  }

  test("runsTest: alternating series has max runs (z>0), blocked series too few (z<0)") {
    // ALT: 20 days alternating above/below median -> 20 runs of size 1
    val alt = (0 until 20).map(i =>
      ("ALT", 20240101 + i, if (i % 2 == 0) 10.0 else 0.0))
    // BLK: 10 low days then 10 high days -> exactly 2 runs
    val blk = (0 until 20).map(i =>
      ("BLK", 20240101 + i, if (i < 10) 0.0 else 10.0))
    val df = (alt ++ blk).toDF("event_type_norm", "date_sk", "value")
    val got = AnalyticsPack.runsTest(df)
      .collect().map(r => r.getString(0) -> r).toMap
    for (t <- Seq("ALT", "BLK")) {
      assert(got(t).getAs[Long]("n_above") == 10L)
      assert(got(t).getAs[Long]("n_below") == 10L)
      // mu = 2*10*10/20 + 1 = 11
      assert(got(t).getAs[Double]("expected_runs") == 11.0)
    }
    assert(got("ALT").getAs[Long]("n_runs") == 20L)
    assert(got("BLK").getAs[Long]("n_runs") == 2L)
    // sigma^2 = 10*9/19; z = (R-11)/sigma
    val sigma = math.sqrt(10.0 * 9.0 / 19.0)
    assert(math.abs(got("ALT").getAs[Double]("z_score") - 9.0 / sigma) < 1e-12)
    assert(math.abs(got("BLK").getAs[Double]("z_score") + 9.0 / sigma) < 1e-12)
    assert(got("ALT").getAs[Double]("p_value") < 0.01)
    assert(got("BLK").getAs[Double]("p_value") < 0.01)
    assert(!got("ALT").getAs[Boolean]("random_5pct"))
    // ties at the interpolated median drop: 5 at-median days vanish
    val tied = ((0 until 4).map(i => ("T", 20240101 + i, i.toDouble * 2)) ++
      (4 until 9).map(i => ("T", 20240101 + i, 3.0)))
      .toDF("event_type_norm", "date_sk", "value")
    val t = AnalyticsPack.runsTest(tied).collect().head
    assert(t.getAs[Long]("n_above") + t.getAs[Long]("n_below") == 4L)
  }

  test("mannKendall: textbook S and z on monotone, constant and tied series") {
    // UP: strictly increasing 12 days -> S = 66 = n(n-1)/2, no ties
    val up = (0 until 12).map(i => ("UP", 20240101 + i, i.toDouble))
    // CONST: all equal -> every pair ties, var 0 -> NULL verdicts
    val const = (0 until 12).map(i => ("CONST", 20240101 + i, 5.0))
    // DOWN: strictly decreasing -> S = -66, 'decreasing'
    val down = (0 until 12).map(i => ("DOWN", 20240101 + i, -i.toDouble))
    val df = (up ++ const ++ down).toDF("event_type_norm", "date_sk", "value")
    val got = AnalyticsPack.mannKendall(df)
      .collect().map(r => r.getString(0) -> r).toMap
    val u = got("UP")
    assert(u.getAs[Long]("n_days") == 12L && u.getAs[Long]("s_stat") == 66L)
    // var = 12*11*29/18 (no ties)
    val v = 12.0 * 11 * 29 / 18.0
    assert(u.getAs[Double]("var_s") == v)
    assert(math.abs(u.getAs[Double]("z_score") - 65.0 / math.sqrt(v)) < 1e-12)
    assert(u.getAs[String]("trend") == "increasing")
    assert(u.getAs[Double]("p_value") < 0.001)
    val d = got("DOWN")
    assert(d.getAs[Long]("s_stat") == -66L)
    assert(d.getAs[String]("trend") == "decreasing")
    val c = got("CONST")
    assert(c.getAs[Long]("s_stat") == 0L && c.getAs[Double]("var_s") == 0.0)
    assert(c.isNullAt(c.fieldIndex("z_score")) && c.isNullAt(c.fieldIndex("trend")))
  }

  test("friedmanDow: exact chi2 on a pure weekly pattern; ties and incomplete weeks handled") {
    def dsk(i: Int): Int = {
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong) // a Monday
      d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
    }
    // SEA: pure weekly pattern, 4 complete weeks + 3 spare days (the
    // incomplete week must drop) -> per week ranks 1..7 identical,
    // R_j = 4 r_j, chi2 = 12/(4*56)*16*140 - 3*4*8 = 24, C = 1
    val pattern = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0)
    val sea = (0 until 31).map(i => ("SEA", dsk(i), pattern(i % 7)))
    // CONST: all values equal -> every block fully tied, C = 0 -> NULL
    val const = (0 until 28).map(i => ("CONST", dsk(i), 5.0))
    val df = (sea ++ const).toDF("event_type_norm", "date_sk", "value")
    val got = AnalyticsPack.friedmanDow(df)
      .collect().map(r => r.getString(0) -> r).toMap
    val sRow = got("SEA")
    assert(sRow.getAs[Long]("n_blocks") == 4L)
    assert(sRow.getAs[Long]("k_treatments") == 7L && sRow.getAs[Long]("dof") == 6L)
    assert(sRow.getAs[Double]("chi2_raw") == 24.0)
    assert(sRow.getAs[Double]("tie_correction") == 1.0)
    assert(sRow.getAs[Double]("chi2_stat") == 24.0)
    // p = e^-12 * (0.5*144 + 12 + 1) = 85 e^-12 ~ 5.22e-4
    assert(math.abs(sRow.getAs[Double]("p_value") - 0.000522) < 1e-6)
    assert(sRow.getAs[Boolean]("seasonal_5pct"))
    val cRow = got("CONST")
    assert(cRow.getAs[Double]("tie_correction") == 0.0)
    assert(cRow.isNullAt(cRow.fieldIndex("chi2_stat")))
    assert(cRow.isNullAt(cRow.fieldIndex("p_value")))
  }

  test("autocorrelation: constant series (zero variance) yields NULL, not a division error") {
    val df = (0 until 5).map(i => ("C", 20240101 + i, 7.0))
      .toDF("event_type_norm", "date_sk", "value")
    val got = AnalyticsPack.autocorrelation(df, maxLag = 2).collect()
    assert(got.nonEmpty && got.forall(_.isNullAt(3)))
  }

  test("seasonalStrength: pure weekly cycle -> f_seasonal 1, flat trend -> f_trend 0") {
    import java.sql.Timestamp
    // 28 days of an exact weekly pattern: residual is identically 0,
    // the MA trend is flat -> Var(T+R) = 0
    val pattern = Seq(10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0)
    val rows = (0 until 28).map { i =>
      (i.toLong, new Timestamp(1704067200000L + i.toLong * 86400000L),
        pattern(i % 7))
    }
    val df = rows.toDF("event_id", "ts", "value")
    val r = AnalyticsPack.seasonalStrength(df).collect().head
    assert(r.getAs[Double]("var_r") == 0.0)
    assert(r.getAs[Double]("f_seasonal") == 1.0)
    assert(r.getAs[Double]("f_trend") == 0.0)
    // decomposable interior only: 28 days minus 3 on each edge
    assert(r.getAs[Long]("n_days") == 22L)
  }

  test("interarrivalStats: within-user gaps only, interpolated percentiles") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)
    val df = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(30), 3L),
      (2L, ts(1000), 4L)) // second user: no gap bridges users
      .toDF("user_id", "ts", "event_id")
      .withColumn("event_type", lit("click"))
    val r = AnalyticsPack.interarrivalStats(df).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("event_type_norm") == "CLICK")
    assert(row.getAs[Long]("n_gaps") == 2L)         // 10s and 20s
    assert(row.getAs[Double]("mean_gap_ms") == 15000.0)
    assert(row.getAs[Double]("p50_gap_ms") == 15000.0) // interpolated
    assert(row.getAs[Double]("p99_gap_ms") == 19900.0)
  }

  test("vocabCoverage: exact cumulative shares at each k") {
    import graft.operators.CorpusQc
    // freq: a=5 b=3 c=2 -> total 10
    val df = Seq("a a a b b", "a a b c c").toDF("text")
    val got = CorpusQc.vocabCoverage(df, "text", ks = Seq(1, 2, 3))
      .collect().map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("types_used"), r.getAs[Long]("tokens_covered"),
          r.getAs[Double]("coverage"))).toMap
    assert(got(1) == ((1L, 5L, 0.5)))
    assert(got(2) == ((2L, 8L, 0.8)))
    assert(got(3) == ((3L, 10L, 1.0)))
  }

  test("forecastConformal: exact integer rank, NULL when calibration too small") {
    // y cumulative 0,1,3,...,45: persistence residuals are exactly 1..9
    val ys = Seq(0, 1, 3, 6, 10, 15, 21, 28, 36, 45)
    val df = ys.zipWithIndex.map { case (y, i) =>
      ("E", 20240101 + i, y.toDouble) }
      .toDF("event_type_norm", "date_sk", "value")
    val got = AnalyticsPack.forecastConformal(df)
      .collect().map(r => r.getAs[String]("method") -> r).toMap
    val p = got("naive_lag1")
    // n = 9 -> conf_rank = ceil(0.8*10) = 8 -> 8th smallest |err| = 8
    assert(p.getAs[Long]("n_eval") == 9L && p.getAs[Long]("conf_rank") == 8L)
    assert(p.getAs[Double]("q_hat") == 8.0)
    assert(p.getAs[Double]("f_next") == 45.0)
    assert(p.getAs[Double]("lo") == 37.0 && p.getAs[Double]("hi") == 53.0)
    val s = got("seasonal_lag7")
    // only 3 lag-7 residuals -> conf_rank 4 > n -> cannot certify
    assert(s.getAs[Long]("n_eval") == 3L && s.getAs[Long]("conf_rank") == 4L)
    assert(s.isNullAt(s.fieldIndex("q_hat")) && s.isNullAt(s.fieldIndex("lo")))
    // seasonal anchor still resolves: y at last_d - 6 = day 4 value 6
    assert(s.getAs[Double]("f_next") == 6.0)
  }

  test("spearmanPair: monotone ±1, hand-computed midrank ties") {
    import graft.operators.Profiling
    val up = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0)).toDF("x", "y")
    assert((Profiling.spearmanPair(up, "x", "y").collect().head
      .getAs[Double]("rho") - 1.0).abs < 1e-12)
    val down = Seq((1.0, 40.0), (2.0, 30.0), (3.0, 20.0), (4.0, 10.0)).toDF("x", "y")
    assert((Profiling.spearmanPair(down, "x", "y").collect().head
      .getAs[Double]("rho") + 1.0).abs < 1e-12)
    // ties: rx=[1.5,1.5,3,4], ry=[1,2.5,2.5,4] -> rho = 3.75/4.5 = 5/6
    val tied = Seq((1.0, 10.0), (1.0, 20.0), (2.0, 20.0), (3.0, 30.0)).toDF("x", "y")
    val r = Profiling.spearmanPair(tied, "x", "y").collect().head
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(math.abs(r.getAs[Double]("rho") - 5.0 / 6.0) < 1e-12)
    // a constant column has no rank variance -> NULL, not a crash
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    assert(Profiling.spearmanPair(const, "x", "y").collect().head.isNullAt(3))
  }

  test("kendallTauB: perfect concordance, independence, tie-adjusted 0.5") {
    import graft.operators.Profiling
    val mono = Seq((1, 1), (2, 2), (3, 3)).toDF("x", "y")
    val m = Profiling.kendallTauB(mono, "x", "y").collect().head
    assert(m.getAs[Double]("n_c") == 3.0 && m.getAs[Double]("n_d") == 0.0)
    assert(math.abs(m.getAs[Double]("tau_b") - 1.0) < 1e-12)
    // balanced 2x2 grid: C == D -> tau 0
    val indep = Seq((1, 1), (1, 2), (2, 1), (2, 2)).toDF("x", "y")
    assert(Profiling.kendallTauB(indep, "x", "y").collect().head
      .getAs[Double]("tau_b") == 0.0)
    // ties on both margins: n_c=1, tie_x2=tie_y2=2, n0_2=6 -> tau = 1/2
    val tied = Seq((1, 1), (1, 2), (2, 2)).toDF("x", "y")
    val t = Profiling.kendallTauB(tied, "x", "y").collect().head
    assert(t.getAs[Double]("n_c") == 1.0 && t.getAs[Double]("n_d") == 0.0)
    assert(t.getAs[Double]("tie_x2") == 2.0 && t.getAs[Double]("tie_y2") == 2.0)
    assert(math.abs(t.getAs[Double]("tau_b") - 0.5) < 1e-12)
  }

  test("oddsRatio: hand 2x2, grid-ln, log interval; empty cell -> NULLs") {
    val rows =
      (1 to 10).map(_ => (true, true)) ++ (1 to 40).map(_ => (true, false)) ++
      (1 to 5).map(_ => (false, true)) ++ (1 to 45).map(_ => (false, false))
    val df = rows.toDF("exp", "out")
    val r = AnalyticsPack.oddsRatio(df, col("exp"), col("out")).collect().head
    assert(r.getAs[Long]("n_exp_pos") == 10L && r.getAs[Long]("n_ctl_neg") == 45L)
    assert(r.getAs[Double]("odds_ratio") == 2.25)
    assert(r.getAs[Double]("ln_or") == math.floor(math.log(2.25) * 1e6) / 1e6)
    assert(!r.getAs[Boolean]("significant_5pct")) // CI spans 0
    assert(r.getAs[Double]("ln_or_lo95") < 0.0 &&
      r.getAs[Double]("ln_or_hi95") > 0.0)
    val degenerate = Seq((true, true), (false, false)).toDF("exp", "out")
    val e = AnalyticsPack.oddsRatio(degenerate, col("exp"), col("out"))
      .collect().head
    assert(e.isNullAt(e.fieldIndex("odds_ratio")) &&
      e.isNullAt(e.fieldIndex("significant_5pct")))
  }

  test("gainsTable: top slice lifts, full depth converges to 1") {
    val rows = (1 to 10).map(i => (0, i <= 1)) ++ (1 to 10).map(i => (1, i <= 9))
    val got = AnalyticsPack.gainsTable(rows.toDF("b", "lab"),
        col("b"), col("lab"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("cum_n"), r.getAs[Long]("cum_pos"),
          r.getAs[Double]("population_share"),
          r.getAs[Double]("captured_share"), r.getAs[Double]("lift"))).toMap
    assert(got(1L) == ((10L, 9L, 0.5, 0.9, 1.8)))
    assert(got(0L) == ((20L, 10L, 1.0, 1.0, 1.0)))
  }

  test("controlChartP: only the shifted day breaches its 3-sigma binomial band") {
    import java.sql.Timestamp
    val rows = Seq(28, 30, 32, 80).zipWithIndex.flatMap { case (pos, d) =>
      (1 to 100).map(i => (
        Timestamp.valueOf(f"2024-02-${d + 1}%02d 09:00:00"),
        if (i <= pos) "PURCHASE" else "CLICK"))
    }
    val got = AnalyticsPack.controlChartP(rows.toDF("ts", "event_type"),
        upper(trim(col("event_type"))) === "PURCHASE")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Double]("rate"), r.getAs[Boolean]("out_of_control"))).toMap
    assert(got.size == 4)
    assert(got("2024-02-04") == ((0.8, true)))
    assert(Seq("2024-02-01", "2024-02-02", "2024-02-03")
      .forall(d => !got(d)._2))
    // center line is the pooled rate
    val pbar = AnalyticsPack.controlChartP(rows.toDF("ts", "event_type"),
        upper(trim(col("event_type"))) === "PURCHASE")
      .collect().head.getAs[Double]("p_bar")
    assert(pbar == 170.0 / 400.0)
  }

  test("pacf: lag-1 equals ACF, lag-2 matches the Yule-Walker closed form, gaps cascade NULL") {
    val rows = Seq(10.0, 14.0, 11.0, 17.0, 12.0, 18.0, 13.0, 19.0, 11.0, 16.0)
      .zipWithIndex.map { case (v, i) =>
        ("u1", 20240101 + i, "LABORAL", 10, "CLICK", v) }
      .toDF("user_id", "date_sk", "tipo_dia", "time_30m_sk", "event_type_norm", "value")
    val acf = AnalyticsPack.autocorrelation(rows, maxLag = 3).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    val got = AnalyticsPack.pacf(rows, maxLag = 3).collect()
      .map(r => r.getInt(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1).contains(acf(1)))
    // Yule-Walker order 2: phi22 = (r2 - r1^2) / (1 - r1^2)
    val exp2 = (acf(2) - acf(1) * acf(1)) / (1.0 - acf(1) * acf(1))
    assert(got(2).contains(exp2))
    assert(got(3).isDefined)
    // a single-day series has no lag pairs at all: the ACF panel is
    // empty, so the PACF emits nothing for that type (not NULL rows)
    val one = Seq(("u1", 20240101, "LABORAL", 10, "CLICK", 5.0))
      .toDF("user_id", "date_sk", "tipo_dia", "time_30m_sk", "event_type_norm", "value")
    assert(AnalyticsPack.pacf(one, maxLag = 3).collect().isEmpty)
  }

  test("arForecast: AR(1) recursion matches the closed form; mean reversion; NULL on flat series") {
    // AR(1): forecast(h) = ybar + phi1^h · (x_last − ybar), with
    // phi1 = acf(1) — verify the recursion against the closed form.
    val rows = Seq(10.0, 14.0, 11.0, 17.0, 12.0, 18.0, 13.0, 19.0, 11.0, 16.0)
      .zipWithIndex.map { case (v, i) => ("E", 20240101 + i, v) }
      .toDF("event_type_norm", "date_sk", "value")
    val acf1 = AnalyticsPack.autocorrelation(rows, maxLag = 1).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap.apply(1)
    val ybar = rows.agg(org.apache.spark.sql.functions.round(
      org.apache.spark.sql.functions.avg("value"), 4)).collect().head.getDouble(0)
    val got = AnalyticsPack.arForecast(rows, p = 1, horizon = 3).collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    val x0 = 16.0
    var f = x0
    for (h <- 1 to 3) {
      f = ybar + acf1 * (f - ybar)
      assert(math.abs(got(h) - f) < 1e-9, s"h=$h")
    }
    // forecasts revert toward the mean as h grows (|phi| < 1)
    assert(math.abs(got(3) - ybar) < math.abs(got(1) - ybar))
    // constant series: zero variance → NULL ACF → NULL forecasts
    val flat = (0 until 5).map(i => ("F", 20240101 + i, 7.0))
      .toDF("event_type_norm", "date_sk", "value")
    val nf = AnalyticsPack.arForecast(flat, p = 1, horizon = 2).collect()
    assert(nf.length == 2 && nf.forall(_.isNullAt(2)))
  }

  test("rateWilson: textbook interval, rate inside, degenerate rates stay in [0,1]") {
    def ev(u: Long, arm: String, et: String) = (u, arm, et)
    // arm A: 4 users, 1 converter; arm B: 2 users, 2 converters (p̂=1)
    val rows = (Seq(ev(1, "A", "PURCHASE")) ++ (2L to 4L).map(ev(_, "A", "CLICK")) ++
      Seq(ev(5, "B", "PURCHASE"), ev(6, "B", "PURCHASE")))
      .toDF("user_id", "split", "event_type")
    val got = AnalyticsPack.rateWilson(rows, "split",
        col("event_type") === "PURCHASE")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("A")
    val (z, n, p) = (1.96, 4.0, 0.25)
    val denom = 1.0 + z * z / n
    val center = (p + z * z / (2 * n)) / denom
    val half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert(a.getAs[Long]("n_users") == 4L && a.getAs[Long]("n_conv") == 1L)
    assert(math.abs(a.getAs[Double]("wilson_lo") - (center - half)) < 1e-12)
    assert(math.abs(a.getAs[Double]("wilson_hi") - (center + half)) < 1e-12)
    assert(a.getAs[Double]("wilson_lo") < 0.25 && 0.25 < a.getAs[Double]("wilson_hi"))
    // p̂ = 1: Wald would give a zero-width band at 1; Wilson pulls the
    // lower bound in and never leaves [0, 1]
    val b = got("B")
    assert(b.getAs[Double]("rate") == 1.0)
    assert(b.getAs[Double]("wilson_lo") > 0.0 && b.getAs[Double]("wilson_lo") < 1.0)
    assert(b.getAs[Double]("wilson_hi") <= 1.0 + 1e-12)
  }

  test("quantileProfile: hand-checked interpolated quantiles, flat panel shape") {
    val df = (1 to 100).map(i => (i.toDouble, i * 2.0)).toDF("a", "b")
    val got = graft.operators.Profiling.quantileProfile(df, Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got.size == 10)
    // 1..100: p50 = 50.5 (linear interpolation), p25 = 25.75, p99 = 99.01
    assert(math.abs(got(("a", 0.5)) - 50.5) < 1e-9)
    assert(math.abs(got(("a", 0.25)) - 25.75) < 1e-9)
    assert(math.abs(got(("a", 0.99)) - 99.01) < 1e-9)
    assert(math.abs(got(("b", 0.5)) - 101.0) < 1e-9)
  }

  test("exactQuantilesBy: bit-identical to Spark's exact percentile, per group and global") {
    // uneven groups, duplicated values, NULLs excluded — the shapes
    // where a rank-bracket plan and the builtin could diverge
    val rows = Seq.tabulate(97)(i => ("g" + (i % 3), Some((i * 37 % 13).toDouble / 7.0)))
    val df = (rows :+ (("g1", None: Option[Double]))).toDF("g", "v")
    val ps = Seq(0.1, 0.25, 0.5, 0.9, 0.95)
    val got = graft.operators.Profiling.exactQuantilesBy(df, Seq("g"), "v", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val want = df.filter(col("v").isNotNull).groupBy("g")
      .agg(percentile(col("v"), lit(ps.head)).as("p0"),
        ps.tail.map(p => percentile(col("v"), lit(p)).as(s"p$p")): _*)
      .collect().flatMap(r => ps.zipWithIndex.map { case (p, i) =>
        (r.getString(0), p) -> r.getDouble(i + 1) }).toMap
    assert(got.size == 15)
    want.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(got(k)) ==
        java.lang.Double.doubleToLongBits(v), s"mismatch at $k: ${got(k)} vs $v")
    }
    // empty groupCols = whole-relation quantile, same bit parity
    val g0 = graft.operators.Profiling.exactQuantilesBy(df, Seq.empty, "v", Seq(0.5))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val w0 = df.agg(percentile(col("v"), lit(0.5))).head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(g0(0.5)) ==
      java.lang.Double.doubleToLongBits(w0))
  }

  test("growthAccounting: new/retained/resurrected/churned ledger over planted months") {
    import java.sql.Timestamp
    def ev(u: Long, month: Int) =
      (u, Timestamp.valueOf(f"2024-$month%02d-10 12:00:00"))
    // u1: Jan+Feb+Mar (retained twice); u2: Jan+Mar (churns in Feb,
    // resurrects in Mar); u3: Feb only (new in Feb, churns in Mar)
    val rows = Seq(ev(1, 1), ev(1, 2), ev(1, 3), ev(2, 1), ev(2, 3), ev(3, 2))
    val got = AnalyticsPack.growthAccounting(rows.toDF("user_id", "ts"))
      .collect().map(r => r.getAs[java.sql.Date]("month").toString -> r).toMap
    assert(got.size == 3)
    val (jan, feb, mar) = (got("2024-01-01"), got("2024-02-01"), got("2024-03-01"))
    assert(jan.getAs[Long]("mau") == 2L && jan.getAs[Long]("n_new") == 2L &&
      jan.getAs[Long]("n_churned") == 0L && jan.isNullAt(jan.fieldIndex("quick_ratio")))
    assert(feb.getAs[Long]("mau") == 2L && feb.getAs[Long]("n_new") == 1L &&
      feb.getAs[Long]("n_retained") == 1L && feb.getAs[Long]("n_resurrected") == 0L &&
      feb.getAs[Long]("n_churned") == 1L)
    assert(feb.getAs[Double]("quick_ratio") == 1.0)
    assert(mar.getAs[Long]("mau") == 2L && mar.getAs[Long]("n_retained") == 1L &&
      mar.getAs[Long]("n_resurrected") == 1L && mar.getAs[Long]("n_churned") == 1L)
  }

  test("medianTest: shifted group splits cleanly off the median; identical groups score 0") {
    // A sits wholly below the global median, B wholly above; C is the
    // bulk straddling it -> big chi2. Identical groups -> chi2 = 0.
    val shifted = (Seq.fill(10)(("a", 1.0)) ++ Seq.fill(10)(("b", 100.0)) ++
      (1 to 20).map(i => ("c", 40.0 + i)))
      .toDF("event_type", "value")
    val got = AnalyticsPack.medianTest(shifted)
      .collect().map(r => r.getAs[String]("event_type_norm") -> r).toMap
    assert(got.size == 3)
    val a = got("A")
    assert(a.getAs[Long]("n_above") == 0L && a.getAs[Long]("n_below_eq") == 10L)
    assert(got("B").getAs[Long]("n_above") == 10L)
    assert(a.getAs[Long]("dof") == 2L)
    assert(a.getAs[Double]("chi2") == 20.0)
    // exp_above = rowTotal * totalAbove / N = 10 * 20 / 40 = 5
    assert(a.getAs[Double]("exp_above") == 5.0)
    val same = (Seq.fill(10)(("a", 1.0)) ++ Seq.fill(10)(("a", 3.0)) ++
      Seq.fill(10)(("b", 1.0)) ++ Seq.fill(10)(("b", 3.0)))
      .toDF("event_type", "value")
    val s = AnalyticsPack.medianTest(same).head
    assert(s.getAs[Double]("chi2") == 0.0 && s.getAs[Long]("dof") == 1L)
  }

  test("concentrationHhi: monopoly reads 1, equal split reads 1/n, effective users exact") {
    // type A: one user owns all 10 events -> HHI 1, normalized 1 over
    // 2 users? plant: u1 has 9, u2 has 1 -> HHI = (81+1)/100
    // type B: 4 users x 5 events each -> HHI = 1/4, normalized 0
    val rows = Seq.fill(9)((1L, "a")) ++ Seq((2L, "a")) ++
      (1 to 4).flatMap(u => Seq.fill(5)((u.toLong + 10L, "b")))
    val got = AnalyticsPack.concentrationHhi(rows.toDF("user_id", "event_type"))
      .collect().map(r => r.getAs[String]("event_type_norm") -> r).toMap
    val a = got("A")
    assert(a.getAs[Long]("n_users") == 2L && a.getAs[Long]("n_events") == 10L)
    assert(a.getAs[Double]("hhi") == 0.82)
    assert(math.abs(a.getAs[Double]("hhi_normalized") - (0.82 - 0.5) / 0.5) < 1e-12)
    val b = got("B")
    assert(b.getAs[Double]("hhi") == 0.25)
    assert(b.getAs[Double]("hhi_normalized") == 0.0)
    assert(b.getAs[Double]("effective_users") == 4.0)
  }

  test("burstiness: a metronome reads -1, a bursty stream reads positive") {
    import java.sql.Timestamp
    def at(ms: Long) = new Timestamp(1700000000000L + ms)
    // user 1 / TICK: exact 10 s metronome. user 2 / BURST: nine 1 ms
    // gaps then a 100 s silence — sigma far above the mean
    val tick = (0 to 10).map(i => (1L, at(i * 10000L), (i + 1).toLong, "tick"))
    val burst = ((0 to 9).map(i => (2L, at(i.toLong), (100 + i).toLong, "burst")) :+
      ((2L, at(100000L), 111L, "burst")))
    val df = (tick ++ burst).toDF("user_id", "ts", "event_id", "event_type")
    val got = AnalyticsPack.burstiness(df)
      .collect().map(r => r.getAs[String]("event_type_norm") -> r).toMap
    val t = got("TICK")
    assert(t.getAs[Long]("n_gaps") == 10L)
    assert(t.getAs[Double]("mean_gap_ms") == 10000.0)
    assert(t.getAs[Double]("std_gap_ms") == 0.0)
    assert(t.getAs[Double]("burstiness") == -1.0 && t.getAs[Double]("cv") == 0.0)
    val b = got("BURST")
    assert(b.getAs[Double]("burstiness") > 0.4)
    assert(b.getAs[Double]("cv") > 1.0)
  }

  test("benjaminiHochberg: step-up ranks, thresholds and flags; null effect survives") {
    // seg 1: all of B converts, none of A (huge z, p -> 0)
    // seg 2: identical arms (z = 0, p -> 1) — must NOT be flagged
    val rows =
      (1L to 40L).map(u => (u, "A", 1, false)) ++
      (41L to 80L).map(u => (u, "B", 1, true)) ++
      (81L to 120L).map(u => (u, if (u <= 100L) "A" else "B", 2, u % 2 == 0))
    val df = rows.toDF("user_id", "split", "seg", "conv")
    val got = AnalyticsPack.benjaminiHochberg(df, "seg", "split", "A", "B",
        col("conv"), q = 0.05)
      .collect().map(r => r.getAs[Int]("segment") -> r).toMap
    assert(got.size == 2)
    val (s1, s2) = (got(1), got(2))
    assert(s1.getAs[Long]("p_rank") == 1L && s2.getAs[Long]("p_rank") == 2L)
    assert(s1.getAs[Double]("bh_threshold") == 0.025)
    assert(s2.getAs[Double]("bh_threshold") == 0.05)
    assert(s1.getAs[Double]("p_value") < 1e-6)
    assert(s2.getAs[Double]("p_value") > 0.9)
    assert(s1.getAs[Boolean]("significant") && !s2.getAs[Boolean]("significant"))
    // the flag set must be a downward-closed rank prefix (step-up law)
    val all = got.values.toSeq
    val kStar = all.filter(r =>
      r.getAs[Double]("p_value") <= r.getAs[Double]("bh_threshold"))
      .map(_.getAs[Long]("p_rank")).maxOption.getOrElse(0L)
    all.foreach { r =>
      assert(r.getAs[Boolean]("significant") == (r.getAs[Long]("p_rank") <= kStar))
    }
  }

  test("outlierFences: hand-checked quartiles, fences, tail counts") {
    // 1..99 plus one extreme: q1 = 25.75, q3 = 75.25 (interpolated),
    // iqr = 49.5, fences [-48.5, 149.5] -> exactly the 1000 is out
    val df = ((1 to 99).map(_.toDouble) :+ 1000.0).map(Tuple1(_)).toDF("x")
    val r = graft.operators.Profiling.outlierFences(df, Seq("x")).head
    assert(r.getAs[String]("column_name") == "x")
    assert(math.abs(r.getAs[Double]("q1") - 25.75) < 1e-12)
    assert(math.abs(r.getAs[Double]("q3") - 75.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("iqr") - 49.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("fence_lo") - (-48.5)) < 1e-12)
    assert(math.abs(r.getAs[Double]("fence_hi") - 149.5) < 1e-12)
    assert(r.getAs[Long]("n") == 100L && r.getAs[Long]("n_below") == 0L &&
      r.getAs[Long]("n_above") == 1L)
    assert(r.getAs[Double]("pct_outliers") == 1.0)
  }

  test("timeToConvert: purchase counts only after the first click; latency panel exact") {
    import java.sql.Timestamp
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:${s}%02d")
    // u1: click then purchase 5 s later (converts, 5000 ms)
    // u2: purchase BEFORE its only click (clicker, not converted)
    // u3: purchase only, never clicks (not a clicker at all)
    // u4: click only (clicker, not converted)
    val rows = Seq(
      (1L, ts(0), 1L, "click"), (1L, ts(5), 2L, "purchase"),
      (2L, ts(0), 3L, "purchase"), (2L, ts(5), 4L, "click"),
      (3L, ts(0), 5L, "purchase"),
      (4L, ts(0), 6L, "click"))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val r = AnalyticsPack.timeToConvert(df).head
    assert(r.getAs[Long]("n_clickers") == 3L)
    assert(r.getAs[Long]("n_converted") == 1L)
    assert(r.getAs[Double]("pct_convert") == 33.33)
    Seq("p25_ms", "p50_ms", "p75_ms", "p90_ms").foreach { c =>
      assert(r.getAs[Double](c) == 5000.0, c)
    }
  }

  test("msprtSequential: evidence accumulates, always-valid p never rises") {
    import java.sql.Timestamp
    def ev(u: Long, split: String, day: Int, et: String) =
      (u, split, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), et, 100.0)
    val rows =
      (1L to 4L).map(u => ev(u, "A", 1, "CLICK")) ++
      (5L to 8L).map(u => ev(u, "B", 1, "CLICK")) ++
      Seq(ev(5L, "B", 2, "PURCHASE"), ev(6L, "B", 2, "PURCHASE")) ++
      Seq(ev(7L, "B", 3, "PURCHASE")) ++
      (1L to 3L).map(u => ev(u, "A", 4, "PURCHASE"))
    val df = rows.toDF("user_id", "split", "ts", "event_type", "value")
    val got = AnalyticsPack.msprtSequential(df, "split", "A",
        upper(trim(col("event_type"))) === "PURCHASE" && col("value") > 95)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    // day 1: no conversions -> pooled 0, vn 0 -> NULL lnL, NULL p
    val d1 = got("2024-01-01")
    assert(d1.getAs[Long]("n_a") == 4L && d1.getAs[Long]("n_b") == 4L)
    assert(d1.isNullAt(d1.fieldIndex("ln_lambda")) &&
      d1.isNullAt(d1.fieldIndex("ln_p_always_valid")))
    // days 2-3: B converts, evidence grows, p falls
    val (d2, d3, d4) = (got("2024-01-02"), got("2024-01-03"), got("2024-01-04"))
    assert(d2.getAs[Long]("conv_b") == 2L && d3.getAs[Long]("conv_b") == 3L)
    val (p2, p3) = (d2.getAs[Double]("ln_p_always_valid"),
      d3.getAs[Double]("ln_p_always_valid"))
    assert(p2 < 0.0 && p3 < p2)
    assert(math.abs(p3 + d3.getAs[Double]("ln_lambda")) < 1e-12)
    // day 4: A catches up (delta -> 0) — the running max HOLDS, the
    // always-valid p cannot rise even though today's evidence shrank
    assert(d4.getAs[Double]("ln_lambda") < d3.getAs[Double]("ln_lambda"))
    assert(d4.getAs[Double]("ln_p_always_valid") == p3)
    assert(!d4.getAs[Boolean]("reject_5pct"))
  }

  test("chi2Assoc: independence zero, perfect diagonal chi2=n V=1, empty cells count") {
    import graft.operators.Profiling
    val indep = (for (x <- Seq("A", "B"); y <- Seq("1", "2"); _ <- 1 to 5)
      yield (x, y)).toDF("u", "v")
    val i = Profiling.chi2Assoc(indep, "u", "v").collect().head
    assert(i.getAs[Long]("n") == 20L && i.getAs[Long]("dof") == 1L)
    assert(i.getAs[Double]("chi2") == 0.0 && i.getAs[Double]("cramers_v") == 0.0)
    // perfect diagonal: the two EMPTY cells carry half the statistic
    // (observed 0, expected 0.25 each) -> chi2 = n, V = 1
    val dep = ((1 to 10).map(_ => ("A", "1")) ++ (1 to 10).map(_ => ("B", "2")))
      .toDF("u", "v")
    val d = Profiling.chi2Assoc(dep, "u", "v").collect().head
    assert(d.getAs[Long]("n_cells") == 2L && d.getAs[Long]("dof") == 1L)
    assert(math.abs(d.getAs[Double]("chi2") - 20.0) < 1e-6)
    assert(math.abs(d.getAs[Double]("cramers_v") - 1.0) < 1e-7)
  }

  test("cramersVPairs: one row per pair, dependent and independent pairs separate") {
    import graft.operators.Profiling
    // c = f(a) (V = 1); b independent of both (V = 0 vs a)
    val rows = for (a <- Seq("A", "B"); b <- Seq("1", "2"); _ <- 1 to 5)
      yield (a, b, if (a == "A") "x" else "y")
    val got = Profiling.cramersVPairs(rows.toDF("a", "b", "c"),
        Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("cramers_v"))
      .toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got(("a", "b")) == 0.0)
    assert(math.abs(got(("a", "c")) - 1.0) < 1e-7)
    assert(got(("b", "c")) == 0.0)
  }

  test("xcorrLags: a one-day lead correlates perfectly at lag +1 only") {
    import java.sql.Timestamp
    val counts = Seq(1, 3, 2, 5, 4)
    val rows =
      counts.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)((Timestamp.valueOf(f"2024-01-${i + 1}%02d 10:00:00"), "CLICK")) } ++
      counts.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)((Timestamp.valueOf(f"2024-01-${i + 2}%02d 10:00:00"), "PURCHASE")) }
    val df = rows.toDF("ts", "event_type")
    val got = AnalyticsPack.xcorrLags(df, "CLICK", "PURCHASE", maxLag = 2)
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("xcorr"))).toMap
    // purchases replay clicks shifted one day: full overlap, corr 1
    assert(got(1)._1 == 5L && math.abs(got(1)._2 - 1.0) < 1e-12)
    // other alignments overlap fewer days and decorrelate
    assert(got(0)._1 == 4L && got(0)._2 < 0.99)
    assert(got(-1)._1 == 3L)
  }

  test("granger: planted lag-1 driver detected, brute-force F, constant cause NULL-guarded") {
    import java.sql.Timestamp
    val x = Seq(1, 6, 2, 7, 3, 9, 2, 8, 4, 7)
    val noise = Seq(0, 1, 1, 0, 1, 0, 1, 1, 0, 0)
    // YY's day-t count = 3*XX's day-(t-1) count + a small wiggle the
    // lagged regressors cannot absorb (keeps RSS_u > 0)
    val y = (1 until x.length).map(t => 3 * x(t - 1) + noise(t))
    def rowsOf(tp: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)((Timestamp.valueOf(f"2024-03-${i + 1}%02d 09:00:00"), tp)) }
    val df = (rowsOf("XX", x) ++ rowsOf("YY", 5 +: y) ++
      rowsOf("ZZ", Seq.fill(10)(4))).toDF("ts", "event_type")
    val got = AnalyticsPack.granger(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val p = got(("XX", "YY"))
    assert(p.getAs[Long]("n_days") == 9L)
    assert(p.getAs[Boolean]("granger_5pct"))
    // brute-force F from the raw triples (plain-double normal
    // equations, independent arithmetic order)
    val yc = 5 +: y
    val triples = (2 to 10).map(t => (yc(t - 1).toDouble,
      yc(t - 2).toDouble, x(t - 2).toDouble))
    val n = triples.length.toDouble
    def mean(s: Seq[Double]) = s.sum / s.length
    val (my, m1, m2) = (mean(triples.map(_._1)), mean(triples.map(_._2)),
      mean(triples.map(_._3)))
    val c = triples.map { case (a, b, cc) => (a - my, b - m1, cc - m2) }
    def dot(f: ((Double, Double, Double)) => Double,
            g: ((Double, Double, Double)) => Double) =
      c.map(t => f(t) * g(t)).sum
    val (s11, s22, s12) = (dot(_._2, _._2), dot(_._3, _._3), dot(_._2, _._3))
    val (s1y, s2y, syy) = (dot(_._2, _._1), dot(_._3, _._1), dot(_._1, _._1))
    val det = s11 * s22 - s12 * s12
    val b1 = (s1y * s22 - s2y * s12) / det
    val b2 = (s2y * s11 - s1y * s12) / det
    val rssU = syy - b1 * s1y - b2 * s2y
    val rssR = syy - s1y * s1y / s11
    val fExp = (rssR - rssU) * (n - 3) / rssU
    assert(math.abs(p.getAs[Double]("f_stat") - fExp) < 1e-4)
    assert(math.abs(p.getAs[Double]("b_cause") - b2) < 1e-4)
    // constant cause: zero regressor variance -> singular normal
    // equations -> every estimate NULL, never Inf/NaN
    val z = got(("ZZ", "YY"))
    assert(z.getAs[Long]("n_days") == 9L)
    assert(z.isNullAt(z.fieldIndex("b_cause")))
    assert(z.isNullAt(z.fieldIndex("f_stat")))
    assert(z.isNullAt(z.fieldIndex("granger_5pct")))
    // all ordered pairs of the 3 types present
    assert(got.size == 6)
  }

  test("cointegration: planted equilibrium pair detected, brute-force t, degenerate guards") {
    import java.sql.Timestamp
    // QQ tracks 2*PP plus an alternating stationary wiggle: the
    // levels share a trend, the spread mean-reverts hard
    val x = Seq(2, 4, 6, 8, 10, 12, 14, 16, 18, 20)
    val y = x.zipWithIndex.map { case (v, i) => 2 * v + (if (i % 2 == 0) 1 else 0) }
    def rowsOf(tp: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)((Timestamp.valueOf(f"2024-04-${i + 1}%02d 09:00:00"), tp)) }
    val df = (rowsOf("PP", x) ++ rowsOf("QQ", y) ++
      rowsOf("RR", Seq.fill(10)(3))).toDF("ts", "event_type")
    val got = AnalyticsPack.cointegration(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size == 6)
    val p = got(("PP", "QQ"))
    assert(p.getAs[Long]("n_days") == 10L && p.getAs[Long]("n_diffs") == 9L)
    assert(p.getAs[Boolean]("coint_5pct"))
    // brute force: step-1 OLS, micro-grid residuals, step-2 ADF(0)
    val n = x.length.toDouble
    val (sx, sy) = (x.map(_.toDouble).sum, y.map(_.toDouble).sum)
    val sxx = x.map(v => v.toDouble * v).sum
    val sxy = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val e6 = x.zip(y).map { case (xv, yv) =>
      math.floor((yv.toDouble - a - b * xv.toDouble) * 1e6).toLong }
    val pairs = e6.sliding(2).map(w => (w(0).toDouble, (w(1) - w(0)).toDouble)).toSeq
    val (ed, ee, dd) = (pairs.map(t => t._1 * t._2).sum,
      pairs.map(t => t._1 * t._1).sum, pairs.map(t => t._2 * t._2).sum)
    val gamma = ed / ee
    val rss = dd - ed * ed / ee
    val tExp = gamma / math.sqrt((rss / (pairs.length - 1)) / ee)
    assert(math.abs(p.getAs[Double]("adf_t") - tExp) < 1e-4)
    assert(math.abs(p.getAs[Double]("gamma") - gamma) < 1e-4)
    assert(math.abs(p.getAs[Double]("beta") - b) < 1e-4)
    // constant regressor: n*Sxx - Sx^2 = 0 -> beta and the whole ADF
    // chain NULL, never Inf/NaN
    val z = got(("RR", "QQ"))
    assert(z.isNullAt(z.fieldIndex("beta")))
    assert(z.isNullAt(z.fieldIndex("gamma")))
    assert(z.isNullAt(z.fieldIndex("adf_t")))
    assert(z.isNullAt(z.fieldIndex("coint_5pct")))
    assert(z.getAs[Long]("n_diffs") == 0L)
  }

  test("kruskalWallis: textbook H on distinct ranks, all-tied NULL correction") {
    // A=[1,2], B=[3,4]: R_A=3, R_B=7 -> H = 0.6*29 - 15 = 2.4, no ties
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)).toDF("g", "v")
    val r = AnalyticsPack.kruskalWallis(df, "v", "g").collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_groups") == 2L)
    assert(math.abs(r.getAs[Double]("h") - 2.4) < 1e-8)
    assert(math.abs(r.getAs[Double]("h_corrected") - 2.4) < 1e-8)
    // every value tied: H = 0 and the tie correction denominator
    // vanishes -> h_corrected NULL
    val flat = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0), ("B", 5.0)).toDF("g", "v")
    val f = AnalyticsPack.kruskalWallis(flat, "v", "g").collect().head
    assert(math.abs(f.getAs[Double]("h")) < 1e-8)
    assert(f.isNullAt(f.fieldIndex("h_corrected")))
  }

  test("welchTTest: textbook statistics against a sequential computation") {
    val a = Seq(27.5, 21.0, 19.0, 23.6, 17.0, 17.9, 16.9, 20.1, 21.9, 22.6)
    val b = Seq(27.1, 22.0, 20.8, 23.4, 23.4, 23.5, 25.8, 22.0, 24.8, 20.2)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val r = AnalyticsPack.welchTTest(df, "v", col("g") === "A").collect().head
    def mv(xs: Seq[Double]): (Double, Double) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (ma, va) = mv(a); val (mb, vb) = mv(b)
    assert(r.getAs[Long]("n_a") == 10L && r.getAs[Long]("n_b") == 10L)
    // tolerances at the 1e-6 value grid: the operator floor-quantizes
    // v and v² (§5 engine-parity discipline), so moments sit within
    // ~n·1e-6 of the unquantized sequential computation
    assert(math.abs(r.getAs[Double]("mean_a") - ma) < 1e-5)
    assert(math.abs(r.getAs[Double]("var_b") - vb) < 1e-5)
    val se2 = va / 10 + vb / 10
    val t = (ma - mb) / math.sqrt(se2)
    val dfw = se2 * se2 / (math.pow(va / 10, 2) / 9 + math.pow(vb / 10, 2) / 9)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-4)
    assert(math.abs(r.getAs[Double]("df_welch") - dfw) < 1e-3)
    val dpool = (ma - mb) / math.sqrt((9 * va + 9 * vb) / 18)
    assert(math.abs(r.getAs[Double]("cohen_d") - dpool) < 1e-4)
    assert(math.abs(r.getAs[Double]("hedges_g") - dpool * (1 - 3.0 / 71.0)) < 1e-4)
    // zero-variance degenerate group -> NULL t, never an error
    val flat2 = Seq(("A", 1.0), ("A", 1.0), ("B", 1.0), ("B", 1.0)).toDF("g", "v")
    val z = AnalyticsPack.welchTTest(flat2, "v", col("g") === "A").collect().head
    assert(z.isNullAt(z.fieldIndex("t_stat")))
  }

  test("anovaF: textbook F decomposition, SSB+SSW=SST, degenerate single group") {
    // groups [1,2,3], [2,3,4], [4,5,6]: grand mean = 30/9
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 4.0), ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = AnalyticsPack.anovaF(df, "v", "g").collect().head
    assert(r.getAs[Long]("k_groups") == 3L && r.getAs[Long]("n_total") == 9L)
    val all = Seq(1.0, 2, 3, 2, 3, 4, 4, 5, 6)
    val gm = all.sum / 9
    val sst = all.map(x => (x - gm) * (x - gm)).sum
    val ssb = Seq(Seq(1.0, 2, 3), Seq(2.0, 3, 4), Seq(4.0, 5, 6))
      .map(g => g.length * math.pow(g.sum / g.length - gm, 2)).sum
    assert(math.abs(r.getAs[Double]("ss_between") - ssb) < 1e-6)
    assert(math.abs(r.getAs[Double]("ss_within") - (sst - ssb)) < 1e-6)
    val f = (ssb / 2) / ((sst - ssb) / 6)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-6)
    assert(math.abs(r.getAs[Double]("eta_sq") - ssb / sst) < 1e-9)
    // a single group: SSB 0, df_between 0 -> NULL F, eta 0/sst
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val o = AnalyticsPack.anovaF(one, "v", "g").collect().head
    assert(o.isNullAt(o.fieldIndex("f_stat")))
  }

  test("brownForsythe: W equals ANOVA F of |x − group median|") {
    // A=[1,2,3] (med 2 → z=[1,0,1]), B=[10,20,30] (med 20 → z=[10,0,10]):
    // SSB=54, SSW=67.333…, W = 54 / (SSW/4)
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 10.0), ("B", 20.0), ("B", 30.0)).toDF("g", "v")
    val r = AnalyticsPack.brownForsythe(df, "v", "g").collect().head
    assert(r.getAs[Long]("k_groups") == 2L && r.getAs[Long]("n_total") == 6L)
    val za = Seq(1.0, 0.0, 1.0); val zb = Seq(10.0, 0.0, 10.0)
    val gm = (za ++ zb).sum / 6
    val ssb = 3 * math.pow(za.sum / 3 - gm, 2) + 3 * math.pow(zb.sum / 3 - gm, 2)
    val ssw = za.map(z => math.pow(z - za.sum / 3, 2)).sum +
      zb.map(z => math.pow(z - zb.sum / 3, 2)).sum
    val w = (ssb / 1) / (ssw / 4)
    assert(math.abs(r.getAs[Double]("w_stat") - w) < 1e-6)
    // identical spreads → W exactly 0 (deviation profiles equal)
    val same = Seq(("A", 0.0), ("A", 2.0), ("B", 10.0), ("B", 12.0)).toDF("g", "v")
    val s0 = AnalyticsPack.brownForsythe(same, "v", "g").collect().head
    assert(math.abs(s0.getAs[Double]("w_stat")) < 1e-9)
  }
}
