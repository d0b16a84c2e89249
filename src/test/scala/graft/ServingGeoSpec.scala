package graft

import org.apache.spark.sql.functions._

import graft.functions.Geo
import graft.operators.Serving

class ServingGeoSpec extends SparkSpec {
  import spark.implicits._

  test("utm inverse: round-trips the forward transform within 1e-6 deg") {
    // Santiago-area grid (zone 19S) — the serving layer's real domain.
    val pts = for {
      lat <- Seq(-33.0, -33.45, -33.9, -34.5)
      lon <- Seq(-70.2, -70.66, -71.2)
    } yield (lat, lon)
    val utm = pts.map { case (lat, lon) =>
      val (e, n) = Geo.forwardUtm(lat, lon)
      (lat, lon, e, n)
    }
    val got = utm.toDF("lat", "lon", "e", "n")
      .select($"lat", $"lon",
        Geo.utmToLat($"e", $"n").as("lat2"), Geo.utmToLon($"e", $"n").as("lon2"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-6,
        s"lat ${r.getDouble(0)} -> ${r.getDouble(2)}")
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-6,
        s"lon ${r.getDouble(1)} -> ${r.getDouble(3)}")
    }
  }

  test("utm inverse: central meridian / equator fixed points") {
    // On the central meridian the easting is exactly 500000 and the
    // longitude is -69 (zone 19) at any latitude; at the southern
    // false-northing origin the latitude is 0.
    val got = Seq((500000.0, 10000000.0))
      .toDF("e", "n")
      .select(Geo.utmToLat($"e", $"n").as("lat"), Geo.utmToLon($"e", $"n").as("lon"))
      .head()
    assert(math.abs(got.getDouble(0)) < 1e-9)
    assert(math.abs(got.getDouble(1) - -69.0) < 1e-9)
  }

  test("modalValue: count desc then ascending multi-column tie-break") {
    val df = Seq(
      // key 1: (5.0, 2.0) appears twice -> wins on count
      (1L, 5.0, 2.0), (1L, 5.0, 2.0), (1L, 1.0, 1.0),
      // key 2: all counts tie -> smallest (x, y) wins: (2.0, 1.0) < (2.0, 9.0) < (3.0, 0.0)
      (2L, 3.0, 0.0), (2L, 2.0, 9.0), (2L, 2.0, 1.0))
      .toDF("k", "x", "y")
    val got = Serving.modalValue(df, "k", Seq("x", "y"))
      .orderBy("k").collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((1L, 5.0, 2.0), (2L, 2.0, 1.0)))
  }

  test("modalValue: string value columns are supported") {
    val df = Seq((1L, "b"), (1L, "a"), (1L, "b"), (2L, "z"), (2L, "a"))
      .toDF("k", "v")
    val got = Serving.modalValue(df, "k", Seq("v")).orderBy("k").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "b"), (2L, "a"))) // key 2 ties -> ascending value wins
  }

  test("gridDensity: floor-division cells, negative coords, exact weight sums") {
    val pts = Seq(
      (10.0, 10.0, 1.005),
      (499.0, 400.0, 2.015),  // same cell as the first point
      (750.0, 100.0, 1.0),    // cell (1, 0)
      (-1.0, -1.0, 0.5))      // floor semantics: cell (-1, -1)
      .toDF("x", "y", "w")
    val got = Serving.gridDensity(pts, "x", "y", cell = 500.0, weightCol = "w")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == Set((0L, 0L), (1L, 0L), (-1L, -1L)))
    // decimal partials via shortest-repr cast (the money convention):
    // 1.005 -> 1.01, 2.015 -> 2.02, exact sum 3.03
    assert(got((0L, 0L)) == ((2L, 3.03, 0.0, 0.0)))
    assert(got((1L, 0L)) == ((1L, 1.0, 500.0, 0.0)))
    assert(got((-1L, -1L)) == ((1L, 0.5, -500.0, -500.0)))
  }

  test("serving predicate composes only the active clauses") {
    val df = Seq(
      (20240110, "LABORAL", "CLICK", 13),  // in
      (20240110, "DOMINGO", "CLICK", 13),  // day out
      (20240110, "LABORAL", "SIGNUP", 13), // mode out
      (20240110, "LABORAL", "CLICK", 3),   // hour out
      (20240201, "LABORAL", "CLICK", 13))  // date out
      .toDF("date_sk", "tipo_dia", "event_type_norm", "time_30m_sk")
    val f = Serving.Filters(dateSkFrom = Some(20240101), dateSkTo = Some(20240131),
      dayTypes = Seq("laboral", "sabado"), modes = Seq("click", "view"),
      hourFrom = Some(6), hourTo = Some(22))
    assert(df.filter(Serving.predicate(f)).count() == 1)
    assert(df.filter(Serving.predicate(Serving.Filters())).count() == 5)
  }

  test("nearestNeighbor: argmin with id tie-break, cross-cell probe, NULL when uncovered") {
    import spark.implicits._
    import graft.operators.SpatialJoin
    val sites = Seq((1L, 0.0, 0.0), (2L, 3.0, 0.0), (3L, 4.9, 20.0))
      .toDF("sid", "sx", "sy")
    val points = Seq(
      (10L, 1.0, 0.0),   // site 1 at d=1 beats site 2 at d=2
      (11L, 1.5, 0.0),   // exact tie (1.5 both) -> lower site id wins
      (12L, 5.1, 20.0),  // site 3 lives in the NEIGHBOR cell (4.9 vs 5.1 across the r=5 cell wall)
      (13L, 60.0, 60.0)) // nothing within radius -> NULL
      .toDF("pid", "x", "y")
    val got = SpatialJoin.nearestNeighbor(points, "pid", "x", "y",
      sites, "sid", "sx", "sy", radius = 5.0)
      .collect().map(r => r.getAs[Long]("point_id") ->
        (if (r.isNullAt(r.fieldIndex("site_id"))) None
         else Some(r.getAs[Long]("site_id") -> r.getAs[Double]("dist")))).toMap
    assert(got(10L) == Some((1L, 1.0)))
    assert(got(11L) == Some((1L, 1.5)))
    assert(got(12L).map(_._1) == Some(3L))
    assert(math.abs(got(12L).get._2 - 0.2) <= 2e-6) // 1e-6 floor grid + fp
    assert(got(13L) == None)
    assert(got.size == 4) // the uncovered point keeps its spine row
  }
}
