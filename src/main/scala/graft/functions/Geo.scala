package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UTM <-> WGS84 geodetic conversion as pure column expressions.
  *
  * The reference reprojects serving map points from UTM zone 19S to
  * WGS84 lat/lon with pyproj on the driver
  * (reference: src/webapp/query_service.py:235-241). Here the inverse
  * transverse Mercator is the standard closed-form Snyder/USGS series
  * (public domain: Snyder, "Map Projections — A Working Manual",
  * USGS PP 1395, eqs. 8-17..8-25), expressed as Catalyst column math:
  * fully distributed, whole-stage-codegen'd, no UDF, no driver loop.
  * Series accuracy is < 1 cm — far below the 1e-6 deg rounding the
  * serving layer applies.
  */
object Geo {

  // WGS84 ellipsoid.
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F)
  private val Ep2 = E2 / (1 - E2)
  private val K0 = 0.9996
  private val E1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
  private val FalseEasting = 500000.0
  private val SouthFalseNorthing = 10000000.0

  private val MuDenom = A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256)

  /** Central meridian of a UTM zone, in radians. */
  private def lon0Rad(zone: Int): Double = math.toRadians(-183.0 + 6.0 * zone)

  /** Footpoint latitude (radians) from a northing column. */
  private def phi1(n: Column, southern: Boolean): Column = {
    val fn = if (southern) SouthFalseNorthing else 0.0
    val m = (n - lit(fn)) / lit(K0)
    val mu = m / lit(MuDenom)
    mu +
      lit(3 * E1 / 2 - 27 * math.pow(E1, 3) / 32) * sin(mu * 2) +
      lit(21 * E1 * E1 / 16 - 55 * math.pow(E1, 4) / 32) * sin(mu * 4) +
      lit(151 * math.pow(E1, 3) / 96) * sin(mu * 6) +
      lit(1097 * math.pow(E1, 4) / 512) * sin(mu * 8)
  }

  /** Latitude (degrees) from UTM easting/northing columns. */
  def utmToLat(e: Column, n: Column, zone: Int = 19, southern: Boolean = true): Column = {
    val p1 = phi1(n, southern)
    val sinP = sin(p1); val cosP = cos(p1); val tanP = tan(p1)
    val c1 = lit(Ep2) * cosP * cosP
    val t1 = tanP * tanP
    val oneMinus = lit(1.0) - lit(E2) * sinP * sinP
    val n1 = lit(A) / sqrt(oneMinus)
    val r1 = lit(A * (1 - E2)) / pow(oneMinus, 1.5)
    val d = (e - lit(FalseEasting)) / (n1 * lit(K0))
    val d2 = d * d; val d4 = d2 * d2; val d6 = d4 * d2
    val latRad = p1 - (n1 * tanP / r1) * (
      d2 / 2 -
        (lit(5.0) + lit(3.0) * t1 + lit(10.0) * c1 - lit(4.0) * c1 * c1 - lit(9.0 * Ep2)) * d4 / 24 +
        (lit(61.0) + lit(90.0) * t1 + lit(298.0) * c1 + lit(45.0) * t1 * t1 -
          lit(252.0 * Ep2) - lit(3.0) * c1 * c1) * d6 / 720)
    degrees(latRad)
  }

  /** Longitude (degrees) from UTM easting/northing columns. */
  def utmToLon(e: Column, n: Column, zone: Int = 19, southern: Boolean = true): Column = {
    val p1 = phi1(n, southern)
    val sinP = sin(p1); val cosP = cos(p1); val tanP = tan(p1)
    val c1 = lit(Ep2) * cosP * cosP
    val t1 = tanP * tanP
    val oneMinus = lit(1.0) - lit(E2) * sinP * sinP
    val n1 = lit(A) / sqrt(oneMinus)
    val d = (e - lit(FalseEasting)) / (n1 * lit(K0))
    val d2 = d * d; val d3 = d2 * d; val d5 = d3 * d2
    val lonRad = lit(lon0Rad(zone)) + (
      d - (lit(1.0) + lit(2.0) * t1 + c1) * d3 / 6 +
        (lit(5.0) - lit(2.0) * c1 + lit(28.0) * t1 - lit(3.0) * c1 * c1 +
          lit(8.0 * Ep2) + lit(24.0) * t1 * t1) * d5 / 120) / cosP
    degrees(lonRad)
  }

  /** The inverse-series constants as shortest-round-trip double
    * literals, for SQL oracle twins that must replay the exact
    * expression tree (Double.toString round-trips to the identical
    * bit pattern in any IEEE-754 parser).
    */
  def sqlConstants(zone: Int = 19): Map[String, String] = Map(
    "a" -> A.toString,
    "e2" -> E2.toString,
    "ep2" -> Ep2.toString,
    "k0" -> K0.toString,
    "mu_denom" -> MuDenom.toString,
    "c2" -> (3 * E1 / 2 - 27 * math.pow(E1, 3) / 32).toString,
    "c4" -> (21 * E1 * E1 / 16 - 55 * math.pow(E1, 4) / 32).toString,
    "c6" -> (151 * math.pow(E1, 3) / 96).toString,
    "c8" -> (1097 * math.pow(E1, 4) / 512).toString,
    "a_1me2" -> (A * (1 - E2)).toString,
    "ep2_9" -> (9.0 * Ep2).toString,
    "ep2_252" -> (252.0 * Ep2).toString,
    "ep2_8" -> (8.0 * Ep2).toString,
    "lon0" -> lon0Rad(zone).toString,
    "false_easting" -> FalseEasting.toString,
    "south_fn" -> SouthFalseNorthing.toString,
    "pi" -> math.Pi.toString)

  /** Forward transform on plain doubles (test oracle for the inverse
    * column expressions; same Snyder series, eqs. 8-9..8-14).
    */
  def forwardUtm(latDeg: Double, lonDeg: Double, zone: Int = 19,
                 southern: Boolean = true): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val nRad = A / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = Ep2 * cosP * cosP
    val aCap = (lam - lon0Rad(zone)) * cosP
    val m = A * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * math.pow(E2, 3) / 256) * phi -
      (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * math.pow(E2, 3) / 1024) * math.sin(2 * phi) +
      (15 * E2 * E2 / 256 + 45 * math.pow(E2, 3) / 1024) * math.sin(4 * phi) -
      (35 * math.pow(E2, 3) / 3072) * math.sin(6 * phi))
    val easting = FalseEasting + K0 * nRad * (aCap +
      (1 - t + c) * math.pow(aCap, 3) / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * Ep2) * math.pow(aCap, 5) / 120)
    val fn = if (southern) SouthFalseNorthing else 0.0
    val northing = fn + K0 * (m + nRad * tanP * (aCap * aCap / 2 +
      (5 - t + 9 * c + 4 * c * c) * math.pow(aCap, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * Ep2) * math.pow(aCap, 6) / 720))
    (easting, northing)
  }
}
