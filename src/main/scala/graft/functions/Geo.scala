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

  private val C2 = 3 * E1 / 2 - 27 * math.pow(E1, 3) / 32
  private val C4 = 21 * E1 * E1 / 16 - 55 * math.pow(E1, 4) / 32
  private val C6 = 151 * math.pow(E1, 3) / 96
  private val C8 = 1097 * math.pow(E1, 4) / 512

  /** Central meridian of a UTM zone, in radians. */
  private def lon0Rad(zone: Int): Double = math.toRadians(-183.0 + 6.0 * zone)

  /** Footpoint latitude (radians) from a northing in meters — the
    * shared head of both inverse series, as plain double math.
    */
  private def phi1Kernel(n: Double, southern: Boolean): Double = {
    val fn = if (southern) SouthFalseNorthing else 0.0
    val m = (n - fn) / K0
    val mu = m / MuDenom
    mu + C2 * math.sin(mu * 2) + C4 * math.sin(mu * 4) +
      C6 * math.sin(mu * 6) + C8 * math.sin(mu * 8)
  }

  /** Scalar latitude kernel — the Snyder series as ONE tight double
    * computation per row, invoked from the native
    * [[graft.expressions.UtmToLatExpr]] codegen. The operation order
    * mirrors the SQL-oracle rendering term for term (same literals,
    * same association), so results are bit-identical to an engine
    * replaying [[sqlConstants]]; as nested Column algebra this series
    * exploded combinatorially (every reuse of the footpoint series
    * re-inlined its whole tree — d6 alone carried it 6×), costing
    * minutes of first-run optimizer/codegen time per session.
    */
  def utmLatKernel(e: Double, n: Double, zone: Int, southern: Boolean): Double = {
    val p1 = phi1Kernel(n, southern)
    val sinP = math.sin(p1); val cosP = math.cos(p1); val tanP = math.tan(p1)
    val c1 = Ep2 * cosP * cosP
    val t1 = tanP * tanP
    val oneMinus = 1.0 - E2 * sinP * sinP
    val n1 = A / math.sqrt(oneMinus)
    val r1 = (A * (1 - E2)) / math.pow(oneMinus, 1.5)
    val d = (e - FalseEasting) / (n1 * K0)
    val d2 = d * d; val d4 = d2 * d2; val d6 = d4 * d2
    val latRad = p1 - (n1 * tanP / r1) * (
      d2 / 2 -
        (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * Ep2) * d4 / 24 +
        (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1 -
          252.0 * Ep2 - 3.0 * c1 * c1) * d6 / 720)
    math.toDegrees(latRad)
  }

  /** Scalar longitude kernel — see [[utmLatKernel]]. */
  def utmLonKernel(e: Double, n: Double, zone: Int, southern: Boolean): Double = {
    val p1 = phi1Kernel(n, southern)
    val sinP = math.sin(p1); val cosP = math.cos(p1); val tanP = math.tan(p1)
    val c1 = Ep2 * cosP * cosP
    val t1 = tanP * tanP
    val oneMinus = 1.0 - E2 * sinP * sinP
    val n1 = A / math.sqrt(oneMinus)
    val d = (e - FalseEasting) / (n1 * K0)
    val d2 = d * d; val d3 = d2 * d; val d5 = d3 * d2
    val lonRad = lon0Rad(zone) + (
      d - (1.0 + 2.0 * t1 + c1) * d3 / 6 +
        (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 +
          8.0 * Ep2 + 24.0 * t1 * t1) * d5 / 120) / cosP
    math.toDegrees(lonRad)
  }

  /** Latitude (degrees) from UTM easting/northing columns. */
  def utmToLat(e: Column, n: Column, zone: Int = 19, southern: Boolean = true): Column =
    graft.expressions.Kernels.utmToLat(e.cast("double"), n.cast("double"), zone, southern)

  /** Longitude (degrees) from UTM easting/northing columns. */
  def utmToLon(e: Column, n: Column, zone: Int = 19, southern: Boolean = true): Column =
    graft.expressions.Kernels.utmToLon(e.cast("double"), n.cast("double"), zone, southern)

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
    "c2" -> C2.toString,
    "c4" -> C4.toString,
    "c6" -> C6.toString,
    "c8" -> C8.toString,
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
