package graft.core

/** Minimal projection engine for the reproject operator (reference
  * `Raster.reproject`, Raster.py:695-733 via rasterio/PROJ — no GDAL in
  * the sandbox, so the EPSG subset the reference's workflows touch is
  * implemented from public formulas):
  *
  *  - Transverse Mercator forward/inverse via the OSGB series expansion
  *    ("A guide to coordinate systems in Great Britain", OS public doc;
  *    same series as Snyder 1987 eq. 8-9..8-17) — parameterized, so one
  *    kernel serves British National Grid and every UTM zone.
  *  - 7-parameter Helmert datum shift via geodetic<->ECEF (public OSGB
  *    constants for WGS84<->OSGB36; ~5 m absolute accuracy, same class as
  *    PROJ's towgs84 path without grid files — documented approximation).
  *
  * Supported EPSG: 27700 (BNG/Airy1830), 326xx / 327xx (UTM north/south,
  * WGS84), 4326 (geographic pass-through, degrees).
  *
  * == Accuracy bound (the API contract) ==
  *
  * | conversion                     | method                  | accuracy |
  * |--------------------------------|-------------------------|----------|
  * | 27700 <-> 27700 grid resample  | no datum change         | exact    |
  * | 326xx/327xx <-> 4326 (WGS84)   | TM series, same datum   | < 1 mm   |
  * | 27700 <-> 4326 / UTM           | TM series + 7-param Helmert | ~5 m absolute (OSGB's own stated bound for the single Helmert set) |
  * | anything else                  | rejected (IllegalArgumentException) | — |
  *
  * The ~5 m class on cross-datum UK conversions is why the r17 reproject
  * query is gated rows-only plus ScalaTest (warp == direct-transform
  * bitwise; OSGB worked example < 5 mm in TM, < 5 m after Helmert):
  * OSTN15 grid-shift files (the route to cm-level BNG accuracy) are
  * deliberately out of scope — they are a ~20 MB external artifact, not
  * a formula. Workflows needing survey-grade BNG should pre-transform
  * coordinates upstream; everything the reference's own test workflows
  * do stays well inside the 5 m class. */
object Proj {

  final case class Ellipsoid(a: Double, b: Double) {
    val e2: Double = (a * a - b * b) / (a * a)
  }
  val airy1830: Ellipsoid = Ellipsoid(6377563.396, 6356256.909)
  val wgs84: Ellipsoid = Ellipsoid(6378137.0, 6356752.314245)

  /** Transverse Mercator parameterization. */
  final case class Tm(ell: Ellipsoid, f0: Double, lat0: Double, lon0: Double,
      e0: Double, n0: Double, datum: Datum)

  /** Datum = Helmert transform TO WGS84 (tx ty tz in m, s in ppm,
    * rx ry rz in arc-seconds). */
  final case class Datum(tx: Double, ty: Double, tz: Double, s: Double,
      rx: Double, ry: Double, rz: Double)
  val wgs84Datum: Datum = Datum(0, 0, 0, 0, 0, 0, 0)
  /** OSGB36 -> WGS84 (OS public constants; inverse of the usual
    * WGS84->OSGB36 set). */
  val osgb36Datum: Datum =
    Datum(446.448, -125.157, 542.060, -20.4894, 0.1502, 0.2470, 0.8421)

  /** A CRS: geographic (tm == null) or projected TM. */
  final case class Crs(epsg: Int, ell: Ellipsoid, datum: Datum, tm: Tm)

  def fromEpsg(epsg: Int): Crs = epsg match {
    case 4326 => Crs(epsg, wgs84, wgs84Datum, null)
    case 27700 => Crs(epsg, airy1830, osgb36Datum,
      Tm(airy1830, 0.9996012717, math.toRadians(49.0), math.toRadians(-2.0),
        400000.0, -100000.0, osgb36Datum))
    case z if z >= 32601 && z <= 32660 => // UTM north
      val lon0 = math.toRadians(-183.0 + 6.0 * (z - 32600))
      Crs(epsg, wgs84, wgs84Datum,
        Tm(wgs84, 0.9996, 0.0, lon0, 500000.0, 0.0, wgs84Datum))
    case z if z >= 32701 && z <= 32760 => // UTM south
      val lon0 = math.toRadians(-183.0 + 6.0 * (z - 32700))
      Crs(epsg, wgs84, wgs84Datum,
        Tm(wgs84, 0.9996, 0.0, lon0, 500000.0, 10000000.0, wgs84Datum))
    case other => throw new IllegalArgumentException(
      s"EPSG:$other not in the engine's registry (27700, 326xx, 327xx, 4326)")
  }

  /** Meridional arc M (OSGB series). */
  private def arc(tm: Tm, lat: Double): Double = {
    val n = (tm.ell.a - tm.ell.b) / (tm.ell.a + tm.ell.b)
    val n2 = n * n; val n3 = n2 * n
    val dLat = lat - tm.lat0
    val sLat = lat + tm.lat0
    tm.ell.b * tm.f0 * (
      (1 + n + 1.25 * n2 + 1.25 * n3) * dLat
        - (3 * n + 3 * n2 + 21.0 / 8 * n3) * math.sin(dLat) * math.cos(sLat)
        + (15.0 / 8 * (n2 + n3)) * math.sin(2 * dLat) * math.cos(2 * sLat)
        - 35.0 / 24 * n3 * math.sin(3 * dLat) * math.cos(3 * sLat))
  }

  /** TM forward: geodetic (lat, lon in radians, on tm's datum) -> (E, N). */
  def tmForward(tm: Tm, lat: Double, lon: Double): (Double, Double) = {
    val e2 = tm.ell.e2
    val sinL = math.sin(lat); val cosL = math.cos(lat)
    val tanL = math.tan(lat)
    val v = tm.ell.a * tm.f0 / math.sqrt(1 - e2 * sinL * sinL)
    val rho = tm.ell.a * tm.f0 * (1 - e2) * math.pow(1 - e2 * sinL * sinL, -1.5)
    val eta2 = v / rho - 1
    val m = arc(tm, lat)
    val i = m + tm.n0
    val ii = v / 2 * sinL * cosL
    val iii = v / 24 * sinL * math.pow(cosL, 3) * (5 - tanL * tanL + 9 * eta2)
    val iiia = v / 720 * sinL * math.pow(cosL, 5) *
      (61 - 58 * tanL * tanL + math.pow(tanL, 4))
    val iv = v * cosL
    val vt = v / 6 * math.pow(cosL, 3) * (v / rho - tanL * tanL)
    val vi = v / 120 * math.pow(cosL, 5) *
      (5 - 18 * tanL * tanL + math.pow(tanL, 4) + 14 * eta2 -
        58 * tanL * tanL * eta2)
    val dL = lon - tm.lon0
    val nOut = i + ii * dL * dL + iii * math.pow(dL, 4) + iiia * math.pow(dL, 6)
    val eOut = tm.e0 + iv * dL + vt * math.pow(dL, 3) + vi * math.pow(dL, 5)
    (eOut, nOut)
  }

  /** TM inverse: (E, N) -> geodetic (lat, lon in radians, on tm's datum). */
  def tmInverse(tm: Tm, e: Double, nCoord: Double): (Double, Double) = {
    val e2 = tm.ell.e2
    var latP = (nCoord - tm.n0) / (tm.ell.a * tm.f0) + tm.lat0
    var m = arc(tm, latP)
    var iter = 0
    while (math.abs(nCoord - tm.n0 - m) >= 1e-11 && iter < 20) {
      latP = latP + (nCoord - tm.n0 - m) / (tm.ell.a * tm.f0)
      m = arc(tm, latP)
      iter += 1
    }
    val sinL = math.sin(latP)
    val tanL = math.tan(latP)
    val secL = 1.0 / math.cos(latP)
    val v = tm.ell.a * tm.f0 / math.sqrt(1 - e2 * sinL * sinL)
    val rho = tm.ell.a * tm.f0 * (1 - e2) * math.pow(1 - e2 * sinL * sinL, -1.5)
    val eta2 = v / rho - 1
    val vii = tanL / (2 * rho * v)
    val viii = tanL / (24 * rho * math.pow(v, 3)) *
      (5 + 3 * tanL * tanL + eta2 - 9 * tanL * tanL * eta2)
    val ix = tanL / (720 * rho * math.pow(v, 5)) *
      (61 + 90 * tanL * tanL + 45 * math.pow(tanL, 4))
    val x = secL / v
    val xi = secL / (6 * math.pow(v, 3)) * (v / rho + 2 * tanL * tanL)
    val xii = secL / (120 * math.pow(v, 5)) *
      (5 + 28 * tanL * tanL + 24 * math.pow(tanL, 4))
    val xiia = secL / (5040 * math.pow(v, 7)) *
      (61 + 662 * tanL * tanL + 1320 * math.pow(tanL, 4) +
        720 * math.pow(tanL, 6))
    val de = e - tm.e0
    val lat = latP - vii * de * de + viii * math.pow(de, 4) - ix * math.pow(de, 6)
    val lon = tm.lon0 + x * de - xi * math.pow(de, 3) + xii * math.pow(de, 5) -
      xiia * math.pow(de, 7)
    (lat, lon)
  }

  /** Geodetic -> ECEF on the given ellipsoid (h = 0). */
  private def toEcef(ell: Ellipsoid, lat: Double, lon: Double)
      : (Double, Double, Double) = {
    val sinL = math.sin(lat); val cosL = math.cos(lat)
    val v = ell.a / math.sqrt(1 - ell.e2 * sinL * sinL)
    (v * cosL * math.cos(lon), v * cosL * math.sin(lon),
      (v * (1 - ell.e2)) * sinL)
  }

  /** ECEF -> geodetic (iterative; h discarded). */
  private def fromEcef(ell: Ellipsoid, x: Double, y: Double, z: Double)
      : (Double, Double) = {
    val lon = math.atan2(y, x)
    val p = math.hypot(x, y)
    var lat = math.atan2(z, p * (1 - ell.e2))
    var i = 0
    while (i < 10) {
      val sinL = math.sin(lat)
      val v = ell.a / math.sqrt(1 - ell.e2 * sinL * sinL)
      lat = math.atan2(z + ell.e2 * v * sinL, p)
      i += 1
    }
    (lat, lon)
  }

  /** Apply a Helmert transform (sign = +1 applies, -1 reverses). */
  private def helmert(d: Datum, sign: Int, x: Double, y: Double, z: Double)
      : (Double, Double, Double) = {
    val s = sign * d.s * 1e-6
    val rx = sign * math.toRadians(d.rx / 3600.0)
    val ry = sign * math.toRadians(d.ry / 3600.0)
    val rz = sign * math.toRadians(d.rz / 3600.0)
    val tx = sign * d.tx; val ty = sign * d.ty; val tz = sign * d.tz
    (tx + (1 + s) * x - rz * y + ry * z,
      ty + rz * x + (1 + s) * y - rx * z,
      tz - ry * x + rx * y + (1 + s) * z)
  }

  /** Geodetic on datum A (ellipsoid eA) -> geodetic on datum B (eB). */
  private def shiftDatum(eA: Ellipsoid, dA: Datum, eB: Ellipsoid, dB: Datum,
      lat: Double, lon: Double): (Double, Double) = {
    if (dA == dB) return (lat, lon)
    val (x0, y0, z0) = toEcef(eA, lat, lon)
    val (x1, y1, z1) = helmert(dA, +1, x0, y0, z0) // A -> WGS84
    val (x2, y2, z2) = helmert(dB, -1, x1, y1, z1) // WGS84 -> B
    fromEcef(eB, x2, y2, z2)
  }

  /** ETRS89/WGS84-based National Grid TM — the projection an OSTN-style
    * lattice shifts FROM: the BNG parameters applied on the GRS80/WGS84
    * ellipsoid with zero datum (OS transformation guide §6). */
  val etrsBngTm: Tm = Tm(wgs84, 0.9996012717, math.toRadians(49.0),
    math.toRadians(-2.0), 400000.0, -100000.0, wgs84Datum)

  /** src CRS -> ETRS-projected BNG (the frame an OSTN-style lattice
    * shifts FROM) — exposed so callers can lattice-bounds-check the
    * position before applying the shift. */
  def transformToEtrsBng(src: Crs, x: Double, y: Double): (Double, Double) = {
    val (latS, lonS) =
      if (src.tm == null) (math.toRadians(y), math.toRadians(x))
      else tmInverse(src.tm, x, y)
    val (latE, lonE) = shiftDatum(src.ell, src.datum, wgs84, wgs84Datum,
      latS, lonS)
    tmForward(etrsBngTm, latE, lonE)
  }

  /** Grid-corrected transform src CRS -> OSGB36 National Grid: src ->
    * ETRS89 geodetic -> ETRS-projected BNG -> [[ShiftGrid]] forward.
    * With a real OSTN lattice this is the published ~0.1 m path; the
    * engine ships the mechanism, not the licensed lattice. */
  def transformToOsgbGrid(src: Crs, grid: ShiftGrid, x: Double, y: Double)
      : (Double, Double) = {
    val (e, n) = transformToEtrsBng(src, x, y)
    grid.forward(e, n)
  }

  /** Grid-corrected inverse: OSGB36 E/N -> dst CRS (iterative
    * [[ShiftGrid.inverse]], then ETRS-BNG inverse TM, then datum leg). */
  def transformFromOsgbGrid(grid: ShiftGrid, dst: Crs, e: Double, n: Double)
      : (Double, Double) = {
    val (ee, en) = grid.inverse(e, n)
    val (latE, lonE) = tmInverse(etrsBngTm, ee, en)
    val (latD, lonD) = shiftDatum(wgs84, wgs84Datum, dst.ell, dst.datum,
      latE, lonE)
    if (dst.tm == null) (math.toDegrees(lonD), math.toDegrees(latD))
    else tmForward(dst.tm, latD, lonD)
  }

  /** Full CRS-to-CRS point transform (map units in, map units out;
    * geographic CRS uses degrees lon=x lat=y like PROJ axis order for
    * EPSG:4326 in rasterio). */
  def transform(src: Crs, dst: Crs, x: Double, y: Double): (Double, Double) = {
    // to geodetic on src datum
    val (latS, lonS) =
      if (src.tm == null) (math.toRadians(y), math.toRadians(x))
      else tmInverse(src.tm, x, y)
    val (latD, lonD) = shiftDatum(src.ell, src.datum, dst.ell, dst.datum,
      latS, lonS)
    if (dst.tm == null) (math.toDegrees(lonD), math.toDegrees(latD))
    else tmForward(dst.tm, latD, lonD)
  }
}
