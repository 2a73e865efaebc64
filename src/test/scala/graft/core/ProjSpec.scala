package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ProjSpec extends AnyFunSuite {

  private def dms(d: Int, m: Int, s: Double): Double =
    math.toRadians(d + m / 60.0 + s / 3600.0)

  test("OSGB worked example: TM forward matches the published E/N") {
    // OS "A guide to coordinate systems in Great Britain", worked example:
    // lat 52 39' 27.2531" N, lon 1 43' 4.5177" E (Airy/OSGB36)
    //  -> E 651409.903, N 313177.270
    val tm = Proj.fromEpsg(27700).tm
    val (e, n) = Proj.tmForward(tm, dms(52, 39, 27.2531), dms(1, 43, 4.5177))
    assert(math.abs(e - 651409.903) < 0.005, s"E=$e")
    assert(math.abs(n - 313177.270) < 0.005, s"N=$n")
  }

  test("TM inverse(forward) is identity to <1e-9 rad across the grid") {
    val tm = Proj.fromEpsg(27700).tm
    for (latDeg <- 50 to 59; lonDeg <- -6 to 1) {
      val lat = math.toRadians(latDeg)
      val lon = math.toRadians(lonDeg.toDouble)
      val (e, n) = Proj.tmForward(tm, lat, lon)
      val (lat2, lon2) = Proj.tmInverse(tm, e, n)
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $latDeg,$lonDeg")
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $latDeg,$lonDeg")
    }
  }

  test("UTM: central meridian maps to E=500000; zones resolve correctly") {
    val utm31 = Proj.fromEpsg(32631) // lon0 = 3E
    val (e, _) = Proj.tmForward(utm31.tm, math.toRadians(45), math.toRadians(3))
    assert(math.abs(e - 500000.0) < 1e-6)
    assert(math.abs(math.toDegrees(Proj.fromEpsg(32630).tm.lon0) + 3.0) < 1e-12)
    assert(Proj.fromEpsg(32730).tm.n0 == 10000000.0) // south false northing
  }

  test("datum shift: 27700 -> 4326 lands within 5m-class accuracy") {
    // the worked-example point: OSGB36 geodetic 52.6575697N 1.7179216E;
    // its WGS84 position differs by the national datum shift (~ -0.0005
    // lat, +0.0015 lon in East Anglia; 7-param Helmert is 5m-class)
    val bng = Proj.fromEpsg(27700)
    val geo = Proj.fromEpsg(4326)
    val (lon, lat) = Proj.transform(bng, geo, 651409.903, 313177.270)
    assert(math.abs(lat - 52.6575) < 0.01, s"lat=$lat")
    assert(math.abs(lon - 1.7179) < 0.01, s"lon=$lon")
    // round trip through the datum shift and back
    val (e2, n2) = Proj.transform(geo, bng, lon, lat)
    assert(math.abs(e2 - 651409.903) < 0.01, s"E=$e2")
    assert(math.abs(n2 - 313177.270) < 0.01, s"N=$n2")
  }

  test("CRS-to-CRS: BNG -> UTM30N is metrically sane") {
    val bng = Proj.fromEpsg(27700)
    val utm = Proj.fromEpsg(32630)
    // two points 1000 m apart in BNG stay ~1000 m apart in UTM (<1 m skew)
    val (x1, y1) = Proj.transform(bng, utm, 340760, 554667)
    val (x2, y2) = Proj.transform(bng, utm, 341760, 554667)
    val d = math.hypot(x2 - x1, y2 - y1)
    assert(math.abs(d - 1000.0) < 1.5, s"d=$d")
  }
}
