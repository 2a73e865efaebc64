package graft

import graft.core.Proj
import graft.core.Proj.{Crs, Tm}

/** DuckDB-SQL generator replicating `core/Proj.transform` for the r17
  * reproject oracle — the same pattern as the d5 SimHash oracle (full
  * kernel recomputation in SQL), applied to the projection engine.
  *
  * Determinism strategy:
  *  - every DERIVED constant (radians conversions, a*f0 products, signed
  *    Helmert parameters, eccentricities) is interpolated as the exact
  *    double the Scala engine computes — `Double.toString` is the
  *    shortest round-trip repr and parses back bit-identically (literals
  *    are forced to DOUBLE with an `e0` suffix so DuckDB never routes
  *    them through DECIMAL);
  *  - the tmInverse footpoint loop is unrolled to the Scala cap of 20
  *    iterations WITH the same `|N - n0 - m| >= 1e-11` guard, so both
  *    engines execute the identical update sequence (measured: the
  *    tolerance sits below double ULP at N ~ 6e6 m, so the loop always
  *    runs all 20 iterations in both engines);
  *  - fromEcef runs its fixed 10 iterations verbatim;
  *  - remaining divergence is libm ULP (sin/cos/pow/atan2 may differ by
  *    ~1 ulp between the JVM and DuckDB), which perturbs source
  *    coordinates by ~1e-9 m; the r17 fixture's nearest-pixel margins
  *    are >= 1e-5 px = 5.6e-5 m (measured over all 30,954 target
  *    pixels), five orders above the perturbation. */
private[graft] object ProjSql {

  /** Exact double literal: shortest round-trip repr, forced DOUBLE. */
  private def L(d: Double): String = {
    val s = d.toString
    if (s.contains("e") || s.contains("E")) s
    else if (s.contains(".")) s + "e0"
    else s + ".0e0"
  }

  /** Meridional arc expression over a latitude COLUMN (mirrors Proj.arc
    * with the n-series coefficients precomputed as exact literals). */
  private def arcExpr(tm: Tm, lat: String): String = {
    val n = (tm.ell.a - tm.ell.b) / (tm.ell.a + tm.ell.b)
    val n2 = n * n; val n3 = n2 * n
    val bF0 = tm.ell.b * tm.f0
    val c1 = 1 + n + 1.25 * n2 + 1.25 * n3
    val c2 = 3 * n + 3 * n2 + 21.0 / 8 * n3
    val c3 = 15.0 / 8 * (n2 + n3)
    val c4 = 35.0 / 24 * n3
    val lat0 = L(tm.lat0)
    s"(${L(bF0)} * (${L(c1)} * ($lat - $lat0)" +
      s" - ${L(c2)} * sin($lat - $lat0) * cos($lat + $lat0)" +
      s" + ${L(c3)} * sin(2*($lat - $lat0)) * cos(2*($lat + $lat0))" +
      s" - ${L(c4)} * sin(3*($lat - $lat0)) * cos(3*($lat + $lat0))))"
  }

  /** CTE chain transforming column pair (eCol, nCol) of `inTable` from
    * projected CRS `src` to projected CRS `dst` (both TM — the r17 pair).
    * `carry` columns ride along. Returns (cteListSql, outTable); the out
    * table has carry ++ (ox, oy). */
  def transformCtes(pfx: String, inTable: String, carry: Seq[String],
      eCol: String, nCol: String, src: Crs, dst: Crs): (String, String) = {
    require(src.tm != null && dst.tm != null, "TM-to-TM only")
    val ctes = Seq.newBuilder[String]
    val ks = if (carry.isEmpty) "" else carry.mkString(", ") + ", "
    var cur = inTable

    // ---- tmInverse(src.tm): footpoint iteration, 20 guarded rounds ----
    val s = src.tm
    val aF0s = L(s.ell.a * s.f0)
    val n0s = L(s.n0)
    ctes += s"""${pfx}_i0 AS (SELECT $ks$eCol AS te, $nCol AS tn,
      ($nCol - $n0s) / $aF0s + ${L(s.lat0)} AS latP FROM $cur)"""
    ctes += s"""${pfx}_i0m AS (SELECT *, ${arcExpr(s, "latP")} AS m FROM ${pfx}_i0)"""
    cur = s"${pfx}_i0m"
    for (k <- 1 to 20) {
      ctes += s"""${pfx}_i$k AS (SELECT $ks te, tn,
        CASE WHEN abs((tn - $n0s) - m) >= 1e-11
             THEN latP + ((tn - $n0s) - m) / $aF0s ELSE latP END AS latP
        FROM $cur)"""
      ctes += s"""${pfx}_i${k}m AS (SELECT *, ${arcExpr(s, "latP")} AS m FROM ${pfx}_i$k)"""
      cur = s"${pfx}_i${k}m"
    }
    // series terms -> (lat, lon) on src datum
    val e2s = L(s.ell.e2)
    ctes += s"""${pfx}_iv AS (SELECT $ks te, tn, latP,
      sin(latP) AS sl, tan(latP) AS tl, 1.0e0 / cos(latP) AS secl,
      $aF0s / sqrt(1.0e0 - $e2s * sin(latP) * sin(latP)) AS v,
      $aF0s * ${L(1 - s.ell.e2)} * power(1.0e0 - $e2s * sin(latP) * sin(latP), -1.5e0) AS rho
      FROM $cur)"""
    ctes += s"""${pfx}_ig AS (SELECT $ks
      latP - (tl / (2.0e0 * rho * v)) * (te - ${L(s.e0)}) * (te - ${L(s.e0)})
        + (tl / (24.0e0 * rho * power(v, 3.0e0)) * (5.0e0 + 3.0e0 * tl * tl + (v / rho - 1.0e0) - 9.0e0 * tl * tl * (v / rho - 1.0e0))) * power(te - ${L(s.e0)}, 4.0e0)
        - (tl / (720.0e0 * rho * power(v, 5.0e0)) * (61.0e0 + 90.0e0 * tl * tl + 45.0e0 * power(tl, 4.0e0))) * power(te - ${L(s.e0)}, 6.0e0) AS glat,
      ${L(s.lon0)} + (secl / v) * (te - ${L(s.e0)})
        - (secl / (6.0e0 * power(v, 3.0e0)) * (v / rho + 2.0e0 * tl * tl)) * power(te - ${L(s.e0)}, 3.0e0)
        + (secl / (120.0e0 * power(v, 5.0e0)) * (5.0e0 + 28.0e0 * tl * tl + 24.0e0 * power(tl, 4.0e0))) * power(te - ${L(s.e0)}, 5.0e0)
        - (secl / (5040.0e0 * power(v, 7.0e0)) * (61.0e0 + 662.0e0 * tl * tl + 1320.0e0 * power(tl, 4.0e0) + 720.0e0 * power(tl, 6.0e0))) * power(te - ${L(s.e0)}, 7.0e0) AS glon
      FROM ${pfx}_iv)"""
    cur = s"${pfx}_ig"

    // ---- datum shift: toEcef(src.ell) -> Helmert -> fromEcef(dst.ell) ----
    // One of the two Helmert steps is the all-zero WGS84 identity (exact
    // in IEEE); emit only the non-trivial one, sign-resolved in Scala.
    val (helm, sign) =
      if (src.datum != Proj.wgs84Datum) (src.datum, +1) else (dst.datum, -1)
    if (src.datum != dst.datum) {
      val e2a = L(src.ell.e2)
      ctes += s"""${pfx}_ec AS (SELECT $ks glat, glon,
        (${L(src.ell.a)} / sqrt(1.0e0 - $e2a * sin(glat) * sin(glat))) * cos(glat) * cos(glon) AS ex,
        (${L(src.ell.a)} / sqrt(1.0e0 - $e2a * sin(glat) * sin(glat))) * cos(glat) * sin(glon) AS ey,
        ((${L(src.ell.a)} / sqrt(1.0e0 - $e2a * sin(glat) * sin(glat))) * ${L(1 - src.ell.e2)}) * sin(glat) AS ez
        FROM $cur)"""
      val hs = L(sign * helm.s * 1e-6)
      val hrx = L(sign * math.toRadians(helm.rx / 3600.0))
      val hry = L(sign * math.toRadians(helm.ry / 3600.0))
      val hrz = L(sign * math.toRadians(helm.rz / 3600.0))
      val htx = L(sign * helm.tx); val hty = L(sign * helm.ty); val htz = L(sign * helm.tz)
      ctes += s"""${pfx}_hl AS (SELECT $ks
        $htx + (1.0e0 + $hs) * ex - $hrz * ey + $hry * ez AS hx,
        $hty + $hrz * ex + (1.0e0 + $hs) * ey - $hrx * ez AS hy,
        $htz - $hry * ex + $hrx * ey + (1.0e0 + $hs) * ez AS hz
        FROM ${pfx}_ec)"""
      val e2b = L(dst.ell.e2)
      val ab = L(dst.ell.a)
      ctes += s"""${pfx}_f0 AS (SELECT $ks hz,
        atan2(hy, hx) AS glon, sqrt(hx * hx + hy * hy) AS p,
        atan2(hz, sqrt(hx * hx + hy * hy) * ${L(1 - dst.ell.e2)}) AS glat
        FROM ${pfx}_hl)"""
      cur = s"${pfx}_f0"
      for (k <- 1 to 10) {
        ctes += s"""${pfx}_f$k AS (SELECT $ks hz, glon, p,
          atan2(hz + $e2b * ($ab / sqrt(1.0e0 - $e2b * sin(glat) * sin(glat))) * sin(glat), p) AS glat
          FROM $cur)"""
        cur = s"${pfx}_f$k"
      }
    }

    // ---- tmForward(dst.tm) over (glat, glon) ----
    val d = dst.tm
    val e2d = L(d.ell.e2)
    val aF0d = L(d.ell.a * d.f0)
    ctes += s"""${pfx}_w AS (SELECT $ks glon,
      sin(glat) AS sl, cos(glat) AS cl, tan(glat) AS tl,
      $aF0d / sqrt(1.0e0 - $e2d * sin(glat) * sin(glat)) AS v,
      $aF0d * ${L(1 - d.ell.e2)} * power(1.0e0 - $e2d * sin(glat) * sin(glat), -1.5e0) AS rho,
      ${arcExpr(d, "glat")} AS m
      FROM $cur)"""
    val out = s"${pfx}_out"
    ctes += s"""$out AS (SELECT $ks
      ${L(d.e0)} + (v * cl) * (glon - ${L(d.lon0)})
        + (v / 6.0e0 * power(cl, 3.0e0) * (v / rho - tl * tl)) * power(glon - ${L(d.lon0)}, 3.0e0)
        + (v / 120.0e0 * power(cl, 5.0e0) * (5.0e0 - 18.0e0 * tl * tl + power(tl, 4.0e0) + 14.0e0 * (v / rho - 1.0e0) - 58.0e0 * tl * tl * (v / rho - 1.0e0))) * power(glon - ${L(d.lon0)}, 5.0e0) AS ox,
      (m + ${L(d.n0)}) + (v / 2.0e0 * sl * cl) * (glon - ${L(d.lon0)}) * (glon - ${L(d.lon0)})
        + (v / 24.0e0 * sl * power(cl, 3.0e0) * (5.0e0 - tl * tl + 9.0e0 * (v / rho - 1.0e0))) * power(glon - ${L(d.lon0)}, 4.0e0)
        + (v / 720.0e0 * sl * power(cl, 5.0e0) * (61.0e0 - 58.0e0 * tl * tl + power(tl, 4.0e0))) * power(glon - ${L(d.lon0)}, 6.0e0) AS oy
      FROM ${pfx}_w)"""
    (ctes.result().mkString(",\n"), out)
  }
}
