package graft.core

import java.io.{DataInputStream, DataOutputStream}
import java.nio.file.{Files, Paths}

/** OSTN/NTv2-style datum grid shift — the mechanism behind rasterio/PROJ's
  * grid-corrected `reproject` (Raster.py:695-733) that the plain 7-param
  * Helmert in [[Proj]] approximates to ~5 m over the UK.
  *
  * The engine implements the full machinery: a regular shift lattice over
  * the projected plane, bilinear interpolation of (dE, dN), the iterative
  * inverse, and a binary grid file format (NTv2-like single-subgrid
  * layout) so ANY published grid can be converted and loaded. The real
  * OSTN15 lattice itself is licensed Crown data and is NOT bundled — with
  * it installed, UK accuracy is the published ~0.1 m class; without it,
  * [[Proj]]'s Helmert bound applies (documented in the r17 scaladoc).
  *
  * Geometry: node (i, j) sits at (e0 + j*cs, n0 + i*cs), row-major
  * south-to-north like OSTN's kilometre-grid records. Queries outside the
  * lattice raise — a silent clamp would fabricate coordinates. */
final case class ShiftGrid(e0: Double, n0: Double, cs: Double,
    ncols: Int, nrows: Int, dE: Array[Double], dN: Array[Double]) {
  require(dE.length == ncols * nrows && dN.length == ncols * nrows,
    s"shift arrays must be ncols*nrows = ${ncols * nrows}")

  /** True when projected (e, n) falls inside the lattice. */
  def contains(e: Double, n: Double): Boolean = {
    val fc = (e - e0) / cs
    val fr = (n - n0) / cs
    fc >= 0 && fc <= ncols - 1 && fr >= 0 && fr <= nrows - 1
  }

  /** Bilinear (dE, dN) at projected (e, n). Exact for lattice-affine
    * fields (the property the spec gates on). */
  def shiftAt(e: Double, n: Double): (Double, Double) = {
    val fc = (e - e0) / cs
    val fr = (n - n0) / cs
    require(fc >= 0 && fc <= ncols - 1 && fr >= 0 && fr <= nrows - 1,
      f"point ($e%.1f, $n%.1f) outside shift grid")
    val c0 = math.min(fc.toInt, ncols - 2)
    val r0 = math.min(fr.toInt, nrows - 2)
    val dc = fc - c0
    val dr = fr - r0
    def bl(a: Array[Double]): Double = {
      val i00 = a(r0 * ncols + c0); val i01 = a(r0 * ncols + c0 + 1)
      val i10 = a((r0 + 1) * ncols + c0); val i11 = a((r0 + 1) * ncols + c0 + 1)
      (1 - dr) * ((1 - dc) * i00 + dc * i01) + dr * ((1 - dc) * i10 + dc * i11)
    }
    (bl(dE), bl(dN))
  }

  /** Forward shift: source-frame (e, n) -> target-frame coordinates. */
  def forward(e: Double, n: Double): (Double, Double) = {
    val (de, dn) = shiftAt(e, n)
    (e + de, n + dn)
  }

  /** Inverse shift by fixed-point iteration (the standard NTv2 inverse:
    * shifts are smooth and ~1e-5 of the cell size per metre, so the map
    * is a contraction; 4 rounds reach sub-0.1 mm on real-world grids). */
  def inverse(e: Double, n: Double, iters: Int = 6): (Double, Double) = {
    var se = e; var sn = n
    var k = 0
    while (k < iters) {
      val (de, dn) = shiftAt(se, sn)
      se = e - de; sn = n - dn
      k += 1
    }
    (se, sn)
  }
}

object ShiftGrid {

  private val Magic = 0x4753484eL // "GSHN"

  /** Write the grid in the engine's binary layout (NTv2-like: one header
    * record, then row-major float64 (dE, dN) node records). */
  def write(path: String, g: ShiftGrid): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path))))
    try {
      out.writeLong(Magic)
      out.writeDouble(g.e0); out.writeDouble(g.n0); out.writeDouble(g.cs)
      out.writeInt(g.ncols); out.writeInt(g.nrows)
      var i = 0
      while (i < g.dE.length) { out.writeDouble(g.dE(i)); out.writeDouble(g.dN(i)); i += 1 }
    } finally out.close()
  }

  def read(path: String): ShiftGrid = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(path))))
    try {
      require(in.readLong() == Magic, s"$path: not a shift-grid file")
      val e0 = in.readDouble(); val n0 = in.readDouble(); val cs = in.readDouble()
      val ncols = in.readInt(); val nrows = in.readInt()
      val n = ncols * nrows
      val dE = new Array[Double](n); val dN = new Array[Double](n)
      var i = 0
      while (i < n) { dE(i) = in.readDouble(); dN(i) = in.readDouble(); i += 1 }
      ShiftGrid(e0, n0, cs, ncols, nrows, dE, dN)
    } finally in.close()
  }
}
