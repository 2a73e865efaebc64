package graft.core

import graft.corpus.Synth

/** Shared deterministic fixtures (FIXTURES.md). Grid/vector fixtures live in
  * main (graft.corpus.Synth) because SparkEntry queries build on them; this
  * object adds test-only derivations. */
object Fixtures {

  val demRef: GridRef = Synth.demRef
  def demValue(r: Int, c: Int): Double = Synth.demValue(r, c)
  val ca1Features: Seq[Feature] = Synth.ca1Features

  def demGrid: RefKernel.Grid = {
    val data = new Array[Double](demRef.ncols * demRef.nrows)
    for (r <- 0 until demRef.nrows; c <- 0 until demRef.ncols)
      data(r * demRef.ncols + c) = demValue(r, c)
    RefKernel.Grid(demRef, data)
  }

  def gridA: RefKernel.Grid = {
    val ref = Synth.gridARef
    val data = new Array[Double](ref.ncols * ref.nrows)
    for (r <- 0 until ref.nrows; c <- 0 until ref.ncols)
      data(r * ref.ncols + c) = Synth.gridAValue(r, c)
    RefKernel.Grid(ref, data)
  }

  def gridB: RefKernel.Grid = {
    val ref = Synth.gridBRef
    val data = new Array[Double](ref.ncols * ref.nrows)
    for (r <- 0 until ref.nrows; c <- 0 until ref.ncols)
      data(r * ref.ncols + c) = Synth.gridBValue(r, c)
    RefKernel.Grid(ref, data)
  }

  /** FIXTURES.md §4 cross-section fixture grid. */
  val xsecRef = GridRef(ncols = 120, nrows = 60, xll = -5, yll = 0,
    cellsize = 0.5, nodata = -9999)

  /** crossline2 from FIXTURES.md §4 (21 pts, x/y/z). */
  val crossline2: Array[(Double, Double, Double)] = Array(
    (14.0, 10.0, 6.0), (14.3, 10.35, 5.75791), (14.6, 10.7, 5.536864),
    (14.9, 11.05, 5.336864), (15.2, 11.4, 5.15791), (15.5, 11.75, 5.0),
    (15.8, 12.1, 4.863136), (16.1, 12.45, 4.747316), (16.4, 12.8, 4.631497),
    (16.7, 13.15, 4.389407), (17.0, 13.5, 4.0), (17.3, 13.85, 3.463277),
    (17.6, 14.2, 3.0), (17.9, 14.55, 2.83093), (18.2, 14.9, 2.956067),
    (18.5, 15.25, 3.375411), (18.8, 15.6, 3.933552), (19.1, 15.95, 4.475082),
    (19.4, 16.3, 5.0), (19.7, 16.65, 5.508306), (20.0, 17.0, 6.0))
}
