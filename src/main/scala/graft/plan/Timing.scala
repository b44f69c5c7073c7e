package graft.plan

/** H13 — perf_counter wrapper + median-of-N
  * (ref blob_dfs/blob-dfs_bench.py:90-99, REPETITIONS=3).
  */
object Timing {

  def timeOnce(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of empty sequence")
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Run `f` `reps` times, return the median wall-clock seconds. */
  def medianOf(reps: Int)(f: => Unit): Double = median((1 to reps).map(_ => timeOnce(f)))
}
