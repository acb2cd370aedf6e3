package graft.bench

/** Shared helpers for the scale-measurement mains — one copy of the
  * timing wrapper and the recursive delete, so a future fix (symlink
  * handling, timing method) lands everywhere at once. */
private[bench] object BenchUtil {

  /** Wall seconds of `f`. */
  def secs(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Recursive local delete (quiet on absence). */
  def rmrf(p: String): Unit = {
    def rec(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rec)
      f.delete(): Unit
    }
    rec(new java.io.File(p))
  }
}
