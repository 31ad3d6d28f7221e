package graft.tools

/** Microbenchmark for the DIWASP kernel stages off-Spark (dev tool). */
object ProbeKernel {
  def main(args: Array[String]): Unit = {
    val n = 512
    val f0 = 0.125
    val k = graft.kernels.Diwasp.wavenumber(2 * math.Pi * f0, 10.0)
    val aP = 0.5 * math.cosh(k * 0.5) / math.cosh(k * 10.0)
    val aU = 0.5 * 2 * math.Pi * f0 * math.cosh(k * 1.0) / math.sinh(k * 10.0)
    val dirR = math.toRadians(30.0)
    val p = Array.tabulate(n)(i => aP * math.cos(2 * math.Pi * f0 * i) + (i * 7919.0 % 97.0) / 5000.0)
    val u = Array.tabulate(n)(i => aU * math.cos(dirR) * math.cos(2 * math.Pi * f0 * i) + (i * 104729.0 % 89.0) / 5000.0)
    val v = Array.tabulate(n)(i => aU * math.sin(dirR) * math.cos(2 * math.Pi * f0 * i) + (i * 15485863.0 % 83.0) / 5000.0)
    val layout = Array(Array(0.0, 0.0, 0.0), Array(0.0, 0.0, 0.0), Array(0.5, 1.0, 1.0))
    def run(method: String, miter: Int): Double = {
      val t0 = System.nanoTime()
      graft.kernels.Diwasp.dirspec(Array(p, u, v), Array("pres", "velx", "vely"),
        layout, 10.0, 1.0, 256, 90, method, miter, 0.05, 0.45)
      (System.nanoTime() - t0) / 1e6
    }
    // warmup
    (1 to 3).foreach { _ => run("DFTM", 0); run("IMLM", 50) }
    val reps = 10
    val dftm = (1 to reps).map(_ => run("DFTM", 0))
    val imlm = (1 to reps).map(_ => run("IMLM", 50))
    println(f"[probe] dftm per-burst  min=${dftm.min}%8.2f ms  median=${dftm.sorted.apply(reps / 2)}%8.2f ms")
    println(f"[probe] imlm per-burst  min=${imlm.min}%8.2f ms  median=${imlm.sorted.apply(reps / 2)}%8.2f ms")
  }
}
