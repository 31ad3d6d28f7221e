package graft.tools
import graft.kernels.Welch
object WelchX {
  def main(args: Array[String]): Unit = {
    // deterministic LCG signal reproducible in numpy
    var s = 123456789L
    def nxt(): Double = { s = (s * 6364136223846793005L + 1442695040888963407L); (s >>> 11).toDouble / (1L << 53).toDouble }
    val x = Array.tabulate(2048)(i => math.sin(2*math.Pi*0.08*i) + 0.3*nxt())
    val (f, p) = Welch.psd(x, fs = 1.0, nperseg = 256)
    println(f.take(10).mkString(","))
    println(p.map(v => f"$v%.12e").mkString(","))
  }
}
