package graft.tools
object SosPrint {
  def main(args: Array[String]): Unit = {
    import graft.kernels.Butterworth
    val sos = Butterworth.lowpass(4, 0.05, 1.0)
    def f(d: Double) = "%.17e".format(d)
    sos.zipWithIndex.foreach { case (s, i) =>
      println(s"SOS$i b0=${f(s.b0)} b1=${f(s.b1)} b2=${f(s.b2)} a1=${f(s.a1)} a2=${f(s.a2)}")
      val g = (s.b0 + s.b1 + s.b2) / (1.0 + s.a1 + s.a2)
      val c2 = s.b2 - s.a2 * g
      val c1 = s.b1 - s.a1 * g
      println(s"SOS$i g=${f(g)} c1=${f(c1)} c2=${f(c2)}")
      assert(f(s.b0).toDouble == s.b0 && f(g).toDouble == g && f(c1).toDouble == c1 && f(c2).toDouble == c2)
    }
    println(s"MARGIN=${Butterworth.marginFor(sos)}")
  }
}
