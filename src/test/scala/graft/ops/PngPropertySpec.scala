package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based PNG round-trip: any pixel content, any dims, both color
  * types, every per-row filter assignment — decode(encode(px)) == px. */
object PngPropertySpec extends Properties("Png") {

  private val dims = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 16)
    ch <- Gen.oneOf(3, 4)
  } yield (w, h, ch)

  property("roundTrip") = Prop.forAll(dims, Gen.long) { case ((w, h, ch), seed) =>
    val rnd = new scala.util.Random(seed)
    val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
    val filterSeed = rnd.nextInt(5)
    val enc = Png.encode(w, h, ch, px, y => (y + filterSeed) % 5)
    val (gw, gh, gc, got) = Png.decode(enc)
    gw == w && gh == h && gc == ch && java.util.Arrays.equals(got, px)
  }

  property("corruptionNeverHangsOrOOMs") = Prop.forAll(
    Gen.choose(0L, Long.MaxValue), Gen.choose(0, 200)) { (seed, flips) =>
    val rnd = new scala.util.Random(seed)
    val px = Array.fill(6 * 4 * 3)(rnd.nextInt(256).toByte)
    val enc = Png.encode(6, 4, 3, px)
    for (_ <- 0 until flips)
      enc(rnd.nextInt(enc.length)) = rnd.nextInt(256).toByte
    // decode must either succeed or throw a controlled exception —
    // never hang, never a giant allocation (OutOfMemoryError would fail)
    try { Png.decode(enc); true }
    catch { case _: IllegalArgumentException => true }
  }
}
