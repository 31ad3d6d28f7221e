package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Compatibility sweep over the reference's REAL deployment configs:
  * every global-attributes file and YAML config in stglib's test data
  * (the only non-LFS real files there) must parse — key variety,
  * indentation, inline comments, quoted strings, timestamp lists,
  * 2-D trim specs. The merge path is exercised on the Aquadopp pair
  * with spot-checked values. */
class RealConfigSweepSpec extends AnyFunSuite {

  private val dataDir = new java.io.File("/root/reference/stglib/tests/data")
  private def real(f: java.io.File): Boolean = {
    if (!f.isFile || f.length() < 10) return false
    val head = new Array[Byte](7)
    val in = new java.io.FileInputStream(f)
    try { in.read(head) } finally in.close()
    new String(head, "US-ASCII") != "version" // git-lfs pointer
  }

  test("every real glob_att file in the reference test data parses") {
    assume(dataDir.isDirectory, "reference test data not present")
    val gatts = dataDir.listFiles.filter(f =>
      (f.getName.startsWith("glob_att") || f.getName.startsWith("gatts") ||
        f.getName.startsWith("sg_glob_att")) &&
      f.getName.endsWith(".txt") && real(f))
    assert(gatts.length >= 10, s"only ${gatts.length} real gatts files found")
    for (f <- gatts) {
      val m = Config.readGlobalAttsFile(f.getAbsolutePath)
      assert(m.attrs.size >= 2, s"${f.getName}: only ${m.attrs.size} attrs")
      assert(Seq("MOORING", "title", "EXPERIMENT", "WATER_DEPTH", "latitude")
          .exists(m.has),
        s"${f.getName}: none of the universal keys present")
    }
  }

  test("every real YAML config in the reference test data parses") {
    assume(dataDir.isDirectory, "reference test data not present")
    val yamls = dataDir.listFiles.filter(f =>
      f.getName.endsWith(".yaml") && real(f))
    assert(yamls.length >= 10, s"only ${yamls.length} real yaml files found")
    for (f <- yamls) {
      val m = Config.readYamlFile(f.getAbsolutePath)
      assert(m.attrs.nonEmpty, s"${f.getName}: empty parse")
      assert(m.has("basefile") || m.has("filename") || m.has("instmeta"),
        s"${f.getName}: keys ${m.attrs.keys.take(5)}")
    }
  }

  test("BOM/CRLF-mangled configs parse identically to their clean forms") {
    // Windows-edited deployment files routinely carry a UTF-8 BOM and
    // CRLF endings; a BOM glued to the first key silently drops it
    // ("<BOM>MOORING" never matches) — regression-gate the strip
    def tmp(name: String, bytes: Array[Byte]): String = {
      val f = java.io.File.createTempFile(name, null)
      f.deleteOnExit()
      java.nio.file.Files.write(f.toPath, bytes)
      f.getAbsolutePath
    }
    val bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    val gatts = "MOORING; 1076a\r\nWATER_DEPTH; 12.5\r\ntitle; 25 °C µS/cm\r\n"
    val g = Config.readGlobalAttsFile(
      tmp("gatts_bom", bom ++ gatts.getBytes("UTF-8")))
    assert(g.str("MOORING").contains("1076a"), s"got ${g.attrs}")
    assert(g.dbl("WATER_DEPTH").contains(12.5))
    // degree/µ survive the decode (a US-ASCII read yields U+FFFD) — the
    // same readTextFile backs the CLI's instrument-CSV header renames
    assert(g.str("title").contains("25 °C µS/cm"), s"got ${g.attrs}")
    // Latin-1 fallback: the same title written as ISO-8859-1 bytes
    val g2 = Config.readGlobalAttsFile(
      tmp("gatts_latin1", "title; 25 °C µS/cm\n".getBytes("ISO-8859-1")))
    assert(g2.str("title").contains("25 °C µS/cm"), s"got ${g2.attrs}")
    val yaml = "basefile: 1121AQ04\r\ninitial_instrument_height: 0.125\r\n"
    val y = Config.readYamlFile(tmp("yaml_bom", bom ++ yaml.getBytes("UTF-8")))
    assert(y.str("basefile").contains("1121AQ04"), s"got ${y.attrs}")
    assert(y.dbl("initial_instrument_height").contains(0.125))
  }

  test("the real Aquadopp deployment pair merges with the documented values") {
    val g = new java.io.File(dataDir, "glob_att1121a_msl_aqd.txt")
    val y = new java.io.File(dataDir, "aqd1121A_config.yaml")
    assume(g.isFile && real(g) && y.isFile && real(y))
    val (meta, _) = Config.merge(
      Config.readGlobalAttsFile(g.getAbsolutePath),
      Config.readYamlFile(y.getAbsolutePath))
    assert(meta.str("MOORING").contains("1121A"))
    assert(meta.dbl("WATER_DEPTH").contains(2.1))
    assert(meta.dbl("magnetic_variation").contains(-14.79))
    assert(meta.str("basefile").contains("1121AQ04"))
    assert(meta.str("orientation").contains("UP"))
    assert(meta.dbl("initial_instrument_height").contains(0.125))
    // timestamp bad_ens list and the 2-D trim spec survive as values
    assert(meta.strSeq("u_1205_bad_ens").exists(_.length == 14),
      s"u_1205_bad_ens = ${meta.attrs.get("u_1205_bad_ens")}")
    assert(meta.strSeq("u_1205_mask").exists(_ == Seq("v_1206", "w_1204")))
    assert(meta.int("u_1205_fliers").contains(1))
    // deployment window parses as dates the clip step can use
    assert(meta.str("Deployment_date").contains("2018-11-12 16:00"))
  }
}
