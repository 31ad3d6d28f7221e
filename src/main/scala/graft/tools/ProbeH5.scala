package graft.tools

/** Dev probe: dump the structure of an HDF5/netCDF-4 file via the
  * library reader (not product code). */
object ProbeH5 {
  def main(args: Array[String]): Unit = {
    for (path <- args) {
      println(s"== $path")
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      val f = graft.io.Hdf5.open(bytes)
      println(s"root attrs: ${f.attrs.toSeq.sortBy(_._1).mkString("; ")}")
      for (d <- f.datasets) {
        println(s"  ds ${d.name} ${d.dtype} n=${d.n} dims=${d.dims} " +
          s"chunks=${d.chunks.length} cdims=${d.chunkDims} filters=${d.filters}")
        println(s"    attrs: ${d.attrs.toSeq.sortBy(_._1).take(6).mkString("; ")}")
        if (d.dtype.head == 'f' || d.dtype.head == 'i' || d.dtype.head == 'u') {
          val col = graft.io.Hdf5.column(bytes, d)
          val fin = col.filter(v => !v.isNaN)
          println(f"    first=${col.take(3).mkString(",")} mean=${if (fin.nonEmpty) fin.sum / fin.length else 0.0}%.4f")
        }
      }
    }
  }
}
