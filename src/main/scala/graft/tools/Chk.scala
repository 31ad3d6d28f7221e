package graft.tools
object Chk {
  def main(args: Array[String]): Unit = {
    val all = graft.queries.Registry.all
    println(s"queries=${all.size} distinct=${all.map(_.name).distinct.size} oracles=${all.count(_.oracle.isDefined)}")
  }
}
