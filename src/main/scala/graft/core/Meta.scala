package graft.core

/**
 * Configuration map driving plan construction — the Spark-side equivalent of
 * stglib's merged global-attributes + instrument-YAML dict, which *is* the
 * logical plan of a run (reference: stglib/core/runcmd.py:8-27,
 * stglib/core/utils.py:831-853). QA/QC operators fire iff their key is
 * present (stglib/core/qaqc.py:63-73 pattern `f"{var}_min" in ds.attrs`).
 *
 * Values are plain Scala types (String, Double, Int, Boolean, Seq[_]).
 */
final case class Meta(attrs: Map[String, Any]) {
  def has(key: String): Boolean = attrs.contains(key)

  def str(key: String): Option[String] = attrs.get(key).map(_.toString)

  def dbl(key: String): Option[Double] = attrs.get(key).map {
    case d: Double => d
    case i: Int    => i.toDouble
    case l: Long   => l.toDouble
    case f: Float  => f.toDouble
    case s: String => s.toDouble
    case other     => other.toString.toDouble
  }

  def int(key: String): Option[Int] = dbl(key).map(_.toInt)

  def bool(key: String): Option[Boolean] = attrs.get(key).map {
    case b: Boolean => b
    case s: String  => s.equalsIgnoreCase("true") || s == "1"
    case i: Int     => i != 0
    case other      => other.toString.toBoolean
  }

  def seq(key: String): Option[Seq[Any]] = attrs.get(key).collect {
    case s: Seq[_]   => s
    case a: Array[_] => a.toSeq
    // attrs round-tripped through the string-valued sidecar
    // (Sink.writeParquet stringifies, readSidecar reads back): recover the
    // exact Scala-collection toString shapes ("List(a, b)", "Vector(...)")
    // as element strings, so has()-gated Seq consumers (Clip
    // good_ens/good_dates) keep working on re-opened datasets instead of
    // dying in dblSeq(...).get. Deliberately NARROW — a bracketed scalar
    // string like "[site A, 2024]" must stay a scalar, so no "[...]" rule,
    // and elements cannot contain ", " (true of the numeric/date seqs the
    // pipeline stores; richer attrs belong in typed config, not toString).
    case s: String if s.matches("""(List|Vector|ArrayBuffer|Seq)\(.*\)""") =>
      s.substring(s.indexOf('(') + 1, s.length - 1).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
  }

  def dblSeq(key: String): Option[Seq[Double]] =
    seq(key).map(_.map {
      case d: Double => d
      case i: Int    => i.toDouble
      case l: Long   => l.toDouble
      case s: String => s.toDouble
      case o         => o.toString.toDouble
    })

  def strSeq(key: String): Option[Seq[String]] = seq(key).map(_.map(_.toString))

  def +(kv: (String, Any)): Meta = Meta(attrs + kv)
  def ++(other: Map[String, Any]): Meta = Meta(attrs ++ other)
}

object Meta {
  val empty: Meta = Meta(Map.empty[String, Any])
  def apply(kvs: (String, Any)*): Meta = Meta(kvs.toMap)
}
