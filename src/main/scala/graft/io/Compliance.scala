package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Output compliance validation (SURVEY §2.2: the reference runs the IOOS
 * compliance-checker over every written file, stglib/core/utils.py:44-70).
 * Validates the engine's CF-style contract on an output table: a time
 * coordinate exists, is non-null and strictly increasing per series; data
 * variables carry units + standard_name metadata; coordinate columns have
 * no missing values.
 *
 * Runs as aggregations over the table (no collect of data), so it scales
 * with the output like any other query.
 */
object Compliance {

  final case class Violation(rule: String, detail: String)

  def check(df: DataFrame, timeCol: String = "time",
            coordCols: Seq[String] = Seq("time"),
            seriesCols: Seq[String] = Nil): Seq[Violation] = {
    val out = scala.collection.mutable.ArrayBuffer[Violation]()

    if (!df.columns.contains(timeCol))
      out += Violation("time-exists", s"missing time coordinate '$timeCol'")
    else {
      val nulls = df.filter(col(timeCol).isNull).limit(1).count()
      if (nulls > 0) out += Violation("coord-no-fill", s"$timeCol contains nulls")
      // a DataFrame has no inherent row order, so "strictly increasing"
      // reduces to per-series time uniqueness (the precondition the
      // reference enforces with drop_duplicates before reindexing)
      val groupCols = (seriesCols :+ timeCol).map(col)
      val dupes = df.groupBy(groupCols: _*).count()
        .filter(col("count") > 1).limit(1).count()
      if (dupes > 0)
        out += Violation("time-monotone",
          s"duplicate $timeCol values within a series")
    }

    for (c <- coordCols.filter(df.columns.contains) if c != timeCol) {
      val nulls = df.filter(col(c).isNull).limit(1).count()
      if (nulls > 0) out += Violation("coord-no-fill", s"coordinate $c contains nulls")
    }

    for (f <- df.schema.fields
         if !coordCols.contains(f.name) &&
           (f.dataType.typeName == "double" || f.dataType.typeName == "float")) {
      if (!f.metadata.contains("units"))
        out += Violation("var-units", s"${f.name} missing units metadata")
      if (!f.metadata.contains("standard_name"))
        out += Violation("var-standard-name", s"${f.name} missing standard_name")
    }
    out.toSeq
  }
}
