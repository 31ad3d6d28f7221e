package graft.io

import graft.core.Meta
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Output compliance validation (SURVEY §2.2: the reference runs the IOOS
 * compliance-checker over every written file, stglib/core/utils.py:44-70).
 * Validates the engine's CF/ACDD-style contract on an output table:
 *
 *  - a time coordinate exists, is non-null and unique per series;
 *  - coordinate columns have no missing values;
 *  - geophysical (float/double data) variables carry units, standard_name
 *    and coverage_content_type metadata (the IOOS checker's per-variable
 *    ACDD rule; `Readers.withCfMetadata` stamps all three);
 *  - declared valid_min/valid_max ranges actually hold over the data;
 *  - when global attributes are supplied: the required identification set
 *    (Conventions, title, institution) is present, and outputs carrying a
 *    vertical coordinate name their datum (geopotential_datum_name /
 *    vertical_datum / NAVD88_ref — what the reference's set_orientation
 *    records, stglib/aqd/aqdutils.py:228-293).
 *
 * Runs as aggregations over the table (no collect of data), so it scales
 * with the output like any other query. Global-attribute rules evaluate
 * only when `meta` is non-empty (schema-only callers stay supported).
 */
object Compliance {

  /** severity follows the checker's split: "required" failures vs
    * "recommended" (ACDD advisory) warnings. */
  final case class Violation(rule: String, detail: String,
                             severity: String = "required")

  private val VerticalNames = Set("z", "depth", "D_3", "bin_depth", "bindist")

  /** CF canonical-units subset for the standard_names this engine stamps
    * (the full checker resolves the CF standard-name XML table; these are
    * the entries the reference's outputs actually carry, with the common
    * equivalent spellings the table's udunits parser accepts). */
  private val CanonicalUnits: Map[String, Set[String]] = Map(
    "sea_water_temperature" -> Set("degree_C", "degrees_C", "degC", "celsius"),
    "sea_water_pressure" -> Set("dbar", "decibar"),
    "sea_water_practical_salinity" -> Set("1", "PSU", "psu"),
    "sea_water_electrical_conductivity" -> Set("S/m", "mS/cm"),
    "sea_water_turbidity" -> Set("1", "NTU"),
    "mass_concentration_of_oxygen_in_sea_water" -> Set("kg m-3", "mg/L"),
    "sea_surface_wave_significant_height" -> Set("m"),
    "sea_water_speed" -> Set("m s-1", "m/s"),
    "direction_of_sea_water_velocity" -> Set("degree", "degrees"),
    "time" -> Set.empty) // validated structurally via the "since" rule

  def check(df: DataFrame, timeCol: String = "time",
            coordCols: Seq[String] = Seq("time"),
            seriesCols: Seq[String] = Nil,
            meta: Meta = Meta.empty): Seq[Violation] = {
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

    val dataFields = df.schema.fields.filter(f =>
      !coordCols.contains(f.name) &&
        (f.dataType.typeName == "double" || f.dataType.typeName == "float"))

    for (f <- dataFields) {
      if (!f.metadata.contains("units"))
        out += Violation("var-units", s"${f.name} missing units metadata")
      if (!f.metadata.contains("standard_name"))
        out += Violation("var-standard-name", s"${f.name} missing standard_name")
      if (!f.metadata.contains("coverage_content_type"))
        out += Violation("coverage-content-type",
          s"${f.name} missing coverage_content_type")
      // CF §3.1: units must be consistent with the standard_name's
      // canonical units (subset table above — the rule the full checker
      // resolves against the CF standard-name XML)
      if (f.metadata.contains("standard_name") && f.metadata.contains("units")) {
        val sn = f.metadata.getString("standard_name")
        val u = f.metadata.getString("units")
        CanonicalUnits.get(sn).foreach { ok =>
          if (ok.nonEmpty && !ok.contains(u))
            out += Violation("units-canonical",
              s"${f.name}: units '$u' not canonical for standard_name '$sn' " +
                s"(expected one of ${ok.mkString("/")})")
        }
      }
      // CF §2.5.1: _FillValue should lie OUTSIDE the declared valid range —
      // a fill inside the range is indistinguishable from data
      if (f.metadata.contains("_FillValue") &&
          (f.metadata.contains("valid_min") || f.metadata.contains("valid_max"))) {
        def mdl(k: String): Double =
          try f.metadata.getDouble(k)
          catch { case _: ClassCastException => f.metadata.getLong(k).toDouble }
        val fv = mdl("_FillValue")
        val insideMin = !f.metadata.contains("valid_min") || fv >= mdl("valid_min")
        val insideMax = !f.metadata.contains("valid_max") || fv <= mdl("valid_max")
        if (insideMin && insideMax)
          out += Violation("fill-in-range",
            s"${f.name}: _FillValue $fv lies inside [valid_min, valid_max]")
      }
    }

    // CF §4.4: a time coordinate's units must be "<unit> since <epoch>"
    df.schema.fields.find(_.name == timeCol).foreach { tf =>
      if (tf.metadata.contains("units")) {
        val u = tf.metadata.getString("units")
        if (!u.matches("(?i)(seconds|minutes|hours|days)\\s+since\\s+.+"))
          out += Violation("time-units",
            s"$timeCol units '$u' is not '<unit> since <epoch>'")
      }
    }

    // declared valid ranges must hold over the data — one aggregation pass
    // across all range-declaring variables
    val ranged = dataFields.filter(f =>
      f.metadata.contains("valid_min") || f.metadata.contains("valid_max"))
    if (ranged.nonEmpty) {
      val aggs = ranged.flatMap(f => Seq(
        min(col(f.name)).as(s"__mn_${f.name}"), max(col(f.name)).as(s"__mx_${f.name}")))
      val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
      for (f <- ranged) {
        val mn = row.getAs[Any](s"__mn_${f.name}")
        val mx = row.getAs[Any](s"__mx_${f.name}")
        def d(a: Any): Double = a.asInstanceOf[Number].doubleValue()
        // integral JSON metadata values come back as Long, not Double
        def mdl(k: String): Double =
          try f.metadata.getDouble(k)
          catch { case _: ClassCastException => f.metadata.getLong(k).toDouble }
        if (f.metadata.contains("valid_min") && mn != null && d(mn) < mdl("valid_min"))
          out += Violation("valid-range",
            s"${f.name} min ${d(mn)} below valid_min ${mdl("valid_min")}")
        if (f.metadata.contains("valid_max") && mx != null && d(mx) > mdl("valid_max"))
          out += Violation("valid-range",
            s"${f.name} max ${d(mx)} above valid_max ${mdl("valid_max")}")
      }
    }

    if (meta.attrs.nonEmpty) {
      for (k <- Seq("Conventions", "title", "institution") if !meta.has(k))
        out += Violation("global-attr", s"missing required global attribute $k")
      // the Conventions string must actually name a CF version (the
      // checker derives its rule set from it)
      meta.str("Conventions").foreach { c =>
        if (!c.matches(".*CF-\\d+\\.\\d+.*"))
          out += Violation("conventions-version",
            s"Conventions '$c' names no CF-x.y version")
      }
      // ACDD recommended identification/provenance set (reported by the
      // reference's checker run as warnings; one rule here, per attribute)
      for (k <- Seq("summary", "history", "source") if !meta.has(k))
        out += Violation("acdd-recommended",
          s"missing recommended global attribute $k", severity = "recommended")
      val hasVertical = df.columns.exists(VerticalNames.contains)
      val hasDatum = Seq("geopotential_datum_name", "vertical_datum",
        "NAVD88_ref", "NAVD88_elevation_ref",
        "height_above_geopotential_datum").exists(meta.has)
      if (hasVertical && !hasDatum)
        out += Violation("vertical-datum",
          "output has a vertical coordinate but no datum attribute " +
            "(geopotential_datum_name / vertical_datum / NAVD88_ref)")
      // ACDD geospatial sanity: declared deployment position must be a
      // real coordinate (the checker's geospatial_lat/lon bounds rule;
      // the reference stamps latitude/longitude on every output)
      meta.dbl("latitude").foreach { lat =>
        if (lat < -90.0 || lat > 90.0)
          out += Violation("geospatial-range", s"latitude $lat outside [-90, 90]")
      }
      meta.dbl("longitude").foreach { lon =>
        if (lon < -180.0 || lon > 360.0)
          out += Violation("geospatial-range",
            s"longitude $lon outside [-180, 360]")
      }
      // ACDD time coverage: recommended on every released file
      for (k <- Seq("time_coverage_start", "time_coverage_end") if !meta.has(k))
        out += Violation("acdd-recommended",
          s"missing recommended global attribute $k", severity = "recommended")
    }

    // CF §4.4.1: a "since"-style time coordinate should declare its
    // calendar (the checker warns on absence; only a known CF calendar
    // passes)
    df.schema.fields.find(_.name == timeCol).foreach { tf =>
      if (tf.metadata.contains("units") &&
          tf.metadata.getString("units").toLowerCase.contains(" since ")) {
        if (!tf.metadata.contains("calendar"))
          out += Violation("time-calendar",
            s"$timeCol has epoch units but no calendar attribute",
            severity = "recommended")
        else {
          val cal = tf.metadata.getString("calendar").toLowerCase
          val known = Set("standard", "gregorian", "proleptic_gregorian",
            "julian", "noleap", "365_day", "all_leap", "366_day", "360_day")
          if (!known.contains(cal))
            out += Violation("time-calendar", s"unknown calendar '$cal'")
        }
      }
    }

    // CF §5: a variable's `coordinates` attribute must name columns that
    // exist in the output (dangling references break every CF reader)
    for (f <- df.schema.fields if f.metadata.contains("coordinates")) {
      val missing = f.metadata.getString("coordinates").split("\\s+")
        .filter(_.nonEmpty).filterNot(df.columns.contains)
      if (missing.nonEmpty)
        out += Violation("coordinates-exist",
          s"${f.name}: coordinates attribute names missing columns " +
            missing.mkString(", "))
    }

    out.toSeq
  }
}
