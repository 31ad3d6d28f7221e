package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The trim_mask_expr mini boolean DSL (reference: stglib/core/qaqc.py:525-602):
 * expressions like `"(P_1ac < 0.1)|(P_1ac == nan)"` with comparison operators
 * `> < >= <= == !=`, connectors `&` / `|` folded LEFT-TO-RIGHT (the reference
 * has no precedence — it splits at connectors and chains and/or sequentially),
 * and the literal `nan` meaning "is missing" (any operator against nan is
 * interpreted as isnull, matching the reference's `right is False` branch).
 *
 * Compiles once to a Catalyst `Column` — the expression engine IS Catalyst;
 * a masked value becomes NULL (see Trims NaN->NULL convention).
 */
object MaskExpr {

  private val cmp = Set(">", "<", ">=", "<=", "==", "!=")

  private def term(s: String): Column = {
    val parts = s.replace("(", "").replace(")", "").trim.split("\\s+")
    require(parts.length == 3, s"Invalid mask expression term: '$s'")
    val left = col(parts(0))
    val op = parts(1)
    require(cmp(op), s"Unsupported operator $op; supported: ${cmp.mkString(" ")}")
    if (parts(2).equalsIgnoreCase("nan")) left.isNull
    else {
      val rhs = lit(parts(2).toDouble)
      op match {
        case ">"  => left > rhs
        case "<"  => left < rhs
        case ">=" => left >= rhs
        case "<=" => left <= rhs
        case "==" => left === rhs
        case "!=" => left =!= rhs
      }
    }
  }

  /** Parse the DSL into a boolean Column (true == mask out). Mirrors the
    * reference tokenizer: insert a break before each connector, split, fold
    * left (stglib/core/qaqc.py:574-594). */
  def compile(expression: String): Column = {
    val pieces = expression.replace("|", ",|").replace("&", ",&").split(",").toSeq
    pieces.tail.foldLeft(term(pieces.head)) { (acc, p) =>
      val trimmed = p.trim
      val connector = trimmed.head
      val t = term(trimmed.tail)
      connector match {
        case '|' => acc || t
        case '&' => acc && t
        case c   => throw new IllegalArgumentException(s"bad connector $c")
      }
    }
  }

  /** trim_mask_expr: null values of v where the expression holds. */
  def trimMaskExpr(df: DataFrame, v: String, expression: String): DataFrame =
    df.withColumn(v, when(compile(expression), lit(null)).otherwise(col(v)))
}
