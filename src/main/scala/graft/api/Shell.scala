package graft.api

import graft.model.Synth
import graft.ops.Search
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal b6 shell-expression surface (SURVEY.md §3.2; reference grammar
  * api/shell.y): pipelines over a feature DataFrame,
  *
  *   find [#status=O]                  tagged query        (shell.y "[#k=v]")
  *   find [#status]                    keyed query
  *   find (and [#a=x] [#b=y])          conjunction
  *   find (or [#a=x] [#b=y])           disjunction
  *   ... | take 10                     id-ordered limit
  *   ... | top price 5                 top-n by column
  *   ... | count                       row count
  *   ... | count-values priority       histogram
  *   ... | within-cap 51.5 -0.1 5000   equirect cap filter
  *
  * The pipeline operator `a | f args` applies f with the left value as the
  * first argument (shell.y:37-46) — here simply sequential application to
  * the DataFrame. This is an API veneer over Search/ops; evaluation is pure
  * Catalyst (no VM: SURVEY.md §3.1 "Catalyst is the compiler").
  */
object Shell {

  def run(df: DataFrame, expr: String, idCol: String = "image_id"): DataFrame = {
    val stages = expr.split("\\|").map(_.trim).filter(_.nonEmpty)
    stages.foldLeft(df)((acc, stage) => apply(acc, stage, idCol))
  }

  private def apply(df: DataFrame, stage: String, idCol: String): DataFrame = {
    val tok = tokenize(stage)
    tok match {
      case "find" :: rest          => df.where(predicate(rest.mkString(" ")))
      case "take" :: n :: Nil      => Search.take(df, idCol, n.toInt)
      case "top" :: c :: n :: Nil  => Search.top(df, c, idCol, n.toInt)
      case "count" :: Nil          => df.agg(count(lit(1)).as("n"))
      case "count-values" :: c :: Nil => Search.countValues(df, c).orderBy(c)
      case "within-cap" :: la :: lo :: r :: Nil =>
        val lat = la.toDouble; val lng = lo.toDouble; val rm = r.toDouble
        val d = rm / 111000.0
        df.where(Search.withinCapD2(lat, lng, math.cos(math.toRadians(lat)), d * d))
      case other => throw new IllegalArgumentException(s"unknown stage: $stage")
    }
  }

  /** Query literal -> Column predicate: `[#k=v]`, `[#k]`, `(and q1 q2)`,
    * `(or q1 q2)`. */
  def predicate(q: String): Column = {
    val s = q.trim
    if (s.startsWith("(")) {
      val inner = s.stripPrefix("(").stripSuffix(")").trim
      val (op, rest) = inner.span(!_.isWhitespace)
      val parts = splitArgs(rest.trim)
      val preds = parts.map(predicate)
      op match {
        case "and" => preds.reduce(_ && _)
        case "or"  => preds.reduce(_ || _)
        case _ => throw new IllegalArgumentException(s"unknown query op: $op")
      }
    } else if (s.startsWith("[#")) {
      val body = s.stripPrefix("[#").stripSuffix("]")
      body.split("=", 2) match {
        case Array(k, v) => Search.tagged(k, v)
        case Array(k)    => Search.keyed(k)
      }
    } else throw new IllegalArgumentException(s"unparseable query: $q")
  }

  /** Split `[#a=x] (and [#b] [#c])` into balanced top-level chunks. */
  private def splitArgs(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach { ch =>
      ch match {
        case '(' | '[' => depth += 1; cur += ch
        case ')' | ']' => depth -= 1; cur += ch
        case c if c.isWhitespace && depth == 0 =>
          if (cur.nonEmpty) { out += cur.toString; cur.clear() }
        case c => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toList
  }

  private def tokenize(stage: String): List[String] = {
    // first token is the op; the rest stays raw for query literals
    val t = stage.trim
    val (op, rest) = t.span(!_.isWhitespace)
    if (rest.trim.isEmpty) List(op)
    else if (op == "find") List(op, rest.trim)
    else op :: rest.trim.split("\\s+").toList
  }
}
