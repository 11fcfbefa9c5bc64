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
  *   ... | within-cap 51.5 -0.1 5000   exact great-circle cap filter
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
        // EXACT great-circle predicate (VERDICT r02 #8): the engine's codegen
        // WithinCapMeters expression — with a session that registers
        // GraftExtensions, the optimizer adds the bbox prune in front; the
        // previous rm/111000 equirect shortcut under-reported east-west caps
        val lat = la.toDouble; val lng = lo.toDouble; val rm = r.toDouble
        df.where(graft.plans.GraftExtensions.withinCap(
          col("lat"), col("lng"), lat, lng, rm))
      case "filter" :: rest =>
        // filter {x -> (gt (get x price) 100)}   (shell.y:95-100 lambdas;
        // api/functions/collections.go:210-246 filter)
        val (param, body) = lambdaBody(rest.mkString(" "))
        df.where(expression(body, param))
      case "map" :: rest =>
        // map {x -> (pair e1 e2)} -> (first, second); map {x -> e} -> value
        // (api/functions/map.go:10-48)
        val (param, body) = lambdaBody(rest.mkString(" "))
        val c = expression(body, param)
        val isPair = {
          val b = body.trim
          b.startsWith("(") && b.drop(1).trim.takeWhile(!_.isWhitespace) == "pair"
        }
        if (isPair)
          df.select(c.getField("first").as("first"), c.getField("second").as("second"))
        else df.select(c.as("value"))
      case other => throw new IllegalArgumentException(s"unknown stage: $stage")
    }
  }

  /** `{x -> body}` -> (param, body). */
  private def lambdaBody(s: String): (String, String) = {
    val inner = s.trim.stripPrefix("{").stripSuffix("}").trim
    val parts = inner.split("->", 2)
    if (parts.length != 2)
      throw new IllegalArgumentException(s"lambda needs '->': $s")
    (parts(0).trim, parts(1).trim)
  }

  /** Lambda-body expression -> Column: s-exprs over the reference's scalar
    * function surface (math.go:10-55 add/divide/gt/clamp; features.go
    * get accessors; map.go pair). `(get x key)` reads column `key`; bare
    * names read columns; numeric literals are doubles. */
  def expression(src: String, param: String): Column = {
    val s = src.trim
    if (s.startsWith("(")) {
      val inner = s.substring(1, s.length - 1).trim
      val (op, rest) = inner.span(!_.isWhitespace)
      val args = splitArgs(rest.trim)
      def e(i: Int) = expression(args(i), param)
      op match {
        case "get" | "get-float" | "get-int" | "get-string" | "value" =>
          require(args.head == param, s"unbound lambda variable in $s")
          col(args(1).stripPrefix("\"").stripSuffix("\""))
        case "add" | "add-ints" => e(0) + e(1)
        case "divide" | "divide-int" => e(0) / e(1)
        case "gt" => e(0) > e(1)
        case "clamp" => least(greatest(e(0), e(1)), e(2))
        case "pair" => struct(e(0).as("first"), e(1).as("second"))
        case other => throw new IllegalArgumentException(s"unknown function: $other")
      }
    } else if (s.matches("-?\\d+(\\.\\d+)?")) lit(s.toDouble)
    else col(s)
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
    else if (op == "find" || op == "filter" || op == "map") List(op, rest.trim)
    else op :: rest.trim.split("\\s+").toList
  }
}
