package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composite-join expression DSL (reference: `lib/join/
  * CompositeInputFormat.java:56`, expression parser `lib/join/Parser.java`,
  * semantics in `InnerJoinRecordReader.java:34` /
  * `OuterJoinRecordReader.java:34` / `OverrideRecordReader.java:42`).
  *
  * Reference grammar: `inner(tbl(...,"a"), tbl(...,"b"))`, composable.
  * Ours: `inner(a,b,...)`, `outer(a,b,...)`, `override(a,b,...)` over
  * named sources, nested arbitrarily. Each source is a DataFrame with a
  * join-key column plus value columns.
  *
  * Semantics:
  *  - inner: emit a tuple iff ALL sources have the key,
  *  - outer: emit if ANY source has it, missing slots null,
  *  - override: the value from the RIGHTMOST source that has the key
  *    (priority coalesce — SURVEY.md §7.3 decision table).
  *
  * The reference requires inputs pre-sorted and identically partitioned
  * (its map-side merge has no shuffle); Catalyst gets the same effect via
  * sort-merge join, and bucketed/pre-partitioned tables eliminate the
  * shuffle exactly like the reference's contract. We deliberately emit a
  * plain multi-way `join` so AQE can still pick broadcast for small sides.
  */
object CompositeJoin {

  sealed trait Expr
  final case class Tbl(name: String) extends Expr
  final case class Node(op: String, children: Seq[Expr]) extends Expr

  /** Tiny recursive-descent parser for `op(child,child,...)` / `name`. */
  def parse(s: String): Expr = {
    val (e, rest) = parseExpr(s.replaceAll("\\s", ""), 0)
    require(rest == s.replaceAll("\\s", "").length, s"trailing input in: $s")
    e
  }

  private def parseExpr(s: String, pos: Int): (Expr, Int) = {
    val idEnd = s.indexWhere(c => c == '(' || c == ')' || c == ',', pos) match {
      case -1 => s.length
      case i  => i
    }
    val ident = s.substring(pos, idEnd)
    require(ident.nonEmpty, s"empty identifier at $pos in $s")
    if (idEnd < s.length && s.charAt(idEnd) == '(') {
      var p = idEnd + 1
      val children = Seq.newBuilder[Expr]
      while (s.charAt(p) != ')') {
        val (c, np) = parseExpr(s, p)
        children += c
        p = if (s.charAt(np) == ',') np + 1 else np
      }
      (Node(ident, children.result()), p + 1)
    } else (Tbl(ident), idEnd)
  }

  /** Evaluate an expression over named sources. Every source must contain
    * `key`; all its other columns are carried as that source's values. */
  def run(expr: String, key: String, sources: Map[String, DataFrame]): DataFrame =
    eval(parse(expr), key, sources)

  private def eval(e: Expr, key: String, srcs: Map[String, DataFrame]): DataFrame =
    e match {
      case Tbl(n) =>
        srcs.getOrElse(n, throw new IllegalArgumentException(s"unknown source: $n"))
      case Node(op, children) =>
        val dfs = children.map(eval(_, key, srcs))
        op match {
          case "inner" => dfs.reduce((a, b) => a.join(b, Seq(key), "inner"))
          case "outer" => dfs.reduce((a, b) => a.join(b, Seq(key), "full_outer"))
          case "override" =>
            // rightmost wins: every child must carry exactly one value col;
            // rename them positionally so same-named sources don't clash
            val renamed = dfs.zipWithIndex.map { case (df, i) =>
              val vs = df.columns.filterNot(_ == key)
              require(vs.length == 1,
                s"override child must have 1 value column, got ${vs.mkString(",")}")
              df.withColumnRenamed(vs.head, s"__ov_$i")
            }
            val joined = renamed.reduce((a, b) => a.join(b, Seq(key), "full_outer"))
            joined.select(col(key),
              coalesce(renamed.indices.reverse.map(i => col(s"__ov_$i")): _*)
                .as("value"))
          case other => throw new IllegalArgumentException(s"unknown op: $other")
        }
    }
}
