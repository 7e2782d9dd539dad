package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Task-parameter plumbing (SURVEY F8/M4: the reference's
  * ConfigurationManager + ParamUtils, commons/.../ConfigurationManager.scala:15-30,
  * commons/.../Utils.scala:175-186) without external JSON deps: task params
  * are a flat string map; [[TaskParams.fromJson]] parses the reference's
  * flat `task.params.json` shape (`{"k":"v","n":7}`).
  */
final case class TaskParams(params: Map[String, String]) {
  /** Missing or empty ⇒ None — the F9 "no constraint" convention. */
  def get(key: String): Option[String] = params.get(key).filter(_.nonEmpty)
  def getLong(key: String): Option[Long] =
    get(key).flatMap(v => scala.util.Try(v.toLong).toOption)
  def getDouble(key: String): Option[Double] =
    get(key).flatMap(v => scala.util.Try(v.toDouble).toOption)
  /** Comma-separated list param. */
  def getSeq(key: String): Option[Seq[String]] =
    get(key).map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq)
}

object TaskParams {
  val empty: TaskParams = TaskParams(Map.empty)

  private val field = """"([^"]+)"\s*:\s*(?:"([^"]*)"|([-0-9.eE]+))""".r

  /** Parses a flat JSON object of string/number fields (exactly the shape
    * of the reference's task.params.json). Not a general JSON parser. */
  def fromJson(s: String): TaskParams =
    TaskParams(field.findAllMatchIn(s).map { m =>
      m.group(1) -> Option(m.group(2)).getOrElse(m.group(3))
    }.toMap)
}

/** Null-tolerant predicate builder (SURVEY F9: commons/.../Utils.scala:297-383
  * ValidUtils.between/in/equal). The reference's convention — a missing task
  * parameter means "no constraint" — becomes `lit(true)`, so Catalyst
  * constant-folds the absent clauses out of the plan entirely (at 100 TB an
  * unconstrained filter costs zero, it never reaches the scan).
  */
object Predicates {
  def between(c: Column, lo: Option[Long], hi: Option[Long]): Column =
    (lo, hi) match {
      case (Some(a), Some(b)) => c.between(a, b)
      case (Some(a), None)    => c >= a
      case (None, Some(b))    => c <= b
      case (None, None)       => lit(true)
    }

  def betweenD(c: Column, lo: Option[Double], hi: Option[Double]): Column =
    (lo, hi) match {
      case (Some(a), Some(b)) => c.between(a, b)
      case (Some(a), None)    => c >= a
      case (None, Some(b))    => c <= b
      case (None, None)       => lit(true)
    }

  def in(c: Column, vals: Option[Seq[String]]): Column =
    vals.filter(_.nonEmpty).map(v => c.isin(v: _*)).getOrElse(lit(true))

  def equalTo(c: Column, v: Option[String]): Column =
    v.map(c === _).getOrElse(lit(true))

  /** AND-combine; `lit(true)` operands are folded away by Catalyst. */
  def all(ps: Column*): Column = ps.foldLeft(lit(true))(_ && _)
}
