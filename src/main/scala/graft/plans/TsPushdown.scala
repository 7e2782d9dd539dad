package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet scan pushdown for range predicates on the NORMALIZED
  * events timestamp.
  *
  * [[graft.Tables.normalizeTs]] maps a physical TIMESTAMP(MICROS) `ts`
  * to the engine's epoch-nanos-Long contract via `unix_micros(ts) *
  * 1000`. Range predicates written against the normalized column (the
  * reference's startDate/endDate task params — its primary pruning
  * lever) then reach the scan as `unix_micros(ts#) * 1000 >= lit`,
  * which the parquet source cannot translate: no PushedFilters, no
  * row-group pruning, and at 100 TB a day-range query reads the corpus.
  *
  * `unix_micros` is strictly monotone, so each comparison has an exact
  * inverse image on the raw timestamp domain; this rule rewrites the
  * comparison onto the raw column with the bound divided back to micros
  * (floor/ceil per operator so the integer boundary semantics are
  * IDENTICAL for every long bound, not just multiples of 1000). The
  * standard predicate-pushdown and file-source translation rules then
  * handle the rest in the same optimizer fixpoint. Null semantics are
  * preserved (each rewritten comparison is null iff `ts` is null, as
  * before); equality with a non-multiple-of-1000 bound is left alone
  * (it can only match nothing, but `null vs false` under a NOT differs,
  * so folding it is not sound in general).
  *
  * Equivalence and pushed-plan shape are pinned in TsPushdownSpec, and
  * SessionsSpec's date-range test asserts PushedFilters end-to-end.
  */
case class TsPushdown(session: SparkSession) extends Rule[LogicalPlan] {

  /** Matches the normalizeTs shape: unix_micros(ts) * 1000 (either
    * operand order), yielding the raw timestamp-typed child. */
  private object NormTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(UnixMicros(ts), Literal(1000L, LongType), _) if ts.dataType == TimestampType => Some(ts)
      case Multiply(Literal(1000L, LongType), UnixMicros(ts), _) if ts.dataType == TimestampType => Some(ts)
      case _ => None
    }
  }

  private def tsLit(us: Long): Literal = Literal(us, TimestampType)
  private def floorUs(v: Long): Long = Math.floorDiv(v, 1000L)
  private def ceilUs(v: Long): Long =
    Math.floorDiv(v, 1000L) + (if (Math.floorMod(v, 1000L) == 0L) 0L else 1L)

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    // nanos*1 monotone inverse: micros*1000 >= v  ⇔  micros >= ceil(v/1000)
    case GreaterThanOrEqual(NormTs(ts), Literal(v: Long, LongType)) =>
      GreaterThanOrEqual(ts, tsLit(ceilUs(v)))
    case GreaterThan(NormTs(ts), Literal(v: Long, LongType)) =>
      GreaterThan(ts, tsLit(floorUs(v)))
    case LessThanOrEqual(NormTs(ts), Literal(v: Long, LongType)) =>
      LessThanOrEqual(ts, tsLit(floorUs(v)))
    case LessThan(NormTs(ts), Literal(v: Long, LongType)) =>
      LessThan(ts, tsLit(ceilUs(v)))
    case EqualTo(NormTs(ts), Literal(v: Long, LongType)) if v % 1000L == 0L =>
      EqualTo(ts, tsLit(v / 1000L))
    // literal-on-left mirrors
    case GreaterThanOrEqual(Literal(v: Long, LongType), NormTs(ts)) =>
      GreaterThanOrEqual(tsLit(floorUs(v)), ts)
    case GreaterThan(Literal(v: Long, LongType), NormTs(ts)) =>
      GreaterThan(tsLit(ceilUs(v)), ts)
    case LessThanOrEqual(Literal(v: Long, LongType), NormTs(ts)) =>
      LessThanOrEqual(tsLit(ceilUs(v)), ts)
    case LessThan(Literal(v: Long, LongType), NormTs(ts)) =>
      LessThan(tsLit(floorUs(v)), ts)
    case EqualTo(Literal(v: Long, LongType), NormTs(ts)) if v % 1000L == 0L =>
      EqualTo(tsLit(v / 1000L), ts)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val r = rewrite(cond)
      if (r.fastEquals(cond)) f else Filter(r, child)
  }
}
