package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan, ResolvedHint, UnaryNode}

/** Opt-in analysis-time PLAN GUARDRAIL (`spark.graft.strictPlans=true`),
  * registered through `SparkSessionExtensions.injectCheckRule` — the
  * third Catalyst extension surface this engine uses (expressions via
  * injectFunction, and this check rule; SURVEY 7.3's ladder).
  *
  * What it rejects: a JOIN WITHOUT A CONDITION whose sides carry no
  * explicit broadcast declaration — the unambiguous cartesian product.
  * On a 1000-executor cluster an accidental `join(df)` (a forgotten
  * `on` clause, a typo'd key producing no equi-condition) plans as a
  * nested-loop over |A|×|B| rows and runs for days before anyone
  * notices; failing the QUERY at analysis time, in the session, is the
  * guardrail a shared 100 TB platform actually wants.
  *
  * What it allows: condition-less joins where either side is wrapped in
  * an explicit `broadcast(...)` hint — the author has DECLARED that
  * side bounded (the quota/total cross joins in Sessions and the
  * centroid fan-out in Embeddings are exactly this shape), which is the
  * legitimate use of a cross join at scale. Check rules run on the
  * analyzed plan, before the optimizer folds `ResolvedHint` nodes into
  * the join, so the declaration is still visible here.
  *
  * Off by default: the conf is read per query, so an interactive
  * session can flip it on (e.g. in a shared notebook profile) without
  * rebuilding the session.
  */
object StrictPlanCheck {
  val Conf = "spark.graft.strictPlans"

  /** The hint is matched against the BROADCAST strategy OBJECT (not a
    * toString substring — brittle against renames), and searched through
    * unary nodes below the join side: `broadcast(df).select(...)` leaves
    * the ResolvedHint under a Project, and the declaration it expresses
    * is no less explicit for it. The descent stops at binary nodes — a
    * hint beyond a nested join belongs to that join, not this one. */
  private def broadcastDeclared(p: LogicalPlan): Boolean = p match {
    case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => true
    case u: UnaryNode => broadcastDeclared(u.child)
    case _ => false
  }

  def apply(session: SparkSession)(plan: LogicalPlan): Unit =
    if (session.conf.get(Conf, "false").toBoolean) {
      plan.foreach {
        case j: Join if j.condition.isEmpty &&
            !broadcastDeclared(j.left) && !broadcastDeclared(j.right) =>
          throw new SparkException(
            s"[graft] $Conf: condition-less ${j.joinType} join (cartesian product) " +
              "rejected — add a join condition, or wrap the bounded side in " +
              "broadcast(...) to declare the cross join intentional")
        case _ => ()
      }
    }
}
