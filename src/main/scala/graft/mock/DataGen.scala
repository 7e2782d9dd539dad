package graft.mock

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seeded fixture generator (SURVEY M5): the reference's mock layer
  * (mock/src/main/scala/MockDataGenerate.scala:34-137) produces
  * user_visit_action-shaped rows with an UNSEEDED Random — runs are
  * non-reproducible. This generator keeps the same shape (sessions of
  * actions with sentinel click ids, nullable CSV id lists, string dates)
  * but is fully deterministic for a given seed, which is what makes
  * generated fixtures usable as test oracles. The driver-provided parquet
  * under /root/testdata remains the primary corpus; this exists for
  * shape-parity tests and ad-hoc local fixtures.
  */
object DataGen {

  final case class VisitAction(
      date: String, user_id: Long, session_id: String, page_id: Long,
      action_time: String, search_keyword: String,
      click_category_id: Long, click_product_id: Long,
      order_category_ids: String, order_product_ids: String,
      pay_category_ids: String, pay_product_ids: String, city_id: Long)

  private val keywords =
    Seq("laptop", "phone", "camera", "monitor", "router", "tablet", "drone")

  /** Deterministic user_visit_action-shaped rows: `users` users × up to
    * `sessionsPerUser` sessions × up to 10 actions. */
  def visitActions(s: SparkSession, seed: Long = 42L,
                   users: Int = 20, sessionsPerUser: Int = 3): DataFrame = {
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = for {
      u <- 0 until users
      sess <- 0 until (1 + rnd.nextInt(sessionsPerUser))
      sessionId = f"sess-$u%03d-$sess%02d"
      day = 1 + rnd.nextInt(28)
      n <- 0 until (1 + rnd.nextInt(10))
    } yield {
      val date = f"2024-02-$day%02d"
      val hour = rnd.nextInt(24)
      val action = rnd.nextInt(4) // 0 search / 1 click / 2 order / 3 pay
      def csv(): String =
        (0 until (1 + rnd.nextInt(3))).map(_ => rnd.nextInt(100)).mkString(",")
      VisitAction(
        date = date,
        user_id = u.toLong,
        session_id = sessionId,
        page_id = rnd.nextInt(50).toLong,
        action_time = f"$date $hour%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d",
        search_keyword = if (action == 0) keywords(rnd.nextInt(keywords.length)) else null,
        click_category_id = if (action == 1) rnd.nextInt(100).toLong else -1L, // -1 sentinel
        click_product_id = if (action == 1) rnd.nextInt(100).toLong else -1L,
        order_category_ids = if (action == 2) csv() else null, // NULL-vs-CSV
        order_product_ids = if (action == 2) csv() else null,
        pay_category_ids = if (action == 3) csv() else null,
        pay_product_ids = if (action == 3) csv() else null,
        city_id = rnd.nextInt(10).toLong)
    }
    rows.toDF()
  }
}
