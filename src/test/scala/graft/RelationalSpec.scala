package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends GraftSuite {
  import Relational._

  test("q01 pricing summary: groups sane, counts add up") {
    val rows = q01Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == Tables.lineitem(spark, sf).count())
    rows.foreach(r => assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price")))
  }

  test("q02 filter pushdown reaches the parquet scan") {
    val df = q02FilterPushdown(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"expected shipdate in PushedFilters:\n$plan")
    df.collect().foreach(r => assert(r.getAs[Double]("l_quantity") < 5))
  }

  test("q03 join+agg broadcasts the nation dim") {
    val df = q03JoinAgg(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(df.count() <= 25)
  }

  test("q04 window top-k: at most 3 per brand, rank ordered") {
    val rows = q04WindowTopk(spark, sf).collect()
    val perBrand = rows.groupBy(_.getAs[String]("p_brand"))
    perBrand.values.foreach { g =>
      assert(g.length <= 3)
      val sorted = g.sortBy(_.getAs[Int]("rn"))
      val prices = sorted.map(_.getAs[Double]("p_retailprice")).toSeq
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q05 global top-k plans TakeOrderedAndProject (no full sort shuffle)") {
    val df = q05TopkOrder(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val prices = df.collect().map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices.length == 10 && prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q06 left join keeps all customers") {
    assert(q06LeftJoin(spark, sf).count() == Tables.customer(spark, sf).count())
  }

  test("q07/q08 semi and anti partition the filtered side") {
    val semi = q07SemiJoin(spark, sf).count()
    assert(semi > 0)
    val anti = q08AntiJoin(spark, sf)
    val plan = anti.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"))
  }

  test("q10 union distinct equals set union") {
    val got = q10Union(spark, sf).collect().map(_.getInt(0)).toSet
    val c = Tables.customer(spark, sf).select(col("c_nationkey")).distinct().collect().map(_.getInt(0)).toSet
    val sup = Tables.supplier(spark, sf).select(col("s_nationkey")).distinct().collect().map(_.getInt(0)).toSet
    assert(got == (c ++ sup))
  }

  test("q13 group concat is sorted and comma-separated") {
    q13GroupConcat(spark, sf).collect().foreach { r =>
      val parts = r.getAs[String]("segments").split(",").toSeq
      assert(parts == parts.sorted)
    }
  }

  test("q14 running window equals a recomputed per-customer cumulative sum") {
    val expected = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .collect()
      // o_orderdate reads as TIMESTAMP_NTZ (LocalDateTime); its ISO string
      // sorts chronologically, which is all the recompute needs
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString, r.getDouble(3)))
      .groupBy(_._1)
      .toSeq
      .flatMap { case (cust, rows) =>
        val sorted = rows.sortBy(t => (t._3, t._2))
        var acc = BigDecimal(0)
        sorted.map { case (_, okey, _, price) =>
          acc += BigDecimal(price).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          (cust, okey) -> acc.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    val got = q14RunningWindow(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey")) -> r.getAs[Double]("running_spend"))
      .toMap
    expected.foreach { case (key, exp) =>
      assert(got(key) === exp, s"running_spend mismatch at $key")
    }
  }

  test("q15 rollup has grand total row") {
    val rows = q15Rollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_customers") == Tables.customer(spark, sf).count())
  }
}
