package graft

import org.apache.spark.sql.functions._
import graft.mock.DataGen

class DataGenSpec extends GraftSuite {

  test("seeded generator is reproducible; unseeded reference shape preserved") {
    val a = DataGen.visitActions(spark, seed = 7L).collect().map(_.toString).sorted
    val b = DataGen.visitActions(spark, seed = 7L).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
    val c = DataGen.visitActions(spark, seed = 8L).collect().map(_.toString).sorted
    assert(a.toSeq !== c.toSeq)
  }

  test("sentinel and NULL-vs-CSV conventions hold in generated rows") {
    val df = DataGen.visitActions(spark).cache()
    // click ids: -1 sentinel exactly when not a click action
    assert(df.where(col("click_category_id") === -1 && col("click_product_id") =!= -1).count() === 0)
    // order/pay lists: NULL or non-empty CSV of ints
    val bad = df.where(col("order_category_ids").isNotNull &&
      size(split(col("order_category_ids"), ",")) < 1).count()
    assert(bad === 0)
    // dates are zero-padded ISO strings (string comparison works)
    df.select(min("date"), max("date")).collect()(0).toSeq.foreach { d =>
      assert(d.toString.matches("""2024-02-\d\d"""))
    }
    df.unpersist()
  }
}
