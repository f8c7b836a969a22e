package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Bucketed layout: a join on the bucket key must plan with no shuffle
  * exchange on either side, and produce the same rows as the plain join. */
class LayoutSpec extends SparkSuite {

  test("bucketed join on the bucket key is shuffle-free and correct") {
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
      Layout.writeBucketed(li, "li_b", "l_orderkey", 8)
      Layout.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", "l_orderkey", 8)
      val joined = Layout.table(spark, "li_b")
        .join(Layout.table(spark, "o_b"), "l_orderkey")
      assert(Layout.isShuffleFree(joined), joined.queryExecution.executedPlan.toString)
      val expected = li.join(o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
