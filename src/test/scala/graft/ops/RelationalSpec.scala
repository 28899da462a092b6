package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin equals the brute-force latest-at-or-before lookup") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))

    val fast = Relational.asofJoin(purchases, clicks, "user_id", "ts", "ts",
        "click_id", "last_click_id")
      .select($"event_id", $"last_click_id").as[(Long, Option[Long])]
      .collect().toMap

    val p = purchases.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val c = clicks.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    p.foreach { case (eid, uid, ts) =>
      val best = c.filter(x => x._1 == uid && !x._2.after(ts))
        .sortBy(x => (x._2.getTime, x._3)).lastOption.map(_._3)
      assert(fast(eid) === best, s"purchase $eid")
    }
  }

  test("rangeJoinWithinGap equals the brute-force inequality join") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click").select($"user_id", $"ts")

    val fast = Relational
      .rangeJoinWithinGap(purchases, clicks, "user_id", "ts", "ts", 300)
      .groupBy($"event_id").agg(count($"matched").as("n"))
      .as[(Long, Long)].collect().toMap

    val p = purchases.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val c = clicks.collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    p.foreach { case (eid, uid, ts) =>
      val n = c.count(x => x._1 == uid &&
        x._2.getTime > ts.getTime - 300000L && !x._2.after(ts))
      assert(fast.getOrElse(eid, 0L) === n.toLong, s"purchase $eid")
    }
  }

  test("saltedJoin returns exactly the plain join result") {
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_linenumber", $"l_suppkey")
    val orders = Tables.orders(spark, sfDir)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    val plain = li.join(orders, "l_orderkey")
      .select($"l_orderkey", $"l_linenumber", $"o_orderstatus")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val salted = Relational.saltedJoin(li, orders, "l_orderkey", "l_linenumber", 8)
      .select($"l_orderkey", $"l_linenumber", $"o_orderstatus")
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("topKPerGroup: k rows max per group, ordered deterministically") {
    val top = Relational.topKPerGroup(
      Tables.orders(spark, sfDir), 2,
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")))
    val counts = top.groupBy("o_custkey").count().as[(Long, Long)].collect()
    assert(counts.forall(_._2 <= 2))
  }
}
