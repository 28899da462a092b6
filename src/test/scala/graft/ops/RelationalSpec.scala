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

  test("scd2History: versions partition each key's timeline exactly") {
    val ev = Tables.events(spark, sfDir)
    val hist = Relational
      .scd2History(ev, "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5)))
      .groupBy(_._1)

    val feed = ev.select($"user_id", $"ts", $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)

    assert(hist.keySet === feed.keySet)
    hist.foreach { case (uid, rowsUnsorted) =>
      val rows = rowsUnsorted.sortBy(_._2)
      // versions are 1..n dense
      assert(rows.map(_._2).toSeq === (1L to rows.length))
      // intervals chain: valid_to(v) == valid_from(v+1); only the last is open
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $uid v${a._2} interval gap")
          assert(a._6 === 0L)
        case _ =>
      }
      assert(rows.last._5.isEmpty && rows.last._6 === 1L)
      // no two consecutive versions share a state (changes collapsed)
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._3 !== b._3, s"user $uid uncollapsed")
        case _ =>
      }
      // replaying the feed's per-key change sequence gives the states
      val expected = feed(uid).sortBy(e => (e._2.getTime, e._3)).map(_._4)
        .foldLeft(List.empty[String]) {
          case (acc, s) if acc.headOption.contains(s) => acc
          case (acc, s) => s :: acc
        }.reverse
      assert(rows.map(_._3).toSeq === expected, s"user $uid states")
    }
  }

  test("scd2History: shuffled input re-delivery reproduces the history") {
    val ev = Tables.events(spark, sfDir).filter($"user_id" < 30)
    def run(df: org.apache.spark.sql.DataFrame) = Relational
      .scd2History(df, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "version").collect().toSeq
    assert(run(ev) === run(ev.repartition(7).sortWithinPartitions("event_type")))
  }
}
