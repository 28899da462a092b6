package graft.ops

import java.sql.Date

import graft.SparkSpec

/** Pins the degenerate-input contracts the round-8 review added: the
  * registry argmax queries must return ZERO rows (not one all-NULL row)
  * when no candidate exists, matching their oracles' `ORDER BY ... LIMIT
  * 1` over an empty candidate set. */
class DailySeriesSpec extends SparkSpec {
  import spark.implicits._

  test("changepoint on a single-day series returns zero rows (oracle LIMIT-1 parity)") {
    val daily = Seq((Date.valueOf("2024-01-01"), 10L)).toDF("day", "n")
    assert(DailySeries.changepoint(daily).count() === 0L)
  }

  test("changepoint on a two-day step picks the only split with exact means") {
    val daily = Seq(
      (Date.valueOf("2024-01-01"), 10L),
      (Date.valueOf("2024-01-02"), 30L)).toDF("day", "n")
    val r = DailySeries.changepoint(daily).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Date]("split_day") === Date.valueOf("2024-01-01"))
    assert(row.getAs[Long]("n_days_left") === 1L)
    assert(row.getAs[Long]("n_days_right") === 1L)
    assert(row.getAs[Double]("mean_left") === 10.0)
    assert(row.getAs[Double]("mean_right") === 30.0)
    // bss = 1*(10-20)^2 + 1*(30-20)^2 = 200
    assert(row.getAs[Double]("bss") === 200.0)
  }

  test("maseForecast prices holdout MAE against training seasonal-naive MAE") {
    // 28 days: weeks of constant 10 then a final fortnight at 20 —
    // with max(day)-14 as the cut, the holdout errors are the jumps
    val days = (0 until 28).map { i =>
      val n = if (i < 14) 10L else 20L
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)), n)
    }
    val r = DailySeries.maseForecast(days.toDF("day", "n")).collect().head
    // lagged pairs exist for days 7..27 (21 rows); cut = day 13 (index):
    // train = days 7..13 (|err|=0), test = days 14..27 (7 jumps of 10, 7 zeros)
    assert(r.getAs[Long]("n_train") === 7L)
    assert(r.getAs[Long]("n_test") === 14L)
    assert(r.getAs[Double]("naive_mae_train") === 0.0)
    assert(r.getAs[Double]("mae_test") === 5.0)
    // zero training MAE ⇒ NULL mase, not a DIVIDE_BY_ZERO crash
    assert(r.isNullAt(r.fieldIndex("mase")))
  }

  test("maseForecast on a short series (all lagged rows in the holdout) " +
      "yields NULL train metrics, never NaN") {
    // 10 days: lagged pairs exist for days 7..9, all AFTER cut=day-14 ⇒
    // n_train = 0 — naive_mae_train must be NULL (0.0/0 would be NaN and
    // leak into streaming MASE state), mase NULL too
    val days = (0 until 10).map { i =>
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)),
        10L + i)
    }
    val r = DailySeries.maseForecast(days.toDF("day", "n")).collect().head
    assert(r.getAs[Long]("n_train") === 0L)
    assert(r.getAs[Long]("n_test") === 3L)
    assert(r.isNullAt(r.fieldIndex("naive_mae_train")))
    assert(r.getAs[Double]("mae_test") === 7.0) // slope-1 series: 7-day lag diff
    assert(r.isNullAt(r.fieldIndex("mase")))
  }

  test("maseForecast with an empty holdout side yields NULL mae_test/mase") {
    // 6 days: no day has a 7-day lag partner ⇒ zero lagged rows at all;
    // counts are NULL (SUM over empty input, same as the DuckDB oracle)
    // and every ratio must be NULL, never NaN
    val days = (0 until 6).map { i =>
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)), 5L)
    }
    val r = DailySeries.maseForecast(days.toDF("day", "n")).collect().head
    assert(r.isNullAt(r.fieldIndex("n_train")))
    assert(r.isNullAt(r.fieldIndex("n_test")))
    assert(r.isNullAt(r.fieldIndex("naive_mae_train")))
    assert(r.isNullAt(r.fieldIndex("mae_test")))
    assert(r.isNullAt(r.fieldIndex("mase")))
  }
}
