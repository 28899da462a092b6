package graft.ops

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook product-limit curve by hand") {
    // (t, obs): 10 subjects, events at 6 (x3), 7, 10, 13; censored at
    // 6, 9, 10, 11. Hand-computed: S(6)=0.7, S(7)=0.7*(5/6),
    // S(9)=S(7), S(10)=0.7*(5/6)*(3/4)=0.4375, S(11)=S(10), S(13)=0.
    val rows = Seq((6L, 1L), (6L, 1L), (6L, 1L), (6L, 0L), (7L, 1L),
      (9L, 0L), (10L, 1L), (10L, 0L), (11L, 0L), (13L, 1L))
    val out = Survival.kaplanMeier(rows.toDF("t", "obs"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(6L) === ((10L, 3L, 1L, 0.7)))
    assert(out(7L) === ((6L, 1L, 0L, 0.583333)))
    assert(out(9L) === ((5L, 0L, 1L, 0.583333)))
    assert(out(10L) === ((4L, 1L, 1L, 0.4375)))
    assert(out(11L) === ((2L, 0L, 1L, 0.4375)))
    assert(out(13L) === ((1L, 1L, 0L, 0.0)))
  }

  test("kaplanMeier: no censoring degenerates to the empirical survivor") {
    // all observed: S(t) = fraction of subjects with duration > t
    val rows = Seq(1L, 2L, 2L, 3L, 5L).map(t => (t, 1L))
    val out = Survival.kaplanMeier(rows.toDF("t", "obs"))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) === 0.8)
    assert(out(2L) === 0.4)
    assert(out(3L) === 0.2)
    assert(out(5L) === 0.0)
  }

  test("kaplanMeier: survival is invariant to input partitioning") {
    val rows = Seq((6L, 1L), (6L, 0L), (7L, 1L), (9L, 0L), (10L, 1L))
    val a = Survival.kaplanMeier(rows.toDF("t", "obs"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = Survival.kaplanMeier(rows.toDF("t", "obs").repartition(5))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.toSeq === b.toSeq)
  }
}
