package graft

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (id, key, ts); right: (key, ts, payload)
  private val left = Seq(
    (1L, "a", 10L), // after right@5 -> p5
    (2L, "a", 5L),  // equal ts -> inclusive match p5
    (3L, "a", 4L),  // before any right -> no match
    (4L, "b", 99L), // key with no right rows -> no match
    (5L, "a", 20L)  // after right@15 -> p15
  ).toDF("id", "key", "ts")

  private val right = Seq(
    ("a", 5L, "p5"),
    ("a", 15L, "p15")
  ).toDF("key", "ts", "payload")

  test("backward as-of join picks latest right at-or-before, inner drops unmatched") {
    val out = AsofJoin.backward(left, right, Seq("key"), "ts", "ts")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    assert(out == Map(1L -> "p5", 2L -> "p5", 5L -> "p15"))
  }

  test("backward as-of left join keeps unmatched rows with null payload") {
    val out = AsofJoin.backward(left, right, Seq("key"), "ts", "ts", joinType = "left")
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("payload"))).toMap
    assert(out(3L).isEmpty && out(4L).isEmpty && out(1L).contains("p5"))
    assert(out.size == 5)
  }

  test("duplicate right (key, ts) rows resolve to the greatest payload struct") {
    val dupRight = Seq(("a", 5L, "p5x"), ("a", 5L, "p5y")).toDF("key", "ts", "payload")
    val out = AsofJoin.backward(left.filter($"id" === 1L), dupRight, Seq("key"), "ts", "ts")
      .collect().map(_.getAs[String]("payload"))
    assert(out.sameElements(Array("p5y")))
  }

  test("forward as-of join picks earliest right at-or-after, ties inclusive") {
    val out = AsofJoin.forward(left, right, Seq("key"), "ts", "ts")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    // id=1 ts=10 -> p15; id=2 ts=5 -> inclusive p5; id=3 ts=4 -> p5;
    // id=4 key b -> dropped; id=5 ts=20 -> no right after -> dropped
    assert(out == Map(1L -> "p15", 2L -> "p5", 3L -> "p5"))
  }

  test("forward as-of left join keeps unmatched rows with null payload") {
    val out = AsofJoin.forward(left, right, Seq("key"), "ts", "ts", joinType = "left")
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("payload"))).toMap
    assert(out(4L).isEmpty && out(5L).isEmpty && out(3L).contains("p5"))
    assert(out.size == 5)
  }

  test("banded range join matches overlapping intervals exactly, hi-exclusive") {
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 99.0)).toDF("pid", "v")
    val ranges = Seq(("r1", 0.0, 10.0), ("r2", 5.0, 20.0), ("r3", 100.0, 200.0))
      .toDF("rid", "lo", "hi")
    val out = graft.operators.RangeJoin.pointInRange(points, ranges, "v", "lo", "hi", 3.0)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // 5.0 in r1 and r2; 10.0 only r2 (hi-exclusive of r1); 99.0 in none
    assert(out == Set((1L, "r1"), (1L, "r2"), (2L, "r2")))
  }
}
