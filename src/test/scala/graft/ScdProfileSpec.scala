package graft

import graft.operators.{Profile, Scd}
import org.apache.spark.sql.functions._

class ScdProfileSpec extends SparkSpec {
  import spark.implicits._

  // change log: user u1 flips plan a->b->b->a (one no-op write), u2 constant
  private val changes = Seq(
    ("u1", 10L, "a"),
    ("u1", 20L, "b"),
    ("u1", 30L, "b"), // no-op write: same attrs as previous version
    ("u1", 40L, "a"),
    ("u2", 15L, "x")
  ).toDF("k", "ts", "plan")

  test("scd type2 collapses no-op changes and tiles half-open intervals") {
    val dim = Scd.type2(changes, Seq("k"), "ts", Seq("plan"))
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("plan"),
        r.getAs[Long]("effective_from"), Option(r.getAs[Any]("effective_to")),
        r.getAs[Boolean]("is_current"), r.getAs[Int]("version")))
    assert(dim.toSeq == Seq(
      ("u1", "a", 10L, Some(20L), false, 1),
      ("u1", "b", 20L, Some(40L), false, 2), // the 30L no-op vanished
      ("u1", "a", 40L, None, true, 3),
      ("u2", "x", 15L, None, true, 1)))
  }

  test("scd type2 keeps no-op versions when collapse is off") {
    val dim = Scd.type2(changes, Seq("k"), "ts", Seq("plan"), collapseUnchanged = false)
    assert(dim.count() == 5)
    assert(dim.filter($"k" === "u1" && $"is_current").select("plan").as[String].head() == "a")
  }

  test("point-in-time lookup resolves the version containing each fact ts") {
    val dim = Scd.type2(changes, Seq("k"), "ts", Seq("plan"))
    val facts = Seq(
      ("f1", "u1", 5L),  // before first version -> null
      ("f2", "u1", 10L), // interval start is inclusive -> a/v1
      ("f3", "u1", 25L), // inside v2 (the collapsed no-op must not split it)
      ("f4", "u1", 40L), // start of the current version -> a/v3
      ("f5", "u3", 20L)  // unknown key -> null
    ).toDF("fid", "k", "fts")
    val out = Scd.pointInTime(facts, dim, Seq("k"), "fts", Seq("plan", "version"))
      .collect()
      .map(r => r.getAs[String]("fid") ->
        (Option(r.getAs[String]("plan")), Option(r.getAs[Any]("version")))).toMap
    assert(out("f1") == (None, None))
    assert(out("f2") == (Some("a"), Some(1)))
    assert(out("f3") == (Some("b"), Some(2)))
    assert(out("f4") == (Some("a"), Some(3)))
    assert(out("f5") == (None, None))
    assert(out.size == 5)
  }

  test("profile computes per-column stats in one pass with typed bounds") {
    val df = Seq(
      (1L, Some("x"), Some(2.5)),
      (2L, None, Some(7.5)),
      (3L, Some("y"), None),
      (4L, Some("x"), Some(2.5))
    ).toDF("id", "tag", "score")
    val rows = Profile.profile(df, Seq("id", "tag", "score"))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.keySet == Set("id", "tag", "score"))
    val id = rows("id")
    assert(id.getAs[Long]("n_rows") == 4 && id.getAs[Long]("n_null") == 0
      && id.getAs[Long]("n_distinct") == 4
      && id.getAs[Double]("min_num") == 1.0 && id.getAs[Double]("max_num") == 4.0
      && id.getAs[String]("min_str") == null)
    val tag = rows("tag")
    assert(tag.getAs[Long]("n_null") == 1 && tag.getAs[Long]("n_distinct") == 2
      && tag.getAs[String]("min_str") == "x" && tag.getAs[String]("max_str") == "y"
      && tag.isNullAt(tag.fieldIndex("min_num")))
    val score = rows("score")
    assert(score.getAs[Long]("n_null") == 1 && score.getAs[Long]("n_distinct") == 2
      && score.getAs[Double]("min_num") == 2.5 && score.getAs[Double]("max_num") == 7.5)
  }

  test("profile handles column names that need quoting") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("my-col", "it's")
    val rows = Profile.profile(df, Seq("my-col", "it's"))
      .collect().map(r => r.getAs[String]("column_name")).toSet
    assert(rows == Set("my-col", "it's"))
  }

  test("profile is a single aggregation pass (one scan of the input)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    val plan = Profile.profile(df, Seq("id", "tag")).queryExecution.optimizedPlan
    val scans = plan.collect { case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l }
    assert(scans.size == 1, s"expected one scan, got:\n$plan")
  }
}
