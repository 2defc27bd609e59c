package graft

import graft.ops.Recon
import org.apache.spark.sql.Row

class ReconSpec extends SparkSpec {
  import spark.implicits._

  private def run(left: Seq[(Long, Option[String], Long)],
      right: Seq[(Long, Option[String], Long)]): Set[(Long, String, String)] =
    Recon.diff(
      left.toDF("k", "name", "v"), right.toDF("k", "name", "v"),
      Seq("k"), Seq("name", "v"))
      .as[(Long, String, String)].collect().toSet

  test("diff classifies added / removed / changed and drops matches") {
    val left = Seq(
      (1L, Some("a"), 10L),  // identical on both sides -> not emitted
      (2L, Some("b"), 20L),  // value drift -> changed(v)
      (3L, Some("c"), 30L),  // both columns drift -> changed(name,v)
      (4L, Some("d"), 40L))  // only on the left -> removed
    val right = Seq(
      (1L, Some("a"), 10L),
      (2L, Some("b"), 21L),
      (3L, Some("C"), 31L),
      (5L, Some("e"), 50L))  // only on the right -> added
    assert(run(left, right) == Set(
      (2L, "changed", "v"),
      (3L, "changed", "name,v"),
      (4L, "removed", ""),
      (5L, "added", "")))
  }

  test("diff null semantics: null==null matches, null vs value changes") {
    val left = Seq((1L, None: Option[String], 1L), (2L, Some("x"), 2L))
    val right = Seq((1L, None: Option[String], 1L), (2L, None, 2L))
    assert(run(left, right) == Set((2L, "changed", "name")))
  }

  test("diff of a table against itself is empty") {
    val t = Seq((1L, Some("a"), 1L), (2L, None: Option[String], 2L))
    assert(run(t, t).isEmpty)
  }

  test("diff rejects overlapping key/compare columns and empty specs") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException](Recon.diff(df, df, Seq("k"), Seq("k")))
    intercept[IllegalArgumentException](Recon.diff(df, df, Nil, Seq("v")))
    intercept[IllegalArgumentException](Recon.diff(df, df, Seq("k"), Nil))
  }

  test("diff supports composite keys") {
    val l = Seq((1L, "x", 10L), (1L, "y", 11L)).toDF("k1", "k2", "v")
    val r = Seq((1L, "x", 10L), (1L, "y", 99L)).toDF("k1", "k2", "v")
    val got = Recon.diff(l, r, Seq("k1", "k2"), Seq("v")).collect().toSet
    assert(got == Set(Row(1L, "y", "changed", "v")))
  }
}
