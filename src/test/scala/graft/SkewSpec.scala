package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join ≡ plain join on a skewed key distribution") {
    // 90% of left rows share one hot key
    val left = (1 to 1000)
      .map(i => (if (i <= 900) "HOT" else s"k$i", i))
      .toDF("k", "v")
    val right = Seq(("HOT", "a"), ("k950", "b"), ("missing", "c")).toDF("k", "w")

    val plain = left.join(right, Seq("k"), "inner").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), salt = 8).collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.count(_.head == "HOT") === 900)

    val plainLeft = left.join(right, Seq("k"), "left").collect().map(_.toSeq).toSet
    val saltedLeft = Skew.saltedJoin(left, right, Seq("k"), salt = 8, "left").collect().map(_.toSeq).toSet
    assert(saltedLeft === plainLeft)
  }

  test("salt column spreads a hot key across partitions and never leaks") {
    val left = (1 to 100).map(i => ("HOT", i)).toDF("k", "v")
    val right = Seq(("HOT", "a")).toDF("k", "w")
    val out = Skew.saltedJoin(left, right, Seq("k"), salt = 4)
    assert(!out.columns.contains("__salt"))
    assert(out.count() === 100)
  }
}
