package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Curriculum

/** Curriculum.interleaveBySource (x105): the closed-form position must
  * equal the definitional double window, and the round-robin shape must
  * hold through uneven-source tail rounds.
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture: round-robin with a short source dropping out") {
    // a: difficulties 1,5 ; b: 2,4,6,8 ; c: 3
    val df = Seq(
      (10L, "a", 1L), (11L, "a", 5L),
      (20L, "b", 2L), (21L, "b", 4L), (22L, "b", 6L), (23L, "b", 8L),
      (30L, "c", 3L)
    ).toDF("doc_id", "source", "n_tok")
    val out = Curriculum.interleaveBySource(df, "source", "n_tok", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    // round 1: a(10), b(20), c(30); round 2: a(11), b(21), c exhausted;
    // rounds 3-4: b only.
    assert(out === Map(10L -> 1L, 20L -> 2L, 30L -> 3L,
      11L -> 4L, 21L -> 5L, 22L -> 6L, 23L -> 7L))
  }

  test("closed form equals the definitional double window on seeded data") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 400)
      .map(i => (i.toLong, s"s${rnd.nextInt(5)}", rnd.nextInt(20).toLong))
      .toDF("doc_id", "source", "n_tok")
    val got = Curriculum.interleaveBySource(df, "source", "n_tok", "doc_id")
      .select("doc_id", "src_rank", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("source")).orderBy(col("n_tok"), col("doc_id"))
    val want = df.withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("pos",
        row_number().over(Window.orderBy(col("src_rank"), col("source"))).cast("long"))
      .select("doc_id", "src_rank", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("pos is a permutation of 1..n") {
    val df = (0 until 100)
      .map(i => (i.toLong, s"s${i % 3}", (i * 7 % 13).toLong))
      .toDF("doc_id", "source", "n_tok")
    val pos = Curriculum.interleaveBySource(df, "source", "n_tok", "doc_id")
      .select("pos").as[Long].collect().sorted
    assert(pos.toSeq === (1L to 100L))
  }

  test("source-count bound: the O(#sources) closed form refuses past maxSources") {
    // one expression term per source — past the bound the require names
    // the broadcast-join alternative instead of letting codegen hit the
    // JIT method limit mid-plan (SURVEY §8.3)
    val df = (0 until (Curriculum.maxSources + 1))
      .map(i => (i.toLong, f"s$i%04d", 1L))
      .toDF("doc_id", "source", "n_tok")
    val e = intercept[IllegalArgumentException] {
      Curriculum.interleaveBySource(df, "source", "n_tok", "doc_id")
    }
    assert(e.getMessage.contains("broadcast join"))
  }
}
