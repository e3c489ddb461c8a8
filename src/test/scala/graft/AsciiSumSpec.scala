package graft

import graft.functions.AsciiSum
import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => ScTest}

/** AsciiSum expression vs the reference partitioner semantics
  * (`utilities.py:59-63`): sum of UTF-8 bytes, mod partition count. */
class AsciiSumSpec extends SparkSpec {
  import spark.implicits._

  private def refAsciiSum(s: String): Int =
    s.getBytes("UTF-8").map(_ & 0xff).sum

  test("asciiSum matches byte-sum semantics incl. multi-byte UTF-8") {
    val words = Seq("", "a", "abc", "héllo", "Ωmega", "the")
    val got = words.toDF("w").select(AsciiSum.asciiSum(col("w"))).as[Int].collect()
    assert(got.toSeq == words.map(refAsciiSum))
  }

  test("property: asciiSum == reference byte sum; partition in [0, 100)") {
    val prop = forAll(Gen.asciiPrintableStr) { s =>
      val row = Seq(s).toDF("w")
        .select(AsciiSum.asciiSum(col("w")), AsciiSum.parityPartition(col("w")))
        .collect()(0)
      row.getInt(0) == refAsciiSum(s) && row.getInt(1) >= 0 && row.getInt(1) < 100
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("asciiSum is callable from the SQL surface after register()") {
    AsciiSum.register(spark)
    val got = spark.sql("SELECT graft_asciisum('abc') AS s").as[Int].head()
    assert(got == refAsciiSum("abc"))
  }

  test("asciiSum survives both codegen and interpreted paths") {
    // wholestage off forces the interpreted/eval path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val got = Seq("spark").toDF("w").select(AsciiSum.asciiSum(col("w"))).as[Int].head()
      assert(got == refAsciiSum("spark"))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
