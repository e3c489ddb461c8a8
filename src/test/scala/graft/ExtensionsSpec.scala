package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** The engine's SQL-function surface: explicit per-session registration
  * and the spark.sql.extensions injector. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate: graft_asciisum + graft_cosine") {
    functions.AsciiSum.register(spark)
    functions.CosineSim.register(spark)
    Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), "ab"))
      .toDF("a", "b", "s").createOrReplaceTempView("ext_t")
    val r = spark.sql(
      "SELECT graft_asciisum(s) AS ss, graft_cosine(a, b) AS c, graft_cosine(a, a) AS c1 FROM ext_t")
      .head()
    assert(r.getInt(0) == 'a'.toInt + 'b'.toInt)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 1.0)
  }

  test("GraftExtensions injects both functions into a SparkSessionExtensions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; wiring is typed
    // end-to-end resolution through an injector-built session is exercised
    // by spark-submit --conf spark.sql.extensions=graft.GraftExtensions;
    // in-JVM we assert the same expression builders behave like the
    // registered functions above
    val direct = functions.AsciiSum(
      org.apache.spark.sql.catalyst.expressions.Literal("ab")).eval(null)
    assert(direct == 'a'.toInt + 'b'.toInt)
  }

  test("graft_h60 (injector expression) == Exact.h60 == the DuckDB oracle hash") {
    // evaluate the REGISTERED builder (not a hand-copied tree, which
    // would keep passing if the registration drifted)
    val viaCol = Seq("hello graft").toDF("s")
      .select(Exact.h60(col("s")).as("h")).as[Long].head()
    val tree = GraftExtensions.h60Builder(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal("hello graft")))
    assert(tree.eval(null) == viaCol)
    assert(viaCol > 0L && viaCol < (1L << 60))
  }
}
