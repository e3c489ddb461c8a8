package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: sum of the UTF-8 bytes of a string.
  *
  * Reference equivalent: the hash partitioner
  * `sum(bytearray(key.encode())) % partition_number` (`utilities.py:59-61`).
  * This is the reference's semantic partitioner; we keep it as an opt-in
  * parity function (Spark's Murmur3 via `repartition(n, col)` is the
  * engine default — the ASCII sum collides on anagrams and skews badly).
  *
  * Implemented with `doGenCode` so it stays inside whole-stage codegen —
  * a Scala UDF here would break the codegen span around the shuffle write.
  */
case class AsciiSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"asciisum needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var s = 0
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int ${ev.value}_acc = 0;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value}_acc += $bytes[$i] & 0xff;
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiSum =
    copy(child = newChild)
}

object AsciiSum {
  import org.apache.spark.sql.graftbridge.Bridge
  def asciiSum(c: Column): Column =
    Bridge.column(AsciiSum(Bridge.expression(c)))

  /** expose to the SQL surface: SELECT graft_asciisum(word) */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_asciisum", exprs => AsciiSum(exprs.head), "built-in")

  /** Reference partition id: asciiSum(key) mod `partitions`
    * (`utilities.py:51-63`; `partition_number=100` per `config.py:25-27`). */
  def parityPartition(c: Column, partitions: Int = 100): Column =
    org.apache.spark.sql.functions.pmod(asciiSum(c),
      org.apache.spark.sql.functions.lit(partitions))
}
