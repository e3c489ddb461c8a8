package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: ALL `tables * bits` sign-LSH plane dot
  * products of one embedding, folded into the per-table bucket array, in
  * one codegen'd pass over the vector.
  *
  * The higher-order-function formulation ([[VectorFunctions.lshBucketArrHof]]:
  * one `aggregate(zip_with(...))` per plane) is semantically identical
  * but builds 96 separate lambda-evaluated array walks per row — measured
  * ~2.3 ms/row at the 16x6 config, which made the INDEX BUILD (not the
  * candidate join) the cost center of the embedding-dedup family. This
  * expression is the (b)-tier of the builder spec's preference order
  * (native Expression > HOF > UDF): one fused nested loop, plane seeds
  * precomputed once on the driver, no per-row allocation beyond the
  * output array.
  *
  * EXACTNESS CONTRACT (do not "optimize"): per plane p, the coefficient
  * of element i is `(((a_p + (i+1)*b_p) mod 2^60) mod 1001 - 500) / 500.0`
  * with `a_p = h60("plane_a_p")`, `b_p = h60("plane_b_p") mod 2^48` —
  * the Kirsch-Mitzenmacher formula of [[VectorFunctions.planeDot]] — and
  * the dot product accumulates `x_i * coef` left-to-right from 0.0 with
  * floats promoted to double before multiplying: the same IEEE operation
  * sequence as the HOF AND as the DuckDB oracles' `list_reduce` folds, so
  * every sign decision is bit-identical to both (asserted value-equal to
  * the HOF in DedupSimilaritySpec). All integer terms stay in-range for
  * any dimension up to 28672: a < 2^60, b < 2^48, so a + (i+1)*b <=
  * (2^60-1) + 28672*(2^48-1) < 2^63 (the JVM would wrap consistently
  * across eval/codegen/HOF beyond that, but DuckDB's checked BIGINT
  * arithmetic would error — same bound note on VectorFunctions.planeDot).
  *
  * NULL elements: the input type may carry containsNull=true (parquet
  * list elements read as nullable), and the fused loops read elements
  * positionally — so a null element FAILS LOUDLY here (one hoisted
  * null-scan per row, both eval paths) instead of silently reading an
  * undefined slot and diverging from the HOF twin's null-propagation.
  */
case class SrpBuckets(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_buckets needs an array<float|double> argument, got $other")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // per-plane seeds, identical to Exact.h60 of the plane-name literals
  // (the Column version constant-folds the same md5s at plan time)
  private lazy val planeA: Array[Long] = Array.tabulate(bits * tables)(p =>
    java.lang.Long.parseLong(graft.Exact.md5Hex(s"plane_a_$p").substring(0, 15), 16))
  private lazy val planeB: Array[Long] = Array.tabulate(bits * tables)(p =>
    java.lang.Long.parseLong(graft.Exact.md5Hex(s"plane_b_$p").substring(0, 15), 16)
      % (1L << 48))

  private def containsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (containsNull) {
      var i0 = 0
      while (i0 < n) {
        if (arr.isNullAt(i0)) throw new IllegalArgumentException(
          s"srp_buckets: null element at index $i0 — filter or impute " +
            "null embedding slots before indexing")
        i0 += 1
      }
    }
    val out = new Array[Long](tables)
    val af = isFloat
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val p = t * bits + j
        val a = planeA(p); val b = planeB(p)
        var dp = 0.0
        var i = 0
        while (i < n) {
          val x = if (af) arr.getFloat(i).toDouble else arr.getDouble(i)
          dp += x * ((((a + (i + 1) * b) % (1L << 60)) % 1001L - 500L)
            .toDouble / 500.0)
          i += 1
        }
        if (dp > 0) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val aRef = ctx.addReferenceObj("srpPlaneA", planeA, "long[]")
      val bRef = ctx.addReferenceObj("srpPlaneB", planeB, "long[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val dp = ctx.freshName("dp")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val bk = ctx.freshName("bk")
      val getX = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      val i0 = ctx.freshName("i0")
      val nullScan = if (containsNull)
        s"""
           |for (int $i0 = 0; $i0 < $n; $i0++) {
           |  if ($v.isNullAt($i0)) throw new IllegalArgumentException(
           |    "srp_buckets: null element at index " + $i0 +
           |    " -- filter or impute null embedding slots before indexing");
           |}
         """.stripMargin
      else ""
      s"""
         |int $n = $v.numElements();
         |$nullScan
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bk = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $p = $t * $bits + $j;
         |    long $a = $aRef[$p]; long $b = $bRef[$p];
         |    double $dp = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $x = $getX;
         |      $dp += $x * ((double) ((($a + ($i + 1L) * $b) % (1L << 60)) % 1001L - 500L) / 500.0);
         |    }
         |    if ($dp > 0) $bk |= 1L << $j;
         |  }
         |  $out[$t] = $bk;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {
  import org.apache.spark.sql.graftbridge.Bridge
  def srpBuckets(v: Column, bits: Int, tables: Int): Column =
    Bridge.column(SrpBuckets(Bridge.expression(v), bits, tables))
}
