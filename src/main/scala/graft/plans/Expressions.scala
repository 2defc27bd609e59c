package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the hot paths where composing built-ins
 * would be clumsy or slow. Each implements `doGenCode`, so it participates in
 * WholeStageCodegen — no UDF boxing, no codegen fence in the scan->project
 * pipeline (the requirement the builder prompt sets for 100 TB scans).
 */

/**
 * Polynomial rolling hash (Karp–Rabin): fold(acc = acc*31 + codepoint mod
 * 10^15) over the string's UTF-16 code units. Used for document
 * fingerprinting; the modulus keeps the accumulator < 2^60 so the fold is
 * exact in a Long AND reproducible in any engine with 64-bit integers (the
 * DuckDB oracle replays it with list_reduce).
 */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"rolling_hash needs a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i)) % RollingHash.Mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + (long) $s.charAt($i)) % ${RollingHash.Mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** 10^15: acc*31 + 0xFFFF < 3.2e16 << Long.MaxValue — overflow-free. */
  val Mod: Long = 1000000000000000L
}

/**
 * Exact integer dot product of two `array<bigint>` columns.
 *
 * The composable alternative — `aggregate(zip_with(a, b, _*_), 0, _+_)` — is
 * a higher-order function: Catalyst evaluates the lambda INTERPRETED, per
 * element, with boxing, and it fences off WholeStageCodegen. On an n x m
 * scoring join (similarity search / embedding near-dup) that lambda is the
 * entire inner loop, so it dominates the operator. This native expression
 * compiles to a tight primitive long loop inside the join's generated code.
 *
 * Semantics: null if either array is null; elements are read as primitive
 * longs (quantized vectors are never element-null); length = min(|a|, |b|).
 */
case class IntDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_dot needs two array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntDot = copy(left = newLeft, right = newRight)
}

object GraftExpressions {
  /** Column wrapper (Spark 4 classic bridge). */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  def int_dot(a: Column, b: Column): Column =
    ColumnBridge.column(IntDot(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Register SQL-callable names so the DSL surface reaches `expr()` / SQL:
    * `SELECT graft_rolling_hash(text) FROM docs`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", exprs => RollingHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_int_dot", exprs => IntDot(exprs.head, exprs(1)), "built-in")
  }
}
