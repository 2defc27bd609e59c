package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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

object GraftExpressions {
  /** Column wrapper (Spark 4 classic bridge). */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  /** Register SQL-callable names so the DSL surface reaches `expr()` / SQL:
    * `SELECT graft_rolling_hash(text) FROM docs`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", exprs => RollingHash(exprs.head), "built-in")
  }
}
