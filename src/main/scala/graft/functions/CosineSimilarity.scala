package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two double arrays.
  *
  * The higher-order-function spelling ([[graft.sim.Similarity.cosine]])
  * allocates an intermediate array per row (`zip_with`) and interprets two
  * lambdas; this expression runs one fused loop in generated Java inside
  * whole-stage codegen — the hot-path form for 100 TB similarity scans.
  * Accumulation order (single left-to-right pass, dot/(sqrt(nx)*sqrt(ny)))
  * is identical to the HOF spelling and the DuckDB oracle, so results are
  * bit-equal across all three.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |int $n = java.lang.Math.min($x.length, $y.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $x[$i] * $y[$i];
         |  $nx += $x[$i] * $x[$i];
         |  $ny += $y[$i] * $y[$i];
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over two double arrays — same codegen pattern as
  * [[CosineSimilarity]], used on the pure-map hot paths (LSH signing, IVF
  * cell ranking) where the higher-order spelling allocates an intermediate
  * array per (row, plane). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    var dot = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { dot += x(i) * y(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |double $dot = 0.0;
         |int $n = java.lang.Math.min($x.length, $y.length);
         |for (int $i = 0; $i < $n; $i++) { $dot += $x[$i] * $y[$i]; }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** The single source of truth for the SQL binding — shared by
    * [[register]] (live-session path) and [[GraftExtensions]]
    * (session-build path) so the copies can't drift. */
  private[functions] def sqlFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  /** Idempotent SQL registration: `SELECT dot_product(a, b)`. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = sqlFunction
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

object CosineSimilarity {
  /** Column-API entry: cosineSim(a, b) on array<double> (cast as needed). */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** The single source of truth for the SQL binding — see
    * [[DotProduct.sqlFunction]]. */
  private[functions] def sqlFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  /** Idempotent SQL registration: `SELECT cosine_sim(a, b)`. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = sqlFunction
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

/** Optimizer rule: fuse the three-pass cosine spelling
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` into the single-pass
  * [[CosineSimilarity]] kernel. Bit-identical by construction — the fused
  * loop accumulates dot/nx/ny each left-to-right, exactly like the three
  * separate passes — so the rewrite is always safe; it just reads each
  * array once instead of three times (and five in the self-join case). */
object FuseCosine
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}

  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      // accept both operand orders of the norm product — sqrt(aa)*sqrt(bb)
      // and the commuted sqrt(bb)*sqrt(aa) spell the same denominator
      case Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a2, b2)), Sqrt(DotProduct(a3, b3)), _), _)
        if (a2.semanticEquals(a) && b2.semanticEquals(a) &&
            a3.semanticEquals(b) && b3.semanticEquals(b)) ||
           (a2.semanticEquals(b) && b2.semanticEquals(b) &&
            a3.semanticEquals(a) && b3.semanticEquals(a)) =>
        CosineSimilarity(a, b)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` wires the custom
  * functions AND the cosine fusion rule into any session at build time
  * (the SparkSessionExtensions path — no Spark fork, no reflection). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(CosineSimilarity.sqlFunction)
    ext.injectFunction(DotProduct.sqlFunction)
    ext.injectOptimizerRule(_ => FuseCosine)
  }
}
