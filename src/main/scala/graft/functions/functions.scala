package graft.functions

import graft.core.{Blake2b, Metadata, Translator}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** blake2b-16 hex digest as a native Catalyst expression.
  *
  * The reference's content hash (C6, `dlfile.py:221-235`) has no Spark
  * builtin. A native `Expression` with `doGenCode` keeps it inside
  * whole-stage codegen (a Scala UDF would break the codegen span and add
  * serialization overhead per row) — used by verification/re-hash jobs
  * over content columns.
  */
case class Blake2bExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "blake2b"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Blake2b.hexDigest(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.core.Blake2b.hexDigest($c, 16))")

  override protected def withNewChildInternal(newChild: Expression): Blake2bExpr =
    copy(child = newChild)
}

/** Column + SQL registration surface for the engine's custom functions
  * (SURVEY §2.8): blake2b (native expression), translate_path and
  * normalize_date (deterministic Scala UDFs). */
object functions {

  import org.apache.spark.sql.graftbridge.Bridge

  /** blake2b-16 hex digest of a binary column. */
  def blake2b(c: Column): Column =
    Bridge.column(Blake2bExpr(Bridge.expression(c.cast(BinaryType))))

  /** Arity-checked expression builder shared by every registration path. */
  def blake2bBuilder(
      exprs: Seq[Expression]): Blake2bExpr = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"blake2b requires exactly one argument, got ${exprs.length}")
    Blake2bExpr(exprs.head)
  }

  /** Register blake2b for SQL usage plus the UDF-surface functions. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "blake2b", blake2bBuilder, "scala_udf")
    // Translator (C7): expression is a constructor argument so the
    // compiled regex is reused across rows
    spark.udf.register("normalize_date",
      (s: String) => Metadata.normalizeDate(s))
  }

  /** A per-expression path-translation UDF (C7, `translator.py:24-99`). */
  def translatePathUdf(translationExpression: String)
    : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val t = Translator(translationExpression)
    org.apache.spark.sql.functions.udf((path: String) => t.translate(path))
  }
}
