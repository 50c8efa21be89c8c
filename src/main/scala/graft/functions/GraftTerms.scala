package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.analyze.Tokenizer

/** Native Catalyst expression for the analyzer: content -> index terms
  * (words + 12-bit shingle hash terms), byte-identical to
  * [[Tokenizer.termsScala]] / the built-in-composed [[Tokenizer.terms]].
  *
  * Why a custom Expression exists (SURVEY.md §7.6 escalation): the
  * built-in composition routes the per-shingle md5 through higher-order
  * function lambdas, which evaluate interpreted with a fresh MessageDigest
  * per element — profiled ~10-100x slower than this single eval call. This
  * is also the engine's registered-scalar-function surface, the analog of
  * the reference's `lirefunc` ValueSourceParser registration
  * (`/root/reference/src/main/java/net/semanticmetadata/lire/solr/LireValueSourceParser.java:64-81`,
  * solrconfig.xml:802-803): usable in projections, filters, sorts and SQL
  * text after [[GraftFunctions.register]].
  */
case class GraftTerms(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_terms"

  override def nullSafeEval(input: Any): Any = {
    val terms = Tokenizer.termsScala(input.toString)
    val out = new Array[Any](terms.length)
    var i = 0
    while (i < terms.length) { out(i) = UTF8String.fromString(terms(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftTerms =
    copy(child = newChild)
}

/** Token-count twin (dl = 2n-1 included): content -> int. */
case class GraftDocLen(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_doclen"
  override def nullSafeEval(input: Any): Any =
    Tokenizer.dlOf(Tokenizer.tokenCountScala(input.toString))
  override protected def withNewChildInternal(newChild: Expression): GraftDocLen =
    copy(child = newChild)
}

object GraftFunctions {
  /** Column-space entry points (no registration needed). */
  def graft_terms(c: Column): Column =
    GraftBridge.column(GraftTerms(GraftBridge.expression(c)))
  def graft_doclen(c: Column): Column =
    GraftBridge.column(GraftDocLen(GraftBridge.expression(c)))

  /** SQL registration: SELECT graft_terms(content) ... (lirefunc analog). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_terms", exprs => GraftTerms(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_doclen", exprs => GraftDocLen(exprs.head), "scala_udf")
  }
}
