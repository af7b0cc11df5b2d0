package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram construction in one compiled loop per row.
  *
  * The declarative formulation — `transform(sequence(1, m-n+1),
  * i -> concat_ws(" ", slice(toks, i, n)))` — dispatches an interpreted
  * lambda per position and allocates a slice array per n-gram; on a corpus
  * pass that is the single hottest text kernel (every dedup/fingerprint
  * operator starts here). This expression builds the same strings
  * (space-joined, `array_distinct` first-occurrence order when distinct)
  * in one JVM loop. CodegenFallback: the win is removing per-element
  * interpretation, not fusing into surrounding codegen.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"word_ngrams expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val count = m - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 0
      while (i < count) {
        seen.add(gram(toks, i))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) { out(i) = gram(toks, i); i += 1 }
      new GenericArrayData(out)
    }
  }

  private def gram(toks: ArrayData, start: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 0
    while (j < n) {
      parts(2 * j) = toks.getUTF8String(start + j)
      if (j < n - 1) parts(2 * j + 1) = space
      j += 1
    }
    UTF8String.concat(parts: _*)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Register `word_ngrams_distinct` / `word_ngrams_pos` for a given n. */
  def register(spark: SparkSession, n: Int): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(s"word_ngrams_distinct_$n"),
      new ExpressionInfo(classOf[WordNgrams].getName, s"word_ngrams_distinct_$n"),
      (children: Seq[Expression]) => WordNgrams(children.head, n, distinct = true))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(s"word_ngrams_pos_$n"),
      new ExpressionInfo(classOf[WordNgrams].getName, s"word_ngrams_pos_$n"),
      (children: Seq[Expression]) => WordNgrams(children.head, n, distinct = false))
  }
}
