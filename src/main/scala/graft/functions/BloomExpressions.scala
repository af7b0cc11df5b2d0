package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, as a codegen'd
  * Catalyst expression — the explicit form of the fact-side pre-filter a
  * shuffled semi join wants at scale: probe each fact row against a
  * compact sketch of the (already filtered) dimension keys BEFORE the
  * shuffle, so rows that cannot match never leave the scan stage. False
  * positives are possible by construction; the real join above removes
  * them, so the operator composition stays exact.
  *
  * The filter rides along as serialized bytes on the expression
  * (deserialized once per executor via a transient lazy), and the
  * generated code calls back into [[BloomMightContain.test]] — the probe
  * is a few hashes per row, dwarfed by the shuffle write it saves. The
  * generated source is identical for any filter (the bytes live in the
  * reference array), so the janino codegen cache is hit across rebuilds.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bloom_might_contain expects BIGINT, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any = test(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.test($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {

  /** Register a probe bound to `bloom` under a content-tagged name (the
    * registerPairs/registerSrp convention: bindings are immutable, so a
    * plan can never capture a later rebuild's filter) and return the name
    * to `call_function`. */
  def registerBloom(spark: SparkSession, bloom: BloomFilter): String = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    val bytes = bos.toByteArray
    val tag = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .take(6).map(b => f"$b%02x").mkString
    val name = s"bloom_might_contain_$tag"
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[BloomMightContain].getName, name),
      (children: Seq[Expression]) => BloomMightContain(children.head, bytes))
    name
  }
}
