package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)` is semantically right but
  * runs as interpreted higher-order functions — per-pair closure dispatch and
  * boxing on a path executed O(n²) times in similarity search. These
  * expressions generate a primitive float loop inside whole-stage codegen
  * (~40× less work per pair) while accumulating in exactly the same order
  * (index-ascending, double accumulator), so results are bit-identical to
  * the HOF formulation and to the DuckDB oracle.
  *
  * Elements are assumed non-null (enforced by the embedding schema).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"vec_dot expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** √(Σ aᵢ²) with the same accumulation order as [[FloatVectorDot]](a, a). */
case class FloatVectorNorm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"vec_norm expects array<float>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-centroid quantizer scores ‖c‖² − 2·v·c (the ‖v−c‖² argmin with the
  * rank-invariant v·v dropped) for all k centroids in one pass.
  *
  * Centroids ride along as a reference object, NOT as literals: the
  * generated source is identical across Lloyd iterations, so the janino
  * codegen cache is hit instead of recompiling a fresh plan per iteration
  * (the literal-array formulation re-JIT'd every round — the dominant cost
  * of ivfTopK's training loop at small scale).
  *
  * Arithmetic contract (shared with the DuckDB oracle): cc accumulates
  * centroid components squared in index order (double), the dot accumulates
  * v[d]·c[d] in index order (double), score = cc − 2·dot. */
case class CentroidScores(child: Expression, cents: Array[Float], k: Int, dim: Int)
    extends UnaryExpression {

  require(cents.length == k * dim, "centroid matrix shape mismatch")

  private lazy val cc: Array[Double] = Array.tabulate(k) { i =>
    var acc = 0.0
    var d = 0
    while (d < dim) { val x = cents(i * dim + d).toDouble; acc += x * x; d += 1 }
    acc
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"ivf_scores expects array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "ivf_scores"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Double](k)
    var i = 0
    while (i < k) {
      var acc = 0.0
      var d = 0
      while (d < n) { acc += v.getFloat(d).toDouble * cents(i * dim + d).toDouble; d += 1 }
      out(i) = cc(i) - 2.0 * acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "float[]")
    val ccRef = ctx.addReferenceObj("cc", cc, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $out = new double[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += ((double) $v.getFloat($d)) * ((double) $cRef[$i * $dim + $d]);
         |  }
         |  $out[$i] = $ccRef[$i] - 2.0 * $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared scoring kernel for the packed-block cosine pair generators. */
private[functions] object VecPairs {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** The packed-block element shape both generators require: reading any
    * other struct layout through getLong/getFloat would silently
    * reinterpret bytes, so the analyzer must reject it. */
  def checkPackedInput(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(org.apache.spark.sql.types.StructType(fields), _)
        if fields.length == 2 &&
          fields(0).dataType == org.apache.spark.sql.types.LongType &&
          (fields(1).dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          }) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<struct<bigint, array<float>>>, got $other")
  }

  val outType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_a", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("vec_b", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cosine_sim", DoubleType, nullable = false))),
    containsNull = false)

  /** Unpack array<struct<vec_id:long, embedding:array<float>>> into primitive
    * arrays with per-vector norms (index-order double accumulation, the
    * [[FloatVectorNorm]] contract). Entries with a null id or null embedding
    * are skipped — the join formulation dropped them through null
    * propagation (null join keys never match; vec_dot of null is null). */
  def unpack(vs: ArrayData): (Array[Long], Array[Array[Float]], Array[Double]) = {
    val n = vs.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    val norms = new Array[Double](n)
    var m = 0
    var i = 0
    while (i < n) {
      val row = vs.getStruct(i, 2)
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        ids(m) = row.getLong(0)
        val e = row.getArray(1)
        val d = e.numElements()
        val v = new Array[Float](d)
        var k = 0
        var acc = 0.0
        while (k < d) {
          val x = e.getFloat(k)
          v(k) = x
          acc += x.toDouble * x.toDouble
          k += 1
        }
        vecs(m) = v
        norms(m) = math.sqrt(acc)
        m += 1
      }
      i += 1
    }
    if (m == n) (ids, vecs, norms)
    else (ids.take(m), vecs.take(m), norms.take(m))
  }

  /** Sentinel meaning "this pair is dropped" — the zero-denominator case,
    * where the join formulation produced null and `filter(null >= t)`
    * dropped the row (the DuckDB oracle NULLIFs identically). */
  val Dropped: Double = java.lang.Double.NEGATIVE_INFINITY

  /** round(dot/denom, 6) with Spark's Round semantics: HALF_UP on
    * BigDecimal.valueOf, and NaN/±Infinity pass through unchanged (Spark's
    * RoundBase guards them; BigDecimal.valueOf would throw on NaN). */
  def cosineRounded(a: Array[Float], na: Double, b: Array[Float], nb: Double): Double = {
    val denom = na * nb
    if (denom == 0) return Dropped
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    val r = acc / denom
    if (java.lang.Double.isNaN(r) || java.lang.Double.isInfinite(r)) r
    else java.math.BigDecimal.valueOf(r)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** The join formulation's threshold filter under Spark SQL comparison
    * semantics, which order NaN GREATER than every number — so a NaN cosine
    * passes `>= t` on both engines and must be emitted, not dropped. −Inf
    * (the [[Dropped]] sentinel and any true −Inf cosine) never passes. */
  def passes(c: Double, threshold: Double): Boolean =
    java.lang.Double.isNaN(c) || c >= threshold

  /** Equal ids never pair: the join formulations this kernel replaces used
    * a strict `vec_id < vec_id` condition (as does the DuckDB oracle), so a
    * duplicated vec_id must not produce an (x, x, 1.0) self-pair here. */
  def emit(out: java.util.ArrayList[Any], idA: Long, idB: Long, cos: Double): Unit = {
    if (idA == idB) return
    val (x, y) = if (idA < idB) (idA, idB) else (idB, idA)
    out.add(new GenericInternalRow(Array[Any](x, y, cos)): InternalRow)
  }

  def result(out: java.util.ArrayList[Any]): GenericArrayData =
    new GenericArrayData(out.toArray)
}

/** All qualifying cosine pairs within one packed vector block: input
  * array<struct<vec_id, embedding>>, output array<struct<vec_a, vec_b,
  * cosine_sim>> for every unordered pair with rounded cosine ≥ threshold.
  *
  * This is the in-place expansion of an LSH bucket (or a diagonal block of
  * the exact blocked scorer): candidates are scored and filtered BEFORE they
  * ever become rows, so the shuffle after this carries survivors only —
  * the candidate set itself (quadratic in bucket size) never materializes.
  * Arithmetic is the [[FloatVectorDot]]/[[FloatVectorNorm]] contract, so
  * results are bit-identical to the join-and-score formulation and to the
  * DuckDB oracle. */
case class VecPairsWithin(child: Expression, threshold: Double)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    VecPairs.checkPackedInput(child.dataType, prettyName)
  override def dataType: DataType = VecPairs.outType
  override def prettyName: String = "vec_pairs_within"

  override protected def nullSafeEval(input: Any): Any = {
    val (ids, vecs, norms) = VecPairs.unpack(input.asInstanceOf[ArrayData])
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < ids.length) {
      var j = i + 1
      while (j < ids.length) {
        val c = VecPairs.cosineRounded(vecs(i), norms(i), vecs(j), norms(j))
        if (VecPairs.passes(c, threshold)) VecPairs.emit(out, ids(i), ids(j), c)
        j += 1
      }
      i += 1
    }
    VecPairs.result(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All qualifying cosine pairs between two packed vector blocks (the
  * off-diagonal case of the exact blocked scorer). Pairs are emitted with
  * vec_a = min(id), vec_b = max(id), so block assignment never affects the
  * output ordering contract. */
case class VecPairsBetween(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(e => VecPairs.checkPackedInput(e.dataType, prettyName))
      .find(_.isFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def dataType: DataType = VecPairs.outType
  override def prettyName: String = "vec_pairs_between"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (idsA, vecsA, normsA) = VecPairs.unpack(a.asInstanceOf[ArrayData])
    val (idsB, vecsB, normsB) = VecPairs.unpack(b.asInstanceOf[ArrayData])
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < idsA.length) {
      var j = 0
      while (j < idsB.length) {
        val c = VecPairs.cosineRounded(vecsA(i), normsA(i), vecsB(j), normsB(j))
        if (VecPairs.passes(c, threshold)) VecPairs.emit(out, idsA(i), idsB(j), c)
        j += 1
      }
      i += 1
    }
    VecPairs.result(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Register `vec_dot` / `vec_norm` on the session's function registry so
    * they are callable from expr()/SQL. Idempotent, runtime-safe on any
    * session (no SparkSessionExtensions wiring needed by callers). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => FloatVectorDot(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[FloatVectorNorm].getName, "vec_norm"),
      (children: Seq[Expression]) => FloatVectorNorm(children.head))
  }

  /** Bind `vec_pairs_within` / `vec_pairs_between` to a cosine threshold
    * under threshold-ENCODED function names (as registerSrp does for its
    * constants) and return the `(within, between)` names to call. A bare
    * shared name rebound per call would make plan correctness depend on
    * analysis happening eagerly between two registrations — two operators
    * building plans concurrently on one session (or a future lazy-analysis
    * path) could silently capture the wrong threshold. Name-encoding makes
    * every binding immutable; re-registering the same threshold is an
    * idempotent overwrite with an identical builder. */
  def registerPairs(spark: SparkSession, threshold: Double): (String, String) = {
    val tag = java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(threshold))
    val within = s"vec_pairs_within_$tag"
    val between = s"vec_pairs_between_$tag"
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(within),
      new ExpressionInfo(classOf[VecPairsWithin].getName, within),
      (children: Seq[Expression]) => VecPairsWithin(children.head, threshold))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(between),
      new ExpressionInfo(classOf[VecPairsBetween].getName, between),
      (children: Seq[Expression]) => VecPairsBetween(children(0), children(1), threshold))
    (within, between)
  }

  /** (Re-)bind `ivf_scores` to a centroid matrix (flattened [cell][dim]).
    * Column analysis is eager, so a caller that registers, builds its
    * DataFrame, and registers again for the next Lloyd round gets the right
    * binding in each plan. */
  def registerCentroidScores(spark: SparkSession, cents: Array[Float], k: Int, dim: Int): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ivf_scores"),
      new ExpressionInfo(classOf[CentroidScores].getName, "ivf_scores"),
      (children: Seq[Expression]) => CentroidScores(children.head, cents, k, dim))
  }
}
