package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Whole-signature MinHash in one array traversal.
  *
  * The naive formulation — one `array_min(transform(hv, h -> (aᵢ·h+bᵢ) mod p))`
  * per signature position — re-traverses the hash array once per position as
  * an interpreted higher-order function: 12 positions × per-element closure
  * dispatch, measured at 64 s for the sf0.1 LSH pass. This expression folds
  * the array once inside whole-stage codegen, carrying all k running minima,
  * with arithmetic identical to the per-position form (same (a·h+b) mod p in
  * 64-bit integers, same min), so band keys — and the DuckDB oracle, which
  * keeps the per-position formulation — are bit-identical.
  *
  * Returns NULL for an empty input array, mirroring `array_min`'s NULL on
  * empty so downstream `concat_ws` behavior is unchanged.
  */
case class MinHashSignature(child: Expression, seedsA: Array[Long], seedsB: Array[Long], prime: Long)
    extends UnaryExpression {

  require(seedsA.length == seedsB.length, "seed arrays must be the same length")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  // NULL on empty input regardless of child nullability
  override def nullable: Boolean = true

  private def k: Int = seedsA.length

  override protected def nullSafeEval(input: Any): Any = {
    val hv = input.asInstanceOf[ArrayData]
    val n = hv.numElements()
    if (n == 0) return null
    val m = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hv.getLong(i)
      var s = 0
      while (s < k) {
        val v = (seedsA(s) * h + seedsB(s)) % prime
        if (v < m(s)) m(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("seedsA", seedsA, "long[]")
    val bRef = ctx.addReferenceObj("seedsB", seedsB, "long[]")
    nullSafeCodeGen(ctx, ev, hv => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val m = ctx.freshName("m")
      s"""
         |int $n = $hv.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $m = new long[$k];
         |  java.util.Arrays.fill($m, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $hv.getLong($i);
         |    for (int $s = 0; $s < $k; $s++) {
         |      long $v = ($aRef[$s] * $h + $bRef[$s]) % ${prime}L;
         |      if ($v < $m[$s]) $m[$s] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($m);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-random-projection codes for `tables` LSH tables of `bits` planes
  * each, in one codegen'd pass: code t = Σ_j (dot(v, plane_{t·bits+j}) ≥ 0) << j.
  *
  * Every dot product accumulates element-wise in index order with a double
  * accumulator (float element widened first) — the exact sequence the DuckDB
  * oracle's `list_sum(list_transform(generate_series(1,dim), d -> v[d]::DOUBLE
  * * comps[d]))` produces, so the sign decisions are bit-identical across
  * engines. `planes` is the flattened [plane][dim] component matrix.
  *
  * The naive column formulation (64 element_at terms per plane × 240 planes)
  * would be a 15k-node expression tree — this keeps it one expression and
  * one tight loop. */
case class SrpCodes(child: Expression, planes: Array[Double], bits: Int, tables: Int, dim: Int)
    extends UnaryExpression {

  require(planes.length == bits * tables * dim, "plane matrix shape mismatch")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"srp_codes expects array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var acc = 0.0
        var d = 0
        while (d < n) { acc += v.getFloat(d).toDouble * planes(base + d); d += 1 }
        // !(acc < 0), not acc >= 0: SQL comparison orders NaN above every
        // number on both engines, so a NaN dot sets the bit — Java's >=
        // would drop it and diverge from the declarative column and DuckDB
        if (!(acc < 0)) code |= (1L << j)
        j += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val code = ctx.freshName("code")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $code = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($t * $bits + $j) * $dim;
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $acc += ((double) $v.getFloat($d)) * $pRef[$base + $d];
         |    }
         |    if (!($acc < 0)) $code |= (1L << $j); // NaN sets the bit (SQL NaN ordering)
         |  }
         |  $out[$t] = $code;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| for two SORTED string arrays by linear merge — the set-similarity
  * verify kernel. `array_intersect` builds a hash set per pair (per-pair
  * allocation on a path executed once per candidate); sorted inputs make the
  * count a single O(|A|+|B|) merge with zero allocation. Inputs MUST be
  * sorted ascending (binary UTF8 order, i.e. `array_sort`) and distinct;
  * the count equals `size(array_intersect(a, b))` exactly. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects array<string> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var cnt = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0, $j = 0, $cnt = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) $i++;
         |  else $j++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HashExpressions {
  /** Register `minhash_sig` (with the graft MinHash seed family baked in) on
    * the session's function registry. Idempotent, runtime-safe. */
  def register(spark: SparkSession): Unit = {
    val seedsA = graft.operators.Dedup.MinhashSeeds.map(_._1).toArray
    val seedsB = graft.operators.Dedup.MinhashSeeds.map(_._2).toArray
    val prime = graft.operators.Dedup.MinhashPrime
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSignature(children.head, seedsA, seedsB, prime))
  }

  /** Register `sorted_intersect_count` on the session's registry. */
  def registerIntersect(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1)))
  }

  /** Register the SRP code kernel for a given plane matrix (flattened
    * [plane][dim]) and return the registered name. The name is keyed on the
    * (bits, tables, dim) configuration so two operators with different
    * table families in one session can never capture each other's binding
    * through deferred Column resolution (the plane constants themselves are
    * a pure function of (plane, dim) via planeComponent, so a name equals
    * exactly one plane matrix). */
  def registerSrp(spark: SparkSession, planes: Array[Double], bits: Int, tables: Int, dim: Int): String = {
    val name = s"srp_codes_${bits}x${tables}x$dim"
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[SrpCodes].getName, name),
      (children: Seq[Expression]) => SrpCodes(children.head, planes, bits, tables, dim))
    name
  }
}
