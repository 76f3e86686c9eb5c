package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_vec_dot(a, b)` — dot product of two numeric arrays
  * (float or double elements) with a strict left-to-right double
  * accumulation, exactly the IEEE operation sequence of
  * `aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y),
  * 0.0D, (acc, v) -> acc + v)` — so results are bit-identical to that
  * interpreted fold (and to DuckDB's `list_sum(list_transform(...))`
  * used by the oracles) while running inside whole-stage codegen.
  * Edge semantics match the fold too: mismatched array lengths return
  * NULL (zip_with pads with null and the fold propagates it), and a
  * null element in either array returns NULL.
  *
  * Exists for performance only: Spark's higher-order functions
  * interpret the lambda per element, which dominated the similarity
  * benchmarks (a 64-dim cosine per candidate pair); this expression
  * compiles to a tight primitive loop. Scale extension — no reference
  * analog (the reference has no vector ops).
  */
case class VecFloatDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  /** Mismatched lengths (a runtime property) return NULL, so the
    * result can be null even for non-null inputs. */
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def mayHaveNullElems(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  // per-expression constants, hoisted off the interpreted per-row path
  // (lazy: dataType is only callable once the expression is resolved)
  private lazy val xf = elemType(left) == FloatType
  private lazy val yf = elemType(right) == FloatType
  private lazy val checkNulls =
    mayHaveNullElems(left) || mayHaveNullElems(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      def getter(arr: String, e: Expression): String =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      // element null checks compile away entirely when the schema says
      // neither array can contain nulls (the embeddings hot path)
      val nullCheck =
        if (mayHaveNullElems(left) || mayHaveNullElems(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  int $n = $a.numElements();
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $nullCheck
        |    $acc += (${getter(a, left)}) * (${getter(b, right)});
        |  }
        |  if (!${ev.isNull}) ${ev.value} = $acc;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecFloatDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = GraftFunctions.VecDotName
}

/** Session registration for graft's native expressions — makes them
  * callable from SQL fragments (`expr("graft_vec_dot(a, b)")`).
  * Idempotent; call before building a plan that uses them. */
object GraftFunctions {
  val VecDotName = "graft_vec_dot"

  /** The ONE encoder plumbing for the bounded aggregators — query-pack
    * call sites use these instead of rebuilding the udaf + encoder
    * tuple at each site (an input-type change would otherwise need
    * editing in half a dozen places). */
  def kmvUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvSketch(k),
      org.apache.spark.sql.Encoders.LONG)

  def topkUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.DOUBLE,
        org.apache.spark.sql.Encoders.LONG))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      VecDotName,
      exprs => {
        require(exprs.length == 2, s"$VecDotName expects 2 arguments")
        VecFloatDot(exprs.head, exprs(1))
      },
      "built-in")
    // bounded-state aggregators on the SQL surface:
    //   graft_kmv64(hash BIGINT)            -> ARRAY<BIGINT> k-min sketch
    //   graft_topk10(score DOUBLE, id BIGINT) -> ARRAY<STRUCT<_1,_2>>
    spark.udf.register("graft_kmv64", kmvUdaf(64))
    spark.udf.register("graft_topk10", topkUdaf(10))
    ()
  }
}
