package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cosine similarity as a native Catalyst expression (SURVEY §4.3 /
  * north-star similarity search).
  *
  * Preference order (b) from the build brief: a scalar the built-ins can only
  * express via nested higher-order functions (zip_with + aggregate), which
  * break whole-stage codegen in the hot loop of a k-NN join. This expression
  * generates a tight Java loop (`doGenCode`) over the two float/double
  * arrays — one pass accumulating dot, |a|² and |b|² — so the brute-force
  * scan stays inside WholeStageCodegen.
  *
  * Accumulation is sequential left-to-right in double precision: the result
  * is bit-deterministic for a given pair regardless of partitioning, which
  * the cross-engine oracle comparison relies on.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$lGet($i);
         |  double $yi = (double) $b.$rGet($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  private def litInt(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }

  /** Register engine scalar functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0), litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "hashed_word_shingles", exprs => HashedWordShingles(exprs(0), litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "word_ngram_list", exprs => WordNgramList(exprs(0), litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "winnow_fingerprint",
      exprs => WinnowedFingerprint(exprs(0), litInt(exprs(1)), litInt(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
  }

  /** Column handles for the native expressions (require register()). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def wordShingles(text: Column, n: Int): Column =
    call_function("word_shingles", text, lit(n))
  def hashedWordShingles(text: Column, n: Int): Column =
    call_function("hashed_word_shingles", text, lit(n))
  def wordNgramList(text: Column, n: Int): Column =
    call_function("word_ngram_list", text, lit(n))
  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    call_function("winnow_fingerprint", text, lit(k), lit(w))
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)

  /** Builtin-composed equivalent (zip_with + aggregate fold; same
    * left-to-right double accumulation — used to cross-check the native
    * expression in tests, and as the no-extensions fallback). */
  def cosineSimBuiltin(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(ad, lit(0.0), (acc, x) => acc + x * x)
    val nb = aggregate(bd, lit(0.0), (acc, x) => acc + x * x)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dot / (sqrt(na) * sqrt(nb)))
  }
}
