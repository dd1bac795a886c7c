package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expressions for the hot array kernels of the dedup /
  * similarity operators. These run inside whole-stage codegen directly on
  * `UnsafeArrayData` (`getLong(i)` word reads) — no per-row Seq boxing, no
  * encoder round-trip, no UDF call overhead. On the pairwise scans
  * (millions of 6-word popcounts / 64-long dot products per query) the
  * scalar-UDF formulation spends more time materializing `Seq[Long]` per
  * call than computing; these kernels make the arithmetic the only cost.
  *
  * The reference has no analogue (its per-element compute is Python inside
  * DoFns, `lib/src/klio/transforms/decorators.py`); this is the Spark-first
  * answer to the same need — custom scalar compute that still participates
  * in Catalyst optimization and codegen.
  */
abstract class LongArrayBinary extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** popcount(A & B) over two long-array bitsets = |A ∩ B| of the encoded
  * sets. Arrays may differ in length; the overlap of the common prefix is
  * counted (same-dictionary bitsets always share length).
  */
case class IntersectBits(left: Expression, right: Expression)
    extends LongArrayBinary {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_bits"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ a(i)·b(i) over the common prefix — the integer dot product of two
  * quantized embedding vectors.
  */
case class DotLong(left: Expression, right: Expression)
    extends LongArrayBinary {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ ((double) a(i) − b(i))² folded in index order — squared L2 between a
  * quantized integer vector and a double centroid, the hottest fold of
  * every nearest-centroid / nearest-code assignment scan (corpus × k
  * candidates × 64 components). Each step is one IEEE subtraction, one
  * multiply, one add in index order — bit-identical to the
  * `zip_with`+`aggregate` HOF form it replaces (and to the oracle's
  * `list_reduce`), but a primitive loop instead of an interpreted
  * per-element lambda chain.
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sqdist_long"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val d = a.getLong(i).toDouble - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getLong($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| of two SORTED long arrays by linear merge — exact set
  * intersection for the general (large-vocabulary) shingle representation.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends LongArrayBinary {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var acc = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { acc += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val acc = ctx.freshName("acc")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $acc = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $acc++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration: exposes the kernels as SQL functions so Column
  * code reaches them via `call_function` — no private Column constructors
  * needed. Idempotent; every query entry point may call it.
  */
object LongArrayOps {
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n,
        s"$name expects $n argument(s), got ${args.length}")
      build(args)
    }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_intersect_bits" -> arity("graft_intersect_bits", 2)(
      args => IntersectBits(args(0), args(1))),
    "graft_dot_long" -> arity("graft_dot_long", 2)(
      args => DotLong(args(0), args(1))),
    "graft_sqdist_long" -> arity("graft_sqdist_long", 2)(
      args => SqDistLong(args(0), args(1))),
    "graft_sorted_intersect_count" -> arity("graft_sorted_intersect_count",
      2)(args => SortedIntersectCount(args(0), args(1))),
    "graft_elementwise_min" -> arity("graft_elementwise_min", 1)(
      args => ElementwiseMin(args(0)).toAggregateExpression()),
    "graft_elementwise_max" -> arity("graft_elementwise_max", 1)(
      args => ElementwiseMax(args(0)).toAggregateExpression()),
    "graft_elementwise_sum" -> arity("graft_elementwise_sum", 1)(
      args => ElementwiseSum(args(0)).toAggregateExpression()),
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // runtime-filter rewrites but does not expose them in the SQL
    // registry; surfacing them makes the bloom-prefilter pattern (build a
    // KB-size sketch of the small side, discard big-side rows before they
    // shuffle) available to queries directly.
    "graft_bloom_agg" -> arity("graft_bloom_agg", 3)(args =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(args(0), args(1), args(2))
        .toAggregateExpression()),
    "graft_might_contain" -> arity("graft_might_contain", 2)(args =>
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(args(0), args(1))),
    // Sidecar-compatible grouped bloom build (raw values, not hashes —
    // unlike Spark's BloomFilterAggregate above): one job builds every
    // partition leaf's bloom sidecar. args: (col, expectedItems, fpp).
    "graft_sidecar_bloom_agg" -> arity("graft_sidecar_bloom_agg", 3)(
      args => {
        def asLit(e: Expression, what: String): Any =
          if (e.foldable) e.eval()
          else throw new IllegalArgumentException(
            s"graft_sidecar_bloom_agg: $what must be a literal")
        val items = asLit(args(1), "expectedItems") match {
          case l: Long => l
          case i: Int => i.toLong
          case other => throw new IllegalArgumentException(
            s"graft_sidecar_bloom_agg: expectedItems must be integral, " +
              s"got $other")
        }
        val p = asLit(args(2), "fpp") match {
          case d: Double => d
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_sidecar_bloom_agg: fpp must be numeric, got $other")
        }
        SidecarBloomAgg(args(0), items, p).toAggregateExpression()
      }),
    "graft_topk_mg" -> arity("graft_topk_mg", 2)(args => {
      val k = args(1) match {
        case e if e.foldable => e.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_topk_mg: k must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "graft_topk_mg: k must be a literal")
      }
      MisraGriesTopK(args(0), k).toAggregateExpression()
    }),
    "graft_topk_by" -> arity("graft_topk_by", 4)(args => {
      def lit[T](e: Expression, what: String): Any =
        if (e.foldable) e.eval()
        else throw new IllegalArgumentException(
          s"graft_topk_by: $what must be a literal")
      val k = lit(args(2), "k") match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_topk_by: k must be an integer literal, got $other")
      }
      val asc = lit(args(3), "asc") match {
        case b: Boolean => b
        case other => throw new IllegalArgumentException(
          s"graft_topk_by: asc must be a boolean literal, got $other")
      }
      TopKBy(args(0), args(1), k, asc).toAggregateExpression()
    }),
    "graft_topk_merge" -> arity("graft_topk_merge", 2)(args => {
      val k = args(1) match {
        case e if e.foldable => e.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_topk_merge: k must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "graft_topk_merge: k must be a literal")
      }
      MisraGriesMergeSketches(args(0), k).toAggregateExpression()
    }))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "internal")
    }
}
