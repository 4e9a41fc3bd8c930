package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Vector math for the similarity/ANN operators (SURVEY §2.12 Q18).
  *
  * The engine's embedding kernels run on QUANTIZED vectors: each
  * component is fixed-pointed once per vector (`round(x·1e6) → BIGINT`,
  * [[quantize]]), and all pair math is then pure integer multiply-add —
  * exactly reproducible on any engine and in any partitioning/AQE order,
  * unlike float dot products which are order-sensitive.
  *
  * [[DotLongArrays]] is a native codegen'd Catalyst expression: the hot
  * loop compiles into the same whole-stage-codegen function as the
  * surrounding join/filter (~64 fused multiply-adds per pair, no
  * per-element virtual calls). An interpreted higher-order-function
  * formulation (`aggregate(zip_with(...))`) measures ~40µs/pair — at
  * corpus scale (10^9+ candidate pairs at 100 TB) that is the difference
  * between minutes and days.
  */
object VectorMath {

  /** Integer dot product of two BIGINT arrays (codegen'd). */
  case class DotLongArrays(left: Expression, right: Expression)
      extends BinaryExpression {

    // inputs must be ARRAY<BIGINT> (produced by [[quantize]]); no
    // implicit coercion — a mistyped operand fails analysis on getLong
    override def dataType: DataType = LongType
    override def prettyName: String = "dot_long"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0L
      var i = 0
      while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotLongArrays =
      copy(left = newLeft, right = newRight)
  }

  /** `dot_long(a, b)` as a Column. */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(DotLongArrays(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Integer squared L2 distance over an index range of two BIGINT
    * arrays (codegen'd): Σ_{i∈[offset, offset+len)} (a[i]−b[i])².
    *
    * The product-quantization kernels need per-SUBVECTOR distances; a
    * `slice()` formulation allocates two fresh arrays per (row, sub) —
    * 16 allocations per candidate row, which at the n·K encode stage is
    * billions of short-lived arrays. This expression walks the parent
    * arrays in place: one fused loop, zero allocation, exact integer
    * math identical to qs·qs − 2·qs·cs + cs·cs. */
  case class SubDist2LongArrays(
      left: Expression, right: Expression, offset: Int, len: Int)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "sub_dist2_long"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val end = math.min(offset + len, math.min(x.numElements(), y.numElements()))
      var acc = 0L
      var i = offset
      while (i < end) {
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val end = ctx.freshName("end")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
           |int $end = java.lang.Math.min($offset + $len,
           |    java.lang.Math.min($a.numElements(), $b.numElements()));
           |long $acc = 0L;
           |for (int $i = $offset; $i < $end; $i++) {
           |  long $d = $a.getLong($i) - $b.getLong($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SubDist2LongArrays =
      copy(left = newLeft, right = newRight)
  }

  /** `sub_dist2_long(a, b, offset, len)` as a Column (0-based offset). */
  def subDist2(a: Column, b: Column, offset: Int, len: Int): Column =
    ColumnBridge.column(SubDist2LongArrays(
      ColumnBridge.expression(a), ColumnBridge.expression(b), offset, len))

  /** Nearest-codeword assignment against a DRIVER-RESIDENT codebook
    * (codegen'd): for each of `numSubs` subvectors of `child` (length
    * `subLen` each), finds the codeword minimizing the integer squared
    * L2 distance over that range and returns
    * `[cl_0, d_0, cl_1, d_1, …]` (2·numSubs longs).
    *
    * This is the Spark-ML-KMeansModel shape for nearest-centroid work:
    * the codebook (K centroids, K bounded by the clustering knob — NOT
    * by the corpus) is collected once on the driver and rides the task
    * binary; assignment is then a pure per-row map — n rows in, n rows
    * out, ZERO extra rows materialized and zero shuffle. The previous
    * formulation (`crossJoin(broadcast(cent))` + per-(row, codeword)
    * argmin aggregation) materialized n·K intermediate rows and paid a
    * SortAggregate (struct-min aggregates have no mutable buffer, so
    * Spark falls back to sort-based aggregation) — measured 2.4–6×
    * slower at 30× data, and the gap grows with K.
    *
    * Ties break toward the SMALLEST codeword id (codebook is sorted by
    * id at construction; strict `<` keeps the first minimum) — the same
    * `(dist, cl)` lexicographic order as the SQL oracles' `ORDER BY`.
    *
    * Ragged inputs: a vector shorter than `numSubs·subLen` is treated
    * as zero-padded — the missing components contribute the codeword's
    * own `c_i²` to the distance, which is exactly the SQL oracles'
    * `n2 − 2·dot_long + cn2` with `dot_long` min-length-bounded. (A
    * fixture corpus is fixed-dim so this is belt-and-braces, but the
    * equivalence claim now holds for ALL inputs, not just uniform-dim.)
    *
    * `flat` is the row-major K×dim codeword matrix; `cls` the parallel
    * codeword ids. Both live in the expression's reference objects —
    * serialized once per stage, not per row. */
  case class NearestCodes(
      child: Expression, flat: Array[Long], cls: Array[Long],
      numSubs: Int, subLen: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    private val dim = numSubs * subLen
    require(cls.nonEmpty && flat.length == cls.length * dim,
      s"codebook shape mismatch: ${flat.length} != ${cls.length} * $dim")

    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override def prettyName: String = "nearest_codes"

    override def nullSafeEval(a: Any): Any = {
      val q = a.asInstanceOf[ArrayData]
      val out = new Array[Long](2 * numSubs)
      var s = 0
      while (s < numSubs) {
        val qBase = s * subLen
        // a short input vector is zero-padded: present components pair
        // off against the codeword, missing ones contribute c_i² (the
        // oracle's n2 − 2·dot + cn2 with a min-length-bounded dot)
        val lim = math.max(0, math.min(subLen, q.numElements() - qBase))
        var best = Long.MaxValue
        var bestCl = 0L
        var k = 0
        while (k < cls.length) {
          val base = k * dim + qBase
          var acc = 0L
          var j = 0
          while (j < lim) {
            val d = q.getLong(qBase + j) - flat(base + j)
            acc += d * d
            j += 1
          }
          while (j < subLen) {
            val c = flat(base + j)
            acc += c * c
            j += 1
          }
          if (acc < best) { best = acc; bestCl = cls(k) }
          k += 1
        }
        out(2 * s) = bestCl
        out(2 * s + 1) = best
        s += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val flatRef = ctx.addReferenceObj("flat", flat, "long[]")
      val clsRef = ctx.addReferenceObj("cls", cls, "long[]")
      nullSafeCodeGen(ctx, ev, q => {
        val out = ctx.freshName("out")
        val s = ctx.freshName("s")
        val k = ctx.freshName("k")
        val j = ctx.freshName("j")
        val acc = ctx.freshName("acc")
        val best = ctx.freshName("best")
        val bestCl = ctx.freshName("bestCl")
        val base = ctx.freshName("base")
        val qb = ctx.freshName("qb")
        val lim = ctx.freshName("lim")
        val d = ctx.freshName("d")
        s"""
           |long[] $out = new long[${2 * numSubs}];
           |for (int $s = 0; $s < $numSubs; $s++) {
           |  long $best = Long.MAX_VALUE; long $bestCl = 0L;
           |  int $qb = $s * $subLen;
           |  int $lim = java.lang.Math.max(0,
           |      java.lang.Math.min($subLen, $q.numElements() - $qb));
           |  for (int $k = 0; $k < ${cls.length}; $k++) {
           |    int $base = $k * $dim + $qb;
           |    long $acc = 0L;
           |    int $j = 0;
           |    for (; $j < $lim; $j++) {
           |      long $d = $q.getLong($qb + $j) - $flatRef[$base + $j];
           |      $acc += $d * $d;
           |    }
           |    for (; $j < $subLen; $j++) {
           |      long $d = $flatRef[$base + $j];
           |      $acc += $d * $d;
           |    }
           |    if ($acc < $best) { $best = $acc; $bestCl = $clsRef[$k]; }
           |  }
           |  $out[2 * $s] = $bestCl; $out[2 * $s + 1] = $best;
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCodes =
      copy(child = newChild)
  }

  /** `nearest_codes(q)` as a Column: per-subvector `[cl, dist2]` pairs
    * against a driver-collected codebook (see [[NearestCodes]]). */
  def nearestCodes(q: Column, flat: Array[Long], cls: Array[Long],
      numSubs: Int, subLen: Int): Column =
    ColumnBridge.column(NearestCodes(
      ColumnBridge.expression(q), flat, cls, numSubs, subLen))

  /** Fix-point a float/double vector: `round(x·1e6) → BIGINT` per
    * component, computed ONCE per vector (Spark round = DuckDB round =
    * HALF_UP away from zero, proven hash-identical by the q18 oracles).
    * All downstream pair math is integer-exact. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * lit(1e6)).cast("long"))

  /** Collect a centroid/codeword table to the driver as the (flat
    * row-major matrix, sorted id array) pair [[NearestCodes]] wants.
    * The collect is K-bounded (the clustering knob, NOT the corpus):
    * K·dim longs — 2 MB at K=4096, dim=64 — well inside any driver.
    * Sorted by id so the expression's first-strict-minimum tie-break
    * equals the oracles' `ORDER BY dist, cl`. */
  def collectCodebook(cent: org.apache.spark.sql.DataFrame,
      idCol: String, vecCol: String): (Array[Long], Array[Long]) = {
    val rows = cent.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)).collect()
    val cls = rows.map(_.getLong(0))
    val flat = rows.flatMap(_.getSeq[Long](1)).toArray
    (flat, cls)
  }

  /** Register SQL function `dot_long(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_long", exprs => DotLongArrays(exprs.head, exprs(1)), "built-in")
}
