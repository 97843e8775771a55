package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit, typedLit}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Fused cosine similarity over two `array<double>` columns — a native
  * Catalyst expression with whole-stage codegen.
  *
  * The compositional form (`zip_with` product + three `aggregate` folds,
  * VectorFunctions.cosine) allocates an intermediate array and walks both
  * inputs four times per row; this expression is one fused loop, no
  * allocation. Semantics are IDENTICAL (same ascending-index accumulation
  * per sum, so float results stay bit-for-bit equal to the compositional
  * form and the DuckDB oracle) — asserted in PlansSpec.
  *
  * Exposed through the session FunctionRegistry (GraftFunctions.register)
  * and `call_function` — the public seam for custom expressions.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // fail at analysis, not with garbage similarities at runtime: getDouble
  // over an array<float>'s 4-byte slots silently reads misaligned bytes
  // (the HyperplaneSketch/Md5Prefix32 seam; a SQL user can reach this
  // directly on parquet float arrays via cosine_fused)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_fused requires two ARRAY<DOUBLE> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    // zero vector -> 0.0, not NaN (0/0): a single NaN would poison any
    // aggregate over similarities (e.g. k-means|| cost sums) and the
    // driver-side Ivf.cosine already defines the zero case as 0
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $a.getDouble($i);
          double $yi = $b.getDouble($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
          : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Fused hyperplane sign-bit sketch over an `array<double>` column: bit p of
  * the result is set iff plane p ⋅ v > 0. One native loop over a
  * plane matrix held ONCE per expression instance (codegen references it via
  * `addReferenceObj`), replacing the composed form's dim×nPlanes
  * `conv(substring(md5(...)))` expression tree — at production embedding
  * dims (512–1536 × 48 planes) that tree is a constant-folding/codegen
  * blowup; this is a single O(dim·nPlanes) kernel.
  *
  * Plane components are derived EXACTLY as the composed form folds them
  * (first 8 hex chars of md5("p:j") as uint32, scaled to [-0.5, 0.5)), and
  * each dot product accumulates in ascending-j order — so bucket ids are
  * bit-identical to the legacy expression tree (asserted in PlansSpec).
  */
case class HyperplaneSketch(child: Expression, dim: Int, nPlanes: Int)
    extends UnaryExpression {

  // Java's long shift is mod 64: `1L << 64` silently aliases plane 64 onto
  // bit 0, producing colliding buckets and degraded recall with no error in
  // either eval path — fail construction instead.
  require(nPlanes >= 1 && nPlanes <= 64,
    s"hyperplane_sketch supports 1..64 planes (one long of sign bits), got $nPlanes")

  override def dataType: DataType = LongType

  // fail at analysis, not with garbage buckets at runtime: getDouble on an
  // array<float>'s 4-byte slots would silently read misaligned bytes
  // (same seam as Md5Prefix32 — ExpectsInputTypes is private[sql])
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sketch requires ARRAY<DOUBLE> input, got ${other.catalogString}")
    }

  @transient private lazy val planes: Array[Array[Double]] =
    HyperplaneSketch.planeMatrix(dim, nPlanes)

  private def sketch(v: ArrayData): Long = {
    val n = math.min(dim, v.numElements())
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val u = planes(p)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v.getDouble(j) * u(j); j += 1 }
      if (dot > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override def nullSafeEval(a: Any): Any = sketch(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val u = ctx.freshName("u")
      s"""
        int $n = java.lang.Math.min($dim, $a.numElements());
        ${ev.value} = 0L;
        for (int $p = 0; $p < $nPlanes; $p++) {
          double[] $u = $planesRef[$p];
          double $dot = 0.0;
          for (int $j = 0; $j < $n; $j++) { $dot += $a.getDouble($j) * $u[$j]; }
          if ($dot > 0) ${ev.value} |= 1L << $p;
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch =
    copy(child = newChild)
}

object HyperplaneSketch {
  /** Deterministic pseudo-random plane matrix: component (p, j) =
    * uint32(md5("p:j")[0:8]) / 2^32 - 0.5 — the exact value the composed
    * `conv(substring(md5(lit("p:j")), 1, 8), 16, 10) / 2^32 - 0.5` chain
    * constant-folds to (8 hex chars < 2^32 are exact in double; the divide
    * by a power of two is exact). */
  def planeMatrix(dim: Int, nPlanes: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (p, j) =>
      val hex = md.digest(s"$p:$j".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
    }
  }
}

/** Map-side nearest-centroid by cosine over a DRIVER-EMBEDDED centroid set:
  * returns struct(cid BIGINT, sim DOUBLE) for the argmax-cosine centroid of
  * the input `array<double>` vector, ties broken by ascending cid.
  *
  * This is the zero-exchange replacement for the crossJoin +
  * `row_number() over partitionBy(vec_id)` argmin in k-means assignment:
  * the window form forces an Exchange of all N×k scored rows per Lloyd
  * round, while centroids are only k×dim doubles — driver-tiny — so the
  * argmin belongs in ONE projection. Per-pair cosine accumulates dot/norms
  * in ascending index order, exactly like CosineSimilarity (zero-vector →
  * 0.0), so the selected centroid is bit-identical to the window form's
  * `orderBy(sim desc, cid asc)` winner.
  *
  * `nanWins` pins the NaN rule to the window form being replaced — the two
  * k-means passes DISAGREE: the assign window (`sim DESC`) puts NaN first
  * (Spark sorts NaN greatest), so a NaN sim wins; the k-means|| distance
  * window (`d ASC`, d = 1 − sim) puts NaN last, so a NaN candidate LOSES.
  * A single hard-coded rule silently inverted one of them (a NaN
  * candidate would poison every distance to NaN and collapse the
  * oversampling cost loop).
  *
  * `cids`/`cents` are Seq (not Array) so case-class equality — and with it
  * expression canonicalization/subexpression elimination — stays
  * structural.
  */
case class NearestCentroid(child: Expression, cids: Seq[Long], cents: Seq[Seq[Double]],
    nanWins: Boolean = true)
    extends UnaryExpression {

  require(cids.nonEmpty && cids.length == cents.length,
    s"nearest_centroid needs a non-empty centroid set (got ${cids.length} ids, ${cents.length} centroids)")

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires ARRAY<DOUBLE> input, got ${other.catalogString}")
    }

  @transient private lazy val ids: Array[Long] = cids.toArray
  @transient private lazy val matrix: Array[Array[Double]] = cents.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    var bestCid = 0L
    var best = 0.0
    var c = 0
    while (c < matrix.length) {
      val u = matrix(c)
      val n = math.min(v.numElements(), u.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var j = 0
      while (j < n) {
        val x = v.getDouble(j); val y = u(j)
        dot += x * y; nx += x * x; ny += y * y
        j += 1
      }
      val sim = if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
      val better =
        if (nanWins) (sim.isNaN && !best.isNaN) || sim > best
        else (!sim.isNaN && best.isNaN) || sim > best
      if (c == 0 || better) { best = sim; bestCid = ids(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCid, best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matrixRef = ctx.addReferenceObj("centroids", matrix, "double[][]")
    val idsRef = ctx.addReferenceObj("cids", ids, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val u = ctx.freshName("u")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val sim = ctx.freshName("sim")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val better = ctx.freshName("better")
      s"""
        long $bestCid = 0L; double $best = 0.0;
        for (int $c = 0; $c < $matrixRef.length; $c++) {
          double[] $u = $matrixRef[$c];
          int $n = java.lang.Math.min($a.numElements(), $u.length);
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          for (int $j = 0; $j < $n; $j++) {
            double $x = $a.getDouble($j); double $y = $u[$j];
            $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
          }
          double $sim = ($nx == 0.0 || $ny == 0.0) ? 0.0
            : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
          boolean $better = $nanWins
            ? ((Double.isNaN($sim) && !Double.isNaN($best)) || $sim > $best)
            : ((!Double.isNaN($sim) && Double.isNaN($best)) || $sim > $best);
          if ($c == 0 || $better) {
            $best = $sim; $bestCid = $idsRef[$c];
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[]{ java.lang.Long.valueOf($bestCid), java.lang.Double.valueOf($best) });
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Per-BLOCK nearest sub-centroid by dot product for product quantization:
  * `left` is the block's sub-vector (`array<double>`), `right` the block id,
  * and the embedded codebook is indexed [block][code] — returns
  * struct(cid BIGINT, dot DOUBLE) for the argmax-dot sub-centroid of that
  * block, ties by ascending cid. Same zero-exchange motivation and
  * bit-exactness contract as NearestCentroid (the dot accumulates in
  * ascending index order, matching the `aggregate(zip_with(...))` fold it
  * replaces; NaN-greatest tie rule matches the window form's descending
  * sort).
  */
case class NearestSubCentroid(left: Expression, right: Expression,
    cids: Seq[Seq[Long]], cents: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {

  require(cids.nonEmpty && cids.length == cents.length &&
    cids.indices.forall(b => cids(b).nonEmpty && cids(b).length == cents(b).length),
    "nearest_sub_centroid needs a non-empty codebook with matching ids per block")

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("dot", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(DoubleType, _), IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_sub_centroid requires (ARRAY<DOUBLE>, INT/BIGINT), got (${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val ids: Array[Array[Long]] = cids.map(_.toArray).toArray
  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    cents.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val blk = b match { case i: Int => i; case l: Long => l.toInt }
    val cb = matrix(blk)
    val bi = ids(blk)
    var bestCid = 0L
    var best = 0.0
    var c = 0
    while (c < cb.length) {
      val u = cb(c)
      val n = math.min(v.numElements(), u.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v.getDouble(j) * u(j); j += 1 }
      if (c == 0 || (dot.isNaN && !best.isNaN) || dot > best) { best = dot; bestCid = bi(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCid, best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matrixRef = ctx.addReferenceObj("codebook", matrix, "double[][][]")
    val idsRef = ctx.addReferenceObj("codebookIds", ids, "long[][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val blk = ctx.freshName("blk")
      val cb = ctx.freshName("cb")
      val bi = ctx.freshName("bi")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val u = ctx.freshName("u")
      val dot = ctx.freshName("dot")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      s"""
        int $blk = (int) $b;
        double[][] $cb = $matrixRef[$blk];
        long[] $bi = $idsRef[$blk];
        long $bestCid = 0L; double $best = 0.0;
        for (int $c = 0; $c < $cb.length; $c++) {
          double[] $u = $cb[$c];
          int $n = java.lang.Math.min($a.numElements(), $u.length);
          double $dot = 0.0;
          for (int $j = 0; $j < $n; $j++) { $dot += $a.getDouble($j) * $u[$j]; }
          if ($c == 0 || (Double.isNaN($dot) && !Double.isNaN($best)) || $dot > $best) {
            $best = $dot; $bestCid = $bi[$c];
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[]{ java.lang.Long.valueOf($bestCid), java.lang.Double.valueOf($best) });
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestSubCentroid =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column handle for the fused cosine (requires GraftFunctions.register
    * on the session, done by GraftSession.local). */
  def cosineFused(a: Column, b: Column): Column =
    call_function("cosine_fused", a, b)

  /** Column handle for the fused hyperplane sketch; `dim`/`nPlanes` are
    * plan-time constants (they size the embedded plane matrix). */
  def hyperplaneSketch(v: Column, dim: Int, nPlanes: Int): Column =
    call_function("hyperplane_sketch", v, lit(dim), lit(nPlanes))

  /** Column handle for the map-side nearest-centroid argmax: the centroid
    * set rides into the plan as foldable literals (driver-tiny — k×dim
    * doubles), so the assign stage of k-means is ONE projection, zero
    * exchanges. Output is struct(cid BIGINT, sim DOUBLE); `nanWins`
    * selects the NaN tie rule of the window form being replaced (see the
    * expression scaladoc). */
  def nearestCentroid(v: Column, cids: Seq[Long], cents: Seq[Seq[Double]],
      nanWins: Boolean = true): Column =
    call_function("nearest_centroid", v, typedLit(cids), typedLit(cents), lit(nanWins))

  /** Column handle for the per-block PQ sub-centroid argmax (codebook
    * indexed [block][code]); output struct(cid BIGINT, dot DOUBLE). */
  def nearestSubCentroid(sub: Column, blockId: Column,
      cids: Seq[Seq[Long]], cents: Seq[Seq[Seq[Double]]]): Column =
    call_function("nearest_sub_centroid", sub, blockId, typedLit(cids), typedLit(cents))
}
