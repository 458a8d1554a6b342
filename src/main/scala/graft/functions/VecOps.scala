package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._

/** Native vector-quantization kernel for the IVF-PQ encode hot loop.
  *
  * The Column-function form (unit-normalize → nlist dot-products →
  * residual → m×K subspace distances, all as higher-order functions) is
  * semantically right but interpreted: ~2k boxed expression evaluations
  * per corpus row. This `StaticInvoke` compiles to one static call inside
  * whole-stage codegen — a tight JVM loop over primitive doubles, zero
  * per-row allocation beyond the output — the same pattern as
  * [[TextHash]] for the text hot loops.
  *
  * Tie-breaking matches the Column path exactly: coarse assignment picks
  * the LARGER centroid id on a dot tie (greatest over (sim, cid) structs),
  * codes pick the LARGER codeword index on a distance tie (greatest over
  * (-dist, k)).
  */
object VecOps {

  /** `[cid, code_0, …, code_{m-1}]` for one vector: unit-normalize,
    * argmax-dot coarse assign against `cents` (flattened nlist×dim unit
    * centroids), subtract the centroid, and code each of the m residual
    * slices against `books` (flattened m×k×(dim/m)). */
  def ivfPqCode(vec: ArrayData, cents: ArrayData, nlist: Int,
                books: ArrayData, m: Int, k: Int): ArrayData = {
    val dim = vec.numElements()
    val sub = dim / m
    // unit normalize
    val u = new Array[Double](dim)
    var i = 0
    var nrm = 0.0
    while (i < dim) { val x = vec.getDouble(i); u(i) = x; nrm += x * x; i += 1 }
    nrm = math.max(math.sqrt(nrm), 1e-12)
    i = 0
    while (i < dim) { u(i) /= nrm; i += 1 }
    // coarse argmax dot; ties -> larger cid (>=, ascending scan)
    var cid = 0
    var best = Double.NegativeInfinity
    var c = 0
    while (c < nlist) {
      var d = 0.0
      i = 0
      while (i < dim) { d += u(i) * cents.getDouble(c * dim + i); i += 1 }
      if (d >= best) { best = d; cid = c }
      c += 1
    }
    // residual against the winning centroid
    i = 0
    while (i < dim) { u(i) -= cents.getDouble(cid * dim + i); i += 1 }
    // per-subspace argmin distance; ties -> larger code (<=, ascending)
    val out = new Array[Int](m + 1)
    out(0) = cid
    var mi = 0
    while (mi < m) {
      var bestK = 0
      var bestD = Double.MaxValue
      var kj = 0
      while (kj < k) {
        val base = (mi * k + kj) * sub
        var dd = 0.0
        var j = 0
        while (j < sub) {
          val t = u(mi * sub + j) - books.getDouble(base + j)
          dd += t * t
          j += 1
        }
        if (dd <= bestD) { bestD = dd; bestK = kj }
        kj += 1
      }
      out(mi + 1) = bestK
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Dense matrix-vector product `mat · vec` (mat flattened row-major,
    * rows×dim): the OPQ rotation applied per corpus row. One tight
    * primitive loop inside whole-stage codegen — the HOF form (an
    * aggregate per output element) costs rows×dim boxed evaluations. */
  def matvec(mat: ArrayData, vec: ArrayData, rows: Int): ArrayData = {
    // width comes from the MATRIX (the trusted plan-time literal), not the
    // per-row vector; UnsafeArrayData reads are unchecked, so a too-short
    // vector must be rejected here rather than silently reading past it —
    // and a too-LONG vector equally (prefix-truncation would return
    // plausible numbers from a dimension mismatch), so exact equality
    val dim = mat.numElements() / rows
    require(vec.numElements() == dim,
      s"matvec: vector has ${vec.numElements()} elements, matrix width is $dim")
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = vec.getDouble(i); i += 1 }
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var s = 0.0
      var j = 0
      val base = r * dim
      while (j < dim) { s += mat.getDouble(base + j) * v(j); j += 1 }
      out(r) = s
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** dot(a, b) with double accumulation, ascending fold — the SAME IEEE
    * operation sequence as `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, so
    * swapping the interpreted form for this kernel is bit-identical
    * (cosine_topk's DuckDB oracle pins exactly that). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // same dimension-mismatch discipline as matvec: iterating a's length
    // over a shorter b would READ PAST its unchecked UnsafeArrayData end
    // (garbage, not an error), and a longer b would silently drop its tail
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch — ${n} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      // Unchecked getDouble reads a null slot as 0.0 — fine for the Column
      // path (inputs declared containsNull=false) but a silent corruption
      // for SQL arrays with null elements, so reject those loudly.
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"vec_dot: null element at index $i — vectors must be dense")
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  // ---- Column wrapper (full whole-stage codegen via StaticInvoke) -------

  def dotCol(a: Column, b: Column): Column = {
    val arrD = ArrayType(DoubleType, containsNull = false)
    GraftExpressionBridge.column(StaticInvoke(
      VecOps.getClass, DoubleType, "dot",
      Seq(GraftExpressionBridge.expression(a.cast("array<double>")),
        GraftExpressionBridge.expression(b.cast("array<double>"))),
      Seq(arrD, arrD), propagateNull = true, returnNullable = false))
  }

  /** `mat · vec` as a Column; `mat` rows become a flattened literal
    * (the OPQ-rotation shape: one fixed matrix applied per corpus row).
    * The matrix must be rectangular — a ragged Seq would silently
    * misalign every row after the short one once flattened, so it is
    * rejected here at plan-build time, not at execution. The row width
    * is taken from the matrix; a vector column whose width differs (in
    * either direction) fails the kernel's per-row require, never
    * silently. */
  def matvecCol(vec: Column, mat: Seq[Seq[Double]]): Column = {
    require(mat.nonEmpty && mat.head.nonEmpty, "matvecCol: empty matrix")
    require(mat.forall(_.size == mat.head.size),
      s"matvecCol: ragged matrix — row widths ${mat.map(_.size).distinct}")
    val arrD = ArrayType(DoubleType, containsNull = false)
    GraftExpressionBridge.column(StaticInvoke(
      VecOps.getClass, arrD, "matvec",
      Seq(
        Literal.create(mat.flatten, arrD),
        GraftExpressionBridge.expression(vec.cast("array<double>")),
        Literal(mat.size)),
      Seq(arrD, arrD, IntegerType),
      propagateNull = true, returnNullable = false))
  }

  def ivfPqCodeCol(vec: Column, cents: Seq[Seq[Double]],
                   books: Seq[Seq[Seq[Double]]]): Column = {
    val nlist = cents.size
    val m = books.size
    val k = books.head.size
    val arrD = ArrayType(DoubleType, containsNull = false)
    GraftExpressionBridge.column(StaticInvoke(
      VecOps.getClass, ArrayType(IntegerType, containsNull = false), "ivfPqCode",
      Seq(
        GraftExpressionBridge.expression(vec.cast("array<double>")),
        Literal.create(cents.flatten, arrD),
        Literal(nlist),
        Literal.create(books.flatten.flatten, arrD),
        Literal(m),
        Literal(k)),
      Seq(arrD, arrD, IntegerType, arrD, IntegerType, IntegerType),
      propagateNull = true, returnNullable = false))
  }
}
