package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Shared shape/validation for the fused product-quantization expressions:
  * a codebook set `books(i)(c)(j)` — `m` subspaces × `k` codewords ×
  * `sub` dims — baked into the expression as a reference object (one
  * `double[][][]`, a few KB; NOT an expression tree).
  *
  * Why these exist: composing the same math from `slice` + [[L2Fold]] +
  * `array_min`/`array_position` builds m×k fold expressions in ONE
  * projection (256 at PQ's m=k=16) — the generated method tripped Janino's
  * 64 KB limit, so the hot scan ran interpreted AND every plan paid
  * multi-second codegen-attempt/optimizer cost on the ~10⁴-node tree
  * (measured: ann_pq ~8 s steady-state on a 2000-row input, i.e. all plan
  * overhead). The fused loops are a few hundred bytes of bytecode and keep
  * the whole stage inside codegen.
  *
  * Arithmetic is BIT-IDENTICAL to the composed form (the DuckDB oracle
  * replays it): per subspace, squared L2 accumulated ascending over j —
  * subtract, self-multiply, add, exactly [[L2Fold]]'s op order — and
  * argmin by strictly-less scan over ascending c = first occurrence of the
  * minimum = `array_position(dists, array_min(dists)) - 1`'s smallest-id
  * tie-break. Null contract (coarser than the composed form, which nulled
  * per-subspace: inputs are fixed-dim non-null embeddings, so the case is
  * degenerate): input null, shorter than m·sub, or any null element in the
  * first m·sub positions → null.
  *
  * NaN contract — the one DELIBERATE divergence from the composed form:
  * Java's `s < best` never accepts a NaN distance, so with a non-finite
  * embedding or codebook value the fused argmin keeps the FIRST codeword
  * whose distance went NaN (bestC stays at the earliest candidate when
  * every later comparison is false), while Spark's `array_min` orders NaN
  * GREATER than any double and would keep the smallest finite distance.
  * Reachable only with non-finite inputs, which the encode pipeline never
  * produces (embeddings are finite by the corpus contract, centroids are
  * means of finite values); the bit-identity claim above is therefore
  * scoped to FINITE inputs, and FoldExprSpec pins the NaN behavior of
  * both forms explicitly so a future change is caught, not discovered.
  */
private[functions] trait PqBookExpression { self: UnaryExpression =>
  def books: Seq[Seq[Seq[Double]]]

  protected lazy val m: Int = books.length
  protected lazy val sub: Int = books.head.head.length
  protected lazy val booksArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = {
    if (books.isEmpty || books.exists(_.isEmpty) ||
        books.exists(_.exists(_.length != books.head.head.length)))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a non-empty m×k×sub codebook with uniform " +
          "codeword length")
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> input, got ${t.catalogString}")
    }
  }

  override def nullable: Boolean = true

  /** Null-or-short-input guard shared by eval paths. */
  protected def usable(v: ArrayData): Boolean = {
    if (v.numElements() < m * sub) return false
    var t = 0
    while (t < m * sub) {
      if (v.isNullAt(t)) return false
      t += 1
    }
    true
  }
}

/** `pq_codes(v)`: the PQ encode step — per subspace, the codeword index
  * minimizing squared L2 against the subspace slice; returns `array<int>`
  * of length m. See [[PqBookExpression]] for the contract.
  */
case class PqCodes(child: Expression, books: Seq[Seq[Seq[Double]]])
  extends UnaryExpression with PqBookExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    if (!usable(v)) return null
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      val book = booksArr(i)
      var best = 0.0
      var bestC = -1
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var s = 0.0
        var j = 0
        while (j < sub) {
          val d = v.getDouble(i * sub + j) - cw(j)
          s += d * d
          j += 1
        }
        if (bestC < 0 || s < best) { best = s; bestC = c }
        c += 1
      }
      out(i) = bestC
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("pqBooks", booksArr, "double[][][]")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val t = ctx.freshName("t")
      s"""
         |boolean $bad = $v.numElements() < ${m * sub};
         |if (!$bad) {
         |  for (int $t = 0; $t < ${m * sub}; $t++) {
         |    if ($v.isNullAt($t)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else {
         |  int[] $out = new int[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $best = 0.0; int $bestC = -1;
         |    for (int $c = 0; $c < $b[$i].length; $c++) {
         |      double $s = 0.0;
         |      for (int $j = 0; $j < $sub; $j++) {
         |        final double $d = $v.getDouble($i * $sub + $j) - $b[$i][$c][$j];
         |        $s += $d * $d;
         |      }
         |      if ($bestC < 0 || $s < $best) { $best = $s; $bestC = $c; }
         |    }
         |    $out[$i] = $bestC;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  def apply(v: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqCodes(
      ColumnBridge.expression(v.cast(ArrayType(DoubleType))), books))
}

/** `pq_tables(v)`: the PQ asymmetric-distance tables for a query vector —
  * per subspace, the squared L2 of the subspace slice against EVERY
  * codeword; returns `array<array<double>>` (m × k). A scan over encoded
  * corpus rows then answers the query by summing one table lookup per
  * subspace. See [[PqBookExpression]] for the contract.
  */
case class PqTables(child: Expression, books: Seq[Seq[Seq[Double]]])
  extends UnaryExpression with PqBookExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_tables"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    if (!usable(v)) return null
    val rows = new Array[Any](m)
    var i = 0
    while (i < m) {
      val book = booksArr(i)
      val tbl = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var s = 0.0
        var j = 0
        while (j < sub) {
          val d = v.getDouble(i * sub + j) - cw(j)
          s += d * d
          j += 1
        }
        tbl(c) = s
        c += 1
      }
      rows(i) = new GenericArrayData(tbl)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("pqBooks", booksArr, "double[][][]")
      val rows = ctx.freshName("rows")
      val tbl = ctx.freshName("tbl")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |boolean $bad = $v.numElements() < ${m * sub};
         |if (!$bad) {
         |  for (int $t = 0; $t < ${m * sub}; $t++) {
         |    if ($v.isNullAt($t)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else {
         |  Object[] $rows = new Object[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    double[] $tbl = new double[$b[$i].length];
         |    for (int $c = 0; $c < $b[$i].length; $c++) {
         |      double $s = 0.0;
         |      for (int $j = 0; $j < $sub; $j++) {
         |        final double $d = $v.getDouble($i * $sub + $j) - $b[$i][$c][$j];
         |        $s += $d * $d;
         |      }
         |      $tbl[$c] = $s;
         |    }
         |    $rows[$i] =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($tbl);
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqTables =
    copy(child = newChild)
}

object PqTables {
  def apply(v: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqTables(
      ColumnBridge.expression(v.cast(ArrayType(DoubleType))), books))
}
