package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The mm_phash_dct DCT bank as ONE native codegen expression: 256 int
  * samples (a 16x16 "image") -> the 16 RAW low-frequency coefficient
  * sums, exactly the integer pipeline the query previously spelled as
  * nested `transform`/`aggregate` higher-order folds (whose lambdas are
  * interpreted per element — measured 3.3 s isolated at sf0.1; this
  * primitive loop does the same ~1.3k multiply-adds per row inside
  * whole-stage codegen). The final /1e7 rounding deliberately STAYS in
  * the SQL layer (a 16-element transform, negligible) so this expression
  * is pure int64 arithmetic — no float op, no rounding-mode subtlety to
  * keep in sync with the oracle.
  *
  * Semantics (bit-identical to the HOF formulation and the DuckDB twin):
  *   r[x*4+v]  = truncToZero(sum_y m[16x+y] * COS[v*16+y] / 1e5)
  *   out[u*4+v] = sum_x COS[u*16+x] * r[x*4+v]
  * with COS the shared 1e9-scaled table ([[Dct16.CosTab]]). Truncation
  * is sign-symmetric (Spark `div` truncates toward zero, and the oracle
  * mirrors the CASE-on-abs form). A wrong-length or null-element input
  * yields NULL — the DotQ misuse-signals-not-corrupts contract.
  */
case class Dct16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "dct16"

  override def nullSafeEval(input: Any): Any = {
    val m = input.asInstanceOf[ArrayData]
    if (m.numElements() != 256) return null
    var i = 0
    while (i < 256) { if (m.isNullAt(i)) return null; i += 1 }
    val cos = Dct16.CosTab
    val r = new Array[Long](64)
    var x = 0
    while (x < 16) {
      var v = 0
      while (v < 4) {
        var s = 0L
        var y = 0
        while (y < 16) { s += m.getInt(x * 16 + y).toLong * cos(v * 16 + y); y += 1 }
        r(x * 4 + v) = if (s >= 0) s / 100000L else -((-s) / 100000L)
        v += 1
      }
      x += 1
    }
    val out = new Array[Long](16)
    var uv = 0
    while (uv < 16) {
      var s = 0L
      var xx = 0
      while (xx < 16) { s += cos((uv / 4) * 16 + xx) * r(xx * 4 + uv % 4); xx += 1 }
      out(uv) = s
      uv += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, m => {
      val cos = ctx.addReferenceObj("dct16CosTab", Dct16.CosTab, "long[]")
      val bad = ctx.freshName("bad")
      val r = ctx.freshName("r")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val y = ctx.freshName("y")
      val s = ctx.freshName("s")
      val uv = ctx.freshName("uv")
      s"""
         |boolean $bad = $m.numElements() != 256;
         |for (int $i = 0; !$bad && $i < 256; $i++) {
         |  if ($m.isNullAt($i)) { $bad = true; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $r = new long[64];
         |  for (int $x = 0; $x < 16; $x++) {
         |    for (int $v = 0; $v < 4; $v++) {
         |      long $s = 0L;
         |      for (int $y = 0; $y < 16; $y++) {
         |        $s += (long) $m.getInt($x * 16 + $y) * $cos[$v * 16 + $y];
         |      }
         |      $r[$x * 4 + $v] = $s >= 0 ? $s / 100000L : -((-$s) / 100000L);
         |    }
         |  }
         |  long[] $out = new long[16];
         |  for (int $uv = 0; $uv < 16; $uv++) {
         |    long $s = 0L;
         |    for (int $x = 0; $x < 16; $x++) {
         |      $s += $cos[($uv / 4) * 16 + $x] * $r[$x * 4 + $uv % 4];
         |    }
         |    $out[$uv] = $s;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Dct16 =
    copy(child = c)
}

object Dct16 {

  /** The 1e9-scaled DCT cos basis, entry [u*16 + x] =
    * round(cos(pi*(2x+1)*u/32) * 1e9) for u in 0..3, x in 0..15 — the
    * single source the expression, the Spark SQL literal, and the DuckDB
    * oracle literal all derive from (MultimodalQueries re-exports it).
    */
  val CosTab: Array[Long] =
    (for (u <- 0 to 3; x <- 0 to 15) yield
      BigDecimal(math.cos(math.Pi * (2 * x + 1) * u / 32.0) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray

  def apply(a: Column): Column =
    GraftSqlBridge.column(Dct16(GraftSqlBridge.expression(a)))
}
