package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the per-document MinHash signature.
  *
  * Semantics are EXACTLY the declarative form (and the DuckDB oracle):
  * {{{
  *   toks = split(text, ' ')                       -- limit -1: keeps empties
  *   shs  = [ concat_ws(' ', toks[i : i+L]) | i <- 0 .. max(n-L, 0) ]
  *   sig[j] = min over shs of
  *            cast(conv(substring(md5(concat(s, '#', j)), 1, 15), 16, 10) as bigint)
  * }}}
  * i.e. the top 60 bits of md5(shingle + "#" + j), minimized over shingles.
  *
  * Why an expression and not the HOF pipeline: the signature costs
  * |shingles|×K md5s per document; evaluated through the expression
  * interpreter (HOFs never enter whole-stage codegen) each hash pays
  * UTF8String/Decimal conversions and a conv() string round-trip. This
  * eval runs the whole loop in one JVM call per row, hashing reused byte
  * buffers and reading the 60 bits straight out of the digest — measured
  * ~5× over the HOF form, identical output. One call per row also means
  * CollapseProject can never duplicate the work (it refuses to inline
  * non-cheap expressions with multiple references, and downstream band
  * projections reference the signature many times).
  *
  * `doGenCode` generates that same one call via a plan reference —
  * real codegen, not CodegenFallback, so the host Project stays inside
  * its whole-stage span (a fallback expression disqualifies the whole
  * operator from codegen, splitting the stage around it).
  */
case class MinhashSignatureExpr(child: Expression, shingleLen: Int, k: Int)
    extends UnaryExpression {
  require(shingleLen >= 1 && k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  // "#0".."#k-1" salt bytes, built once per task via transient lazy
  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(k)(j => ("#" + j).getBytes("US-ASCII"))
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("minhashExpr", this,
        classOf[MinhashSignatureExpr].getName)
      s"${ev.value} = $ref.evalText($c);"
    })

  override def nullSafeEval(input: Any): Any =
    evalText(input.asInstanceOf[UTF8String])

  /** Shared kernel for the interpreted and generated paths. */
  final def evalText(input: UTF8String): ArrayData = {
    val text = input.toString
    val toks = text.split(" ", -1) // Spark split keeps trailing empties
    val n = toks.length
    val nSh = math.max(n - shingleLen, 0) + 1
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < nSh) {
      val end = math.min(i + shingleLen, n)
      val sb = new java.lang.StringBuilder
      var t = i
      while (t < end) {
        if (t > i) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      val shBytes = sb.toString.getBytes("UTF-8")
      var j = 0
      while (j < k) {
        md.reset()
        md.update(shBytes)
        md.update(salts(j))
        val d = md.digest()
        // first 15 hex chars = top 60 bits of the digest
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        v = (v << 4) | ((d(7) >> 4) & 0xfL)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinhashSignatureExpr =
    copy(child = c)
}

/** Word k-shingles of a text column — the native form of the
  * declarative HOF
  * `transform(sequence(0, greatest(size(split(text,' '))-k, 0)),
  *            i -> concat_ws(' ', slice(split(text,' '), i+1, k)))`
  * (the exact loop MinhashSignatureExpr runs before hashing, emitting
  * the shingle strings instead). One JVM call per row replaces ~|tokens|
  * interpreted lambda frames each allocating a slice array; measured as
  * the dominant cost of the n-gram Jaccard explode.
  */
case class ShinglesExpr(child: Expression, shingleLen: Int)
    extends UnaryExpression {
  require(shingleLen >= 1)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("shinglesExpr", this,
        classOf[ShinglesExpr].getName)
      s"${ev.value} = $ref.evalText($c);"
    })

  override def nullSafeEval(input: Any): Any =
    evalText(input.asInstanceOf[UTF8String])

  final def evalText(input: UTF8String): ArrayData = {
    val toks = input.toString.split(" ", -1) // Spark split keeps empties
    val n = toks.length
    val nSh = math.max(n - shingleLen, 0) + 1
    val out = new Array[AnyRef](nSh)
    var i = 0
    while (i < nSh) {
      val end = math.min(i + shingleLen, n)
      val sb = new java.lang.StringBuilder
      var t = i
      while (t < end) {
        if (t > i) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
}

/** The graft interleaved span shape of a text column — native form of
  * the declarative HOF (see TextOps.spanizeSql, asserted equal in
  * TextOpsSpec):
  * {{{
  *   transform(split(text, ' '), (tok, i) -> named_struct(
  *     'kind',      i % 3 = 2 ? 'media' : 'text',
  *     'text',      i % 3 = 2 ? ''      : tok,
  *     'media_ref', i % 3 = 2 ? concat('asset://', md5(tok)) : '',
  *     'offset',    i))
  * }}}
  * One JVM call per row replaces |tokens| interpreted lambda frames each
  * building a 4-field struct through boxed CASE evaluation (with an
  * interpreted md5→hex round-trip for every media token).
  */
case class SpanizeExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("media_ref", StringType, nullable = false),
      StructField("offset", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "spanize"

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  private val kindText = UTF8String.fromString("text")
  private val kindMedia = UTF8String.fromString("media")
  private val emptyStr = UTF8String.fromString("")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("spanizeExpr", this,
        classOf[SpanizeExpr].getName)
      s"${ev.value} = $ref.evalText($c);"
    })

  override def nullSafeEval(input: Any): Any =
    evalText(input.asInstanceOf[UTF8String])

  final def evalText(input: UTF8String): ArrayData = {
    val toks = input.toString.split(" ", -1) // Spark split keeps empties
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) {
      val row = new Array[Any](4)
      if (i % 3 == 2) {
        md.reset()
        val d = md.digest(toks(i).getBytes("UTF-8"))
        val hex = new Array[Char](40)
        "asset://".getChars(0, 8, hex, 0)
        var b = 0
        while (b < 16) {
          hex(8 + 2 * b) = VectorKernels.hexChars((d(b) >> 4) & 0xf)
          hex(9 + 2 * b) = VectorKernels.hexChars(d(b) & 0xf)
          b += 1
        }
        row(0) = kindMedia
        row(1) = emptyStr
        row(2) = UTF8String.fromString(new String(hex, 0, 40))
      } else {
        row(0) = kindText
        row(1) = UTF8String.fromString(toks(i))
        row(2) = emptyStr
      }
      row(3) = i
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SpanizeExpr =
    copy(child = c)
}

/** Shared kernels for the vector-similarity expressions below. All of
  * them replicate the exact declarative-HOF semantics they replace
  * (TextOpsSpec asserts value equality against the HOF forms):
  *
  *   - round(x) / round(x, 6) is Spark's `Round` on DoubleType —
  *     decimal-string HALF_UP via BigDecimal.valueOf — NOT Math.round
  *     (they differ at negative .5 boundaries).
  *   - the ±1 plane signs come from the parity of the portable 60-bit
  *     hash conv(substr(md5(salt),1,15),16,10), identical to the DuckDB
  *     oracle's CAST('0x'||substr(md5(salt),1,15) AS BIGINT) % 2.
  */
private[functions] object VectorKernels {
  val hexChars: Array[Char] = "0123456789abcdef".toCharArray

  /** HALF_UP rounding of a double at `scale` decimals, as Spark's Round. */
  def roundHalfUp(x: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Parity bit of the portable 60-bit md5 hash of an ASCII salt: the
    * 60-bit value's low bit is bit 4 of digest byte 7.
    */
  def saltSign(md: java.security.MessageDigest, salt: String): Long = {
    md.reset()
    val d = md.digest(salt.getBytes("US-ASCII"))
    if (((d(7) >> 4) & 1) == 0) 1L else -1L
  }

  /** Cosine over two double ArrayData — see [[CosineSimExpr]] for the
    * exact null/length/zero-norm conventions it replicates.
    */
  def cosine(l: ArrayData, r: ArrayData): Double = {
    val n = l.numElements()
    if (r.numElements() != n) return -1.0 // zip_with pads → null → -1.0
    var dot = 0.0
    var sl = 0.0
    var sr = 0.0
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return -1.0 // null elem → null → -1.0
      val x = l.getDouble(i)
      val y = r.getDouble(i)
      dot += x * y
      sl += x * x
      sr += y * y
      i += 1
    }
    val denom = math.sqrt(sl) * math.sqrt(sr)
    if (denom == 0.0) -1.0 else dot / denom // try_divide(_, 0) → null → -1.0
  }
}

/** Cosine similarity of two double arrays — the codegen'd form of
  * TextOps.cosineSql's HOF pipeline. Returns NULL only when an input
  * array is NULL (callers coalesce to -1.0, as the HOF form does);
  * length mismatch, a null element, or a zero-norm side all yield -1.0
  * directly — exactly what zip_with's null-padding / null propagation /
  * try_divide produce through the HOF pipeline's outer coalesce(-1.0).
  * Accumulation order matches aggregate()'s left fold, so the IEEE
  * result is bit-identical.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val ref = ctx.addReferenceObj("cosineExpr", this,
        classOf[CosineSimExpr].getName)
      s"${ev.value} = $ref.kernel($l, $r);"
    })

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  final def kernel(l: ArrayData, r: ArrayData): Double =
    VectorKernels.cosine(l, r)

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : CosineSimExpr = copy(left = l, right = r)
}

/** Random-hyperplane LSH buckets as ONE native per-row call — the
  * codegen'd form of the nested zip_with/aggregate HOF pipeline in
  * TextOps.lshBuckets / annLshTopK (which interprets tables×planes×dim
  * boxed lambda steps per row). Element t of the result = table t's
  * bucket: Σ_p [dot(t,p) > 0] · 2^p with
  * dot(t,p) = Σ_d cast(round(cast(x_d as double) · 2^20) as bigint) · s(t,p,d),
  * s from the parity of md5("t:p:d") (tableSalt) or md5("p:d"). The
  * quantization is per (row, d) — computed once and reused across all
  * (t,p), which the HOF form recomputes 32×. Exact integer dots ⇒
  * evaluation-order-independent, identical to the oracle.
  */
case class LshBucketsExpr(child: Expression, tables: Int, planes: Int,
    dim: Int, tableSalt: Boolean) extends UnaryExpression {
  require(tables >= 1 && planes >= 1 && planes <= 63 && dim >= 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  // signs(t)(p)(d), built once per task from the deterministic salts
  @transient private lazy val signs: Array[Array[Array[Long]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables, planes, dim) { (t, p, d) =>
      val salt = if (tableSalt) s"$t:$p:$d" else s"$p:$d"
      VectorKernels.saltSign(md, salt)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("lshExpr", this,
        classOf[LshBucketsExpr].getName)
      s"${ev.value} = $ref.kernel($c);"
    })

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  final def kernel(v: ArrayData): ArrayData = {
    // quantize once per dimension (the HOF recomputes per (t, p, d))
    val q = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      q(d) = VectorKernels
        .roundHalfUp(v.getFloat(d).toDouble * 1048576.0, 0).toLong
      d += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val st = signs(t)
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val sp = st(p)
        var dot = 0L
        var i = 0
        while (i < dim) { dot += q(i) * sp(i); i += 1 }
        if (dot > 0L) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): LshBucketsExpr =
    copy(child = c)
}

/** IVF list assignment: argmax over the broadcast codebook of the
  * 6-dp-rounded cosine, ties (and the all-(-1) zero-norm case) to the
  * LOWEST cid — the native form of TextOps.ivfTopK's per-row
  * aggregate-over-codebook HOF (seed (cid=-1, c=-2.0), strict `>` over
  * the cid-ascending scan). `cb` is the sort_array'd
  * array<struct<cid:bigint, cv:array<double>>> codebook column.
  */
case class IvfAssignExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "ivf_assign"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val ref = ctx.addReferenceObj("ivfExpr", this,
        classOf[IvfAssignExpr].getName)
      s"${ev.value} = $ref.kernel($v, $cb);"
    })

  override def nullSafeEval(v: Any, cb: Any): Any =
    kernel(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  final def kernel(v: ArrayData, cb: ArrayData): Long = {
    var bestCid = -1L
    var bestC = -2.0
    val n = cb.numElements()
    var i = 0
    while (i < n) {
      val ce = cb.getStruct(i, 2)
      val c = VectorKernels.roundHalfUp(
        VectorKernels.cosine(v, ce.getArray(1)), 6)
      if (c > bestC) { bestC = c; bestCid = ce.getLong(0) }
      i += 1
    }
    bestCid
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : IvfAssignExpr = copy(left = l, right = r)
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhash_signature(text: Column, shingleLen: Int, k: Int): Column =
    column(MinhashSignatureExpr(expression(text), shingleLen, k))

  /** Word k-shingle array of a text column (native). */
  def word_shingles(text: Column, shingleLen: Int): Column =
    column(ShinglesExpr(expression(text), shingleLen))

  /** Interleaved span array of a text column (native). */
  def spanize(text: Column): Column =
    column(SpanizeExpr(expression(text)))

  /** Cosine over array<double> (NULL input → NULL; callers coalesce). */
  def cosine_sim(l: Column, r: Column): Column =
    column(CosineSimExpr(expression(l), expression(r)))

  /** Per-table LSH buckets over a raw array<float> embedding. */
  def lsh_buckets(emb: Column, tables: Int, planes: Int, dim: Int,
      tableSalt: Boolean): Column =
    column(LshBucketsExpr(expression(emb), tables, planes, dim, tableSalt))

  /** IVF argmax-cosine list id for array<double> v against the codebook. */
  def ivf_assign(v: Column, cb: Column): Column =
    column(IvfAssignExpr(expression(v), expression(cb)))
}
