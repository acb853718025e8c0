package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the sketch hot path.
  *
  * The declarative builders in [[graft.functions.DedupFunctions]] are
  * higher-order array functions, which Spark evaluates interpreted (no
  * whole-stage codegen participation) — fine for correctness, but the
  * per-document sketch work dominates dedup cost at scale. These
  * expressions generate a single call into [[HashOps]]'s tight loops, so
  * the surrounding projection stays inside whole-stage codegen and each row
  * costs one JVM call instead of an interpreted expression-tree walk.
  *
  * Registered per session as `graft_token_hashes` / `graft_shingle_hashes`
  * / `graft_minhash_sig` by [[graft.sources.Tables.prepare]] (runtime
  * registration rather than `SparkSessionExtensions` because the driver
  * builds its own SparkSession; a production deploy would list an extension
  * installing the same builders in `spark.sql.extensions`).
  */
object HashExpressions {

  case class StringHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      HashOps.stringHash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.stringHash($c)")
    override protected def withNewChildInternal(newChild: Expression): StringHash =
      copy(child = newChild)
  }

  case class TokenHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      HashOps.tokenHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.tokenHashes($c)")
    override protected def withNewChildInternal(newChild: Expression): TokenHashes =
      copy(child = newChild)
  }

  case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      HashOps.shingleHashes(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.shingleHashes($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  case class BigramHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      HashOps.bigramHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.bigramHashes($c)")
    override protected def withNewChildInternal(newChild: Expression): BigramHashes =
      copy(child = newChild)
  }

  case class ShingleHashesAll(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      HashOps.shingleHashesAll(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.shingleHashesAll($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashesAll =
      copy(child = newChild)
  }

  /** Positional word windows (d30) — see [[HashOps.wordWindows]]. */
  case class WordWindows(child: Expression, w: Int) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      HashOps.wordWindows(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.wordWindows($c, $w)")
    override protected def withNewChildInternal(newChild: Expression): WordWindows =
      copy(child = newChild)
  }

  /** Packed canonical pairs over a (distinct-id) array — d37's pair
    * expansion as one codegen'd call emitting n·(n−1)/2 single-long keys
    * (see [[HashOps.pairPack]] for the packing contract and guard). */
  case class PairPack(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      HashOps.pairPack(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.pairPack($c)")
    override protected def withNewChildInternal(newChild: Expression): PairPack =
      copy(child = newChild)
  }

  case class MinhashSig(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override protected def nullSafeEval(input: Any): Any =
      HashOps.minhashSignature(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.minhashSignature($c)")
    override protected def withNewChildInternal(newChild: Expression): MinhashSig =
      copy(child = newChild)
  }

  case class Simhash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      HashOps.simhash(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.simhash($c)")
    override protected def withNewChildInternal(newChild: Expression): Simhash =
      copy(child = newChild)
  }

  case class PretokenCounts(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_bpeish",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("n_digit_runs",
          org.apache.spark.sql.types.IntegerType, nullable = false)))
    override protected def nullSafeEval(input: Any): Any =
      HashOps.pretokenCounts(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.pretokenCounts($c)")
    override protected def withNewChildInternal(newChild: Expression): PretokenCounts =
      copy(child = newChild)
  }

  /** Ranks a bounded IVF codebook by cosine against the row's vector:
    * returns centroid ids ordered by (−cosine, cid) — element 1 is the
    * assignment, the first NProbe are the probe lists.
    *
    * The codebook travels as a REFERENCE OBJECT on this one expression node
    * (`ctx.addReferenceObj`), not as literal children: the r7 formulation —
    * `array(NList × struct(−dot(vec, array(Dim literals))/…))` — put
    * NList·Dim ≈ 2000 literal nodes in the plan, and the r8 10× scale
    * measurement showed the one-time Catalyst-optimize + janino-compile of
    * that tree dominating a cold run (17.8 s of a 10.7 s-median e04, vs
    * 1.2 s warm). Plan size is now O(1) in codebook dimensions and the
    * per-row work is one tight JVM loop.
    *
    * Value semantics are EXACTLY the r7 tree (and the DuckDB oracles):
    * left-fold dot, cos = dot/(nrm·cnrm), ascending (−cos, cid) order — so
    * assignments, probe lists, and every downstream hash stay bit-identical.
    */
  case class CodebookRank(
      vec: Expression,
      nrm: Expression,
      cids: Array[Long],
      cvecs: Array[Array[Double]],
      cnrms: Array[Double]) extends BinaryExpression {
    override def left: Expression = vec
    override def right: Expression = nrm
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    def rank(v: org.apache.spark.sql.catalyst.util.ArrayData, n: Double)
        : org.apache.spark.sql.catalyst.util.ArrayData = {
      val k = cids.length
      val negc = new Array[Double](k)
      var j = 0
      while (j < k) {
        val cv = cvecs(j)
        var dot = 0.0
        var i = 0
        while (i < cv.length) { dot += v.getDouble(i) * cv(i); i += 1 }
        negc(j) = -(dot / (n * cnrms(j)))
        j += 1
      }
      val order = Array.range(0, k).sortBy(j => (negc(j), cids(j)))
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        order.map(cids(_)))
    }

    override protected def nullSafeEval(v: Any, n: Any): Any =
      rank(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        n.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cbrank", this, classOf[CodebookRank].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$ref.rank($a, $b)")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CodebookRank =
      copy(vec = newLeft, nrm = newRight)
  }

  /** Two-level coarse ranking for the corpus-wide graph (e07/e08): the
    * first `nSuper` centroids (lowest cid — the codebook arrives cid-sorted)
    * double as SUPER-centroids; every centroid is branch-assigned to its
    * nearest super driver-side (`branchOf`), and a vector ranks only the
    * members of its `superProbe` nearest branches instead of the whole
    * codebook. With NList = √n and NSuper = ⌈√NList⌉ = n^¼ this cuts
    * assignment from n·√n dots (the r9 flagged O(n^1.5) term) to
    * n·(n^¼ + superProbe·avgBranch) ≈ O(n^1.25) — the two-level IVF
    * routing production coarse quantizers use.
    *
    * Output contract matches [[CodebookRank]]: centroid ids of the SEARCHED
    * set ordered by (−cos, cid); element 1 is the assignment, the first
    * NProbe the probe lists. Every super's own centroid is a member of its
    * branch (cos(s,s)=1 is maximal), so the searched set has ≥ superProbe
    * members. Fold order ascending-dimension, ties to the lowest cid — the
    * oracles replay both levels with the identical keys, so the searched
    * set, assignment, and probe lists are bit-identical across engines. */
  case class TwoLevelCodebookRank(
      vec: Expression,
      nrm: Expression,
      cids: Array[Long],
      cvecs: Array[Array[Double]],
      cnrms: Array[Double],
      nSuper: Int,
      superProbe: Int,
      branchOf: Array[Int]) extends BinaryExpression {
    override def left: Expression = vec
    override def right: Expression = nrm
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    // branch index (super position 0..nSuper-1) -> member centroid positions
    @transient private lazy val members: Array[Array[Int]] = {
      val bs = Array.fill(nSuper)(List.newBuilder[Int])
      var j = 0
      while (j < branchOf.length) { bs(branchOf(j)) += j; j += 1 }
      bs.map(_.result().toArray)
    }

    private def negCos(x: Array[Double], n: Double, j: Int): Double = {
      val cv = cvecs(j)
      var dot = 0.0
      var i = 0
      while (i < cv.length) { dot += x(i) * cv(i); i += 1 }
      -(dot / (n * cnrms(j)))
    }

    def rank(v: org.apache.spark.sql.catalyst.util.ArrayData, n: Double)
        : org.apache.spark.sql.catalyst.util.ArrayData = {
      // One primitive copy up front: negCos reads the vector (nSuper +
      // |cand|) times, and per-element ArrayData.getDouble is a virtual
      // call in that inner loop.
      val x = v.toDoubleArray()
      // Level 1: rank the supers (positions 0..nSuper-1 ARE centroids).
      val negs = new Array[Double](nSuper)
      var j = 0
      while (j < nSuper) { negs(j) = negCos(x, n, j); j += 1 }
      val superOrder = Array.range(0, nSuper).sortBy(j => (negs(j), cids(j)))
      // Level 2: rank the union of the top-superProbe branches' members.
      val cand = Array.range(0, superProbe).flatMap(r => members(superOrder(r)))
      val negc = cand.map(negCos(x, n, _))
      val order = Array.range(0, cand.length)
        .sortBy(i => (negc(i), cids(cand(i))))
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        order.map(i => cids(cand(i))))
    }

    override protected def nullSafeEval(v: Any, n: Any): Any =
      rank(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        n.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cbrank2", this,
        classOf[TwoLevelCodebookRank].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$ref.rank($a, $b)")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TwoLevelCodebookRank =
      copy(vec = newLeft, nrm = newRight)
  }

  /** [[TwoLevelCodebookRank]] with INT8-CODED centroids (VERDICT r13 next
    * #6): the corpus-side assignment — the engine's residual O(n^1.25)
    * term — ranks int8 vector codes against int8 centroid codes instead of
    * float64 against float64. Per row the vector is quantized ONCE
    * (scale = 127/max|x|, half-up round — [[HashOps.quantizeCodes]]'s exact
    * formula), then every centroid dot is an integer multiply-accumulate
    * over a `Dim`-BYTE row instead of a `Dim`-double one: 8× less centroid
    * memory traffic (the whole coded codebook sits in L2 where the float
    * one spilled) and a SIMD-friendlier inner loop. Cosine is
    * scale-invariant, so code-space directions rank vector directions —
    * the same argument the Lloyd trainer already relies on.
    *
    * Parity: code values are integers ≤ 127, so every dot (≤ Dim·127² ≪
    * 2⁵³) is EXACT in both int64 and the oracle's double arithmetic; the
    * ranking key −dot/(qnrm·cnrm) has the identical two-rounding shape as
    * the float router. Branch structure (`branchOf`) stays FLOAT —
    * centroid→super assignment is NList·NSuper bounded metadata computed
    * once driver-side, replayed by the oracles' unchanged `cbrF`/`cbrB`.
    * An all-zero vector quantizes to all-zero codes and ranks by the NaN
    * keys' cid tie-break — exactly where the float router's 0/0 put it. */
  case class TwoLevelCodebookRankQ(
      vec: Expression,
      cids: Array[Long],
      c8vecs: Array[Array[Byte]],
      c8nrms: Array[Double],
      nSuper: Int,
      superProbe: Int,
      branchOf: Array[Int]) extends UnaryExpression {
    override def child: Expression = vec
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    @transient private lazy val members: Array[Array[Int]] = {
      val bs = Array.fill(nSuper)(List.newBuilder[Int])
      var j = 0
      while (j < branchOf.length) { bs(branchOf(j)) += j; j += 1 }
      bs.map(_.result().toArray)
    }

    def rank(v: org.apache.spark.sql.catalyst.util.ArrayData)
        : org.apache.spark.sql.catalyst.util.ArrayData = {
      val x = v.toDoubleArray()
      val dim = x.length
      var amax = 0.0
      var i = 0
      while (i < dim) { val a = math.abs(x(i)); if (a > amax) amax = a; i += 1 }
      val scale = if (amax > 0.0) 127.0 / amax else 0.0
      val q = new Array[Int](dim)
      var ss = 0L
      i = 0
      while (i < dim) {
        val c = math.floor(x(i) * scale + 0.5).toInt
        q(i) = c; ss += c.toLong * c; i += 1
      }
      val qnrm = math.sqrt(ss.toDouble)
      def negCos(j: Int): Double = {
        val cv = c8vecs(j)
        // Bound by both lengths: a row longer than the centroid dimension
        // silently truncates (the float kernel's cv.length bound), never
        // throws — same failure mode for malformed rows in both routers.
        val lim = math.min(dim, cv.length)
        var dot = 0L
        var k = 0
        while (k < lim) { dot += q(k) * cv(k); k += 1 }
        -(dot.toDouble / (qnrm * c8nrms(j)))
      }
      val negs = new Array[Double](nSuper)
      var j = 0
      while (j < nSuper) { negs(j) = negCos(j); j += 1 }
      val superOrder = Array.range(0, nSuper).sortBy(j => (negs(j), cids(j)))
      val cand = Array.range(0, superProbe).flatMap(r => members(superOrder(r)))
      val negc = cand.map(negCos)
      val order = Array.range(0, cand.length)
        .sortBy(i => (negc(i), cids(cand(i))))
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        order.map(i => cids(cand(i))))
    }

    override protected def nullSafeEval(v: Any): Any =
      rank(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cbrank2q", this,
        classOf[TwoLevelCodebookRankQ].getName)
      defineCodeGen(ctx, ev, a => s"$ref.rank($a)")
    }
    override protected def withNewChildInternal(
        newChild: Expression): TwoLevelCodebookRankQ =
      copy(vec = newChild)
  }

  case class QuantizeCodes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      HashOps.quantizeCodes(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.quantizeCodes($c)")
    override protected def withNewChildInternal(newChild: Expression): QuantizeCodes =
      copy(child = newChild)
  }

  case class PhashSig(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sig1", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("sig2", LongType, nullable = false)))
    override protected def nullSafeEval(input: Any): Any =
      HashOps.phashSig(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expr.HashOps.phashSig($c)")
    override protected def withNewChildInternal(newChild: Expression): PhashSig =
      copy(child = newChild)
  }

  /** Real P6 PPM decode over the binary column (see [[HashOps.ppmDecode]]).
    * Nullable by design: malformed payloads decode to NULL, which the m06
    * query surfaces as the quarantine flag — so the codegen path must
    * null-check the RESULT, not just the input (plain `defineCodeGen`
    * assumes a non-null return). */
  case class PpmDecode(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("width",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("height",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("maxval",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("mean_r", DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("mean_g", DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("mean_b", DoubleType, nullable = false)))
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      HashOps.ppmDecode(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.expr.HashOps.ppmDecode($c);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildInternal(newChild: Expression): PpmDecode =
      copy(child = newChild)
  }

  /** d10's per-band sign-LSH bucket (see [[HashOps.signLshBucket]]). Band
    * index and planes-per-band ride as constructor constants so the whole
    * bucket computation is one codegen'd JVM call. */
  case class SignLshBucket(child: Expression, band: Int, ppb: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      HashOps.signLshBucket(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], band, ppb)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.expr.HashOps.signLshBucket($c, $band, $ppb)")
    override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
      copy(child = newChild)
  }

  /** Product-quantization encoder: per subspace m, the 0-based index of the
    * argmin-L2² centroid in `cvecs(m)` (ties to the LOWEST index — the
    * codebook arrives sorted by centroid vec_id, so "lowest index" is the
    * oracles' `ORDER BY d2 ASC, cid`). The M×K×subdim codebook rides as a
    * reference object (same plan-size rationale as [[CodebookRank]]); d2 is
    * an ascending-index left fold, bit-identical to the DuckDB oracle's
    * `list_reduce` over `list_zip`. Output indices are internal intermediates
    * (both engines pick the same centroid; the oracle names it by cid). */
  case class PqEncode(
      child: Expression,
      cvecs: Array[Array[Array[Double]]]) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    def encode(v: org.apache.spark.sql.catalyst.util.ArrayData)
        : org.apache.spark.sql.catalyst.util.ArrayData = {
      val m = cvecs.length
      val out = new Array[Long](m)
      var mi = 0
      var off = 0
      while (mi < m) {
        val cents = cvecs(mi)
        val sub = cents(0).length
        var best = 0
        var bestD = Double.PositiveInfinity
        var j = 0
        while (j < cents.length) {
          val cv = cents(j)
          var d = 0.0
          var i = 0
          while (i < sub) { val t = v.getDouble(off + i) - cv(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        out(mi) = best.toLong
        off += sub
        mi += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def nullSafeEval(input: Any): Any =
      encode(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqenc", this, classOf[PqEncode].getName)
      defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): PqEncode =
      copy(child = newChild)
  }

  /** Asymmetric-distance (ADC) scorer: Σ_m lut(qid)(m)(code_m), the
    * product-quantization approximate distance between a query and an
    * encoded corpus vector. The per-query lookup tables (|queries|·M·K
    * doubles — bounded index metadata, built driver-side from the collected
    * query set) ride as a reference object; the sum runs ascending-m, the
    * oracles' explicit `((l0+l1)+l2)+l3` parenthesization, so values are
    * bit-identical. Per row this is M table lookups + M adds — the PQ
    * bandwidth win: the scan reads M int8-sized codes, not Dim floats. */
  case class PqAdc(
      qid: Expression,
      codes: Expression,
      qids: Array[Long],
      luts: Array[Array[Array[Double]]]) extends BinaryExpression {
    override def left: Expression = qid
    override def right: Expression = codes
    override def dataType: DataType = DoubleType

    private val qIndex: java.util.HashMap[Long, Int] = {
      val m = new java.util.HashMap[Long, Int](qids.length * 2)
      var i = 0
      while (i < qids.length) { m.put(qids(i), i); i += 1 }
      m
    }

    def adc(q: Long, cs: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
      val lut = luts(qIndex.get(q))
      var a = 0.0
      var m = 0
      while (m < lut.length) { a += lut(m)(cs.getLong(m).toInt); m += 1 }
      a
    }

    override protected def nullSafeEval(q: Any, cs: Any): Any =
      adc(q.asInstanceOf[Long],
        cs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqadc", this, classOf[PqAdc].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$ref.adc($a, $b)")
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdc =
      copy(qid = newLeft, codes = newRight)
  }

  /** Membership probe against a serialized Bloom filter — the map-side
    * runtime-filter primitive (q48): the build side's key set rides as a
    * compact byte image (serialized once driver-side, deserialized lazily
    * per executor), and the probe is a handful of hash-bit tests inside
    * whole-stage codegen. `mightContain` admits false positives, never
    * false negatives, so a bloom-pruned scan followed by an exact join is
    * result-identical to the unpruned join — the bloom only cuts the rows
    * that reach the shuffle. This is the explicit form of the planner's
    * injected runtime bloom filter, for build sides the optimizer cannot
    * see (an external index, a pre-computed key manifest). */
  case class BloomContains(child: Expression, bloomBytes: Array[Byte])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType

    @transient private lazy val bloom =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes))

    def contains(v: Long): Boolean = bloom.mightContainLong(v)

    override protected def nullSafeEval(input: Any): Any =
      contains(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", this, classOf[BloomContains].getName)
      defineCodeGen(ctx, ev, c => s"$ref.contains($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomContains =
      copy(child = newChild)
  }

  /** Exact string-set membership against a driver-built key set — the
    * EXACT sibling of [[BloomContains]] for map-side scrub sets whose
    * hit/miss counts land in the result (a Bloom's false positives would
    * corrupt them). The keys ride as a reference object (one copy per
    * executor, the same envelope as broadcasting the set for a hash join);
    * the probe is one hash lookup inside whole-stage codegen — NOT an
    * `array_contains` linear scan, which made a 6.5k-entry scrub set
    * quadratic over a 92k-window corpus (measured 55 s vs ~1 s at sf0.1). */
  case class StringSetContains(child: Expression, keys: Array[Array[Byte]])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType

    @transient private lazy val set = {
      val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
        math.max(keys.length * 2, 16))
      keys.foreach(k =>
        s.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(k)))
      s
    }

    def contains(v: org.apache.spark.unsafe.types.UTF8String): Boolean =
      set.contains(v)

    override protected def nullSafeEval(input: Any): Any =
      contains(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("strset", this, classOf[StringSetContains].getName)
      defineCodeGen(ctx, ev, c => s"$ref.contains($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): StringSetContains =
      copy(child = newChild)
  }

  case class DotFold(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      HashOps.dotFold(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.expr.HashOps.dotFold($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotFold =
      copy(left = newLeft, right = newRight)
  }

  /** Register the native functions in a session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_token_hashes",
      args => TokenHashes(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      args => ShingleHashes(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_hashes_all",
      args => ShingleHashesAll(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_bigram_hashes",
      args => BigramHashes(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_pair_pack",
      args => PairPack(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_word_windows",
      args => WordWindows(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      args => MinhashSig(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      args => Simhash(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_string_hash",
      args => StringHash(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      args => DotFold(args.head, args(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_pretoken_counts",
      args => PretokenCounts(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_phash",
      args => PhashSig(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_quantize",
      args => QuantizeCodes(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_ppm_decode",
      args => PpmDecode(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_sign_lsh",
      args => SignLshBucket(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue()), "built-in")
  }
}
