package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_dot(a, b)`: dot product of two array<double> columns as a
  * native Catalyst expression with whole-stage codegen — a tight
  * primitive loop instead of the interpreted per-element lambdas of
  * `aggregate(zip_with(...))`. The fold is sequential in element order,
  * so results are bit-identical to the SQL-oracle's `list_sum` over an
  * index range (SURVEY.md §6).
  *
  * This is the hot inner loop of every vector operator (cosine dedup,
  * brute-force ANN, LSH bucketing): at 100 TB the win is per-row CPU,
  * which codegen keeps inside the generated loop with no virtual calls.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // analysis-time type check (no ExpectsInputTypes — AbstractDataType
  // is private[sql]): the SQL surface exposes graft_dot to any array,
  // and a non-double array read with getDouble strides would return
  // GARBAGE on unsafe data rather than erroring
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      // array<void>: the untyped empty/all-null array literal — no
      // element is ever read as a double (empty loop, or the null
      // check returns first), so it stays accepted as before
      case ArrayType(org.apache.spark.sql.types.NullType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString} " +
        "(cast with transform(a, x -> CAST(x AS DOUBLE)))")
  }

  override def dataType: DataType = DoubleType

  // null on length mismatch OR any null element — the exact semantics
  // of the lambda form aggregate(zip_with(a,b,(x,y)->x*y),0D,
  // (acc,x)->acc+x): the shorter side zip-pads with null, and a null
  // element's product poisons the sum either way; this is what makes
  // the RewriteLambdaDot optimizer rule a sound swap
  override def nullable: Boolean = true

  /** Whether either input's STATIC type admits null elements. Resolved
    * once per (deserialized) instance — a def would re-match the
    * children's types on every interpreted-eval row; when false the
    * generated loop carries no per-element null check. */
  @transient private lazy val mayHaveNullElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    if (mayHaveNullElements) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck =
        if (mayHaveNullElements)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** `EquiDepthBucket(value, cuts)`: rank of `value` against a SORTED
  * driver-side cut-point array — the number of cut points ≤ value,
  * i.e. the equi-depth bucket id in [0, cuts.length]. Binary search
  * (O(log nBuckets)) with whole-stage codegen, replacing the O(n)
  * per-row `size(filter(array(...), c -> value >= c))` literal-array
  * lambda in the Z-order Morton code — for 8-bit buckets that is
  * 255 interpreted comparisons per row per column collapsed to 8.
  * NaN ranks LAST (cuts.length): Spark SQL orders NaN above every
  * double, so the lambda form counts ALL cut points — Java's `>=`
  * would count none, hence the explicit branch. NULL input yields
  * bucket 0, also matching the lambda (a null predicate drops every
  * cut from the filter): a null column value must produce a VALID
  * Morton digit, or one null column would poison the whole
  * interleaved code and collapse those rows' OTHER dimensions into
  * one unsorted range.
  * Column-API only ([[Native.bucket]]): the cut array is a plan-time
  * constant shipped via codegen references, not a SQL literal.
  * `cuts` is a Seq (not Array) so case-class equality is structural —
  * array identity-equals would defeat canonicalization/CSE/exchange
  * reuse between semantically identical expressions. */
case class EquiDepthBucket(child: Expression, cuts: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val cutsArr: Array[Double] = cuts.toArray

  // declared input check ⇒ a non-double child via the public
  // Native.bucket surface fails at ANALYSIS with a type message, not
  // with a ClassCastException in eval / a codegen compile error
  // (AbstractDataType is private[sql], so checkInputDataTypes directly)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bucket requires a DOUBLE child, got ${child.dataType.catalogString}")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  private def upperBound(v: Double): Int = {
    if (java.lang.Double.isNaN(v)) return cutsArr.length
    var lo = 0
    var hi = cutsArr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v >= cutsArr(mid)) lo = mid + 1 else hi = mid
    }
    lo
  }

  // NULL input → bucket 0 (see class doc): the output is never null,
  // so eval/codegen are written in full rather than via the null-
  // propagating nullSafe* helpers
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else upperBound(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val arr = ctx.addReferenceObj("cuts", cutsArr, "double[]")
    val childGen = child.genCode(ctx)
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val resultCode =
      code"""
         |${childGen.code}
         |int ${ev.value} = 0;
         |if (!${childGen.isNull}) {
         |  int $lo = 0, $hi = $arr.length;
         |  if (Double.isNaN(${childGen.value})) {
         |    $lo = $arr.length;
         |  } else {
         |    while ($lo < $hi) {
         |      int $mid = ($lo + $hi) >>> 1;
         |      if (${childGen.value} >= $arr[$mid]) $lo = $mid + 1; else $hi = $mid;
         |    }
         |  }
         |  ${ev.value} = $lo;
         |}
       """.stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bucket"
}

/** Shared deterministic hashing parameters for MinHash — md5-derived
  * on the driver so SQL oracles can inline identical literals. */
object GraftHashing {
  /** Modulus for the affine permutations: 2^61 - 1. */
  val MinhashMod: Long = 2305843009213693951L

  /** Permutation p hashes a 32-bit shingle key x as (a_p·x + b_p) mod
    * MinhashMod. a_p < 2^30 keeps a·x under 2^62 (no overflow). */
  def minhashParams(numPerm: Int): (Array[Long], Array[Long]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String, mask: Long): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      (java.lang.Long.parseUnsignedLong(hex, 16) & mask) | 1L // odd, nonzero
    }
    (Array.tabulate(numPerm)(p => h(s"a$p", (1L << 30) - 1)),
     Array.tabulate(numPerm)(p => h(s"b$p", (1L << 30) - 1)))
  }

  /** md5-derived hyperplane weights for cosine LSH: plane p, dims
    * 1..dims → uniform[-0.5, 0.5]. Deterministic and tiny; shared by
    * [[HyperplaneBuckets]] and any oracle that needs the literals. */
  def planeWeights(numPlanes: Int, dims: Int = 64): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dims) { (p, i0) =>
      val hex = md.digest(s"${p}_${i0 + 1}".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
    }
  }
}

/** `graft_minhash(words, n, numPerm)`: the full MinHash signature of a
  * document from its word array, in ONE native pass — build each
  * word-n-gram shingle, md5 it, take the first 32 bits as the shingle
  * key x, and fold (a_p·x + b_p) mod M into a running min per
  * permutation. No shingle materialization, no explode, no shuffle —
  * the whole signature matrix is a map stage. Duplicate shingles need
  * no dedup: they cannot change a min.
  *
  * Semantics match the SQL-oracle formulation exactly: x =
  * conv(substr(md5(shingle),1,8),16,10), h = (a_p·x + b_p) % M
  * (SparkEntry.oracleSql q_dedup_minhash).
  */
case class MinHashWords(child: Expression, n: Int, numPerm: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  // returns null for docs shorter than n regardless of child nullability
  override def nullable: Boolean = true

  @transient private lazy val (as, bs) = GraftHashing.minhashParams(numPerm)

  // one digest per (deserialized, per-task) instance, not per row —
  // getInstance is a JCA provider lookup + allocation in the hot path;
  // digest() resets the instance so reuse is safe
  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val len = words.numElements()
    if (len < n) return null
    val mins = Array.fill(numPerm)(Long.MaxValue)
    val md = digest
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var j = 0
      var appended = false
      while (j < n) {
        // null elements skipped WITH their separator — the concat_ws
        // semantics ShingleWords documents; split() never yields
        // nulls, but the registered SQL function accepts any array
        val w = words.getUTF8String(i + j)
        if (w != null) {
          if (appended) sb.append(' ')
          sb.append(w.toString)
          appended = true
        }
        j += 1
      }
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      var x = 0L
      var k = 0
      while (k < 4) { x = (x << 8) | (d(k) & 0xff); k += 1 }
      var p = 0
      while (p < numPerm) {
        val h = (as(p) * x + bs(p)) % GraftHashing.MinhashMod
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

/** `HyperplaneBuckets(vec, numTables, bitsPerTable)`: ALL cosine-LSH
  * table buckets of an embedding in ONE native pass — for table t,
  * bit j is the sign of vec · plane(t·bits+j) over the md5-derived
  * [[GraftHashing.planeWeights]], packed as a "0101" string per
  * table. Replaces numTables×bitsPerTable separate dot-expression
  * trees (each one re-walking the array, and at production plane
  * counts blowing the expression tree far past codegen limits) with a
  * single loop that reads each element once and advances every
  * plane's accumulator. Output is indexed by table: element t IS
  * table t's bucket (posexplode recovers (t, bucket)).
  *
  * Exact semantics of the expression-tree form it replaces: elements
  * cast to double before multiplying; a vector whose length differs
  * from the planes' 64 dims, or with any null element, gets the
  * all-zero bucket in every table (the dot is NULL there, and
  * NULL > 0 is false); a NULL vector yields NULL (callers explode, so
  * such rows drop out of the bucket relation). */
case class HyperplaneBuckets(child: Expression, numTables: Int, bitsPerTable: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(numTables > 0 && bitsPerTable > 0,
    s"graft_hyperplane_buckets needs positive table/bit counts, got $numTables x $bitsPerTable")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hyperplane_buckets requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullable: Boolean = child.nullable

  @transient private lazy val w: Array[Array[Double]] =
    GraftHashing.planeWeights(numTables * bitsPerTable)

  @transient private lazy val isFloat: Boolean =
    child.dataType == ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false) ||
      child.dataType == ArrayType(org.apache.spark.sql.types.FloatType, containsNull = true)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val dims = w(0).length
    var degenerate = n != dims
    if (!degenerate) {
      var i = 0
      while (i < n && !degenerate) { degenerate = v.isNullAt(i); i += 1 }
    }
    val nPlanes = numTables * bitsPerTable
    val signs = new Array[Boolean](nPlanes)
    if (!degenerate) {
      // copy the input once into the per-task scratch, then run each
      // plane's dot over plain arrays (sequential fold order — the
      // exact FP sum the dot-expression form produced)
      var i = 0
      while (i < dims) {
        xbuf(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        i += 1
      }
      var p = 0
      while (p < nPlanes) {
        val wp = w(p)
        var s = 0.0
        i = 0
        while (i < dims) { s += xbuf(i) * wp(i); i += 1 }
        signs(p) = s > 0.0
        p += 1
      }
    }
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](numTables)
    val sb = new java.lang.StringBuilder(bitsPerTable)
    var t = 0
    while (t < numTables) {
      sb.setLength(0)
      var j = 0
      while (j < bitsPerTable) {
        sb.append(if (signs(t * bitsPerTable + j)) '1' else '0')
        j += 1
      }
      out(t) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }

  // per-instance scratch: one allocation per task, not per row
  @transient private lazy val xbuf: Array[Double] = new Array[Double](w(0).length)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_buckets"
}

/** `graft_simhash(words)`: 60-bit tf-weighted SimHash of a document
  * from its raw word array in ONE native pass — apply the engine's
  * stopword/min-length predicate, count term frequencies, md5 each
  * distinct term (first 15 hex digits → 60-bit key, exactly
  * conv(substr(md5(term),1,15),16,10)), accumulate ±tf per bit, pack
  * bit b into position b of a BIGINT. Replaces a tf-shuffle + 60-way
  * bit explode + two more aggregations with a zero-shuffle map stage;
  * the integer form makes downstream banding (shift/mask) and hamming
  * (bit_count ^) pure codegen'd bit ops. Returns null when the doc has
  * no kept tokens (those docs have no tf rows in the aggregation
  * formulation, so callers filter nulls for parity).
  */
case class SimHashWords(child: Expression, bits: Int = 60)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  // returns null for docs with no kept tokens regardless of child nullability
  override def nullable: Boolean = true

  @transient private lazy val stop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Text.Stopwords.foreach(s.add)
    s
  }

  // see MinHashWords.digest: per-instance, not per-row
  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val tf = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < words.numElements()) {
      val u = words.getUTF8String(i) // null elements: never kept tokens
      if (u != null) {
        val w = u.toString
        // CODE-POINT length, matching Text.keepToken's length() and
        // the oracle — Java's UTF-16 w.length would keep a single
        // supplementary char that both of those drop
        if (w.codePointCount(0, w.length) >= Text.MinTokenLength && !stop.contains(w))
          tf.merge(w, 1, Integer.sum)
      }
      i += 1
    }
    if (tf.isEmpty) return null
    val acc = new Array[Long](bits)
    val md = digest
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val d = md.digest(e.getKey.getBytes("UTF-8"))
      // first 15 hex digits = first 7 bytes + high nibble of byte 7
      var hv = 0L
      var k = 0
      while (k < 7) { hv = (hv << 8) | (d(k) & 0xff); k += 1 }
      hv = (hv << 4) | ((d(7) & 0xf0) >>> 4)
      var b = 0
      while (b < bits) {
        acc(b) += e.getValue.toLong * (2L * ((hv >> b) & 1L) - 1L)
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < bits) { if (acc(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

/** `graft_shingles(words, n)`: the word-n-gram shingle array of a
  * document in ONE native pass — a single function call per row
  * instead of an interpreted per-element `transform` lambda (higher-
  * order array functions never enter codegen; the lambda costs a
  * virtual call per shingle). Output order and the single-space join
  * match the SQL-oracle formulation exactly, and callers explode +
  * distinct downstream, so this is a drop-in for the lambda form.
  * Returns null when the doc has fewer than n words (callers filter on
  * size >= n for parity). */
case class ShingleWords(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  // returns null for docs shorter than n regardless of child nullability
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val len = words.numElements()
    if (len < n) return null
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](len - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var j = 0
      var appended = false
      while (j < n) {
        // null elements are skipped WITH their separator, exactly like
        // concat_ws (the lambda formulation this replaced); split()
        // never yields them, but SQL callers can pass any array
        val w = words.getUTF8String(i + j)
        if (w != null) {
          if (appended) sb.append(' ')
          sb.append(w.toString)
          appended = true
        }
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

/** `graft_char_ngrams(s, n)`: all length-n character substrings of a
  * string as one native pass (one call per row; the `transform(
  * sequence(...), i -> substring(...))` form pays an interpreted
  * lambda per position AND materializes an int sequence first).
  * Returns null for strings shorter than n (callers filter length
  * >= n for oracle parity). */
case class CharNgrams(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  // returns null for strings shorter than n regardless of child nullability
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  // codegen = a static call into the same one-pass routine: keeps the
  // surrounding project/explode stage inside whole-stage codegen
  // instead of dropping the whole span to interpreted mode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.CharNgrams.compute($v, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_char_ngrams"
}

object CharNgrams {
  /** All length-n code-point substrings in ONE pass over the bytes:
    * record every code-point's byte offset, then slice [off(i),
    * off(i+n)) per window — O(bytes), where the earlier
    * `substringSQL(i+1, n)` per window re-scanned the prefix for
    * code-point alignment every call (O(bytes²) on long documents).
    * Code-point (not UTF-16) indexing, matching SQL substring
    * semantics. Null for strings shorter than n. */
  def compute(s: org.apache.spark.unsafe.types.UTF8String,
              n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val nBytes = s.numBytes()
    val bytes = s.getBytes // materializes at most once (may copy off-heap)
    // byte offset of each code point, plus the end sentinel
    val offs = new Array[Int](nBytes + 1)
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      offs(nChars) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nChars += 1
    }
    offs(nChars) = nBytes
    if (nChars < n) return null
    val out = new Array[Any](nChars - n + 1)
    var i = 0
    while (i <= nChars - n) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `graft_segment(text, dict_array)`: greedy longest-match dictionary
  * segmentation — the engine's stand-in for the reference's ansj
  * Chinese segmenter (BatchBM25PreMain.java:185-199), which is
  * likewise a dictionary-driven tokenizer for text with no word
  * delimiters. The dictionary arrives as an array literal/column
  * (driver-broadcast vocabulary — segmenter dictionaries are bounded
  * by construction); match greedily from the left, longest word
  * first, falling back to a single character for out-of-vocabulary
  * runs (ansj's unknown-char behavior). One native pass per row; the
  * HashSet + max-length probe is rebuilt only when the dictionary
  * expression is foldable (the normal case — checked once).
  */
case class SegmentWords(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  private def buildDict(d: ArrayData): (java.util.HashSet[String], Int) = {
    val set = new java.util.HashSet[String]()
    var maxLen = 1
    var i = 0
    while (i < d.numElements()) {
      val u = d.getUTF8String(i) // null dictionary entries are ignored
      if (u != null) {
        val w = u.toString
        set.add(w)
        if (w.length > maxLen) maxLen = w.length
      }
      i += 1
    }
    (set, maxLen)
  }

  // the dictionary HashSet is cached only when the dict expression is
  // FOLDABLE (the normal case: a literal/broadcast vocabulary); a
  // per-row dict column would rebuild the set per row, so the honest
  // contract is: pass the dictionary as a literal
  @transient private lazy val foldedDict: Option[(java.util.HashSet[String], Int)] =
    if (right.foldable) Option(right.eval(null)).map(d => buildDict(d.asInstanceOf[ArrayData]))
    else None

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val (dict, maxLen) = foldedDict.getOrElse(buildDict(b.asInstanceOf[ArrayData]))
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < s.length) {
      var len = math.min(maxLen, s.length - i)
      var found = false
      while (len > 0 && !found) {
        if (dict.contains(s.substring(i, i + len))) found = true else len -= 1
      }
      // OOV fallback: ONE code point (not code unit — a supplementary
      // CJK char is two UTF-16 units and must not split into surrogates)
      if (!found) len = Character.charCount(s.codePointAt(i))
      out += org.apache.spark.unsafe.types.UTF8String.fromString(s.substring(i, i + len))
      i += len
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_segment"
}

/** Session-extension hook registering graft's native expressions.
  * Users: `.withExtensions(new GraftExtensions)` on the session
  * builder, or `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Validated extraction of a literal-int SQL argument: without this,
    * a non-foldable / non-numeric / NULL argument surfaced as a raw
    * UnsupportedOperationException / ClassCastException / NPE from
    * deep inside planning instead of a message naming the function. */
  private def intArg(fn: String, args: Seq[Expression], pos: Int): Int = {
    require(args.length > pos, s"$fn expects at least ${pos + 1} arguments, got ${args.length}")
    val e = args(pos)
    require(e.foldable, s"$fn argument ${pos + 1} must be a literal integer")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn argument ${pos + 1} must be a literal integer, got $other")
    }
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Seq[Expression] = {
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")
    args
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new RewriteLambdaDot)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => { arity("graft_dot", children, 2); DotProduct(children(0), children(1)) }
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashWords].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashWords(arity("graft_simhash", children, 1).head)
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashWords].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinHashWords(arity("graft_minhash", children, 3).head,
        intArg("graft_minhash", children, 1),
        intArg("graft_minhash", children, 2))
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleWords].getName, "graft_shingles"),
      (children: Seq[Expression]) => ShingleWords(arity("graft_shingles", children, 2).head,
        intArg("graft_shingles", children, 1))
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "graft_char_ngrams"),
      (children: Seq[Expression]) => CharNgrams(arity("graft_char_ngrams", children, 2).head,
        intArg("graft_char_ngrams", children, 1))
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_segment"),
      new ExpressionInfo(classOf[SegmentWords].getName, "graft_segment"),
      (children: Seq[Expression]) => { arity("graft_segment", children, 2); SegmentWords(children(0), children(1)) }
    ))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => { arity("graft_jaro_winkler", children, 2); JaroWinkler(children(0), children(1)) }
    ))
  }
}
