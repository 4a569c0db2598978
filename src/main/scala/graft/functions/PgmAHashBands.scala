package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** 64-bit average-hash over a REAL decoded image: parses a binary PGM
  * (Netpbm "P5") payload — magic, `#` comments, whitespace-separated
  * width/height/maxval, then `w*h` raw gray bytes — average-pools the
  * pixel grid into 8×8 luma cells, and emits the same 4 sixteen-bit
  * band values as [[AHashBands]], so the LSH banding / hamming-verify
  * machinery downstream is identical for text and image payloads.
  *
  * This closes the one stand-in decode boundary the multimodal family
  * had: the hash is computed from actual decoded pixels of an actual
  * uncompressed image format (pure JVM byte-walk, no codec
  * dependency). Pooling cell for pixel (r, c) of a w×h image is
  * `(r*8/h, c*8/w)` in integer arithmetic; bit k is set when cell k's
  * mean exceeds the global mean, compared by integer
  * cross-multiplication (`cellSum * nPix > total * cellCnt`) so the
  * result is exact and engine-replayable — the DuckDB oracle walks the
  * same bytes through hex-string arithmetic and reproduces every bit.
  *
  * The 8×8 pooling makes the hash RESOLUTION-INDEPENDENT: the same
  * scene stored at 8×8 and 16×16 pools to (nearly) the same grid, so
  * near-dups meet across sizes — the property that makes aHash an
  * image dedup key rather than a byte checksum.
  *
  * Malformed payloads (wrong magic, dims ≤ 0, maxval outside 1..255,
  * truncated pixel data, oversized dims) decode to NULL rather than
  * failing the job: at corpus scale a scan must survive corrupt blobs,
  * and a null hash simply drops the row out of the near-dup index
  * (callers that want strictness can assert on the null count).
  * Multi-byte (maxval > 255, 2-byte samples) PGMs are rejected as
  * malformed — the fixture and the common thumbnail path are 8-bit.
  */
case class PgmAHashBands(child: Expression) extends UnaryExpression {

  /** Cap on w*h: a lying header ("999999999 999999999") must not make
    * the decoder loop for a day on a 40-byte payload. Any genuine
    * payload is length-checked against w*h anyway; the cap just fails
    * fast before trusting the product. 1<<26 = a 64 MB gray image.
    */
  private val maxPixels: Long = 1L << 26

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // malformed payloads decode to null even when the input column is
  // non-nullable — without this override the planner would trust
  // child.nullable and skip the null check downstream
  override def nullable: Boolean = true
  override def prettyName: String = "pgm_ahash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a BinaryType input, got ${child.dataType}")

  /** Called from both interpreted eval and generated code. Returns
    * null for malformed payloads (see class doc).
    */
  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    // header scan state: pos advances through magic, whitespace runs,
    // '#' comments (to end of line), and three decimal fields
    var pos = 0
    if (n < 2 || bytes(0) != 'P' || bytes(1) != '5') return null
    pos = 2
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0B || b == 0x0C
    // skip whitespace and comments; returns false if the payload ends
    def skipWsAndComments(): Boolean = {
      var progressed = false
      var again = true
      while (again) {
        again = false
        while (pos < n && isWs(bytes(pos))) { pos += 1; progressed = true }
        if (pos < n && bytes(pos) == '#') {
          while (pos < n && bytes(pos) != '\n') pos += 1
          again = true; progressed = true
        }
      }
      progressed && pos < n
    }
    // parse a non-negative decimal field; -1 = malformed
    def parseInt(): Long = {
      if (pos >= n || bytes(pos) < '0' || bytes(pos) > '9') return -1L
      var v = 0L
      while (pos < n && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) return -1L
        pos += 1
      }
      v
    }
    if (!skipWsAndComments()) return null
    val w = parseInt()
    if (w <= 0) return null
    if (!skipWsAndComments()) return null
    val h = parseInt()
    if (h <= 0) return null
    if (!skipWsAndComments()) return null
    val maxval = parseInt()
    if (maxval <= 0 || maxval > 255) return null
    // exactly ONE whitespace byte separates the header from the
    // raster (the Netpbm spec: the single character after maxval)
    if (pos >= n || !isWs(bytes(pos))) return null
    pos += 1
    val nPix = w * h
    if (nPix > maxPixels || n - pos < nPix) return null
    val wi = w.toInt
    val hi = h.toInt
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var r = 0
    var i = pos
    while (r < hi) {
      val segRowBase = (r * 8 / hi) * 8
      var c = 0
      while (c < wi) {
        val v = (bytes(i) & 0xFF).toLong
        val seg = segRowBase + c * 8 / wi
        sums(seg) += v
        cnts(seg) += 1
        total += v
        c += 1
        i += 1
      }
      r += 1
    }
    val out = new Array[Long](4)
    val np = nPix
    var b = 0
    while (b < 4) {
      var v = 0L
      var j = 0
      while (j < 16) {
        val seg = b * 16 + j
        if (sums(seg) * np > total * cnts(seg)) v |= (1L << j)
        j += 1
      }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pgmahash", this,
      classOf[PgmAHashBands].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $ref.compute($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
