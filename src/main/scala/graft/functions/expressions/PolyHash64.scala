package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-replayable 64-bit string hash: four independent polynomial rolling
  * hashes of the code-point sequence — `h := (h·base + cp) mod p` — each
  * with a distinct (base, prime) pair, packed into the four 16-bit chunks
  * of a long.
  *
  * Exists so signature-based operators (SimHash, MinHash) can run under a
  * hash an external SQL engine can replay exactly (pure integer
  * arithmetic, no engine-internal hash like xxhash64): each part is
  * `list_reduce(.., (h, c) -> (h*base + ascii(c)) % p)` in DuckDB. The
  * top part's prime is < 2^15 so bit 63 is never set and the packed value
  * stays non-negative — summing `1 << j` bit weights then never overflows
  * a signed 64-bit integer in engines without wrapping arithmetic.
  *
  * Per-part mixing mod a ~16-bit prime is decent, so 16-bit-chunk
  * pigeonhole blocking (TextDedup.simHashPairs) keeps expected random
  * chunk collisions at ~n²/2p — the blocking stays real, unlike packing a
  * single 30-bit hash into 64 bits where constant chunks would degrade
  * candidate generation to all-pairs.
  */
@ExpressionDescription(
  usage = "_FUNC_(str) - 64-bit polynomial rolling hash (4 packed 16-bit parts)")
case class PolyHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    PolyHash64.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.PolyHash64.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {

  /** (base, prime) per 16-bit part, low chunk first. The last prime is
    * < 2^15 so the packed hash never sets bit 63 (see class doc).
    */
  val Parts: Seq[(Long, Long)] = Seq(
    (31L, 65521L), (37L, 65519L), (41L, 65497L), (43L, 32749L))

  /** Reference implementation, shared by eval and codegen. Iterates code
    * points (matching SQL `string_split(s, '')` + `ascii`). Accumulators
    * stay < 2^16, so `h·base + cp` never approaches overflow.
    */
  def hash(s: String): Long = {
    var h0 = 0L; var h1 = 0L; var h2 = 0L; var h3 = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h0 = (h0 * 31 + cp) % 65521
      h1 = (h1 * 37 + cp) % 65519
      h2 = (h2 * 41 + cp) % 65497
      h3 = (h3 * 43 + cp) % 32749
      i += Character.charCount(cp)
    }
    h0 | (h1 << 16) | (h2 << 32) | (h3 << 48)
  }
}
