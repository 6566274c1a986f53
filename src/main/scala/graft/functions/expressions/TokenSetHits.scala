package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token count plus per-word-set hit counts in ONE tokenization pass:
  * `struct(n_tokens, hits[i] = #tokens contained in sets(i))`, duplicates
  * counted, tokens = whitespace-split of the lowercased text (Spark
  * `split` semantics, limit -1).
  *
  * Replaces the `size(filter(tokens, t -> array_contains(array(lits…),
  * t)))` formulation used per word set, which (a) re-tokenizes the text
  * for EVERY set — language ID over 5 marker sets plus a stopword ratio
  * split the same text 6+ times per row — and (b) runs an interpreted
  * lambda doing a linear scan of the literal array per token (HOF lambdas
  * never codegen). Here one pass tokenizes once and each token is one hash
  * probe into a shared token→sets lookup built once per expression
  * instance; the whole thing stays inside whole-stage codegen.
  */
case class TokenSetHits(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {
  require(sets.nonEmpty, "at least one word set required")

  override def dataType: DataType = TokenSetHits.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"token_set_hits requires a string input, got ${dt.sql}")
  }

  /** token → indices of the sets containing it (a token may appear in
    * several sets — e.g. 'de'/'fr' markers share articles). Built once;
    * shipped to generated code as a single reference object.
    */
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    sets.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        m.computeIfAbsent(w, _ => scala.collection.mutable.ArrayBuffer[Int]()) += i
      }
    }
    val out = new java.util.HashMap[String, Array[Int]]()
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenSetHits.compute(input.asInstanceOf[UTF8String], lookup, sets.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSetLookup", lookup,
      "java.util.HashMap<String, int[]>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TokenSetHits.compute($c, $ref, ${sets.size})")
  }

  override protected def withNewChildInternal(c: Expression): TokenSetHits =
    copy(child = c)

  override def prettyName: String = "token_set_hits"
}

object TokenSetHits {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  def compute(
      text: UTF8String,
      lookup: java.util.HashMap[String, Array[Int]],
      nSets: Int): InternalRow = {
    // UTF8String.toLowerCase = Spark's lower(); split limit -1 keeps
    // empty tokens exactly like split(lower(text), "\\s+")
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val hits = new Array[Int](nSets)
    var i = 0
    while (i < toks.length) {
      val idxs = lookup.get(toks(i))
      if (idxs != null) {
        var j = 0
        while (j < idxs.length) { hits(idxs(j)) += 1; j += 1 }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](toks.length, new GenericArrayData(hits)))
  }
}
