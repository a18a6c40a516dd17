package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding of ONE word by ranked-greedy merging — the encode path
  * that scales in MERGE COUNT: repeatedly merge the LEFTMOST occurrence
  * of the lowest-rank pair present, via a hash-map rank lookup per
  * adjacent pair. [[graft.operators.BpeEncode.encodeWord]]'s
  * fold-chain formulation applies each merge as one Catalyst
  * `aggregate` expression — exactly right at demo merge counts, but a
  * production tokenizer's 32k-50k merges would chain 32k fold
  * expressions into one plan and break analysis/codegen long before
  * execution (the encode-side twin of the round-6 trainer's
  * scan-per-merge gap). Here the merge table rides as ONE broadcast
  * reference object however large it is, and per-word cost is
  * O(len² · lookup) with len = word length — merge-count-independent.
  *
  * EQUIVALENCE CONTRACT: ranked-greedy equals the sequential
  * rank-by-rank passes (the fold chain / BpeSpec's reference encoder)
  * for merge tables PRODUCED BY BPE TRAINING, where rank r's pair is
  * built from symbols that exist before r — the property
  * [[graft.operators.BpeTrain]] guarantees by construction. An
  * arbitrary hand-written table can violate it (a rank-1 pair over a
  * symbol only minted by rank 2 is unreachable for sequential passes
  * but reachable here after rank 2 fires); BpeSpec pins parity under
  * trained tables (16 and 256 merges, ASCII and non-BMP) and
  * demonstrates the precondition with exactly that pathological table.
  *
  * Symbols are code points (split like BpeTrain — never lone
  * surrogates). Null word → null; empty word → empty array.
  */
case class BpeRankedEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_ranked_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  /** pair-key → rank; first occurrence of a duplicate pair wins (the
    * lower rank), matching sequential semantics where the later
    * duplicate merge finds nothing left to do. */
  @transient private lazy val rankMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(BpeRankedEncode.key(a, b), Integer.valueOf(i)): Unit
    }
    m
  }

  override def nullSafeEval(w: Any): Any =
    BpeRankedEncode.encodeWord(w.asInstanceOf[UTF8String], rankMap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("ranks", rankMap,
      "java.util.HashMap<String, Integer>")
    val helper = BpeRankedEncode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = $helper$$.MODULE$$.encodeWord($w, $mapRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeRankedEncode =
    copy(child = newChild)
}

object BpeRankedEncode {

  /** Pair key: symbols come from whitespace-split words, so a space
    * can never occur INSIDE a symbol — the join is unambiguous. */
  private def key(a: String, b: String): String = a + " " + b

  /** Ranked-greedy encode of one word (called from both the
    * interpreted eval and the generated code). Pair ranks are cached
    * in an array parallel to the adjacency list and only the two pairs
    * adjacent to a merge are re-looked-up, so key strings are built
    * O(len + merges) times per word, not O(len) per merge round. */
  def encodeWord(word: UTF8String,
      ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val s = word.toString
    // code-point split, like BpeTrain
    val syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(s.substring(i, i + n)): Unit
      i += n
    }
    if (syms.size() >= 2) {
      // pairRanks(j) = rank of (syms(j), syms(j+1)), Integer.MAX_VALUE
      // if unmergeable — kept in lockstep with syms below
      val pairRanks = new java.util.ArrayList[Integer](syms.size() - 1)
      var j = 0
      while (j < syms.size() - 1) {
        pairRanks.add(rankOf(ranks, syms.get(j), syms.get(j + 1))): Unit
        j += 1
      }
      var continue = true
      while (continue) {
        var best = -1
        var bestRank = Integer.MAX_VALUE
        var k = 0
        while (k < pairRanks.size()) {
          val r = pairRanks.get(k).intValue()
          if (r < bestRank) { bestRank = r; best = k }
          k += 1
        }
        if (best < 0 || bestRank == Integer.MAX_VALUE) continue = false
        else {
          syms.set(best, syms.get(best) + syms.get(best + 1))
          syms.remove(best + 1): Unit
          pairRanks.remove(best): Unit
          if (best > 0)
            pairRanks.set(best - 1, rankOf(ranks, syms.get(best - 1), syms.get(best))): Unit
          if (best < syms.size() - 1)
            pairRanks.set(best, rankOf(ranks, syms.get(best), syms.get(best + 1))): Unit
        }
      }
    }
    val out = new Array[AnyRef](syms.size())
    var k = 0
    while (k < out.length) {
      out(k) = UTF8String.fromString(syms.get(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  private def rankOf(ranks: java.util.HashMap[String, Integer],
      a: String, b: String): Integer = {
    val r = ranks.get(key(a, b))
    if (r == null) Integer.valueOf(Integer.MAX_VALUE) else r
  }

  def apply(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeRankedEncode(Bridge.expression(word), merges))
}
