package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Native UDTF (Catalyst `Generator`): distinct word n-gram shingle
  * hashes of a token-hash array, emitted row-by-row.
  *
  * The declared UDTF extension point from SURVEY.md §2B's last row —
  * the whole-row-generating analogue of the scalar `VecDot` family.
  * Semantics match the query layer's `transform(sequence(...)) →
  * array_distinct → explode` formulation bit-for-bit (same
  * `xxhash64(tok_i, …, tok_{i+n-1})` seed-42 chain, first occurrence
  * order), but the shingle array is never materialized: hashes stream
  * out of a running window with an open-addressed dedup set, so peak
  * memory per row is O(distinct shingles) longs instead of
  * O(tokens) array cells plus a sort inside `array_distinct`.
  */
final case class NGramHashGen(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(StructField("h", LongType, nullable = false) :: Nil)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_gen expects array<bigint> of token hashes, got ${other.simpleString(10)}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) return Iterator.empty
    val m = arr.numElements() - n + 1
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](m)
    var i = 0
    while (i < m) {
      // same chain as the xxhash64(e_i, ..., e_{i+n-1}) builtin: fold
      // each element into the running hash, starting from seed 42
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(arr.getLong(i + j), h); j += 1 }
      if (seen.add(h)) out += InternalRow(h)
      i += 1
    }
    out.iterator
  }

  override protected def withNewChildInternal(newChild: Expression): NGramHashGen =
    copy(child = newChild)
}
