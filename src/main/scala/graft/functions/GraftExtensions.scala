package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for the engine's native Catalyst
  * expressions, so `spark.sql("... graft_dot_product(a, b) ...")` works
  * anywhere the Scala API does:
  *
  *  - `graft_dot_product(arr, arr)`   -> double (codegen tight loop)
  *  - `graft_simhash32(arr<long>)`    -> 32-bit SimHash as long
  *  - `graft_ngram_poly_hash(arr<long>, n, base, mod)` -> arr<long>
  *
  * Two wiring paths:
  *  - cluster config: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    injects at session build (the SparkSessionExtensions route the
  *    brief prefers for whole-engine integration);
  *  - runtime: [[GraftFunctions.register]] on a live session (useful in
  *    notebooks/tests where the session already exists).
  *
  * `minhash_signature` is not exposed in SQL: its permutation tables are
  * Scala-level constants, not row values (use the Scala API).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def long(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  /** (name, info, builder) triples shared by both wiring paths. */
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot_product(arrayA, arrayB)")
        DotProduct(args(0), args(1))
      }),
    ("graft_simhash32",
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash32(arrayOfTokenHashes)")
        SimHash32(args.head)
      }),
    ("graft_codepoint",
      new ExpressionInfo(classOf[CodepointAt].getName, "graft_codepoint"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_codepoint(text, pos)")
        CodepointAt(args(0), args(1))
      }),
    ("graft_ngram_poly_hash",
      new ExpressionInfo(classOf[NGramPolyHash].getName, "graft_ngram_poly_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "graft_ngram_poly_hash(arr, n, base, mod)")
        NGramPolyHash(args.head,
          long(args(1), "n").toInt, long(args(2), "base"), long(args(3), "mod"))
      }),
    // aggregate: the analyzer wraps a registered AggregateFunction in
    // AggregateExpression itself, same as the built-in aggregates
    ("graft_kmv_sketch",
      new ExpressionInfo(classOf[KmvSketch].getName, "graft_kmv_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_kmv_sketch(hashCol, k)")
        KmvSketch(args.head, long(args(1), "k").toInt)
      }),
    ("graft_hll_sketch",
      new ExpressionInfo(classOf[HllSketch].getName, "graft_hll_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hll_sketch(hashCol, m)")
        HllSketch(args.head, long(args(1), "m").toInt)
      }),
    ("graft_hashed_bucket_sum",
      new ExpressionInfo(classOf[HashedBucketSum].getName, "graft_hashed_bucket_sum"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_hashed_bucket_sum(tokens, lookup, buckets)")
        HashedBucketSum(args(0), args(1), long(args(2), "buckets").toInt)
      }),
  )

  /** Register on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
