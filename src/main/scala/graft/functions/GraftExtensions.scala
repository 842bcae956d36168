package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions hook: registers the native graft expressions in
  * the session function registry so plain SQL can call them —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * SELECT doc_id, simhash64(split(text, ' ')) FROM documents
  * SELECT minhash_signature(token_shingles(split(text, ' '), 3), 128) ...
  * SELECT array_cosine(a.embedding, b.embedding) ...
  * }}}
  *
  * This is the standard extension path (no session-internal APIs at the
  * call site); the same functions remain available to the DataFrame API
  * through [[native]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$fn expects a literal integer argument, got: $other")
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)
    ),
    (
      new FunctionIdentifier("simhash56_md5"),
      new ExpressionInfo(classOf[SimHash56Md5].getName, "simhash56_md5"),
      (children: Seq[Expression]) => SimHash56Md5(children.head)
    ),
    (
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => MinHashSignature(children.head, intArg(children(1), "minhash_signature"))
    ),
    (
      new FunctionIdentifier("token_shingles"),
      new ExpressionInfo(classOf[TokenShingles].getName, "token_shingles"),
      (children: Seq[Expression]) => TokenShingles(children.head, intArg(children(1), "token_shingles"))
    ),
    (
      new FunctionIdentifier("token_windows"),
      new ExpressionInfo(classOf[TokenWindows].getName, "token_windows"),
      (children: Seq[Expression]) => TokenWindows(children.head, intArg(children(1), "token_windows"))
    ),
    (
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => ArrayDot(children.head, children(1))
    ),
    (
      new FunctionIdentifier("array_cosine"),
      new ExpressionInfo(classOf[ArrayCosine].getName, "array_cosine"),
      (children: Seq[Expression]) => ArrayCosine(children.head, children(1))
    )
  )

  /** Same registrations for a session that already exists (the
    * `spark.sql.extensions` config only applies at session creation).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftshim.GraftSqlShim.registerFunction(spark, id, info, builder)
    }
}
