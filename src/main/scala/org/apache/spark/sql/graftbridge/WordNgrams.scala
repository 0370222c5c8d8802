package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-valued function (Catalyst Generator): word n-grams of a
  * text column as (pos, ng) rows — the shingling primitive as a
  * LATERAL VIEW source, completing the UDF surface triple (scalar
  * kernels, typed UDAF, and this UDTF) that SURVEY §2.B.11 maps from the
  * reference's create_udf/create_udaf/table-function hooks
  * (datafusion-flight-sql-server/src/session.rs:9-12 gives the embedding
  * application the SessionState to register them on).
  *
  * pos is 1-based (the n-gram starting at word i), so the DuckDB oracle's
  * generate_series(1, len - n + 1) positions align exactly.
  */
case class WordNgrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ng", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    val nv = n.eval(input)
    if (t == null || nv == null) Nil
    else {
      val words = t.asInstanceOf[UTF8String].toString.split(" ")
      val k = nv.asInstanceOf[Int]
      if (k < 1 || words.length < k) Nil
      else (0 to words.length - k).map { i =>
        InternalRow(i + 1,
          UTF8String.fromString(words.slice(i, i + k).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNgrams =
    copy(child = newChildren(0), n = newChildren(1))

  override def prettyName: String = "graft_ngrams"
}
