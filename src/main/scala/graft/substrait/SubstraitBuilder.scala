package graft.substrait

import graft.protocol.Proto.Writer

/** Minimal Substrait producer — the inverse of [[SubstraitDecoder]], used
  * by the `q_substrait_exec` inventory entry and the service e2e specs to
  * hand-encode plans a Flight SQL client would ship via
  * `CommandStatementSubstraitPlan` (the reference consumes these at
  * datafusion-flight-sql-server/src/service.rs:274-303).
  *
  * Wire layout follows the public Substrait protos and is cross-validated
  * against an independent consumer where that consumer supports the shape:
  * scripts/check_substrait.py executes the join/filter/sort/fetch plan
  * under Acero (pyarrow.substrait.run_query) and matches DuckDB exactly,
  * and pins that the aggregate plan is rejected by Acero *only* for its
  * missing `modulus` kernel (the bytes parse; the kernel is absent there).
  * So the producer and the in-repo consumer cannot simply share a private
  * misreading of the format. Run: `python3 scripts/check_substrait.py
  * <sfDir> <planDir>` after `sbt "runMain graft.substrait.SubstraitPlanDump
  * <planDir>"`.
  */
object SubstraitBuilder {

  private def msg(b: Writer => Unit): Array[Byte] = {
    val w = new Writer(); b(w); w.result()
  }

  // ---- types (type.proto kind tags; nullability NULLABLE=1) ----

  val BOOL = 1; val I8 = 2; val I16 = 3; val I32 = 5; val I64 = 7
  val FP32 = 10; val FP64 = 11; val STR = 12; val BIN = 13; val DATE = 16

  def typ(tag: Int): Array[Byte] =
    msg(_.bytesField(tag, msg(_.varintField(2, 1))))

  /** Decimal { scale=1; precision=2; nullability=4 }. */
  def decimalType(precision: Int, scale: Int): Array[Byte] =
    msg(_.bytesField(24, msg { w =>
      if (scale != 0) w.varintField(1, scale)
      w.varintField(2, precision)
      w.varintField(4, 1)
    }))

  // ---- expressions ----

  /** Root struct-field reference by flat index. */
  def fieldRef(i: Int): Array[Byte] = msg { w =>
    val structField = msg(x => if (i != 0) x.varintField(1, i))
    val segment = msg(_.bytesField(2, structField))
    w.bytesField(2, msg { fr =>
      fr.bytesField(1, segment)
      fr.bytesField(4, Array.emptyByteArray) // root_reference
    })
  }

  def litBool(v: Boolean): Array[Byte] =
    msg(_.bytesField(1, msg(_.varintField(1, if (v) 1 else 0))))
  def litI32(v: Int): Array[Byte] =
    msg(_.bytesField(1, msg(_.varintField(5, v.toLong))))
  def litI64(v: Long): Array[Byte] =
    msg(_.bytesField(1, msg(_.varintField(7, v))))
  def litF64(v: Double): Array[Byte] =
    msg(_.bytesField(1, msg(_.fixed64Field(11, java.lang.Double.doubleToLongBits(v)))))
  def litF32(v: Float): Array[Byte] =
    msg(_.bytesField(1, msg(_.fixed32Field(10, java.lang.Float.floatToIntBits(v)))))
  def litStr(v: String): Array[Byte] =
    msg(_.bytesField(1, msg(_.stringField(12, v))))
  def litNull(ofType: Array[Byte]): Array[Byte] =
    msg(_.bytesField(1, msg(_.bytesField(29, ofType))))
  def litDateDays(days: Int): Array[Byte] =
    msg(_.bytesField(1, msg(_.varintField(16, days.toLong))))

  /** ScalarFunction { function_reference=1; output_type=3; arguments=4 }. */
  def fn(anchor: Int, outType: Array[Byte], args: Array[Byte]*): Array[Byte] =
    msg(_.bytesField(3, msg { w =>
      if (anchor != 0) w.varintField(1, anchor.toLong)
      w.bytesField(3, outType)
      args.foreach(a => w.bytesField(4, msg(_.bytesField(3, a))))
    }))

  /** Cast { type=1; input=2; failure_behavior=3 } — THROW_EXCEPTION (2),
    * the ANSI semantics both Spark and DuckDB evaluate these plans under
    * (Acero REJECTS a plan whose failure_behavior is unspecified, so a
    * conforming producer must write it).
    */
  def cast(input: Array[Byte], to: Array[Byte]): Array[Byte] =
    msg(_.bytesField(11, msg { w =>
      w.bytesField(1, to); w.bytesField(2, input); w.varintField(3, 2)
    }))

  /** Expression.Subquery.in_predicate (Expression tag 12, Subquery field
    * 2) { needles=1; haystack=2 } — the uncorrelated `x IN (SELECT …)`
    * form; graft's consumer lowers it to a left_semi join (left_anti when
    * wrapped in `not`).
    */
  def inSubquery(needles: Seq[Array[Byte]], haystack: Array[Byte]): Array[Byte] =
    msg(_.bytesField(12, msg(_.bytesField(2, msg { w =>
      needles.foreach(w.bytesField(1, _))
      w.bytesField(2, haystack)
    }))))

  /** Expression.WindowFunction (tag 5) { function_reference=1;
    * partitions=2; sorts=3; phase=6; output_type=7; arguments=9;
    * invocation=11 } — default (unspecified) frame bounds only.
    */
  def windowFn(
      anchor: Int,
      outType: Array[Byte],
      partitions: Seq[Array[Byte]],
      sorts: Seq[(Array[Byte], Int)],
      args: Seq[Array[Byte]] = Nil): Array[Byte] =
    msg(_.bytesField(5, msg { w =>
      if (anchor != 0) w.varintField(1, anchor.toLong)
      partitions.foreach(w.bytesField(2, _))
      sorts.foreach { case (e, dir) =>
        w.bytesField(3, msg { sf => sf.bytesField(1, e); sf.varintField(2, dir.toLong) })
      }
      w.varintField(6, 3) // AGGREGATION_PHASE_INITIAL_TO_RESULT
      w.bytesField(7, outType)
      args.foreach(a => w.bytesField(9, msg(_.bytesField(3, a))))
      w.varintField(11, 1) // AGGREGATION_INVOCATION_ALL
    }))

  def ifThen(clauses: Seq[(Array[Byte], Array[Byte])], els: Option[Array[Byte]]): Array[Byte] =
    msg(_.bytesField(6, msg { w =>
      clauses.foreach { case (c, t) =>
        w.bytesField(1, msg { cw => cw.bytesField(1, c); cw.bytesField(2, t) })
      }
      els.foreach(w.bytesField(2, _))
    }))

  def inList(value: Array[Byte], options: Array[Byte]*): Array[Byte] =
    msg(_.bytesField(8, msg { w =>
      w.bytesField(1, value)
      options.foreach(w.bytesField(2, _))
    }))

  // ---- relations ----

  /** ReadRel over a named table; base_schema pins the positional order the
    * plan's field indexes assume.
    */
  def readNamed(
      table: String,
      cols: Seq[(String, Array[Byte])],
      filter: Option[Array[Byte]] = None): Array[Byte] =
    msg(_.bytesField(1, msg { w =>
      w.bytesField(2, msg { ns =>
        cols.foreach { case (n, _) => ns.stringField(1, n) }
        // Type.Struct { types=1; type_variation_reference=2; nullability=3 }
        ns.bytesField(2, msg { st =>
          cols.foreach { case (_, t) => st.bytesField(1, t) }
          st.varintField(3, 1)
        })
      })
      filter.foreach(w.bytesField(3, _))
      w.bytesField(7, msg(_.stringField(1, table)))
    }))

  def filterRel(input: Array[Byte], cond: Array[Byte]): Array[Byte] =
    msg(_.bytesField(2, msg { w => w.bytesField(2, input); w.bytesField(3, cond) }))

  def fetch(input: Array[Byte], offset: Long, count: Long): Array[Byte] =
    msg(_.bytesField(3, msg { w =>
      w.bytesField(2, input)
      if (offset != 0) w.varintField(3, offset)
      w.varintField(4, count)
    }))

  val AscFirst = 1; val AscLast = 2; val DescFirst = 3; val DescLast = 4

  def sort(input: Array[Byte], keys: Seq[(Array[Byte], Int)]): Array[Byte] =
    msg(_.bytesField(5, msg { w =>
      w.bytesField(2, input)
      keys.foreach { case (e, dir) =>
        w.bytesField(3, msg { sf => sf.bytesField(1, e); sf.varintField(2, dir.toLong) })
      }
    }))

  /** ProjectRel — direct output is input fields then `exprs`; `emit`
    * indexes into that combined layout (packed, the proto3 default).
    */
  def project(
      input: Array[Byte],
      exprs: Seq[Array[Byte]],
      emit: Option[Seq[Int]] = None): Array[Byte] =
    msg(_.bytesField(7, msg { w =>
      emit.foreach { m =>
        val packed = { val pw = new Writer(); m.foreach(i => pw.writeVarint(i.toLong)); pw.result() }
        w.bytesField(1, msg(_.bytesField(2, msg(_.bytesField(1, packed)))))
      }
      w.bytesField(2, input)
      exprs.foreach(w.bytesField(3, _))
    }))

  /** One aggregate measure: AggregateFunction { function_reference=1;
    * phase=4 INITIAL_TO_RESULT; output_type=5; invocation=6; arguments=7 }
    * wrapped in Measure { measure=1; filter=2 }.
    */
  def measure(
      anchor: Int,
      outType: Array[Byte],
      args: Seq[Array[Byte]],
      distinct: Boolean = false,
      filter: Option[Array[Byte]] = None): Array[Byte] =
    msg { w =>
      w.bytesField(1, msg { m =>
        if (anchor != 0) m.varintField(1, anchor.toLong)
        m.varintField(4, 3)
        m.bytesField(5, outType)
        m.varintField(6, if (distinct) 2 else 1)
        args.foreach(a => m.bytesField(7, msg(_.bytesField(3, a))))
      })
      filter.foreach(w.bytesField(2, _))
    }

  /** AggregateRel with a single grouping (inline grouping_expressions). */
  def aggregate(
      input: Array[Byte],
      groups: Seq[Array[Byte]],
      measures: Seq[Array[Byte]]): Array[Byte] =
    msg(_.bytesField(4, msg { w =>
      w.bytesField(2, input)
      w.bytesField(3, msg(g => groups.foreach(g.bytesField(1, _))))
      measures.foreach(w.bytesField(4, _))
    }))

  /** AggregateRel with MULTIPLE groupings in the reference style a
    * DataFusion producer emits: a shared grouping_expressions table
    * (field 5) + per-grouping expression_references (Grouping field 2).
    */
  def aggregateSets(
      input: Array[Byte],
      groupingExpressions: Seq[Array[Byte]],
      sets: Seq[Seq[Int]],
      measures: Seq[Array[Byte]]): Array[Byte] =
    msg(_.bytesField(4, msg { w =>
      w.bytesField(2, input)
      sets.foreach { s =>
        w.bytesField(3, msg(g => s.foreach(i => g.varintField(2, i.toLong))))
      }
      measures.foreach(w.bytesField(4, _))
      groupingExpressions.foreach(w.bytesField(5, _))
    }))

  val Inner = 1; val FullOuter = 2; val LeftOuter = 3; val RightOuter = 4
  val LeftSemi = 5; val LeftAnti = 6

  def join(
      left: Array[Byte],
      right: Array[Byte],
      cond: Array[Byte],
      joinType: Int,
      postFilter: Option[Array[Byte]] = None): Array[Byte] =
    msg(_.bytesField(6, msg { w =>
      w.bytesField(2, left)
      w.bytesField(3, right)
      w.bytesField(4, cond)
      postFilter.foreach(w.bytesField(5, _))
      w.varintField(6, joinType.toLong)
    }))

  def cross(left: Array[Byte], right: Array[Byte]): Array[Byte] =
    msg(_.bytesField(12, msg { w => w.bytesField(2, left); w.bytesField(3, right) }))

  val UnionDistinct = 5; val UnionAll = 6

  /** SetRel { common=1; inputs=2; op=3 } (algebra.proto Rel oneof tag 8). */
  def set(inputs: Seq[Array[Byte]], op: Int): Array[Byte] =
    msg(_.bytesField(8, msg { w =>
      inputs.foreach(w.bytesField(2, _))
      w.varintField(3, op.toLong)
    }))

  // ---- plan ----

  /** One function declaration: anchor + extension URI + compound name
    * (`sum:fp64`); URIs get sequential anchors.
    */
  final case class Fn(anchor: Int, uri: String, name: String)

  /** Standard substrait extension YAML URIs (functions resolve by these
    * under Acero; DataFusion and graft resolve by simple name).
    */
  val UriComparison =
    "https://github.com/substrait-io/substrait/blob/main/extensions/functions_comparison.yaml"
  val UriArithmetic =
    "https://github.com/substrait-io/substrait/blob/main/extensions/functions_arithmetic.yaml"
  val UriAggGeneric =
    "https://github.com/substrait-io/substrait/blob/main/extensions/functions_aggregate_generic.yaml"
  val UriBoolean =
    "https://github.com/substrait-io/substrait/blob/main/extensions/functions_boolean.yaml"
  val UriString =
    "https://github.com/substrait-io/substrait/blob/main/extensions/functions_string.yaml"

  /** Serialize a Plan: extension URIs + function declarations + one
    * RelRoot(rel, names) + version.
    */
  def plan(rootRel: Array[Byte], names: Seq[String], functions: Seq[Fn]): Array[Byte] = {
    val uris = functions.map(_.uri).distinct.zipWithIndex.map { case (u, i) => u -> (i + 1) }.toMap
    msg { w =>
      uris.toSeq.sortBy(_._2).foreach { case (u, a) =>
        w.bytesField(1, msg { uw => uw.varintField(1, a.toLong); uw.stringField(2, u) })
      }
      functions.foreach { f =>
        w.bytesField(2, msg(_.bytesField(3, msg { fw =>
          fw.varintField(1, uris(f.uri).toLong)
          fw.varintField(2, f.anchor.toLong)
          fw.stringField(3, f.name)
        })))
      }
      w.bytesField(3, msg(_.bytesField(2, msg { r =>
        r.bytesField(1, rootRel)
        names.foreach(r.stringField(2, _))
      })))
      w.bytesField(6, msg { v => v.varintField(2, 44); v.stringField(5, "graft") })
    }
  }
}
