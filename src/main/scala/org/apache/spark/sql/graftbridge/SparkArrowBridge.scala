package org.apache.spark.sql.graftbridge

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.types.pojo.{Schema => ArrowSchema}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

/** Bridge into Spark's `private[sql]` Arrow machinery (SURVEY §7.4: the
  * supported alternative would be hand-rolled row→vector population; Spark's
  * own ArrowWriter already handles every type in our surface — lists,
  * decimals, timestamps — identically to what Spark's Python/R interop
  * emits, so we expose exactly the three entry points the IPC layer needs).
  */
object SparkArrowBridge {

  /** Spark StructType → Arrow schema (µs timestamps in the given zone). */
  def toArrowSchema(schema: StructType, timeZoneId: String): ArrowSchema =
    ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = false, largeVarTypes = false)

  /** Arrow schema → Spark StructType (client-side schema discovery). */
  def fromArrowSchema(schema: ArrowSchema): StructType =
    ArrowUtils.fromArrowSchema(schema)

  def createWriter(root: VectorSchemaRoot): ArrowWriterHandle =
    new ArrowWriterHandle(ArrowWriter.create(root))

  /** Lazy executor→driver iterator of the query result's InternalRows
    * (partition-at-a-time, never a full collect).
    */
  def internalRowIterator(df: DataFrame): Iterator[InternalRow] =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan.executeToIterator()

  /** Output column name → table qualifier (alias or table name) from the
    * analyzed plan, for the table_name field-metadata decoration (mirrors
    * get_schema_for_plan's DFSchema qualifier walk, service.rs:1044-1067).
    */
  def outputQualifiers(df: DataFrame): Seq[(String, Option[String])] =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.analyzed.output
      .map(a => a.name -> a.qualifier.lastOption)

  /** Wrap an (already parsed/verified) logical plan as a DataFrame —
    * triggers analysis only; execution stays lazy.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  final class ArrowWriterHandle(private val writer: ArrowWriter) {
    def write(row: InternalRow): Unit = writer.write(row)
    def finish(): Unit = writer.finish()
    def reset(): Unit = writer.reset()
  }
}
