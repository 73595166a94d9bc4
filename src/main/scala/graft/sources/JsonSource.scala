package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines query-table source — the same explicit-schema contract
  * as [[CsvSource]] for the second ubiquitous interchange format.
  * One JSON object per line (JSONL): line-splittable, so the read
  * parallelizes exactly like CSV; `multiLine` (whole-file arrays)
  * stays off for the same reason. Schema is required — JSON schema
  * inference samples the data and can type the same column
  * differently between files.
  */
object JsonSource {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Materialize a query table as JSONL (fixture writer). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
