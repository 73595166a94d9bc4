package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway a Catalyst extension needs: turning
  * a custom [[LogicalPlan]] back into a user-facing DataFrame.
  * `Dataset.ofRows` is `private[sql]`, so this object lives under
  * `org.apache.spark.sql` — the established pattern for open-source
  * Spark extensions that add whole operators (same access trick the
  * big table-format and geospatial extensions use). Everything else
  * in graft.plans uses only public extension points
  * (`SparkSessionExtensions.injectPlannerStrategy`).
  */
object Bridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Drop the session's shared file-listing cache. On an
    * eventually-consistent store a scan can cache a stale (empty or
    * partial) directory listing — and the cache's default TTL is
    * infinite, so the staleness never heals within the session. A
    * deployment sets `spark.sql.metadataCacheTTLSeconds` (static
    * conf); this hook gives tests and long-lived serving loops the
    * same freshness without a session rebuild.
    */
  def invalidateFileListingCache(spark: SparkSession): Unit =
    org.apache.spark.sql.execution.datasources.FileStatusCache
      .getOrCreate(spark).invalidateAll()
}
