package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  Filter, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.ingest.Versioned

/** V1 `BaseRelation` over a versioned table at one version: the SQL
  * surface's data-skipping read path. Catalyst's V1 source strategy
  * hands `buildScan` the query's pushable filter conjuncts and the
  * required columns, and [[Versioned.buildPrunedScan]] turns them into
  * log-metadata file skipping (zone maps, null counts, partition
  * values) plus an in-scan parquet row-group pushdown — so a plain SQL
  * `WHERE` over a registered view prunes files exactly like the Scala
  * `readAsOfWhere` API. The relation deliberately reports every filter
  * unhandled (the `BaseRelation` default), so Spark re-applies the
  * full predicate above the scan: pruning is result-neutral by
  * construction, the q261 invariant carried to SQL.
  *
  * Mirrors the reading side of the reference's lake tables (the Delta
  * path behind e.g. process_silver_trending_tracks.py), re-expressed
  * as a Spark V1 source so SQL, DataFrame and view readers all share
  * one skipping implementation. */
final class VersionedRelation(ctx: SQLContext, path: String, version: Long)
    extends BaseRelation with PrunedFilteredScan {
  override def sqlContext: SQLContext = ctx

  override val schema: StructType =
    Versioned.schemaAt(ctx.sparkSession, path, version)

  // buildScan returns rows straight off the pruned columnar scan
  // (InternalRow) — the V1 contract for conversion-free sources
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] =
    Versioned.buildPrunedScan(ctx.sparkSession, path, version,
      requiredColumns, filters)
}

/** `spark.read.format("graft-table")` (or the full class name)
  * provider for [[VersionedRelation]]. Options: `path` (the table
  * root), `versionAsOf` (defaults to the head version at load
  * time). */
final class VersionedTable extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table: a path is required — spark.read.format(\"graft-table\")" +
        ".load(<table root>)"))
    val version = parameters.get("versionAsOf").map(_.toLong)
      .getOrElse(Versioned.latestVersion(ctx.sparkSession, path))
    new VersionedRelation(ctx, path, version)
  }
}
