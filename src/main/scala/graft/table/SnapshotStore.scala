package graft.table

import graft.core.{JArr, JInt, JObj, JStr, JValue}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Snapshot/manifest layer over partitioned parquet — Iceberg *semantics*
  * (snapshots, per-partition lineage, resumable commit) without the Iceberg
  * runtime jar (none in this environment; see SURVEY.md §7 environment
  * facts). The reference's closest concept is the Store's id→document cache
  * (reference lib/JSON/Validator/Store.pm:21-49) — here the registry tracks
  * partition-level completion instead of schema documents.
  *
  * Layout:
  * {{{
  *   <root>/data/<partCol>=<value>/…parquet     (dynamic partition overwrite)
  *   <root>/_snapshots/<snapshotId>.json        (manifest, atomic rename)
  * }}}
  *
  * Resume contract: a run writes partition-by-partition-group via dynamic
  * partition overwrite (idempotent — re-running a partition replaces it,
  * never duplicates), then commits the partition list + per-partition row
  * metrics to the manifest atomically (tmp + rename through the Hadoop
  * FileSystem API, so the same code works on HDFS/S3A on a real cluster).
  * A relaunch with the same snapshot id skips completed partitions.
  */
final case class SnapshotManifest(
    snapshotId: String,
    parent: Option[String],
    completed: Map[String, Long] // partition value → rows written
) {
  def toJson: String = JObj(Vector(
    "snapshot_id" -> JStr(snapshotId),
    "parent" -> parent.map(JStr(_): JValue).getOrElse(graft.core.JNull),
    "completed" -> JObj(completed.toVector.sortBy(_._1).map { case (k, v) => k -> (JInt(v): JValue) }),
    "partitions" -> JArr(completed.keys.toVector.sorted.map(JStr(_): JValue))
  )).render
}

object SnapshotManifest {
  def fromJson(s: String): SnapshotManifest = {
    val o = JValue.parse(s).asInstanceOf[JObj]
    val completed = o.get("completed") match {
      case Some(c: JObj) => c.fields.map { case (k, JInt(v)) => k -> v; case (k, _) => k -> 0L }.toMap
      case _ => Map.empty[String, Long]
    }
    SnapshotManifest(
      o.get("snapshot_id").collect { case JStr(s0) => s0 }.getOrElse(""),
      o.get("parent").collect { case JStr(p) => p },
      completed)
  }
}

class SnapshotStore(root: String, spark: SparkSession) {

  private def fs: FileSystem = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def manifestPath(id: String) = new Path(s"$root/_snapshots/$id.json")
  val dataPath = s"$root/data"

  def readManifest(id: String): Option[SnapshotManifest] = {
    val p = manifestPath(id)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(SnapshotManifest.fromJson(new String(in.readAllBytes(), StandardCharsets.UTF_8)))
      finally in.close()
    }
  }

  /** Atomic manifest write: tmp file + rename (rename is atomic on HDFS and
    * local fs; on S3A the committer handles it). */
  def writeManifest(m: SnapshotManifest): Unit = {
    val p = manifestPath(m.snapshotId)
    val tmp = new Path(p.toString + ".tmp")
    fs.mkdirs(p.getParent)
    val out = fs.create(tmp, true)
    try out.write(m.toJson.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** Resumable partitioned write. Computes the remaining partitions
    * (distinct partition values minus the manifest's completed set), writes
    * ONLY those partitions via dynamic partition overwrite, and commits
    * their row counts to the manifest. Returns per-partition rows written
    * in this run (empty → nothing left, run was already complete).
    *
    * The distinct-partitions scan and the per-partition counts ride the
    * same shuffle as the write's partitioning; at 100 TB the extra cost is
    * one `groupBy(part).count()` over the remaining slice.
    */
  def writeResumable(df: DataFrame, partCol: String, snapshotId: String): Map[String, Long] = {
    val prior = readManifest(snapshotId).getOrElse(SnapshotManifest(snapshotId, None, Map.empty))
    val done = prior.completed.keySet

    val remainingDf =
      if (done.isEmpty) df
      else df.where(!col(partCol).cast("string").isInCollection(done))

    // per-partition metrics (lineage): rows per remaining partition
    val counts = remainingDf.groupBy(col(partCol).cast("string").as("__p"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    if (counts.nonEmpty) {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try remainingDf.write.mode("overwrite").partitionBy(partCol).parquet(dataPath)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      writeManifest(prior.copy(completed = prior.completed ++ counts))
    }
    counts
  }

  /** Read the table back (partition pruning applies via the partition
    * column). */
  def read(): DataFrame = spark.read.parquet(dataPath)

  /** Lineage/metrics table from the manifest: `(partition, n_rows)`. */
  def lineage(snapshotId: String): DataFrame = {
    import spark.implicits._
    readManifest(snapshotId).map(_.completed.toSeq).getOrElse(Seq.empty)
      .toDF("partition", "n_rows")
  }
}
