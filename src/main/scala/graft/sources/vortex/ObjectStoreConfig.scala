package graft.sources.vortex

import org.apache.spark.sql.SparkSession

/** Configuration-only object-store wiring (SURVEY §2.1 S5; see
  * OBJECT_STORES.md). The vortex source touches storage exclusively
  * through the Hadoop FileSystem API, so pointing it at S3/MinIO/GCS
  * is a matter of standard per-scheme conf keys — this helper sets
  * the s3a ones a vortex workload cares about. It deliberately
  * contains no AWS classes: the hadoop-aws + aws-sdk-bundle jars are
  * a deploy-time classpath concern (documented blocker: this build
  * sandbox has neither, so the live round trip cannot run in CI here;
  * VortexObjectStoreSpec covers the same call sites via a custom
  * scheme instead).
  */
object ObjectStoreConfig {

  /** Apply s3a settings tuned for the vortex access pattern:
    * many parallel small footer GETs at planning time + large
    * sequential chunk GETs at read time + rename-committed writes. */
  def s3a(spark: SparkSession, endpoint: String = "",
          pathStyleAccess: Boolean = false,
          connections: Int = 96): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    if (endpoint.nonEmpty) c.set("fs.s3a.endpoint", endpoint)
    c.set("fs.s3a.path.style.access", pathStyleAccess.toString)
    // footer prefetch fans out ~#cores parallel GETs per executor
    c.set("fs.s3a.connection.maximum", connections.toString)
    // chunk reads are sequential within a split; random hurts them,
    // but the footer tail-read seeks backwards — normal + readahead
    // is the right default for this mix
    c.set("fs.s3a.experimental.input.fadvise", "normal")
    c.set("fs.s3a.readahead.range", (256 * 1024).toString)
    // writes stream through the fast upload path; the .inprogress →
    // rename commit needs no S3-side atomicity (see OBJECT_STORES.md)
    c.set("fs.s3a.fast.upload", "true")
    c.set("fs.s3a.multipart.size", (64 * 1024 * 1024).toString)
  }
}
