package graft

import org.apache.spark.ml.clustering.{GraftKMeansIO, KMeans}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** The zero-job KMeansModel codec (optimization r19): a loaded model
  * must be BEHAVIORALLY identical to the fitted one — bit-exact
  * centers, same params, same uid (the broadcast-cache key), same
  * predictions — because every IVF/PQ/model-store serve path now
  * round-trips through it. */
class GraftKMeansIOSpec extends SparkSpec {

  private def fitTiny() = {
    val df = spark.range(0, 200)
      .select(col("id"),
        array_to_vector(array(
          (col("id") % 7).cast("double") + rand(1) * 0.01,
          (col("id") % 3).cast("double") + rand(2) * 0.01))
          .as("features"))
      .localCheckpoint()
    (new KMeans().setK(5).setSeed(42).setFeaturesCol("features")
      .setPredictionCol("cell").fit(df), df)
  }

  test("round-trip is exact: centers bit-for-bit, params, uid") {
    val (m, _) = fitTiny()
    val dir = java.nio.file.Files.createTempDirectory("gkio").toString
    GraftKMeansIO.save(s"$dir/kmeans", m)
    val l = GraftKMeansIO.load(s"$dir/kmeans")
    assert(l.uid == m.uid)
    assert(l.getK == m.getK)
    assert(l.getFeaturesCol == m.getFeaturesCol)
    assert(l.getPredictionCol == m.getPredictionCol)
    assert(l.getDistanceMeasure == m.getDistanceMeasure)
    assert(l.getSeed == m.getSeed)
    assert(l.clusterCenters.length == m.clusterCenters.length)
    l.clusterCenters.zip(m.clusterCenters).foreach { case (a, b) =>
      assert(a.toArray.map(java.lang.Double.doubleToRawLongBits).toSeq ==
        b.toArray.map(java.lang.Double.doubleToRawLongBits).toSeq)
    }
  }

  test("loaded model transforms identically to the fitted one") {
    val (m, df) = fitTiny()
    val dir = java.nio.file.Files.createTempDirectory("gkio").toString
    GraftKMeansIO.save(s"$dir/kmeans", m)
    val l = GraftKMeansIO.load(s"$dir/kmeans")
    val a = m.transform(df).select("id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val b = l.transform(df).select("id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("overwrite-save replaces a prior artifact (and a stale dir)") {
    val (m, _) = fitTiny()
    val dir = java.nio.file.Files.createTempDirectory("gkio").toString
    // stale directory at the target (the native writer's layout)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/kmeans/data"))
    GraftKMeansIO.save(s"$dir/kmeans", m)
    GraftKMeansIO.save(s"$dir/kmeans", m) // plain overwrite too
    assert(GraftKMeansIO.load(s"$dir/kmeans").getK == m.getK)
  }

  test("load is loud on a missing or foreign artifact") {
    val dir = java.nio.file.Files.createTempDirectory("gkio").toString
    val e = intercept[IllegalArgumentException] {
      GraftKMeansIO.load(s"$dir/absent")
    }
    assert(e.getMessage.contains("missing"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/foreign"), "not-a-model\n")
    val e2 = intercept[IllegalArgumentException] {
      GraftKMeansIO.load(s"$dir/foreign")
    }
    assert(e2.getMessage.contains("graft-kmeans-v1"))
  }
}
