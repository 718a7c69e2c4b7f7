package org.apache.spark.ml.clustering

import org.apache.spark.mllib.clustering.{KMeansModel => MLlibKMeansModel}
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Exact, Spark-job-free persistence for fitted [[KMeansModel]]s.
  *
  * A fitted k-means quantizer is k·dim doubles plus four params —
  * kilobytes. Spark's native ML persistence round-trips that through a
  * parquet write + a parquet read + a JSON metadata file, each a Spark
  * job with driver-side file listing and schema resolution: measured on
  * this repo's bench, ONE `KMeansModel.load` costs ~3 Spark jobs /
  * ~150-250 ms, and the IVF-PQ artifact rows pay it 9-18× per serve run
  * (coarse quantizer + M per-subspace codebooks, sometimes for two
  * artifact generations). That is driver/O(jobs) overhead, not data
  * work, at ANY corpus scale — the artifact is constant-size by
  * construction (guide §5: the driver should do almost no data work;
  * §1.2: remove work that isn't the algorithm).
  *
  * This codec writes the centers as hex-encoded IEEE-754 bit patterns
  * (exact round-trip, no decimal parsing ambiguity) plus the uid and
  * the explicitly-set params this repo's fits use, in ONE plain text
  * file written atomically (temp + ATOMIC_MOVE — strictly safer than
  * the native writer's non-atomic directory layout). Load reconstructs
  * the model through the same constructor path the native ML reader
  * uses (`new KMeansModel(uid, new MLlibKMeansModel(centers, ...))` +
  * param restore), so a loaded model is behaviorally identical to a
  * natively-loaded one: same centers bit-for-bit, same distance
  * measure, same tie-breaking in `predict`/`transform`.
  *
  * Lives in `org.apache.spark.ml.clustering` because the faithful
  * reconstruction constructor is package-private; everything used is
  * public Spark API semantics (the exact constructor call the bundled
  * `KMeansModelReader.load` makes).
  */
object GraftKMeansIO {

  private val Magic = "graft-kmeans-v1"

  private def hex(d: Double): String =
    java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(d))

  private def unhex(s: String): Double =
    java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(s, 16))

  /** Serialize to the codec's text form (exposed for spec coverage). */
  def toText(model: KMeansModel): String = {
    val params = Seq[(String, Option[String])](
      "k" -> (if (model.isSet(model.k)) Some(model.getK.toString) else None),
      "seed" -> (if (model.isSet(model.seed)) Some(model.getSeed.toString)
                 else None),
      "featuresCol" -> (if (model.isSet(model.featuresCol))
                          Some(model.getFeaturesCol) else None),
      "predictionCol" -> (if (model.isSet(model.predictionCol))
                            Some(model.getPredictionCol) else None),
      "distanceMeasure" -> (if (model.isSet(model.distanceMeasure))
                              Some(model.getDistanceMeasure) else None)
    ).collect { case (n, Some(v)) => s"$n=$v" }
    val header =
      s"$Magic\t${model.uid}\t${model.getDistanceMeasure}\t" +
        params.mkString(",")
    val centers = model.clusterCenters
      .map(c => c.toArray.map(hex).mkString(","))
    (header +: centers).mkString("\n")
  }

  /** Reconstruct from the codec's text form (exposed for spec coverage). */
  def fromText(text: String): KMeansModel = {
    val lines = text.split("\n")
    val head = lines.head.split("\t", -1)
    require(head(0) == Magic,
      s"not a $Magic artifact (found header '${head(0).take(40)}')")
    val uid = head(1)
    val measure = head(2)
    val centers = lines.tail.map(l =>
      OldVectors.dense(l.split(",").map(unhex)))
    val model = new KMeansModel(uid,
      new MLlibKMeansModel(centers, measure, 0.0, -1))
    head(3).split(",").filter(_.nonEmpty).foreach { kv =>
      val Array(n, v) = kv.split("=", 2)
      n match {
        case "k" => model.set(model.k, v.toInt)
        case "seed" => model.set(model.seed, v.toLong)
        case "featuresCol" => model.set(model.featuresCol, v)
        case "predictionCol" => model.set(model.predictionCol, v)
        case "distanceMeasure" => model.set(model.distanceMeasure, v)
        case other => throw new IllegalArgumentException(
          s"unknown persisted kmeans param '$other'")
      }
    }
    model
  }

  /** Atomic overwrite-save to a single file at `path`. */
  def save(path: String, model: KMeansModel): Unit = {
    val target = Paths.get(path)
    Option(target.getParent).foreach(Files.createDirectories(_))
    // a stale directory from the native layout (or a crashed native
    // write) blocks the file move — clear it first, like .overwrite()
    if (Files.isDirectory(target)) {
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
          Files.list(p).forEach(rm(_))
        Files.deleteIfExists(p)
      }
      rm(target)
    }
    val tmp = target.resolveSibling(
      s".${target.getFileName}.tmp.${Thread.currentThread().getId}")
    Files.write(tmp, toText(model).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Loud load: a missing or foreign file fails with the store's named
    * violation, mirroring the stores' partial-artifact contract. */
  def load(path: String): KMeansModel = {
    val p = Paths.get(path)
    require(Files.isRegularFile(p),
      s"kmeans artifact $path is missing or not a codec file — " +
        "refusing to serve against a partial store")
    fromText(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }
}
