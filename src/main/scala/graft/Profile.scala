package graft

/** Dev profiler: time named gate queries repeatedly.
  * Usage: runMain graft.Profile <sfDir> <reps> <query...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = GraftSession.build(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      (1 to reps).foreach { i =>
        // same per-rep hygiene as Bench.dropCaches: without it,
        // localCheckpoint blocks accumulate across queries and the
        // later numbers measure memory pressure, not the query
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        q(spark, sfDir).count()
        println(f"PROFILE $n#$i ${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
