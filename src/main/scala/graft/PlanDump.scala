package graft

import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round evidence dumper: writes `EXPLAIN FORMATTED` for a
  * named list of queries to `<outDir>/<query>_<suffix>.txt`, one file per
  * query — the before/after plan artifacts OPTIMIZATION_rN.md cites.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|top:N:benchJson>
  *   e.g. runMain graft.PlanDump /root/testdata/sf0.1 plans/r14 before q67_incremental_neardup,q27_neardup_minhash
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|top:N:benchJson>")
    val Array(sfDir, outDir, suffix, spec) = args
    val names: Seq[String] =
      if (spec.startsWith("top:")) {
        val Array(_, n, benchJson) = spec.split(":", 3)
        val line = java.nio.file.Files.readString(java.nio.file.Path.of(benchJson))
        Plans.queryTimes(line).filter(_._2 >= 0).sortBy(-_._2)
          .take(n.toInt).map(_._1)
      } else spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(outDir))
    val spark = GraftSession.local("graft-plandump")
    val mode = ExplainMode.fromString("formatted")
    names.foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(mode)
        catch { case scala.util.control.NonFatal(e) =>
          s"(explain failed: ${e.getMessage})"
        }
      val body =
        s"""query: $name  ($suffix)
           |sfDir: $sfDir
           |structure: ${Plans.summarize(plan)}
           |
           |${plan.trim}
           |""".stripMargin
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(s"$outDir/${name}_$suffix.txt"), body)
      println(s"$outDir/${name}_$suffix.txt  [${Plans.summarize(plan)}]")
    }
    spark.stop()
  }
}
