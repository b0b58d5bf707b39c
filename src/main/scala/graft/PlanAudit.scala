package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: physical-plan smell report over the whole registry. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the registry includes custom-operator queries (GroupTopK):
      // without the extension their logical plans have no strategy
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.registry.foreach { q =>
      try {
        val p = q.fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
        val ex = "Exchange".r.findAllIn(p).length
        val bhj = "BroadcastHashJoin".r.findAllIn(p).length
        val smj = "SortMergeJoin".r.findAllIn(p).length
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
        val cart = "CartesianProduct".r.findAllIn(p).length
        val top = if (p.contains("TakeOrderedAndProject")) 1 else 0
        println(f"AUDIT ${q.name}%-36s ex=$ex bhj=$bhj smj=$smj bnlj=$bnlj cart=$cart top=$top")
      } catch { case e: Throwable => println(s"AUDIT ${q.name} ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
