package graft
import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `.explain("formatted")` for the named queries (or
  * all) so shuffle counts, pushed filters, and codegen spans can be
  * reviewed without a debugger. Usage:
  *   sbt 'runMain graft.Explain /root/testdata/sf0.01 q_hll_sketch j3_interval_join'
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSet
    val spark = Sessions.local(4, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
