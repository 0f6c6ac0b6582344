package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev-loop profiler (optimization-round measurement harness, guide §1):
  * times ONE contract query through the noop sink, then prints
  *  - per-stage wall/task times from a SparkListener (where the seconds go
  *    between exchanges), and
  *  - the executed plan annotated with each operator's SQLMetrics
  *    (rows out, per-operator times) — operator-level evidence the plan
  *    text alone cannot give.
  *
  * Usage: `runMain graft.ProfileQ <queryName> [sfDir] [reps]`.
  * Never run by the driver; purely a measurement tool.
  */
object ProfileQ {

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = GraftSession.local(appName = s"graft-profile-$name")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))

    case class StageRow(id: Int, nameLine: String, wallMs: Long,
                        taskMs: Long, tasks: Int, shuffleReadMB: Double,
                        shuffleWriteMB: Double, inputMB: Double)
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(90),
          wall, m.executorRunTime, si.numTasks,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6)
      }
    }

    // the noop write runs its own QueryExecution — capture the executed
    // (post-AQE) plan of the write via a QueryExecutionListener
    @volatile var lastQe: org.apache.spark.sql.execution.QueryExecution = null
    val qeListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = lastQe = qe
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qeListener)

    // warmup (codegen/JIT out of the measurement, the Bench discipline)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    for (_ <- 0 until reps) {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    println(f"%n==== $name: $wall%.2f s over $reps rep(s) ====")
    println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s ${"tasks"}%6s " +
      f"${"shRd_MB"}%8s ${"shWr_MB"}%8s ${"in_MB"}%7s  name")
    stages.sortBy(-_.wallMs).take(40).foreach { r =>
      println(f"${r.id}%6d ${r.wallMs}%8d ${r.taskMs}%8d ${r.tasks}%6d " +
        f"${r.shuffleReadMB}%8.1f ${r.shuffleWriteMB}%8.1f " +
        f"${r.inputMB}%7.1f  ${r.nameLine}")
    }
    println(f"%n-- ${stages.length} stages, Σwall ${stages.map(_.wallMs).sum}%d ms, " +
      f"Σtask ${stages.map(_.taskMs).sum}%d ms --%n")

    // executed plan with operator metrics (last rep's plan)
    def walk(p: SparkPlan, depth: Int, out: StringBuilder): Unit = {
      val mets = p.metrics.toSeq
        .filter { case (_, m) => m.value != 0 }
        .sortBy(_._1)
        .map { case (k, m) => s"$k=${m.value}" }
        .mkString(", ")
      out ++= ("  " * depth) + p.nodeName +
        (if (mets.nonEmpty) s"  [$mets]" else "") + "\n"
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
          Seq(r.child)
        case b: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(b.child)
        case _ => p.children
      }
      kids.foreach(walk(_, depth + 1, out))
      p.subqueries.foreach { sq =>
        out ++= ("  " * (depth + 1)) + "[subquery]\n"
        walk(sq, depth + 2, out)
      }
    }
    // let the listener bus drain so lastQe is the final write's QE
    var spin = 0
    while (lastQe == null && spin < 100) { Thread.sleep(50); spin += 1 }
    Thread.sleep(500)
    val sb = new StringBuilder
    if (lastQe != null) walk(lastQe.executedPlan, 0, sb)
    println(sb.toString)
    spark.stop()
  }
}
