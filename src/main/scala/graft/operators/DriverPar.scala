package graft.operators

import org.apache.spark.sql.SparkSession

/** Overlap independent driver-side Spark actions (guide §2.6): Spark's
  * scheduler runs concurrent jobs happily — actions are only sequential
  * because driver code calls them sequentially — so independent builds
  * and writes submitted from a small pool back-fill the executor slots
  * each other's stage tails leave idle.
  *
  * Discipline (the r11-ADVICE Takedown lessons, centralized): pool
  * threads are daemons (an orphaned action can never pin JVM exit),
  * the await is unbounded (a hard-coded timeout turns a legitimately
  * slow large-scale action into a spurious TimeoutException), and on
  * the first failure the sibling tasks' in-flight jobs are cancelled
  * via a shared job group before the error propagates. Session and
  * job-group are re-established per pool thread — both are
  * thread-local in Spark.
  */
object DriverPar {

  def run[T](spark: SparkSession, label: String)(tasks: Seq[() => T]): Seq[T] = {
    if (tasks.isEmpty) return Nil
    if (tasks.size == 1) return Seq(tasks.head())
    val sc = spark.sparkContext
    val group = s"$label-${java.util.UUID.randomUUID}"
    val tf = new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"$label-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size, tf)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futs = tasks.map { t =>
      scala.concurrent.Future {
        SparkSession.setActiveSession(spark)
        sc.setJobGroup(group, label, interruptOnCancel = false)
        try t() finally sc.clearJobGroup()
      }
    }
    try {
      val out = futs.map(f => scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration.Inf))
      pool.shutdown()
      out
    } catch { case t: Throwable =>
      try sc.cancelJobGroup(group) catch { case _: Exception => () }
      pool.shutdownNow()
      throw t
    }
  }
}
