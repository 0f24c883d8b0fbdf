package graft.pipeline

import scala.collection.mutable
import scala.util.Try

/** Minimal DAG runner: topological stage execution with fail-fast.
  *
  * Re-expresses the reference's Airflow TaskGroup chain
  * (/root/reference/dags/pipeline_orchestration_dag.py:212): stages declare
  * dependencies, run in topological order, and a failure skips every
  * transitive dependent while unrelated stages still run — the same
  * fail-fast semantics an Airflow DAG gives the reference.
  */
object Runner {

  final case class Stage(name: String, deps: Seq[String] = Seq.empty)(val run: () => Unit)

  sealed trait Status
  case object Succeeded extends Status
  final case class Failed(error: Throwable) extends Status
  final case class Skipped(because: String) extends Status

  final case class StageResult(name: String, status: Status)

  /** Run stages respecting deps. Throws IllegalArgumentException on an
    * unknown dep or a cycle (a mis-declared DAG is a bug, not a runtime
    * failure). */
  def run(stages: Seq[Stage]): Seq[StageResult] = {
    val byName = stages.map(s => s.name -> s).toMap
    stages.foreach(s => s.deps.foreach(d =>
      require(byName.contains(d), s"stage ${s.name}: unknown dep $d")))

    // Kahn topological order, stable by declaration order.
    val indeg = mutable.Map(stages.map(s => s.name -> s.deps.size): _*)
    val order = mutable.ArrayBuffer.empty[Stage]
    val ready = mutable.Queue(stages.filter(_.deps.isEmpty): _*)
    while (ready.nonEmpty) {
      val s = ready.dequeue()
      order += s
      stages.filter(_.deps.contains(s.name)).foreach { dep =>
        indeg(dep.name) -= 1
        if (indeg(dep.name) == 0) ready.enqueue(dep)
      }
    }
    require(order.size == stages.size,
      s"cycle among: ${stages.map(_.name).diff(order.map(_.name).toSeq).mkString(",")}")

    val status = mutable.Map.empty[String, Status]
    order.foreach { s =>
      val badDep = s.deps.find(d => status(d) != Succeeded)
      status(s.name) = badDep match {
        case Some(d) => Skipped(s"dep $d did not succeed")
        case None => Try(s.run()).fold(Failed(_), _ => Succeeded)
      }
    }
    order.map(s => StageResult(s.name, status(s.name))).toSeq
  }

  /** Like [[run]] but independent stages execute CONCURRENTLY (Airflow's
    * parallel branches): each stage starts as soon as all its deps succeed,
    * failures skip transitive dependents. `parallelism` bounds concurrent
    * stages. Results are in declaration order. */
  def runParallel(stages: Seq[Stage], parallelism: Int = 4): Seq[StageResult] = {
    import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
    import scala.concurrent.{Await, ExecutionContext, Future, Promise}
    import scala.concurrent.duration.Duration

    val byName = stages.map(s => s.name -> s).toMap
    stages.foreach(s => s.deps.foreach(d =>
      require(byName.contains(d), s"stage ${s.name}: unknown dep $d")))
    // reuse the sequential validator for cycle detection
    require({
      val indeg = mutable.Map(stages.map(s => s.name -> s.deps.size): _*)
      val seen = mutable.ArrayBuffer.empty[String]
      val ready = mutable.Queue(stages.filter(_.deps.isEmpty): _*)
      while (ready.nonEmpty) {
        val s = ready.dequeue(); seen += s.name
        stages.filter(_.deps.contains(s.name)).foreach { dep =>
          indeg(dep.name) -= 1
          if (indeg(dep.name) == 0) ready.enqueue(dep)
        }
      }
      seen.size == stages.size
    }, s"cycle among stages")

    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val done = new ConcurrentHashMap[String, Promise[Status]]()
    stages.foreach(s => done.put(s.name, Promise[Status]()))
    try {
      stages.foreach { s =>
        val depFutures = Future.sequence(s.deps.map(d => done.get(d).future))
        depFutures.map { depStatuses =>
          s.deps.zip(depStatuses).find(_._2 != Succeeded) match {
            case Some((d, _)) => done.get(s.name).success(Skipped(s"dep $d did not succeed"))
            case None => Future {
              done.get(s.name).success(Try(s.run()).fold(Failed(_), _ => Succeeded))
            }
          }
        }
      }
      stages.map(s => StageResult(s.name,
        Await.result(done.get(s.name).future, Duration.Inf)))
    } finally {
      pool.shutdown()
      pool.awaitTermination(10, TimeUnit.SECONDS)
    }
  }
}
