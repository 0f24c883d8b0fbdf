package graft.pipeline

import java.io.{FileInputStream, InputStream}
import java.util.Properties
import scala.jdk.CollectionConverters._

/** Config-driven pipeline definition.
  *
  * Mirrors the reference's `dags/config/pipeline_config.yaml` (entities,
  * landing-file sensor patterns, timeouts, retry policy, notification
  * address — /root/reference/dags/config/pipeline_config.yaml:31-46) as a
  * zero-dependency `.properties` file: adding an entity to the pipeline is
  * a config change, not code.
  *
  * Entity hash columns carry an optional render hint (`col:money`,
  * `col:ts`) so the audit row-hash is rendered identically by the Spark
  * plan and the DuckDB oracle — the same cross-engine formatting rules
  * `Ingest.p1IngestRaw` uses.
  */
final case class EntityConfig(
    name: String,
    table: String,
    pattern: String,
    sensorTimeoutMs: Long,
    pokeIntervalMs: Long,
    pk: Seq[String],
    hashCols: Seq[(String, String)]) // (column, render hint: plain|money|ts)

/** One declarative per-column expectation: inclusive integer bounds in
  * the metric's own exact unit (`min_cents`/`max_cents` in cents,
  * `null_rate_e6` floor-e6, `n_distinct` a count); `None` = unbounded on
  * that side. Integer bounds are the p14 discipline: a verdict can never
  * flip on a cross-engine ulp. */
final case class Expectation(table: String, column: String, metric: String,
                             lo: Option[Long], hi: Option[Long])

object Expectation {
  val Metrics: Set[String] = Set("min_cents", "max_cents", "null_rate_e6", "n_distinct")
}

final case class PipelineConfig(
    entities: Seq[EntityConfig],
    retries: Int,
    retryDelayMs: Long,
    stageTimeoutMs: Long,
    notifyEmail: Option[String],
    expectations: Seq[Expectation]) {
  def entity(name: String): EntityConfig =
    entities.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no entity '$name' in config"))
}

object PipelineConfig {

  /** The shipped default definition — embedded so it survives bare-classes
    * classpaths, but parsed through the same parser as any user file
    * (PipelineMain's 4th arg overrides it). */
  val defaultProperties: String =
    """# graft pipeline definition — the analog of the reference's
      |# dags/config/pipeline_config.yaml: entities, landing patterns, sensor
      |# timeouts, retry policy, notification address. Adding an entity here
      |# (plus its staging transform name) adds it to the pipeline without
      |# code changes.
      |
      |pipeline.entities=customer,orders
      |pipeline.retries=1
      |pipeline.retryDelayMs=200
      |# per-attempt wall-clock bound, the reference's execution_timeout
      |# (default_args, pipeline_orchestration_dag.py:36 — 2 hours)
      |pipeline.stageTimeoutMs=7200000
      |notifications.email=pipeline-alerts@example.invalid
      |
      |# "employee-like" entity: the customer fact-dim
      |entity.customer.table=customer
      |entity.customer.pattern=Employee.csv
      |entity.customer.sensorTimeoutMs=10000
      |entity.customer.pokeIntervalMs=100
      |entity.customer.pk=c_custkey
      |entity.customer.hashCols=c_custkey,c_name,c_nationkey,c_acctbal:money,c_mktsegment
      |
      |# second entity through the identical parameterized ingest (reference
      |# ingests Employee and Department through the same job pair)
      |entity.orders.table=orders
      |entity.orders.pattern=Department.csv
      |entity.orders.sensorTimeoutMs=10000
      |entity.orders.pokeIntervalMs=100
      |entity.orders.pk=o_orderkey
      |entity.orders.hashCols=o_orderkey,o_custkey,o_orderstatus,o_totalprice:money,o_orderdate:ts,o_orderpriority
      |
      |# per-column expectation suite (p17): table.column.metric:lo:hi,
      |# inclusive integer bounds in the metric's exact unit (cents / e6 /
      |# counts), empty side = unbounded — the value-bound generalization
      |# of the reference's COUNT(*)>0 checks
      |pipeline.expectations=orders.o_totalprice.min_cents:0:,\
      |orders.o_totalprice.max_cents::60000000,\
      |orders.o_orderstatus.n_distinct:1:3,\
      |orders.o_orderdate.null_rate_e6::0,\
      |customer.c_acctbal.min_cents:-100000:,\
      |customer.c_nationkey.n_distinct:1:25,\
      |lineitem.l_quantity.min_cents:100:,\
      |lineitem.l_quantity.max_cents::5000,\
      |lineitem.l_discount.max_cents::10,\
      |lineitem.l_shipdate.null_rate_e6::0
      |""".stripMargin

  def default: PipelineConfig = fromStream(
    new java.io.ByteArrayInputStream(defaultProperties.getBytes("UTF-8")))

  def load(path: String): PipelineConfig = fromStream(new FileInputStream(path))

  def fromStream(in: InputStream): PipelineConfig = {
    val props = new Properties()
    try props.load(in) finally in.close()
    fromProperties(props)
  }

  def fromProperties(props: Properties): PipelineConfig = {
    def get(k: String): String = {
      val v = props.getProperty(k)
      require(v != null && v.nonEmpty, s"pipeline config: missing key '$k'")
      v.trim
    }
    def opt(k: String): Option[String] =
      Option(props.getProperty(k)).map(_.trim).filter(_.nonEmpty)
    def list(v: String): Seq[String] =
      v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val names = list(get("pipeline.entities"))
    val entities = names.map { n =>
      val hashCols = list(get(s"entity.$n.hashCols")).map { spec =>
        spec.split(":") match {
          case Array(c) => (c, "plain")
          case Array(c, hint) =>
            require(Set("plain", "money", "ts").contains(hint),
              s"entity.$n.hashCols: unknown render hint '$hint' on $c")
            (c, hint)
          case _ => throw new IllegalArgumentException(
            s"entity.$n.hashCols: bad spec '$spec'")
        }
      }
      EntityConfig(
        name = n,
        table = opt(s"entity.$n.table").getOrElse(n),
        pattern = get(s"entity.$n.pattern"),
        sensorTimeoutMs = opt(s"entity.$n.sensorTimeoutMs").map(_.toLong).getOrElse(60000L),
        pokeIntervalMs = opt(s"entity.$n.pokeIntervalMs").map(_.toLong).getOrElse(1000L),
        pk = list(get(s"entity.$n.pk")),
        hashCols = hashCols)
    }
    // expectation spec: table.column.metric:lo:hi — both bound slots
    // always present (`::` = unbounded hi and lo would be a tautology a
    // config reviewer should see spelled out, so at least one side must
    // be given), values integer in the metric's own unit
    val expectations = opt("pipeline.expectations").toSeq
      .flatMap(list).map { spec =>
        spec.split(":", -1) match {
          case Array(path, lo, hi) =>
            val parts = path.split("\\.")
            require(parts.length == 3,
              s"pipeline.expectations: bad path '$path' (want table.column.metric)")
            require(Expectation.Metrics.contains(parts(2)),
              s"pipeline.expectations: unknown metric '${parts(2)}' on $path")
            def side(s: String) = if (s.isEmpty) None else Some(s.toLong)
            val e = Expectation(parts(0), parts(1), parts(2), side(lo), side(hi))
            require(e.lo.isDefined || e.hi.isDefined,
              s"pipeline.expectations: $path has no bound on either side")
            e
          case _ => throw new IllegalArgumentException(
            s"pipeline.expectations: bad spec '$spec' (want table.column.metric:lo:hi)")
        }
      }
    // unknown keys under entity./pipeline. are config typos — fail loudly
    val known = names.flatMap(n => Seq("table", "pattern", "sensorTimeoutMs",
      "pokeIntervalMs", "pk", "hashCols").map(s => s"entity.$n.$s")).toSet ++
      Set("pipeline.entities", "pipeline.retries", "pipeline.retryDelayMs",
        "pipeline.stageTimeoutMs", "notifications.email", "pipeline.expectations")
    val unknown = props.stringPropertyNames().asScala.filterNot(known.contains)
    require(unknown.isEmpty, s"pipeline config: unknown keys ${unknown.mkString(", ")}")
    PipelineConfig(
      entities = entities,
      retries = opt("pipeline.retries").map(_.toInt).getOrElse(0),
      retryDelayMs = opt("pipeline.retryDelayMs").map(_.toLong).getOrElse(0L),
      // missing key => the reference's 2h execution_timeout default, NOT
      // "no timeout": config files written before this key existed must
      // still get hang protection (set 0 explicitly to disable)
      stageTimeoutMs = opt("pipeline.stageTimeoutMs").map(_.toLong).getOrElse(7200000L),
      notifyEmail = opt("notifications.email"),
      expectations = expectations)
  }
}
