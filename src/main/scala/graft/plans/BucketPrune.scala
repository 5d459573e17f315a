package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, Cast, DynamicPruning, DynamicPruningSubquery, EqualTo, Expression, In, InSet, Literal, Pmod, PredicateHelper, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.plans.{InnerLike, JoinType, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.IntegerType

/** Automatic bucket pruning for
  * [[graft.pipeline.Sinks.writeKeyedBuckets]] tables — the engine's one
  * custom `Rule[LogicalPlan]`, and the case that genuinely needs one: a
  * user filtering a keyed-bucket table by KEY writes
  * `table.filter($"k" === 5)`, but the layout's selectivity lives in the
  * DERIVED directory column (`bucket = pmod(xxhash64(k), n)`), which no
  * built-in optimization can conjure because the key→bucket function is
  * a storage-layout convention, not a catalog fact. This rule reads the
  * layout's sidecar metadata and conjoins the implied bucket predicate,
  * which `FileSourceStrategy` then turns into a partition filter — the
  * scan lists |distinct keys| directories instead of all `n`. Key
  * equality against a dimension-sized JOIN side gets the dynamic twin:
  * a stock `DynamicPruningSubquery` whose build key is the writer's
  * bucket function over the dim keys (see [[tryInjectJoin]]).
  *
  * Semantics-preserving by construction: the added conjunct is implied
  * by the key predicate (every row with k=5 IS in bucket(5)), so it can
  * only remove directories that cannot contain matches. Injection is
  * skipped when the condition already references `bucket` (also what
  * stops the fixed-point optimizer re-injecting), when no top-level
  * conjunct is a key equality/IN over literals, or when the relation
  * carries no sidecar.
  *
  * Register per session: production via
  * `spark.sql.extensions=graft.plans.GraftExtensions`; an already-built
  * session via `spark.experimental.extraOptimizations` (the spec path —
  * both land in optimizer batches that run before physical planning).
  */
case class InjectBucketPruning(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val withLiterals = plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation) =>
        tryInject(cond, rel)
          .map(extra => f.copy(condition = And(cond, extra)))
          .getOrElse(f)
    }
    withLiterals.transformUp {
      case j: Join => tryInjectJoin(j)
    }
  }

  /** DPP-style bucket pruning for KEY-EQUALITY JOINS (the dynamic twin
    * of the literal path): `bucketTable JOIN dim ON bucketTable.k =
    * dim.k` implies every surviving bucket-table row has
    * `bucket ∈ { pmod(xxhash64(dim.k), n) }` — a set only known at
    * RUNTIME. Injects Spark's own `DynamicPruningSubquery` with the
    * bucket partition attribute as the pruning key and the writer's
    * bucket function over the dim-side join key as the build key —
    * exactly the `Filter(DynamicPruningSubquery(partitionAttr, ...),
    * LogicalRelation)` shape the built-in PartitionPruning rule emits,
    * so the whole downstream machinery (subquery reuse against a
    * broadcast exchange, `dynamicallySelectedPartitions` on the file
    * scan) is the stock DPP path. The built-in rule can never fire here
    * on its own: it requires the JOIN key to be the partition column,
    * and this layout's selectivity lives in the DERIVED `bucket` dir
    * column, not in `k`.
    *
    * Guards: only when the dim side's plan-time size estimate is within
    * `autoBroadcastJoinThreshold` (the subquery re-executes the dim when
    * no broadcast exchange is reusable — `onlyInBroadcast = false` — so
    * it must be dimension-sized); only join types where pruning the
    * bucket side is semantics-preserving (the same sidedness rules as
    * Spark's `PartitionPruning.canPruneLeft/Right`); skipped when DPP is
    * globally disabled (the physical planner would strand the subquery)
    * or when the bucket side already carries a dynamic-pruning filter
    * (fixed-point idempotence). */
  private def tryInjectJoin(j: Join): Join = {
    if (!spark.sessionState.conf.dynamicPartitionPruningEnabled) return j
    val cond = j.condition.getOrElse(return j)
    def canPruneLeft(t: JoinType) = t match {
      case _: InnerLike | LeftSemi | RightOuter => true; case _ => false
    }
    def canPruneRight(t: JoinType) = t match {
      case _: InnerLike | LeftSemi | LeftOuter => true; case _ => false
    }
    val equi = splitConjunctivePredicates(cond).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
    }
    def trySide(prune: LogicalPlan, other: LogicalPlan): Option[LogicalPlan] = {
      val (rel, meta, bucketAttr) = bucketRelationIn(prune).getOrElse(return None)
      if (alreadyDynamicallyPruned(prune)) return None
      val dimKey = equi.collectFirst {
        case (a, b) if a.name == meta.key &&
          rel.outputSet.contains(a) && other.outputSet.contains(b) => b
        case (a, b) if b.name == meta.key &&
          rel.outputSet.contains(b) && other.outputSet.contains(a) => a
      }.getOrElse(return None)
      val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
      if (threshold <= 0 || other.stats.sizeInBytes > threshold) return None
      val buildKey = Cast(
        Pmod(new XxHash64(Seq(dimKey)), Literal(meta.numBuckets.toLong)),
        IntegerType)
      val pruning = DynamicPruningSubquery(
        pruningKey = bucketAttr,
        buildQuery = other,
        buildKeys = Seq(buildKey),
        broadcastKeyIndices = Seq(0),
        onlyInBroadcast = false)
      Some(prune.transformUp {
        case r: LogicalRelation if r.eq(rel) => Filter(pruning, r)
      })
    }
    if (canPruneLeft(j.joinType)) {
      trySide(j.left, j.right) match {
        case Some(newLeft) => return j.copy(left = newLeft)
        case None =>
      }
    }
    if (canPruneRight(j.joinType)) {
      trySide(j.right, j.left) match {
        case Some(newRight) => return j.copy(right = newRight)
        case None =>
      }
    }
    j
  }

  /** The unique keyed-bucket relation reachable through
    * projection/filter/alias nodes only — injecting a filter directly
    * above it is then equivalent to filtering the side's output. */
  private def bucketRelationIn(side: LogicalPlan)
      : Option[(LogicalRelation, KeyedBucketMeta.Meta, Attribute)] =
    side match {
      case rel: LogicalRelation =>
        val fsRel = rel.relation match {
          case h: HadoopFsRelation
            if h.partitionSchema.fieldNames.contains("bucket") => h
          case _ => return None
        }
        val bucketAttr = rel.output.collectFirst {
          case a: AttributeReference if a.name == "bucket" => a
        }.getOrElse(return None)
        val root = fsRel.location.rootPaths.headOption.getOrElse(return None)
        KeyedBucketMeta.read(spark.sparkContext.hadoopConfiguration, root)
          .map(meta => (rel, meta, bucketAttr))
      case Project(_, child) => bucketRelationIn(child)
      case Filter(_, child) => bucketRelationIn(child)
      case SubqueryAlias(_, child) => bucketRelationIn(child)
      case _ => None
    }

  private def alreadyDynamicallyPruned(side: LogicalPlan): Boolean =
    side.exists {
      case Filter(c, _) => c.exists(_.isInstanceOf[DynamicPruning])
      case _ => false
    }

  private def tryInject(cond: Expression,
      rel: LogicalRelation): Option[Expression] = {
    val fsRel = rel.relation match {
      case h: HadoopFsRelation
        if h.partitionSchema.fieldNames.contains("bucket") => h
      case _ => return None
    }
    val bucketAttr = rel.output.collectFirst {
      case a: AttributeReference if a.name == "bucket" => a
    }.getOrElse(return None)
    val root = fsRel.location.rootPaths.headOption.getOrElse(return None)
    val meta = KeyedBucketMeta.read(
      spark.sparkContext.hadoopConfiguration, root).getOrElse(return None)
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.exists(_.references.exists(_.name == "bucket")))
      return None // already constrained (or already injected)
    val keyLits: Option[Seq[Literal]] = conjuncts.collectFirst {
      case EqualTo(a: AttributeReference, l: Literal)
        if a.name == meta.key => Seq(l)
      case EqualTo(l: Literal, a: AttributeReference)
        if a.name == meta.key => Seq(l)
      case In(a: AttributeReference, ls)
        if a.name == meta.key && ls.forall(_.isInstanceOf[Literal]) =>
        ls.map(_.asInstanceOf[Literal])
      case InSet(a: AttributeReference, vs) if a.name == meta.key =>
        vs.toSeq.map(v => Literal.create(v, a.dataType))
    }
    keyLits.map(_.filter(_.value != null)).filter(_.nonEmpty).map { lits =>
      val buckets = lits.map(bucketOf(_, meta.numBuckets)).distinct
      In(bucketAttr, buckets.map(b => Literal(b)))
    }
  }

  /** Driver-side eval of the writer's own bucket function on a literal —
    * the SAME Catalyst expressions (`pmod(xxhash64(_))`, seed 42) the
    * Column API builds, so the mapping cannot drift from the write
    * path. */
  private def bucketOf(l: Literal, numBuckets: Int): Int =
    Pmod(new XxHash64(Seq(l)), Literal(numBuckets.toLong))
      .eval().asInstanceOf[Long].toInt
}

/** Sidecar metadata (`_graft_keyed_buckets.json` in the table root — the
  * leading underscore keeps it invisible to parquet file listing) that
  * makes a keyed-bucket table self-describing: key column + bucket
  * count. Reads memoize per root path, including absence — the optimizer
  * must not re-stat the filesystem on every plan. */
object KeyedBucketMeta {
  val SidecarName = "_graft_keyed_buckets.json"
  final case class Meta(key: String, numBuckets: Int)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Meta]]()

  private val Pattern =
    """\{\s*"key"\s*:\s*"([^"]+)"\s*,\s*"numBuckets"\s*:\s*(\d+)\s*\}""".r

  def write(conf: org.apache.hadoop.conf.Configuration, dir: String,
      key: String, numBuckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, SidecarName)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(
      s"""{"key": "$key", "numBuckets": $numBuckets}"""
        .getBytes("UTF-8"))
    finally out.close()
    cache.remove(new org.apache.hadoop.fs.Path(dir).toString)
    cache.remove(fs.makeQualified(new org.apache.hadoop.fs.Path(dir)).toString)
  }

  /** Memoizes only DEFINITIVE answers — sidecar present (Some) or
    * genuinely absent / unparseable (None). A transient IO failure
    * returns None for THIS plan but is NOT cached, so one filesystem
    * hiccup can't silently disable pruning for the JVM lifetime; it is
    * logged so the performance regression is visible, not silent. */
  def read(conf: org.apache.hadoop.conf.Configuration,
      root: org.apache.hadoop.fs.Path): Option[Meta] = {
    val key = root.toString
    val hit = cache.get(key)
    if (hit != null) return hit
    val resolved: Option[Option[Meta]] =
      try {
        val p = new org.apache.hadoop.fs.Path(root, SidecarName)
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) Some(None) // genuine absence: cacheable
        else {
          val in = fs.open(p)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          txt.trim match {
            case Pattern(k, n) => Some(Some(Meta(k, n.toInt)))
            case _ =>
              System.err.println(
                s"[graft] $SidecarName at $root unparseable — bucket " +
                  "pruning disabled for this table")
              Some(None) // malformed sidecar: definitive, cacheable
          }
        }
      } catch {
        // NonFatal only: OutOfMemoryError and friends must propagate, and
        // an interrupt must not be swallowed as a "transient IO failure"
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          System.err.println(
            s"[graft] $SidecarName read interrupted at $root — bucket " +
              "pruning skipped for this plan only")
          None // NOT cached
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[graft] transient $SidecarName read failure at $root " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}) — bucket " +
              "pruning skipped for this plan only, will retry")
          None // transient: NOT cached
      }
    resolved match {
      case Some(answer) =>
        val prev = cache.putIfAbsent(key, answer)
        if (prev != null) prev else answer
      case None => None
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(InjectBucketPruning)
}
