package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Schema mapping operator: project/rename (map mode) and multi-step
 * equi-join plans (join mode).
 *
 * Reference semantics (reference: src/etl_core/components/data_operations/
 * schema_mapping/schema_mapping_component.py:35-311, mapping_rule.py:18-51,
 * join_rules.py:17-38, receivers/.../schema_mapping_receiver.py:38-415):
 *  - map mode: copy src_port:src_path → dst_port:dst_path for dotted leaf
 *    paths, possibly fanning out to several output ports;
 *  - join mode: a chain of equi-join steps {left_port, right_port, left_on,
 *    right_on, how} where a step's output_port can feed a later step;
 *    supported how: inner | left | right | outer.
 *
 * Spark-first re-expression: dotted source paths are native struct access
 * (`col("addr.city")`); nested destination paths are rebuilt with struct().
 * The reference buffers all join inputs in memory until end-of-stream
 * (schema_mapping_component.py:112-197) — here each step is a Catalyst join,
 * so the planner picks broadcast-hash for small sides and sort-merge
 * otherwise, and AQE re-plans skew at runtime. Nothing is buffered per-node
 * beyond the join's own hash/sort state.
 */
object SchemaMappingOp {

  /** One projection rule: source dotted path → destination dotted path. */
  final case class MapRule(srcPort: String, srcPath: String, dstPath: String)

  /** One join step in a plan. `broadcastSide` ("left"|"right") pins a
    * broadcast-hash plan for that side — the 100 TB lever when a
    * dimension side is known-small but sits above Catalyst's
    * autoBroadcastJoinThreshold (default 10 MB), where the planner
    * would otherwise shuffle BOTH sides into a sort-merge. The hint is
    * advisory Catalyst metadata: results are identical either way
    * (SchemaMappingAggSpec pins plan + parity), and a broadcast side that does
    * not fit driver/executor memory fails loudly rather than silently
    * degrading. */
  final case class JoinStep(
      leftPort: String, rightPort: String,
      leftOn: Seq[String], rightOn: Seq[String],
      how: String, outputPort: String,
      broadcastSide: Option[String] = None)

  /**
   * Map mode: for each destination port, select the mapped columns.
   * Destination dotted paths are rebuilt as nested structs.
   */
  def mapMode(inputs: Map[String, DataFrame],
              rulesByDest: Map[String, Seq[MapRule]]): Map[String, DataFrame] =
    rulesByDest.map { case (dstPort, rules) =>
      val srcPorts = rules.map(_.srcPort).distinct
      require(srcPorts.size == 1,
        s"map-mode port $dstPort draws from multiple source ports $srcPorts; " +
          "use a join step to combine ports first")
      val df = inputs.getOrElse(srcPorts.head,
        throw new IllegalArgumentException(s"unknown source port ${srcPorts.head}"))
      dstPort -> df.select(buildProjection(rules): _*)
    }

  /** Rebuild possibly-nested destination paths from flat rules. */
  private[ops] def buildProjection(rules: Seq[MapRule]): Seq[Column] = {
    sealed trait Tree
    final case class LeafT(src: String) extends Tree
    final case class NodeT(children: Seq[(String, Tree)]) extends Tree

    def insert(node: NodeT, path: List[String], src: String): NodeT = path match {
      case last :: Nil =>
        // appending without this check would emit two same-named columns
        // (the opposite insertion order already threw below)
        require(!node.children.exists(_._1 == last),
          s"destination path conflict at $last")
        NodeT(node.children :+ (last -> LeafT(src)))
      case head :: rest =>
        node.children.indexWhere(_._1 == head) match {
          case -1 => NodeT(node.children :+ (head -> insert(NodeT(Nil), rest, src)))
          case i =>
            val sub = node.children(i)._2 match {
              case n: NodeT => n
              case _ => throw new IllegalArgumentException(
                s"destination path conflict at $head")
            }
            NodeT(node.children.updated(i, head -> insert(sub, rest, src)))
        }
      case Nil => throw new IllegalArgumentException("empty destination path")
    }

    def toColumn(t: Tree, name: String): Column = t match {
      case LeafT(src) => col(src).as(name)
      case NodeT(children) =>
        struct(children.map { case (n, c) => toColumn(c, n) }: _*).as(name)
    }

    val root = rules.foldLeft(NodeT(Nil)) { (acc, r) =>
      insert(acc, r.dstPath.split('.').toList, r.srcPath)
    }
    root.children.map { case (n, t) => toColumn(t, n) }
  }

  /**
   * Join mode: fold the steps; each step's result is registered under its
   * output_port so later steps can reference it. Column name collisions are
   * resolved the pandas way (the reference uses pd.merge semantics): shared
   * join keys collapse when they are the same name; other duplicate names
   * are disambiguated by the caller's port schema projection.
   */
  def joinMode(inputs: Map[String, DataFrame], steps: Seq[JoinStep]): Map[String, DataFrame] = {
    // semi/anti are beyond the reference's four variants (SURVEY §2.4):
    // left-side filtering by key existence without duplicating matches —
    // Spark's LeftSemi/LeftAnti never materialize right columns, so the
    // shuffle carries keys only (or broadcasts the right side outright)
    val how = Map("inner" -> "inner", "left" -> "left", "right" -> "right",
      "outer" -> "full_outer", "semi" -> "left_semi", "anti" -> "left_anti")
    steps.foldLeft(inputs) { (env, step) =>
      val l = env.getOrElse(step.leftPort,
        throw new IllegalArgumentException(s"unknown join port ${step.leftPort}"))
      val r = env.getOrElse(step.rightPort,
        throw new IllegalArgumentException(s"unknown join port ${step.rightPort}"))
      require(step.leftOn.size == step.rightOn.size, "left_on/right_on arity mismatch")
      val h = how.getOrElse(step.how.toLowerCase,
        throw new IllegalArgumentException(s"unknown join how: ${step.how}"))
      require(step.broadcastSide.forall(Set("left", "right")),
        s"join step → ${step.outputPort}: broadcast must be left|right, " +
          s"got '${step.broadcastSide.get}'")
      // the hint goes ON TOP of any alias so it sits directly under the
      // Join node — EliminateResolvedHint attaches hints to the nearest
      // enclosing join, and burying one beneath a SubqueryAlias risks it
      // being generated-then-dropped
      def hintL(df: DataFrame): DataFrame =
        if (step.broadcastSide.contains("left")) broadcast(df) else df
      def hintR(df: DataFrame): DataFrame =
        if (step.broadcastSide.contains("right")) broadcast(df) else df
      val joined =
        if (step.leftOn == step.rightOn)
          hintL(l).join(hintR(r), step.leftOn, h)
        else {
          // alias both sides before building the condition: dataframe-
          // attribute references (l(lk) === r(rk)) break on self-joins or
          // chained steps where the right frame's lineage already occurs
          // inside the left (Spark's ambiguous-self-join detection), while
          // alias-qualified column references always resolve one side
          val la = hintL(l.alias("__jl"))
          val ra = hintR(r.alias("__jr"))
          val cond = step.leftOn.zip(step.rightOn)
            .map { case (lk, rk) => col(s"__jl.`$lk`") === col(s"__jr.`$rk`") }
            .reduce(_ && _)
          la.join(ra, cond, h)
        }
      env + (step.outputPort -> joined)
    }
  }
}
