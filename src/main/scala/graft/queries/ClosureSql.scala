package graft.queries

/** DuckDB oracle SQL for connected components: UNROLLED FastSV-style
  * min-label propagation with a fixpoint guard — the round-19
  * replacement for the `WITH RECURSIVE reach(src, dst)` transitive
  * closure the dedup oracles used through round 18.
  *
  * Why: the all-pairs closure materializes every (src, dst) pair
  * inside each component — quadratic in component size — and DuckDB
  * iterates it to fixpoint, which put the sf0.1 oracle sweep past
  * 6 CPU-hours (BASELINE §Round 18) and starved the driver's
  * correctness artifact of its window. Label propagation keeps ONE
  * row per node per round; each of the `rounds` unrolled steps is a
  * handful of hash joins over (nodes + edges), so the whole chain is
  * O(rounds * (n + m)) — polynomial, never pair-quadratic.
  *
  * Exactness does NOT depend on the round count: the readback joins
  * round `rounds` against one extra guard round and calls DuckDB's
  * `error()` if ANY label still moved, so a too-shallow unroll is a
  * loud oracle failure, never a silently-wrong cluster id. At a
  * verified fixpoint the labels equal the old closure's
  * `LEAST(src, MIN(dst))` exactly: (1) labels are always ids of nodes
  * in the same component (induction over every term below); (2) the
  * neighbor-min term at fixpoint forces lbl(u) <= lbl(v) across every
  * edge — symmetric edges make that equality, so lbl is constant per
  * component; (3) the constant is a member id, hence >= the component
  * minimum m, and it equals lbl(m) <= lbl_0(m) <= m — so it IS m.
  *
  * Convergence speed comes from the FastSV-style terms (Zhang, Azad,
  * Buluc, "FastSV: a distributed-memory connected-component algorithm
  * with fast convergence", 2020 — public algorithm): shortcutting
  * (min with lbl(lbl(v))), aggressive hooking (edge endpoints take the
  * neighbor's grandparent label), and stochastic hooking (the current
  * label TARGET is updated too, so hub nodes broadcast new minima).
  * 16 rounds converge a 50,000-node path with adversarially shuffled
  * ids in ~0.9 s of DuckDB wall; the organic duplicate clusters here
  * (band-collision near-cliques, single-digit diameters) converge in
  * 3-4 rounds.
  */
private[queries] object ClosureSql {

  /** Default unroll depth — converges a 50,000-node shuffled-id path
    * (far beyond any organic duplicate cluster's diameter). The guard
    * makes a miss loud, so this is a perf knob, not a correctness one.
    */
  val Rounds = 16

  private def stepSql(edges: String, prev: String, name: String): String =
    s"""${name}_gp AS MATERIALIZED (
       |  SELECT p.node, q.lbl AS glbl
       |  FROM $prev p JOIN $prev q ON q.node = p.lbl),
       |$name AS MATERIALIZED (
       |  SELECT node, MIN(lbl) AS lbl FROM (
       |    SELECT node, glbl AS lbl FROM ${name}_gp
       |    UNION ALL
       |    SELECT e.src, p.lbl FROM $edges e JOIN $prev p ON p.node = e.dst
       |    UNION ALL
       |    SELECT e.src, g.glbl
       |    FROM $edges e JOIN ${name}_gp g ON g.node = e.dst
       |    UNION ALL
       |    SELECT pu.lbl, g.glbl FROM $edges e
       |      JOIN $prev pu ON pu.node = e.src
       |      JOIN ${name}_gp g ON g.node = e.dst)
       |  GROUP BY node)""".stripMargin

  /** The propagation CTE chain over a SYMMETRIC `edges` CTE of
    * (src, dst): seed + `rounds` unrolled steps + one guard step + the
    * `${pfx}_ok` convergence check. `edges` MUST be declared
    * MATERIALIZED at the call site — every round re-reads it, and an
    * inlined edge derivation would re-run `rounds` times. Compose with
    * [[componentsSql]] for the (node, component-min) readback.
    */
  def lpCtes(edges: String, pfx: String, rounds: Int = Rounds): String = {
    val seed =
      s"""${pfx}_0 AS MATERIALIZED (
         |  SELECT src AS node, LEAST(src, MIN(dst)) AS lbl
         |  FROM $edges GROUP BY src)""".stripMargin
    val steps = (1 to rounds)
      .map(i => stepSql(edges, s"${pfx}_${i - 1}", s"${pfx}_$i"))
    val guard = stepSql(edges, s"${pfx}_$rounds", s"${pfx}_g")
    val check =
      s"""${pfx}_ok AS (
         |  SELECT CASE WHEN COUNT(*) > 0 THEN error(
         |      '$pfx: label propagation did not converge in $rounds rounds')
         |    ELSE 'ok' END AS s
         |  FROM ${pfx}_$rounds a JOIN ${pfx}_g b
         |    ON a.node = b.node AND a.lbl <> b.lbl)""".stripMargin
    (seed +: steps :+ guard :+ check).mkString(",\n")
  }

  /** The converged (node, label) readback — one row per node that
    * appears in the edge set, label = component-minimum id (the old
    * closure's `LEAST(src, MIN(dst))`). The guard cross join (one row)
    * makes the WHOLE query error out if the unroll was too shallow.
    */
  def componentsSql(pfx: String, nodeAlias: String, labelAlias: String,
      rounds: Int = Rounds): String =
    s"""SELECT f.node AS $nodeAlias, f.lbl AS $labelAlias
       |  FROM ${pfx}_$rounds f CROSS JOIN ${pfx}_ok g WHERE g.s = 'ok'"""
      .stripMargin
}
