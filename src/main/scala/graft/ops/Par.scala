package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism restoration before row-EXPANSION operators (round-7; guide
  * §2 "partitioning should be scale-adaptive"): AQE rightly coalesces a
  * few-KB aggregate output to one post-shuffle partition, but a downstream
  * ×bands crossJoin or multi-match broadcast join then multiplies that one
  * partition's rows by 10³–10⁴ — and the whole expansion chain (candidate
  * generation, hamming filter, partial distinct) executes in ONE task.
  * Measured on the sf0.1 flagship before the fix: the uncapped LSH
  * candidate chain ran 87 s in a single task with 31 cores idle.
  *
  * `spread` hash-repartitions on a row key to the session's default
  * parallelism — scale-adaptive (local cores here, cluster cores in
  * production, never a constant), deterministic (hash of a real key: no
  * round-robin, no sort-before-repartition, no rand() retry hazards), and
  * pinned (an explicit numPartitions is not AQE-coalescible). The exchange
  * moves only the SMALL pre-expansion frame.
  */
object Par {
  /** Pin the frame's partitioning on the keys of the expansion join that
    * follows. Measured effect on the sf0.1 flagship (stage metrics, round
    * 7): the banded candidate self-join's inputs are a few hundred KB, AQE
    * coalesces their ENSURE_REQUIREMENTS exchanges to ONE partition, and
    * the join's 60M-row expansion + hamming filter + partial distinct all
    * execute in a single 30 s task with 31 cores idle. An explicit
    * `repartition(defaultParallelism, joinKeys…)` (a) already satisfies the
    * join's required distribution, so EnsureRequirements adds no further
    * exchange, (b) is REPARTITION_BY_NUM, which AQE must not re-coalesce,
    * and (c) lets same-keyed aggregations (bucket-population stats) reuse
    * the exchange outright (guide §2.4). The exchange itself moves only the
    * small pre-expansion frame.
    */
  def pinned(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, keys: _*)
}
