package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.internal.SQLConf

/** Size-guarded broadcast hints.
  *
  * An unconditional `broadcast()` is a latent scale bug: the hint
  * overrides the planner's own size check, so a caller who hands a large
  * frame to an operator that "knows" its input is small gets a driver OOM
  * or a broadcast timeout at 100× the tested scale. The guard consults
  * the optimizer's size ESTIMATE (plan statistics — file sizes ×
  * selectivity; no job is run) and only hints when the estimate fits;
  * otherwise the frame is returned unhinted and Catalyst plans a shuffle
  * join, which is the correct degradation.
  */
object Broadcasting {

  /** Default cap: 8× the session's autoBroadcastJoinThreshold (the hint
    * exists precisely for frames somewhat above the auto threshold that
    * the caller knows are safe), floored at 256 MiB for sessions that
    * disable auto-broadcast entirely (threshold -1).
    */
  private def defaultCap: Long = {
    val auto = SQLConf.get.autoBroadcastJoinThreshold
    math.max(auto * 8L, 256L * 1024 * 1024)
  }

  /** `broadcast(df)` when the optimizer estimates ≤ `maxBytes` (default:
    * see `defaultCap`), else `df` unchanged.
    */
  def broadcastIfSmall(df: DataFrame, maxBytes: Long = -1L): DataFrame = {
    val cap = if (maxBytes > 0) maxBytes else defaultCap
    val estimate = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estimate <= cap) broadcast(df) else df
  }
}
