package graft.queries

/** Self-healing stage-once registry for side tables under
  * `/tmp/graft_oracle`.
  *
  * Several query families (NearDup signatures/bands, TpcH ps/late,
  * ScaleOps bucketed layout) materialize a side table once per
  * (JVM, SF dir) and reuse it — the production index-once/read-many
  * shape. Round 11's single red correctness row came from the failure
  * mode this object closes: a JVM-lifetime path cache trusted a staged
  * path whose files had vanished from /tmp between uses (external
  * cleaner or overwrite race), so a later reader — including the DuckDB
  * oracle, which replays some of these tables — died on "No files
  * found" while the cache said everything was fine.
  *
  * The rule: a cache hit is only a hit if the parquet files are still
  * on disk. Otherwise the writer runs again. Staging writers are
  * idempotent (mode("overwrite"), deterministic content), so a re-stage
  * is always safe — it costs one extra write, never wrong data.
  */
object Staging {
  private val staged = scala.collection.concurrent.TrieMap[String, String]()

  /** True iff `path` is a directory holding at least one non-empty
    * parquet part file — i.e. both Spark and DuckDB can read it. */
  def hasParquet(path: String): Boolean = {
    val files = new java.io.File(path).listFiles()
    files != null && files.exists(f => f.getName.endsWith(".parquet") && f.length() > 0)
  }

  /** Run `write(path)` once per (JVM, key) — unless the previously
    * staged files are gone, in which case stage again. Synchronized:
    * concurrent callers of the same key must not overwrite a directory
    * another thread is reading mid-stage. */
  def parquetOnce(key: String, path: String)(write: String => Unit): String =
    staged.synchronized {
      if (!staged.get(key).exists(hasParquet)) {
        write(path)
        staged.put(key, path)
      }
      staged(key)
    }

  /** Multi-artifact variant: one writer produces a GROUP of parquet
    * dirs that are only consistent together (e.g. a trained ANN index's
    * codebooks + codes + probes — retraining must replace all of them
    * or none). Healthy = this JVM staged the group AND every path still
    * has files; anything less re-runs the writer, which also lets the
    * caller re-populate any in-memory model object (codebooks) inside
    * the closure, keeping memory and disk in lockstep. */
  def parquetGroupOnce(key: String, paths: Seq[String])(write: () => Unit): Unit =
    staged.synchronized {
      if (!(staged.contains(key) && paths.forall(hasParquet))) {
        val t0 = System.nanoTime()
        write()
        System.err.println(f"[stage] $key staged in ${(System.nanoTime() - t0) / 1e9}%.2f s (one-time per JVM+dir; excluded from timed medians by design)")
        staged.put(key, paths.mkString(","))
      }
    }

  /** Visible for the self-healing spec: forget a key so the next
    * parquetOnce re-checks the disk. (Production code never needs this —
    * the disk check alone heals — but the spec uses it to also prove the
    * cold-cache path.) */
  private[graft] def invalidate(key: String): Unit = staged.remove(key)
}
