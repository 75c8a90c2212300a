package graft.read

import org.apache.spark.sql.DataFrame

import graft.write.Mutations

/** Coprocessor hook surface — the graft analogue of `RegionObserver`
  * (hbase-server/.../coprocessor/RegionObserver.java: `preGetOp:345`,
  * `preScannerOpen:1268`, `postScannerNext:1320`, `prePut:405`,
  * `preBatchMutate:559`, `preFlush:128`, `preCompact:298`).
  *
  * The reference interposes imperative callbacks on the server read /
  * write paths; graft interposes *plan rewrites*: every hook is either
  * a `GScan → GScan` spec rewrite or a `DataFrame → DataFrame` plan
  * transform, applied when the pipeline is composed. Because hooks
  * return declarative plans, Catalyst keeps optimizing through them
  * (a `preScannerOpen` that narrows the range still pushes down to the
  * source scan) — observers cost nothing at runtime unless they add
  * real work. Chains apply in registration order, like the reference's
  * coprocessor priority chain.
  */
trait ReadObserver {
  /** Rewrite the scan spec before planning (preScannerOpen / preGetOp). */
  def preScannerOpen(scan: GScan): GScan = scan
  /** Transform the scanned result plan (postScannerNext). */
  def postScannerNext(result: DataFrame): DataFrame = result
}

trait WriteObserver {
  /** Transform the incoming mutation batch (prePut / preBatchMutate). */
  def preBatchMutate(batch: DataFrame): DataFrame = batch
  /** Transform the merged store after apply (postBatchMutate). */
  def postBatchMutate(cells: DataFrame): DataFrame = cells
  /** Transform the cell set at persistence points (preFlush — e.g.
    * drop expired cells before they are written back). */
  def preFlush(store: DataFrame): DataFrame = store
  /** Transform the compaction REWRITE stream (preCompact:298 — the
    * reference wraps the compaction's InternalScanner; graft's twin
    * transforms the resolved frame feeding the rewritten store, so a
    * hook sees exactly the cells that will survive into the new store
    * files). Threaded by `Jobs.majorCompact(…, observers)`. */
  def preCompact(store: DataFrame): DataFrame = store
}

/** Table façade with observer chains (the `coprocessorService`-adjacent
  * composition point; endpoint-style per-partition computation maps to
  * `mapPartitions` / custom `Aggregator`s per SURVEY §2.9). */
object ObservedTable {

  def scan(cells: DataFrame, s: GScan, observers: Seq[ReadObserver]): DataFrame = {
    val spec = observers.foldLeft(s)((acc, o) => o.preScannerOpen(acc))
    observers.foldLeft(GTable.scan(cells, spec))((df, o) => o.postScannerNext(df))
  }

  def get(cells: DataFrame, rowKey: String, observers: Seq[ReadObserver],
      s: GScan = GScan()): DataFrame =
    scan(cells, GTable.pointSpec(rowKey, s), observers)

  def applyMutations(cells: DataFrame, muts: DataFrame,
      observers: Seq[WriteObserver]): DataFrame = {
    val batch = observers.foldLeft(muts)((acc, o) => o.preBatchMutate(acc))
    val merged = Mutations.applyMutations(cells, batch)
    observers.foldLeft(merged)((df, o) => o.postBatchMutate(df))
  }

  def flush(store: DataFrame, observers: Seq[WriteObserver]): DataFrame =
    observers.foldLeft(store)((df, o) => o.preFlush(df))
}
