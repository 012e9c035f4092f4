package graft.streaming

/** Cagg-materialization reader epochs (SCALE.md §15/§18): registered by
  * [[ContinuousAggregate.readMatLive]] BEFORE the mat-catalog read,
  * consulted by the generation GC in `syncMatCatalog` — a live epoch
  * blocks deletion of every dir retired after it registered, past the
  * `matGraceMs` grace, until the planned scan is collected, the reader
  * crashes (stale mtime) or the 1 h cap. Orphan generations (retired kind
  * `o`, never catalog-live) are exempt: no catalog reader can have
  * planned them. See [[graft.sources.ReaderEpochs]] for the protocol and
  * [[graft.sources.ChunkReaderEpochs]] for the raw-hypertable twin.
  */
private[graft] object MatReaderEpochs
  extends graft.sources.ReaderEpochs("_mat_readers", "spark.graft.cagg.matEpoch")
