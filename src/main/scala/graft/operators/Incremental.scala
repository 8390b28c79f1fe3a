package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental corpus ingestion — the operation a 100 TB pipeline runs
  * DAILY: a new document batch arrives and must join the existing dedup
  * group structure and the existing ANN index WITHOUT recomputing either
  * from scratch. Two halves:
  *
  *  - [[ingestDupGroups]]: new docs band-probe the EXISTING band table
  *    (persisted at scale), pair only new-vs-corpus and new-vs-new, and
  *    merge components in LABEL space — the CC re-run is bounded by the
  *    components the batch actually touches, never the corpus.
  *  - [[appendToIndex]]: new vectors are encoded against FROZEN
  *    quantizers (coarse centroids + PQ codebooks trained once on the
  *    base corpus) and appended per-cell to the persisted IVF×PQ index.
  *    Production appends never retrain — retraining would invalidate
  *    every code already stored.
  *
  * Both are EXACT: incremental == from-scratch on the combined corpus,
  * and not just spec-asserted — the gated keys d09/e06 run the
  * incremental plan on the Spark side against a FROM-SCRATCH oracle in
  * DuckDB, so the equivalence is hash-checked at every gate run.
  */
object Incremental {

  /** Deterministic batch split for the gated keys: ids ≡ 0 (mod 5) are
    * "the new batch" (20%), the rest are the pre-existing corpus. */
  val IngestMod = 5

  /** Merge a new batch into an existing near-dup group labelling.
    *
    * Inputs are the artifacts a production pipeline PERSISTS between
    * batches: the labelling (id, lbl) with lbl = component-min id (d06
    * semantics), the corpus band table (doc_id, band, bsig)
    * ([[Dedup.minhashBands]] — at scale read back from parquet, never
    * recomputed), and the corpus shingle store for exact verification.
    *
    * Scale shape: band-probe join keyed (band, bsig) touches only
    * buckets the batch occupies; exact verify touches only candidate
    * rows; the component merge runs over LABELS incident to new edges —
    * a graph whose size is bounded by the batch's fan-out, not the
    * corpus. The only full-corpus pass is the final relabel join, a
    * broadcast-able map when batches are daily-sized.
    *
    * Exactness: old-old pairs are already encoded in `oldLabels`
    * (connectivity, which is all CC needs), band signatures are
    * per-document deterministic (so new-vs-all candidates equal the
    * from-scratch candidate set restricted to pairs touching the batch),
    * and min-label merge over component representatives yields the
    * component-global min because each old label is already its
    * component's min. Hence CC(old pairs ∪ new pairs) == from-scratch
    * CC on the combined corpus — the d09 oracle checks exactly this.
    *
    * PRECONDITION (id-disjointness): the merge graph mixes old-label
    * vertices and batch doc ids in one value space, so batch ids must
    * not collide with existing ids (old labels are component-min doc
    * ids, so disjoint doc-id spaces suffice). Every real ingest
    * satisfies this — doc ids are assigned once, corpus-wide — and the
    * gated mod-split does by construction (IncrementalSpec asserts it);
    * feeding a batch that REUSES existing doc ids silently mislabels
    * instead of erroring, so dedupe ids upstream first. */
  def ingestDupGroups(s: SparkSession, oldLabels: DataFrame,
                      oldBands: DataFrame, oldSh: DataFrame,
                      newIds: DataFrame, newSh: DataFrame,
                      threshold: Double = 0.5): DataFrame =
    relabeled(oldLabels, newIds,
      mergeGraph(s, oldLabels, oldBands, oldSh, newIds, newSh, threshold))

  /** Apply a merged touched-graph labelling to the full label table:
    * old components adopt their merged label (old labels are component
    * minima, so a bridge through a new doc correctly pulls both sides
    * down to the global min); untouched components and isolated new
    * docs keep their own. The relabel maps are bounded by the batch's
    * edge FAN-OUT ([[mergeGraph]]'s vertex set is edge-incident only)
    * and broadcast so the corpus-sized label table maps in place
    * instead of shuffling — SIZE-GUARDED ([[Skew.boundedBroadcast]]):
    * a ~100%-near-dup batch (the crawl case) makes fan-out ≈ batch,
    * and the guard lets the relabel degrade to a shuffle join instead
    * of a forced driver collect. */
  private def relabeled(oldLabels: DataFrame, newIds: DataFrame,
                        merged: DataFrame): DataFrame = {
    val relabelOld = Skew.boundedBroadcast(merged.toDF("lbl", "nl"))
    val oldFinal = oldLabels.join(relabelOld, Seq("lbl"), "left")
      .select(col("id"), coalesce(col("nl"), col("lbl")).as("lbl"))
    val relabelNew = Skew.boundedBroadcast(merged.toDF("id", "nl"))
    val newFinal = newIds.join(relabelNew, Seq("id"), "left")
      .select(col("id"), coalesce(col("nl"), col("id")).as("lbl"))
    oldFinal.unionByName(newFinal)
  }

  /** The LABEL DELTA of an ingest — what a production pipeline actually
    * persists per batch: the batch's labels plus the old rows whose
    * component label CHANGED (batch-fan-out-sized), never the untouched
    * corpus. Upserting it over the old labelling reproduces
    * [[ingestDupGroups]] row for row (IncrementalSpec asserts this), so
    * a daily batch writes O(batch fan-out) rows while the full-relabel
    * form re-emits — and re-shuffles for group sizes — the whole
    * corpus. The only corpus-sized work left is one map-side scan of
    * the label table against the broadcast relabel map. */
  def ingestDupGroupsDelta(s: SparkSession, oldLabels: DataFrame,
                           oldBands: DataFrame, oldSh: DataFrame,
                           newIds: DataFrame, newSh: DataFrame,
                           threshold: Double = 0.5): DataFrame = {
    val merged = mergeGraph(s, oldLabels, oldBands, oldSh, newIds, newSh, threshold)
    val changed = Skew.boundedBroadcast(merged.toDF("lbl", "nl")
      .filter(col("nl") =!= col("lbl")))
    val oldChanged = oldLabels.join(changed, Seq("lbl"))
      .select(col("id"), col("nl").as("lbl"))
    val relabelNew = Skew.boundedBroadcast(merged.toDF("id", "nl"))
    val newFinal = newIds.join(relabelNew, Seq("id"), "left")
      .select(col("id"), coalesce(col("nl"), col("id")).as("lbl"))
    oldChanged.unionByName(newFinal)
  }

  /** Candidate generation + verify + label-space CC shared by the full
    * and delta ingest forms: returns the merged labelling of the
    * touched graph (old labels + batch ids incident to new edges).
    * The vertex set is EDGE-INCIDENT only — an isolated batch doc is
    * its own singleton component and resolves via the
    * coalesce-to-own-id in the callers' relabel joins — so the CC, its
    * output, and the relabel broadcasts are all bounded by the batch's
    * verified-pair fan-out, not the batch (package-visible so
    * ScaleGuardSpec can assert that bound on the real frame). */
  private[graft] def mergeGraph(s: SparkSession, oldLabels: DataFrame,
                                oldBands: DataFrame, oldSh: DataFrame,
                                newIds: DataFrame, newSh: DataFrame,
                                threshold: Double = 0.5): DataFrame =
    mergeLabels(s, oldLabels, batchPairs(s, oldBands, oldSh, newSh, threshold))

  /** Candidate generation + exact verification of the pairs a batch
    * introduces (new-vs-corpus AND new-vs-new) — the pair half of
    * [[mergeGraph]], factored so the composed lifecycle can ALSO feed
    * the verified pairs forward into its persisted pair graph. */
  private[graft] def batchPairs(s: SparkSession, oldBands: DataFrame,
                                oldSh: DataFrame, newSh: DataFrame,
                                threshold: Double = 0.5): DataFrame = {
    val n = s.sessionState.conf.numShufflePartitions
    val newBands = Dedup.minhashBands(newSh)
    // New-vs-(corpus ∪ batch) candidates: the probe side is the batch
    // only; the build side is the full band table plus the batch's own
    // bands (new-new dups matter too). Explicit repartition pins the
    // pair-generation parallelism against AQE input-size coalescing,
    // exactly as in d03.
    val probe = newBands.toDF("id_a", "band", "bsig")
      .repartition(n, col("band"), col("bsig"))
    // Bucket pre-filter: a corpus band row can only pair with the batch
    // if its (band, bsig) bucket is one the batch occupies, so the
    // persisted band table is semi-joined down to the TOUCHED buckets
    // (batch-bands broadcast — daily-batch-small by assumption) before
    // anything shuffles. Provably candidate-preserving (a pair needs an
    // equal bucket on both sides), hash-checked by the d09 gate; at
    // corpus scale it is the difference between shuffling the whole
    // band table per batch and shuffling the batch's fan-out.
    val touched = newBands.select(col("band").as("band2"), col("bsig").as("bsig2"))
      .distinct()
    val build = oldBands.unionByName(newBands).toDF("id_b", "band2", "bsig2")
      .join(broadcast(touched), Seq("band2", "bsig2"), "leftsemi")
      .repartition(n, col("band2"), col("bsig2"))
    val cand = probe
      .join(build, col("band") === col("band2") && col("bsig") === col("bsig2") &&
        col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    Dedup.verifyJaccard(cand, oldSh.unionByName(newSh), threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** The label-space merge CC over a batch's verified pairs — the
    * labelling half of [[mergeGraph]]. `newPairs` is consumed once
    * (the edge lift, itself cut immediately); a caller that ALSO
    * carries the pairs forward (composed lifecycle state) must cut
    * them first or the verify pipeline re-runs per consumer. */
  private[graft] def mergeLabels(s: SparkSession, oldLabels: DataFrame,
                                 newPairs: DataFrame): DataFrame = {
    // Lift pair endpoints into LABEL space: an old endpoint stands for
    // its whole (already-connected) component, so the merge graph is
    // labels + new ids, with one edge per verified pair.
    val edges = newPairs
      .join(oldLabels.toDF("id_a", "la"), Seq("id_a"), "left")
      .join(oldLabels.toDF("id_b", "lb"), Seq("id_b"), "left")
      .select(coalesce(col("la"), col("id_a")).as("id_a"),
        coalesce(col("lb"), col("id_b")).as("id_b"))
      .transform(graft.Checkpoints.cut)
    // EDGE-INCIDENT vertices only: feeding all of newIds into the CC
    // made `merged` — and the relabel broadcasts built from it —
    // BATCH-sized; isolated batch docs need no CC row (the callers
    // coalesce a missing relabel hit to the doc's own id).
    val verts = edges.select(col("id_a").as("id"))
      .unionByName(edges.select(col("id_b").as("id")))
      .distinct()
    // The merge CC: fan-out-bounded by construction (touched labels +
    // edge-incident batch ids). Checkpointed so the two relabel maps
    // and the size-guard counts read materialized rows.
    Dedup.connectedComponents(verts, edges).transform(graft.Checkpoints.cut)
  }

  /** Append a batch of vectors to a persisted IVF×PQ index with FROZEN
    * quantizers. Pure per-vector encode of the batch (one cell
    * assignment + PqM code lookups per vector — embarrassingly parallel,
    * no training pass, no touch of existing index rows), then a
    * per-cell union: at scale this is an append of new files into the
    * index's cell partitions. Encoding is a per-vector map given frozen
    * params, so append(base-index, batch) == index(base ∪ batch) row
    * for row — IncrementalSpec asserts the frame equality and e06
    * hash-gates the query results over an appended index. */
  def appendToIndex(s: SparkSession, index: DataFrame, centroids: DataFrame,
                    codebooks: DataFrame, newE: DataFrame): DataFrame =
    index.unionByName(Similarity.e05IndexFrom(s, newE, centroids, codebooks))

  /** The base corpus's pre-existing dup-group state (labels, bands,
    * shingles), exactly as a production pipeline would have persisted it
    * after its last batch: pairs → CC labelling over base docs only.
    * Shared by the self-contained gated key (which rebuilds it in-query
    * so the oracle can check it) and the persisted-state path
    * ([[writeGroupState]]/[[mergeFromState]], which is what production
    * actually runs — and what IncBench prices). */
  def baseGroupState(s: SparkSession, d: String,
                     mod: Int = IngestMod): (DataFrame, DataFrame, DataFrame) = {
    // Lineage-cut the three state frames (round 19): they are the
    // in-query analog of writeGroupState's persisted artifacts, and the
    // downstream ingest consumes each several times (shingles twice in
    // the verify's sa/sb plus the batch verify, bands in both the base
    // self-join and the batch probe's build side, labels in the edge
    // lift and both relabel maps) — uncut, every reference re-ran the
    // corpus shingle pass.
    val baseSh = graft.Checkpoints.cut(
      Dedup.shingled(s, d).filter(!(pmod(col("doc_id"), lit(mod)) === 0)))
    val baseBands = graft.Checkpoints.cut(Dedup.minhashBands(baseSh))
    val basePairs = Dedup.verifyJaccard(
        Dedup.bandCandidates(s, baseBands), baseSh, 0.5)
      .select(col("id_a"), col("id_b"))
    val baseVerts = Tables.documents(s, d).select(col("doc_id").as("id"))
      .filter(!(pmod(col("id"), lit(mod)) === 0))
    (graft.Checkpoints.cut(Dedup.connectedComponents(baseVerts, basePairs)),
      baseBands, baseSh)
  }

  /** Ingest the batch into a given base state and resolve d06's group
    * schema over the combined corpus — the tail shared by the gated key
    * and the persisted-state path. */
  private def ingestAndResolve(s: SparkSession, d: String,
                               baseLabels: DataFrame, baseBands: DataFrame,
                               baseSh: DataFrame, mod: Int): DataFrame = {
    val isNew = pmod(col("doc_id"), lit(mod)) === 0
    // Cut (round 19): batchPairs references the batch shingles ~5x
    // (band table, touched buckets, build-side union, verify sa/sb).
    val newSh = graft.Checkpoints.cut(Dedup.shingled(s, d).filter(isNew))
    val newIds = Tables.documents(s, d).select(col("doc_id").as("id"))
      .filter(pmod(col("id"), lit(mod)) === 0)
    val labels =
      ingestDupGroups(s, baseLabels, baseBands, baseSh, newIds, newSh)
    val sizes = labels.groupBy(col("lbl").as("cid"))
      .agg(count(lit(1)).as("group_size"))
    labels.join(sizes, col("lbl") === col("cid"))
      .select(col("id").as("doc_id"), col("lbl").as("canonical_id"),
        col("group_size"), (col("id") === col("lbl")).as("is_keeper"))
  }

  /** d09: incremental dup-group ingestion as a gated key. The 20% batch
    * (doc_id ≡ 0 mod [[IngestMod]]) is ingested into the base corpus's
    * labelling via [[ingestDupGroups]]; output is d06's exact schema
    * over the COMBINED corpus. The oracle is from-scratch CC over the
    * combined pair graph (d06's recursive CTE verbatim), so the gate
    * hash-proves incremental == from-scratch on every run.
    *
    * NOTE ON THE BENCH NUMBER: this self-contained form REBUILDS the
    * base state in-query (the oracle needs one closed plan), so its
    * wall time is base-build + ingest — strictly more work than d06.
    * The number production cares about is the MARGINAL ingest cost from
    * persisted state: [[mergeFromState]], priced by [[IncBench]]. */
  def d09IncrementalGroups(s: SparkSession, d: String): DataFrame = {
    val (baseLabels, baseBands, baseSh) = baseGroupState(s, d)
    ingestAndResolve(s, d, baseLabels, baseBands, baseSh, IngestMod)
  }

  /** Persist the dup-group state a pipeline carries between batches.
    * Bands are written bucket-partitionable by (band); labels and
    * shingles by id range — at 100 TB these are the nightly artifacts,
    * and the ingest reads back only what the batch's bands touch. */
  def writeGroupState(s: SparkSession, d: String, dir: String,
                      mod: Int = IngestMod): Unit = {
    val (labels, bands, sh) = baseGroupState(s, d, mod)
    labels.write.mode("overwrite").parquet(s"$dir/labels")
    bands.write.mode("overwrite").parquet(s"$dir/bands")
    sh.write.mode("overwrite").parquet(s"$dir/shingles")
  }

  /** The production ingest: merge the batch into PERSISTED state. Work
    * is bounded by the batch's band fan-out + the final relabel — the
    * base pair-generation and base CC never re-run. */
  def mergeFromState(s: SparkSession, d: String, dir: String,
                     mod: Int = IngestMod): DataFrame =
    ingestAndResolve(s, d,
      s.read.parquet(s"$dir/labels"),
      s.read.parquet(s"$dir/bands"),
      s.read.parquet(s"$dir/shingles"), mod)

  /** [[ingestDupGroupsDelta]] over persisted state: the batch-bounded
    * label upsert a daily pipeline writes back. */
  def mergeDeltaFromState(s: SparkSession, d: String, dir: String,
                          mod: Int = IngestMod): DataFrame = {
    val isNew = pmod(col("doc_id"), lit(mod)) === 0
    val newSh = Dedup.shingled(s, d).filter(isNew)
    val newIds = Tables.documents(s, d).select(col("doc_id").as("id"))
      .filter(pmod(col("id"), lit(mod)) === 0)
    ingestDupGroupsDelta(s,
      s.read.parquet(s"$dir/labels"),
      s.read.parquet(s"$dir/bands"),
      s.read.parquet(s"$dir/shingles"), newIds, newSh)
  }

  /** Persist the ANN-index state a pipeline carries between batches:
    * frozen quantizers (centroids + PQ codebooks, trained on the base
    * corpus) and the base IVF×PQ index, cell-partitioned so query
    * probes prune partitions (IndexPersistSpec's deployment shape). */
  def writeIndexState(s: SparkSession, d: String, dir: String,
                      mod: Int = IngestMod): Unit = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val base = e.filter(!(pmod(col("vec_id"), lit(mod)) === 0))
    val centroids = Similarity.kmeansCentroids(s, base)
    val codebooks = Similarity.pqCodebooks(s, base)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
    Similarity.e05IndexFrom(s, base, centroids, codebooks)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/index")
  }

  /** The production append: encode the batch against PERSISTED frozen
    * quantizers, append to the persisted index, query the combined
    * index. No training pass, no touch of existing index rows — the
    * marginal cost a daily pipeline pays ([[IncBench]] prices this
    * against the self-contained e06). */
  def appendFromState(s: SparkSession, d: String, dir: String,
                      mod: Int = IngestMod,
                      shortlist: Int = Similarity.PqShortlist): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val batch = e.filter(pmod(col("vec_id"), lit(mod)) === 0)
    val centroids = s.read.parquet(s"$dir/centroids")
    val codebooks = s.read.parquet(s"$dir/codebooks")
    val index = s.read.parquet(s"$dir/index")
      .select(col("cell"), col("c_id"), col("recon"))
    val combined = appendToIndex(s, index, centroids, codebooks, batch)
    Similarity.e05FromIndex(s, e, centroids, combined, shortlist)
  }

  // ---------------------------------------------------------------
  // Deletion / takedown propagation — the REVERSE state lifecycle
  // operation (GDPR/takedown/opt-out): remove a doc set and propagate
  // through persisted structures without rebuilding them. The oracle
  // convention is d09's inverted: from-scratch on corpus-MINUS-deleted
  // must hash-equal the delete-propagated state.
  // ---------------------------------------------------------------

  /** Deterministic takedown slice for the gated delete keys
    * (d16/e14/e15): ids ≡ [[DeleteRes]] (mod [[DeleteMod]]) are "the
    * takedown list" (10% of the corpus). [[DeleteRes]] ≠ 0 keeps the
    * id % 100 == 0 query docs ALIVE — the semantic under test is
    * deleted docs vanishing from OTHER docs' results (and from group
    * structure), not queries vanishing wholesale. */
  val DeleteMod = 10
  val DeleteRes = 3

  /** Propagate a takedown list through a persisted dup-group labelling.
    *
    * Inputs are the artifacts a delete-capable pipeline persists: the
    * labelling (id, lbl) with lbl = component-min id (d06 semantics)
    * and the VERIFIED pair graph keyed by its component label
    * (id_a, id_b, lbl) — the structure that makes component SPLITS
    * recomputable without re-banding anything ([[Curation]] persists
    * the same frame for contamination-driven splits; deletes need no
    * bands or shingles at all, because removing vertices never CREATES
    * an edge).
    *
    * Work is bounded by what the takedown disturbs:
    *  - touched components = labels of deleted ids — takedown-sized;
    *  - untouched components pass through with ONE map-side anti-join
    *    against the broadcast touched-label set (a component with no
    *    deleted vertex loses no vertex and no edge, so its membership
    *    AND its min — its label — are unchanged);
    *  - touched components re-run CC on their label-filtered persisted
    *    subgraph minus edges incident to deleted vertices — a SPLIT
    *    falls out as multiple new components, and a dead keeper
    *    (deleted component-min) re-elects by each piece taking its own
    *    min (the new label). Vertices are edge-incident only; isolated
    *    survivors resolve to their own id via the coalesce (d09's
    *    merge-CC shape).
    *
    * Exactness: deleting vertices only ever REMOVES edges incident to
    * them, so components not containing a deleted vertex are identical
    * in the remaining graph, and each touched component's survivors
    * re-CC'd on the induced subgraph are exactly the from-scratch
    * components of the remaining corpus restricted to that component —
    * the d16 gate hash-checks this against from-scratch-on-remaining
    * every run. Broadcasts are size-guarded ([[Skew.boundedBroadcast]]):
    * a hostile takedown touching most components degrades to a shuffle
    * join, never a forced collect. */
  def deleteFromGroups(s: SparkSession, labels: DataFrame,
                       labeledPairs: DataFrame, deleted: DataFrame): DataFrame = {
    val delIds = deleted.select("id")
    // Touched labels feed three consumers and their lineage includes the
    // label-table join; cut once (the x08/r11 multiply-referenced rule).
    val touched = labels.join(delIds, "id").select("lbl").distinct()
      .transform(graft.Checkpoints.cut)
    val touchedB = Skew.boundedBroadcast(touched)
    val untouched = labels.join(touchedB, Seq("lbl"), "left_anti")
      .select("id", "lbl")
    val survivors = labels.join(touchedB, "lbl")
      .join(delIds, Seq("id"), "left_anti")
      .select("id")
    val subEdges = labeledPairs.join(touchedB, "lbl")
      .join(delIds.toDF("id_a"), Seq("id_a"), "left_anti")
      .join(delIds.toDF("id_b"), Seq("id_b"), "left_anti")
      .select("id_a", "id_b")
      .transform(graft.Checkpoints.cut)
    val verts = subEdges.select(col("id_a").as("id"))
      .unionByName(subEdges.select(col("id_b").as("id")))
      .distinct()
    val cc = Dedup.connectedComponents(verts, subEdges).toDF("id", "nl")
      .transform(graft.Checkpoints.cut)
    val touchedFinal = survivors.join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("nl"), col("id")).as("lbl"))
    untouched.unionByName(touchedFinal)
  }

  /** Propagate a takedown through (labels, component-labeled pairs) and
    * return BOTH updated frames — the state a MULTI-BATCH delete stream
    * carries forward (d16's one-shot form returns labels only; a second
    * delete needs the surviving pair graph re-keyed by its new
    * component labels). The pair-graph update is takedown-bounded:
    * untouched components' pairs pass through labels-and-all with ONE
    * anti-join against the broadcast touched-label set; only touched
    * components' surviving pairs re-label against the new labelling.
    * Applying the same takedown twice is a NO-OP (already-deleted ids
    * hit no label row, so `touched` is empty) — the idempotence the
    * CDC drain's at-least-once restart semantics rest on
    * (StreamTakedownSpec asserts it). */
  def deleteGroupStateStep(s: SparkSession, labels: DataFrame,
                           labeledPairs: DataFrame,
                           deleted: DataFrame): (DataFrame, DataFrame) = {
    val del = deleted.select("id")
    val newLabels = deleteFromGroups(s, labels, labeledPairs, del)
      .transform(graft.Checkpoints.cut)
    val touchedB = Skew.boundedBroadcast(
      labels.join(del, "id").select("lbl").distinct())
    val untouched = labeledPairs.join(touchedB, Seq("lbl"), "left_anti")
    val survivors = labeledPairs.join(touchedB, Seq("lbl"), "left_semi")
      .join(del.toDF("id_a"), Seq("id_a"), "left_anti")
      .join(del.toDF("id_b"), Seq("id_b"), "left_anti")
      .drop("lbl")
      .join(newLabels.toDF("id_a", "lbl"), "id_a")
    (newLabels, untouched.unionByName(survivors))
  }

  /** Resolve a labelling into d06's group schema (sizes + min-id
    * keeper) — the shared tail of d06/d09/d16. */
  private[graft] def resolveGroups(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("lbl").as("cid"))
      .agg(count(lit(1)).as("group_size"))
    labels.join(sizes, col("lbl") === col("cid"))
      .select(col("id").as("doc_id"), col("lbl").as("canonical_id"),
        col("group_size"), (col("id") === col("lbl")).as("is_keeper"))
  }

  /** Full-corpus labelling + component-labeled pair graph — the state
    * a DELETE propagates through (deletes run against the CURRENT
    * corpus, so unlike [[baseGroupState]] there is no batch holdout). */
  private def fullGroupState(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // Cut the shingles BEFORE pair generation (round 19): the verify
    // reads them twice (sa/sb) and the band aggregate once — uncut,
    // the pairs' one materialization ran the corpus shingle pass three
    // times.
    val sh = graft.Checkpoints.cut(Dedup.shingled(s, d))
    val pairs = Dedup.minhashLshPairs(s, sh)
      .select(col("id_a"), col("id_b"))
      .transform(graft.Checkpoints.cut)
    val verts = Tables.documents(s, d).select(col("doc_id").as("id"))
    val labels = Dedup.connectedComponents(verts, pairs)
      .transform(graft.Checkpoints.cut)
    (labels, pairs.join(labels.toDF("id_a", "lbl"), "id_a"))
  }

  /** d16: takedown propagation through dup groups as a gated key. The
    * 10% takedown slice (doc_id ≡ [[DeleteRes]] mod [[DeleteMod]]) is
    * deleted from the full corpus's persisted labelling via
    * [[deleteFromGroups]]; output is d06's exact schema over the
    * REMAINING corpus. The oracle is from-scratch CC on
    * corpus-minus-deleted (d06's recursive CTE with the takedown
    * filter), so keeper re-election and component splits are
    * hash-proved, not spec-claimed. State frames are checkpointed
    * (x09's in-query-rebuild discipline: production state is
    * parquet-opaque, and a transparent rebuild re-runs the base
    * pipeline per reference).
    *
    * NOTE ON THE BENCH NUMBER: the self-contained form pays
    * base-build + delete; the production marginal from persisted state
    * is [[deleteGroupsFromState]], priced by [[graft.IncBench]]
    * `--deletes`. */
  def d16DeleteGroups(s: SparkSession, d: String): DataFrame = {
    val (labels, labeledPairs) = fullGroupState(s, d)
    val deleted = Tables.documents(s, d)
      .filter(col("doc_id") % DeleteMod === DeleteRes)
      .select(col("doc_id").as("id"))
    resolveGroups(deleteFromGroups(s, labels, labeledPairs, deleted))
  }

  /** Persist the delete-capable group state: labelling + labeled pair
    * graph over the FULL corpus (the nightly artifact a takedown
    * pipeline reads; bands/shingles are NOT needed — deletes never
    * create edges). */
  def writeDeleteGroupState(s: SparkSession, d: String, dir: String): Unit = {
    val (labels, labeledPairs) = fullGroupState(s, d)
    labels.write.mode("overwrite").parquet(s"$dir/labels")
    labeledPairs.write.mode("overwrite").parquet(s"$dir/pairs")
  }

  /** The production delete: propagate a takedown list through PERSISTED
    * group state — touched-component re-CC only, one map-side pass over
    * the label table. Frame-equal to the in-query d16 (TakedownSpec). */
  def deleteGroupsFromState(s: SparkSession, dir: String,
                            deleted: DataFrame): DataFrame =
    resolveGroups(deleteFromGroups(s,
      s.read.parquet(s"$dir/labels"),
      s.read.parquet(s"$dir/pairs"), deleted))

  /** e15: takedown propagation through the IVF×PQ index as a gated key.
    * Quantizers stay FROZEN (trained on the pre-delete corpus — the
    * e06 posture in reverse: retraining on delete would invalidate
    * every stored code), deleted vectors leave the index, and queries
    * run over the remaining corpus. Because encoding is a per-vector
    * map under frozen quantizers, filter-after-encode == encode-only-
    * remaining — so the oracle mirrors full-corpus training with
    * index/query CTEs restricted to live ids, and the gate hash-proves
    * the delete leaves exactly the index of the remaining corpus. */
  def e15IndexDelete(s: SparkSession, d: String,
                     shortlist: Int = Similarity.PqShortlist): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = Similarity.corpusCentroids(s, d)
    val index = Similarity
      .e05IndexFrom(s, e, centroids, Similarity.corpusCodebooks(s, d))
      .filter(col("c_id") % DeleteMod =!= DeleteRes)
    Similarity.e05FromIndex(s,
      e.filter(col("vec_id") % DeleteMod =!= DeleteRes),
      centroids, index, shortlist)
  }

  /** Persist the FULL-corpus index state a DELETE runs against (e06's
    * [[writeIndexState]] holds out a batch for the append gate; deletes
    * start from the complete current index). Quantizers are the
    * memoized full-corpus ones — the same frozen params e05 queries
    * with. */
  def writeFullIndexState(s: SparkSession, d: String, dir: String): Unit = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    writeIndexStateOf(s, e, Similarity.corpusCentroids(s, d),
      Similarity.corpusCodebooks(s, d), dir)
  }

  /** Persist an index state from explicit quantizers + a base vector
    * frame — the shared write tail of [[writeFullIndexState]] and the
    * composed-lifecycle spec's base publish. */
  def writeIndexStateOf(s: SparkSession, base: DataFrame, centroids: DataFrame,
                        codebooks: DataFrame, dir: String): Unit = {
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
    Similarity.e05IndexFrom(s, base, centroids, codebooks)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/index")
  }

  /** e17: the composed lifecycle gate for the DENSE index — d17/e16's
    * slice history through the IVF×PQ state: quantizers train on the
    * 60% base corpus and stay FROZEN through all three operations
    * (e06's append posture AND e15's delete posture at once — frozen
    * params are what make the history composable: encoding is a
    * per-vector map, so the re-ingested batch₂ vectors encode to
    * exactly the rows the delete removed plus nothing stale). The
    * oracle mirrors base-only training with index/query CTEs on the
    * composed survivor set; hash equality proves three chained index
    * mutations leave exactly the index of the survivors. Persisted
    * form: appendToIndexState × 2 + deleteFromIndexState (touched-cell
    * rewrite) + compaction, frame-equal to this in-query plan
    * (ComposedIndexSpec). */
  def e17IndexLifecycle(s: SparkSession, d: String,
                        shortlist: Int = Similarity.PqShortlist): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val b1 = pmod(col("vec_id"), lit(IngestMod)) === 0
    val b2n = pmod(col("vec_id"), lit(IngestMod)) === ComposedBatch2Res
    val delP = col("vec_id") % DeleteMod === DeleteRes
    val base = e.filter(!b1 && !b2n)
    val centroids = Similarity.kmeansCentroids(s, base)
    val codebooks = Similarity.pqCodebooks(s, base)
    val idx1 = appendToIndex(s,
      Similarity.e05IndexFrom(s, base, centroids, codebooks),
      centroids, codebooks, e.filter(b1))
    val idx2 = idx1.filter(!(col("c_id") % DeleteMod === DeleteRes))
    val batch2 = e.filter(b2n ||
      (delP && col("vec_id") % ComposedReingestMod === 0))
    val idx3 = appendToIndex(s, idx2, centroids, codebooks, batch2)
    Similarity.e05FromIndex(s, e.filter(composedSurvivor(col("vec_id"))),
      centroids, idx3, shortlist)
  }

  /** d17/e16/e17's survivor predicate (deleted ∧ not-re-ingested is
    * the only absent slice). */
  private[graft] def composedSurvivor(c: Column): Column =
    !(c % DeleteMod === DeleteRes && c % ComposedReingestMod =!= 0)

  /** Query the persisted index AFTER a [[deleteFromIndexState]]: reads
    * the surgically-rewritten cells plus frozen quantizers — the
    * production read path of a takedown; frame-equal to the in-query
    * e15 when the same slice is deleted (TakedownSpec). `live` filters
    * the query side (deleted docs no longer query). */
  def queryDeletedIndexState(s: SparkSession, d: String, dir: String,
                             live: Column => Column,
                             shortlist: Int = Similarity.PqShortlist): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = s.read.parquet(s"$dir/centroids")
    val index = s.read.parquet(s"$dir/index")
      .select(col("cell"), col("c_id"), col("recon"))
    Similarity.e05FromIndex(s, e.filter(live(col("vec_id"))), centroids,
      index, shortlist)
  }

  /** Delete vectors from a PERSISTED cell-partitioned IVF×PQ index,
    * rewriting ONLY the touched cell partitions (the
    * `partitionBy(cell)` layout makes takedown surgical: untouched
    * cells' files are never read or written). Returns the touched cell
    * ids. The kept rows are materialized (lineage cut) BEFORE the
    * overwrite — Spark cannot safely overwrite a path it is still
    * lazily reading. */
  def deleteFromIndexState(s: SparkSession, dir: String,
                           deletedIds: DataFrame): Seq[Int] = {
    val index = s.read.parquet(s"$dir/index")
    val del = deletedIds.toDF("c_id")
    val touched = index.join(del, "c_id").select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq // bounded by KmeansCells (16)
    if (touched.nonEmpty) {
      val kept = index.filter(col("cell").isin(touched: _*))
        .join(del, Seq("c_id"), "left_anti")
        .transform(graft.Checkpoints.cut)
      touched.foreach { c =>
        kept.filter(col("cell") === c).drop("cell")
          .write.mode("overwrite").parquet(s"$dir/index/cell=$c")
      }
    }
    touched
  }

  /** The production PERSISTED index append: encode a vector batch
    * against the frozen on-disk quantizers and land NEW FILES in the
    * cell partitions (mode append — existing index files are never
    * read or rewritten; encoding is a per-vector map). Repeated cycles
    * of this and [[deleteFromIndexState]] fragment the cell partitions
    * into small files — the storage debt [[compactIndexState]] pays
    * down. */
  def appendToIndexState(s: SparkSession, dir: String,
                         batch: DataFrame): Unit =
    Similarity.e05IndexFrom(s, batch,
        s.read.parquet(s"$dir/centroids"), s.read.parquet(s"$dir/codebooks"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/index")

  /** COMPACTION of a persisted cell-partitioned IVF×PQ index: per
    * cell, bin-pack the accumulated part files to
    * ~[[Retrieval.CompactTargetBytes]] (coalesce — no shuffle, and the
    * cell partitioning is preserved because each cell rewrites in
    * place). Rows are unchanged (deletes already rewrote their cells;
    * index compaction is purely a small-file fold), frame equality is
    * the CompactionSpec gate, and kept rows are lineage-cut before
    * each overwrite. The per-cell loop is driver-side over ≤
    * [[Similarity.KmeansCells]] cells — bounded by construction.
    * Returns cell → (files before, files after). */
  def compactIndexState(s: SparkSession, dir: String,
                        targetBytes: Long = Retrieval.CompactTargetBytes)
      : Map[Int, (Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/index")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    val cells = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map(_.getPath.getName.stripPrefix("cell=").toInt).sorted
    cells.map { c =>
      val cellPath = s"$dir/index/cell=$c"
      val before = Retrieval.partFileCount(s, cellPath)
      val rows = graft.Checkpoints.cut(s.read.parquet(cellPath))
      val n = Retrieval.packFileCount(s,
        Retrieval.dirBytes(s, cellPath), targetBytes)
      rows.coalesce(n).write.mode("overwrite").parquet(cellPath)
      c -> (before, Retrieval.partFileCount(s, cellPath))
    }.toMap
  }

  /** e06: incremental ANN-index append as a gated key. Quantizers are
    * trained on the BASE corpus only (vec_id ≢ 0 mod [[IngestMod]]) and
    * frozen; the base index is built, the 20% batch is appended via
    * [[appendToIndex]], and e05's query half runs over the combined
    * index. The oracle mirrors base-only training + full-corpus encode
    * in SQL, so "append with frozen quantizers equals indexing the
    * combined corpus" is hash-checked, not assumed. */
  def e06IndexAppend(s: SparkSession, d: String,
                     shortlist: Int = Similarity.PqShortlist): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val isNew = pmod(col("vec_id"), lit(IngestMod)) === 0
    val base = e.filter(!isNew)
    val batch = e.filter(isNew)
    val centroids = Similarity.kmeansCentroids(s, base)
    val codebooks = Similarity.pqCodebooks(s, base)
    val baseIndex = Similarity.e05IndexFrom(s, base, centroids, codebooks)
    val index = appendToIndex(s, baseIndex, centroids, codebooks, batch)
    Similarity.e05FromIndex(s, e, centroids, index, shortlist)
  }

  // ---------------------------------------------------------------
  // Composed lifecycle — append → delete → append through ONE state
  // (d17). The per-direction gates (d09 append, d16 delete) each prove
  // one operation against a from-scratch mirror; real state is never
  // one operation old, and the danger class is the INTERACTION: a
  // deleted doc re-ingested by a later batch, a component split by a
  // delete then re-bridged by an append, a keeper killed by a delete
  // whose replacement a later batch changes again. The composed gate
  // runs the SAME per-step operators production runs, and its oracle
  // is the from-scratch mirror on the composed survivor set — so the
  // hash gate proves the steps COMPOSE, not just that each works.
  // ---------------------------------------------------------------

  /** The dup-group state a lifecycle-capable pipeline PERSISTS between
    * operations: the labelling (id, lbl), the verified pair graph
    * (id_a, id_b), and the band/shingle stores appends probe. A
    * delete-only pipeline needs just labels + pairs (d16 — deletes
    * never create edges); carrying bands + shingles is what makes the
    * NEXT append possible without re-banding the corpus. */
  final case class GroupLifecycleState(labels: DataFrame, pairs: DataFrame,
                                       bands: DataFrame, shingles: DataFrame)

  /** Build lifecycle state from scratch over any (doc_id, text) corpus
    * frame — the once-per-corpus bootstrap (and the spec fixtures'
    * entry). */
  def groupLifecycleOf(s: SparkSession, docs: DataFrame): GroupLifecycleState = {
    // All four state frames cut (round 19) — the in-query analog of
    // writeGroupLifecycle's persisted artifacts. Uncut, the carried
    // shingles/bands re-ran the corpus shingle pass per downstream
    // reference (the next append's verify alone reads shingles twice),
    // and the band table was built TWICE (once inside minhashLshPairs,
    // once for the carried frame).
    val sh = graft.Checkpoints.cut(Dedup.shingledDocs(s, docs))
    val bands = graft.Checkpoints.cut(Dedup.minhashBands(sh))
    val pairs = graft.Checkpoints.cut(
      Dedup.verifyJaccard(Dedup.bandCandidates(s, bands), sh, 0.5)
        .select(col("id_a"), col("id_b")))
    val verts = docs.select(col("doc_id").as("id"))
    GroupLifecycleState(
      Dedup.connectedComponents(verts, pairs).transform(graft.Checkpoints.cut),
      pairs, bands, sh)
  }

  /** Append a batch to lifecycle state: [[ingestDupGroups]]'s merge for
    * the labelling, plus the state-forward halves a one-shot ingest
    * doesn't need — the new verified pairs join the persisted pair
    * graph, the batch's bands/shingles join the stores. Work is the
    * d09 ingest's (band-probe bounded) plus an APPEND of
    * batch-fan-out-sized pair rows and batch-sized band/shingle rows.
    * Re-ingesting a previously DELETED id is legal — it is absent from
    * every state frame, so the id-disjointness precondition holds and
    * its NEW text alone determines its new edges (the old rows left
    * state at delete time); re-ingesting a LIVE id remains the
    * upstream bug [[ingestDupGroups]] documents. */
  def appendGroupLifecycle(s: SparkSession, st: GroupLifecycleState,
                           newIds: DataFrame, newSh: DataFrame,
                           threshold: Double = 0.5): GroupLifecycleState = {
    // Cut: consumed twice (the merge-CC's edge lift AND the pair graph
    // carried forward) — without it the candidate+verify pipeline
    // re-runs per consumer.
    val newPairs = batchPairs(s, st.bands, st.shingles, newSh, threshold)
      .transform(graft.Checkpoints.cut)
    val merged = mergeLabels(s, st.labels, newPairs)
    GroupLifecycleState(
      relabeled(st.labels, newIds, merged),
      st.pairs.unionByName(newPairs),
      st.bands.unionByName(Dedup.minhashBands(newSh)),
      st.shingles.unionByName(newSh))
  }

  /** Delete a takedown list from lifecycle state: [[deleteFromGroups]]
    * for the labelling (touched-component re-CC only); pairs, bands
    * and shingles drop the deleted ids' per-doc rows by anti-join —
    * removing vertices never creates an edge, and a deleted doc must
    * stop band-matching FUTURE batches too (the half d16's
    * labels-and-pairs-only state never needed). */
  def deleteGroupLifecycle(s: SparkSession, st: GroupLifecycleState,
                           deleted: DataFrame): GroupLifecycleState = {
    val del = deleted.select("id")
    val labeledPairs = st.pairs.join(st.labels.toDF("id_a", "lbl"), "id_a")
    GroupLifecycleState(
      deleteFromGroups(s, st.labels, labeledPairs, del),
      st.pairs.join(del.toDF("id_a"), Seq("id_a"), "left_anti")
        .join(del.toDF("id_b"), Seq("id_b"), "left_anti"),
      st.bands.join(del.toDF("doc_id"), Seq("doc_id"), "left_anti"),
      st.shingles.join(del.toDF("doc_id"), Seq("doc_id"), "left_anti"))
  }

  /** Composed-lifecycle slice grammar (d17/e16): batch₁ is the d09
    * residue (id % [[IngestMod]] == 0), batch₂'s NEW docs are
    * id % [[IngestMod]] == [[ComposedBatch2Res]] (held out of the base
    * corpus), the takedown is the d16 slice (id % [[DeleteMod]] ==
    * [[DeleteRes]] — entirely inside the base corpus, since
    * 3 mod 5 ∉ {0, 1}), and batch₂ additionally RE-INGESTS the deleted
    * ids with id % [[ComposedReingestMod]] == 0. The composed survivor
    * set is therefore everything except the deleted-and-not-re-ingested
    * slice: NOT (id % 10 == 3 AND id % 3 != 0) — one predicate the
    * from-scratch oracle mirrors. */
  val ComposedBatch2Res = 1
  val ComposedReingestMod = 3

  /** d17: the composed state-lifecycle gate. Base state is built over
    * the 60% base corpus, then THREE production operations run through
    * one carried state — append(batch₁), delete(takedown slice),
    * append(batch₂ where batch₂ re-ingests a third of the deleted
    * ids) — and the final labelling resolves to d06's group schema.
    * The oracle is d06's from-scratch recursive CTE on the composed
    * survivor set, so the gate hash-proves the operations COMPOSE:
    * stale bands of deleted docs would re-pair them, a stale pair
    * graph would resurrect deleted edges under re-CC, and a relabel
    * bug in either append would mislabel the re-bridged components —
    * each diverges from the mirror.
    *
    * State frames are lineage-cut between steps (x09's in-query
    * rebuild discipline: production state is parquet-opaque, and a
    * transparent rebuild both re-runs the base pipeline per reference
    * and leaks foldable literals into join keys). The production
    * marginal per step from PERSISTED state is priced by
    * [[graft.IncBench]] `--composed`. */
  def d17LifecycleGroups(s: SparkSession, d: String): DataFrame =
    resolveGroups(composedLifecycleLabels(s, d))

  /** The composed append→delete→append labelling over the gate corpus —
    * shared by the gated key and the persisted-path equality spec. */
  private[graft] def composedLifecycleLabels(s: SparkSession, d: String): DataFrame = {
    val (base, (ids1, sh1), delIds, (ids2, sh2)) = composedSliceInputs(s, d)
    def cutState(st: GroupLifecycleState): GroupLifecycleState =
      GroupLifecycleState(graft.Checkpoints.cut(st.labels), st.pairs,
        st.bands, st.shingles)
    val st0 = groupLifecycleOf(s, base)
    val st1 = cutState(appendGroupLifecycle(s, st0, ids1, sh1))
    val st2 = cutState(deleteGroupLifecycle(s, st1, delIds))
    appendGroupLifecycle(s, st2, ids2, sh2).labels
  }

  /** The composed grammar's DOCUMENT slices — (base corpus, batch₁,
    * deleted doc_ids, batch₂) — shared by d17 (groups) and e16
    * (postings): ONE slice definition, so the two composed gates
    * exercise the same lifecycle history. */
  private[graft] def composedDocSlices(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val batch1 = (c: Column) => pmod(c, lit(IngestMod)) === 0
    val batch2New = (c: Column) => pmod(c, lit(IngestMod)) === ComposedBatch2Res
    val deletedP = (c: Column) => c % DeleteMod === DeleteRes
    val batch2 = (c: Column) =>
      batch2New(c) || (deletedP(c) && c % ComposedReingestMod === 0)
    (docs.filter(!batch1(col("doc_id")) && !batch2New(col("doc_id"))),
      docs.filter(batch1(col("doc_id"))),
      docs.filter(deletedP(col("doc_id"))).select("doc_id"),
      docs.filter(batch2(col("doc_id"))))
  }

  /** The composed gate's step inputs in GROUP-state form: (base docs,
    * (batch₁ ids, batch₁ shingles), delete ids, (batch₂ ids, batch₂
    * shingles)) — one definition shared by the in-query key, the
    * persisted-path runner, and IncBench. */
  private[graft] def composedSliceInputs(s: SparkSession, d: String)
      : (DataFrame, (DataFrame, DataFrame), DataFrame, (DataFrame, DataFrame)) = {
    val (base, batch1, delIds, batch2) = composedDocSlices(s, d)
    def ids(docs: DataFrame) = docs.select(col("doc_id").as("id"))
    // Batch shingles cut (round 19): each append references its batch's
    // shingle frame ~5x (band table, touched buckets, build-side union,
    // verify sa/sb, state carry) — uncut, the batch shingle pass re-ran
    // per reference.
    (base,
      (ids(batch1), graft.Checkpoints.cut(Dedup.shingledDocs(s, batch1))),
      ids(delIds),
      (ids(batch2), graft.Checkpoints.cut(Dedup.shingledDocs(s, batch2))))
  }

  /** Run the composed gate's three operations through PERSISTED state —
    * the production shape (each step reads version k from parquet and
    * publishes version k+1; never an overwrite of a path a lazy plan
    * still reads). Returns the four version dirs (base, after-append₁,
    * after-delete, after-append₂); the persisted-path == in-query
    * equality is spec-asserted (ComposedLifecycleSpec) and the per-step
    * marginals are priced by [[graft.IncBench]] `--composed`. */
  def runComposedLifecyclePersisted(s: SparkSession, d: String,
                                    root: String): Seq[String] = {
    val (base, (ids1, sh1), delIds, (ids2, sh2)) = composedSliceInputs(s, d)
    val dirs = (0 to 3).map(k => s"$root/v$k")
    writeGroupLifecycle(groupLifecycleOf(s, base), dirs(0))
    writeGroupLifecycle(
      appendGroupLifecycle(s, readGroupLifecycle(s, dirs(0)), ids1, sh1), dirs(1))
    writeGroupLifecycle(
      deleteGroupLifecycle(s, readGroupLifecycle(s, dirs(1)), delIds), dirs(2))
    writeGroupLifecycle(
      appendGroupLifecycle(s, readGroupLifecycle(s, dirs(2)), ids2, sh2), dirs(3))
    dirs
  }

  /** Persist lifecycle state (the four nightly artifacts). Each
    * operation writes a NEW version directory — atomic publish, and
    * never an overwrite of a path a lazy plan is still reading. */
  def writeGroupLifecycle(st: GroupLifecycleState, dir: String): Unit = {
    st.labels.write.mode("overwrite").parquet(s"$dir/labels")
    st.pairs.write.mode("overwrite").parquet(s"$dir/pairs")
    st.bands.write.mode("overwrite").parquet(s"$dir/bands")
    st.shingles.write.mode("overwrite").parquet(s"$dir/shingles")
  }

  /** Read persisted lifecycle state back. */
  def readGroupLifecycle(s: SparkSession, dir: String): GroupLifecycleState =
    GroupLifecycleState(
      s.read.parquet(s"$dir/labels"), s.read.parquet(s"$dir/pairs"),
      s.read.parquet(s"$dir/bands"), s.read.parquet(s"$dir/shingles"))
}
