package graft.io

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

/** Per-plan directory-statistics source — the fix for the one
  * scale-killer in scan planning: consulting sidecar FILES per
  * directory costs O(directories) sequential driver-side round trips
  * before the first task launches, which on a 10⁴–10⁵-directory table
  * is minutes of planning (the Iceberg/Delta answer is stats embedded
  * in the manifest, read once per plan — [[Manifest]] embeds them as
  * `#ann:` lines at commit time since the round-14 format).
  *
  * Resolution order per directory:
  *
  *  1. a manifest `#ann:stats` annotation WITH a body — parsed from the
  *     already-read manifest, zero extra IO;
  *  2. otherwise (no annotation at all — a pre-format manifest — or an
  *     empty one — the directory had no sidecar when committed) fall
  *     back to ONE sidecar-file open, memoized for the plan. The empty
  *     annotation still probes because a sidecar may have been
  *     RETROFITTED after the commit (`CALL lake.sidecar`) — trusting
  *     "absent at commit" forever would silently disable the retrofit.
  *
  * So a disciplined table plans with zero sidecar reads, and any other
  * table pays at most one read per directory per plan — never the 3–6
  * re-parses of the pre-provider code. Bloom consults follow the same
  * ladder (annotation carries the covered COLUMN NAMES; the filter
  * bytes themselves always load lazily from the sidecar — they can be
  * megabytes, and only point-probe plans ever need them).
  *
  * Driver-side object, shared by every scan of one resolved table
  * instance — so two queries PLANNED CONCURRENTLY over the same loaded
  * table hit the memo maps from different threads. The maps are
  * [[TrieMap]]s (lock-free, atomic getOrElseUpdate): a racing pair may
  * compute the same entry twice (reads are idempotent — harmless), but
  * never corrupts the map. Not serializable by design.
  */
object DirStatsProvider {
  /** Cross-plan stats-body parse memo: annotation bodies are immutable
    * (a directory's stats never change once committed) and — since the
    * parsed-manifest cache — the SAME string instances arrive at every
    * plan of a table version, so the second plan's 10⁴ parses become
    * 10⁴ hash lookups on already-hashed strings. Bounded: cleared past
    * ~8 big tables' worth, the same discipline as the manifest cache.
    */
  private val bodyCache = TrieMap
    .empty[String, Option[SkipStats.Sidecar]]

  private[io] def parseCached(body: String)
      : Option[SkipStats.Sidecar] = {
    if (bodyCache.size > 131072) bodyCache.clear()
    bodyCache.getOrElseUpdate(body, SkipStats.parse(body))
  }
}

class DirStatsProvider(s: SparkSession, root: String,
    version: Option[Int],
    preParsed: Option[Manifest.DirAnnotations] = None) {

  private lazy val ann: Manifest.DirAnnotations =
    preParsed.getOrElse(
      scala.util.Try(Manifest.annotationsOf(s, root, version))
        .getOrElse(Manifest.DirAnnotations.empty))

  private def fOf(d: String) = new Path(d)
    .getFileSystem(s.sparkContext.hadoopConfiguration)

  private val sidecars =
    TrieMap.empty[String, Option[SkipStats.Sidecar]]

  /** The directory's full sidecar — annotation-first, one memoized
    * file open otherwise. None = no readable sidecar (keep the
    * directory, credit nothing: every consumer fails open).
    */
  def sidecar(d: String): Option[SkipStats.Sidecar] =
    ann.stats.get(d).flatten match {
      // annotation path: the global body memo IS the cache — adding a
      // per-provider entry on top would only pay 10⁴ TrieMap inserts
      // per plan of a big table for nothing
      case Some(body) => DirStatsProvider.parseCached(body)
      case None =>
        sidecars.getOrElseUpdate(d, SkipStats.readAll(fOf(d), d))
    }

  def cols(d: String): Option[Map[String, SkipStats.ColStats]] =
    sidecar(d).flatMap(_.cols)

  def count(d: String): Option[Long] = sidecar(d).flatMap(_.count)

  def nonNull(d: String): Map[String, Long] =
    sidecar(d).map(_.nonNull).getOrElse(Map.empty)

  private val bloomKeyCache = TrieMap.empty[String, Set[String]]

  /** The columns the directory's bloom sidecar covers — annotation
    * names when embedded, else one keys-only sidecar scan (filters'
    * bytes skipped). Empty = no bloom coverage known.
    */
  def bloomKeys(d: String): Set[String] =
    bloomKeyCache.getOrElseUpdate(d, ann.bloomCols.get(d).flatten match {
      case Some(cs) => cs.toSet
      case None => BloomSidecar.readKeys(fOf(d), d).getOrElse(Set.empty)
    })

  private val bloomCache =
    TrieMap.empty[(String, String), Option[(String, BloomFilter)]]

  /** One column's bloom filter for a point consult. The annotation
    * decides existence without IO; the filter BYTES always come from
    * the sidecar file (lazily, memoized) — embedding megabytes of
    * filter in every manifest version would bloat the commit path for
    * a consult most plans never make.
    */
  def bloom(d: String, c: String): Option[(String, BloomFilter)] =
    bloomCache.getOrElseUpdate((d, c), ann.bloomCols.get(d).flatten match {
      case Some(cs) if !cs.contains(c) => None
      case _ => BloomSidecar.readOne(fOf(d), d, c)
    })
}
