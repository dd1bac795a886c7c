package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-level ATOMIC multi-table commits — the Iceberg-catalog /
  * Nessie pattern on top of [[Manifest]]: a catalog is itself a manifest
  * table whose entries are `tableRoot@version` pins, so publishing a
  * consistent snapshot ACROSS tables is one create-if-absent manifest
  * write, exactly as atomic as a single-table commit.
  *
  * Why it matters here: an index is usually SEVERAL tables that must
  * move together — t25's postings + corpus-stats tables, s14's IVF
  * lists + frozen quantizer. Committing them independently leaves a
  * window where a reader sees new postings against old stats (a wrong
  * BM25 normalizer, silently). The transaction protocol closes it:
  *
  *  1. commit each table's batch at the TABLE level (any order — these
  *     versions are staged-but-unpublished as far as catalog readers
  *     are concerned);
  *  2. [[pin]] the catalog at the new (table → version) vector — the
  *     single atomic publish point.
  *
  * A crash between 1 and 2 leaves the catalog at the previous pin
  * vector: catalog readers still resolve the old CONSISTENT pair, and
  * the half-landed table versions are ordinary superseded versions the
  * table's own retention ([[Manifest.expire]]) later reclaims. Readers
  * that want cross-table consistency read through [[snapshotOf]];
  * reading a table's latest directly remains possible and remains
  * single-table-consistent only — the same split Iceberg makes between
  * table-level and catalog-level reads.
  *
  * Scale: resolve cost is one small-file read regardless of how many
  * tables or how much data the pins cover; time travel across the
  * catalog's own versions gives consistent-pair history for free.
  */
object Catalog {

  /** Publish an atomic pin vector: the catalog's next version maps each
    * table root to the exact manifest version a consistent reader must
    * use. One manifest write — all-or-nothing. Returns the catalog
    * version.
    */
  def pin(s: SparkSession, catRoot: String, pins: Seq[(String, Int)],
      committer: Committer = FsCreateCommitter): Int = {
    require(pins.nonEmpty, "empty pin vector")
    Manifest.rewrite(s, catRoot,
      pins.map { case (root, v) => s"$root@$v" }, committer)
  }

  /** Publish the CURRENT latest version of each table as one atomic
    * pin vector — the "commit tables first, pin last" ingest
    * discipline's final step. Idempotent for replayed writers: when
    * the catalog already pins exactly this vector (a Structured
    * Streaming batch replayed after its pin landed), no new catalog
    * version is burned. Returns the catalog version holding the
    * vector.
    *
    * CONCURRENCY CONTRACT: designed for a SINGLE concurrent publisher
    * per catalog; racing publishers degrade SAFELY, never tornly.
    * The per-root latest reads are sequential, so with a concurrent
    * writer mid-publish the captured vector could mix the writer's old
    * and new versions (lists@3 read, peer lands lists@4 + quantizer@2,
    * quantizer@2 read) — a stabilization re-read retries until two
    * consecutive scans agree and REFUSES loudly if they never do.
    * Losing the catalog SLOT race to a peer who published newer table
    * versions would land this publisher's stale (consistent, but
    * older) vector as a later catalog version — a silently regressed
    * head — so after every publish the table vector is re-read and the
    * publish loops onto the winner's state until it returns with the
    * head holding the freshest vector (bounded, then refuses). Every
    * landed catalog version is a consistent per-publish vector either
    * way; history may hold a superseded older vector between a loser's
    * land and its convergence re-pin, but the RETURNED version always
    * resolves the settled head. True cross-publisher isolation still
    * wants external serialization (the streaming paths get it free:
    * one query, one publisher).
    */
  def pinLatest(s: SparkSession, catRoot: String, roots: Seq[String],
      committer: Committer = FsCreateCommitter): Int = {
    def readVec(): Seq[(String, Int)] = roots.map { r =>
      val vs = Manifest.versions(s, r)
      require(vs.nonEmpty, s"cannot pin $r: no committed version")
      r -> vs.last
    }
    var publishes = 0
    while (true) {
      var vec = readVec()
      var tries = 0
      var settled = false
      while (!settled && tries < 5) {
        val again = readVec()
        if (again == vec) settled = true else { vec = again; tries += 1 }
      }
      // fail loudly rather than publish a potentially mixed old/new
      // cross-table vector: an unsettled scan after 5 retries means a
      // writer is actively publishing — the caller should serialize
      // with it, not race it (pinning a torn vector is the one state
      // the catalog exists to prevent)
      require(settled, s"pinLatest($catRoot): table versions still " +
        s"changing after $tries stabilization re-reads — a concurrent " +
        "publisher is mid-publish; serialize the publish step and retry")
      // The idempotence probe reads the LATEST catalog manifest, which a
      // racing pinner may be writing right now (created, terminator not
      // yet landed). That is a not-yet-visible version, not an error:
      // treat it as "not already pinned" and fall through to pin, whose
      // commitLoop is already in-flight-tolerant.
      val alreadyPinned =
        try {
          val catVersions = Manifest.versions(s, catRoot)
          if (catVersions.nonEmpty && resolve(s, catRoot) == vec.toMap)
            Some(catVersions.last)
          else None
        } catch {
          case _: Manifest.IncompleteManifestException |
               _: java.io.FileNotFoundException => None
        }
      val v = alreadyPinned.getOrElse(pin(s, catRoot, vec, committer))
      // CONVERGENCE check: losing the catalog slot race to a peer who
      // published NEWER table versions would otherwise land this
      // publisher's stale (consistent, but older) vector as a LATER
      // catalog version — a silently regressed head. Re-read the
      // tables: unchanged → this publish is the head's truth, return;
      // changed → loop and re-pin onto the winner's state (the
      // idempotence probe above keeps the loop from burning versions
      // once the head already holds the fresh vector).
      if (readVec() == vec) return v
      publishes += 1
      require(publishes < 5, s"pinLatest($catRoot): table versions " +
        s"advanced under $publishes consecutive publishes — serialize " +
        "the publish step and retry")
    }
    -1 // unreachable
  }

  /** The (table root → manifest version) vector a catalog version pins
    * (latest when unspecified).
    */
  def resolve(s: SparkSession, catRoot: String,
      version: Option[Int] = None): Map[String, Int] =
    Manifest.entries(s, catRoot, version).map { line =>
      val i = line.lastIndexOf('@')
      require(i > 0, s"malformed catalog entry: $line")
      (line.substring(0, i), line.substring(i + 1).toInt)
    }.toMap

  /** Retention for a table the catalog pins: [[Manifest.expire]] with
    * PIN PROTECTION. The catalog root itself is an ordinary manifest
    * table — expiring ITS old versions with `Manifest.expire(catRoot,
    * keepLast)` is always safe (a pin vector only references other
    * tables; dropping an old vector never breaks a live one). But a
    * TABLE version still referenced by any live catalog version must
    * stay reachable, or `snapshotOf` through an old-but-live vector
    * would fail on a vanished manifest — a dangling pin. This wrapper
    * REFUSES loudly when the expire window would reclaim a version a
    * live catalog version still pins; expire the catalog's own old
    * versions first (shrinking the pinned set), then retry. Returns
    * the versions reclaimed.
    */
  def expireTable(s: SparkSession, catRoot: String, tableRoot: String,
      keepLast: Int): Seq[Int] = {
    val vs = Manifest.versions(s, tableRoot)
    val dead = vs.dropRight(keepLast)
    val pinned = Manifest.versions(s, catRoot)
      .flatMap(cv => resolve(s, catRoot, Some(cv)).get(tableRoot))
      .toSet
    val clash = dead.filter(pinned)
    require(clash.isEmpty,
      s"refusing to expire $tableRoot version(s) ${clash.mkString(",")}" +
        s": still pinned by a live catalog version of $catRoot — " +
        "expire the catalog's old versions first, or keep more " +
        "table versions")
    Manifest.expire(s, tableRoot, keepLast)
  }

  /** A table's snapshot AS PINNED by the catalog — the cross-table-
    * consistent read path. Fails loudly if the catalog doesn't pin the
    * table (a reader asking for consistency must not silently fall
    * back to latest).
    */
  def snapshotOf(s: SparkSession, catRoot: String, tableRoot: String,
      version: Option[Int] = None): DataFrame = {
    val pins = resolve(s, catRoot, version)
    require(pins.contains(tableRoot),
      s"catalog $catRoot does not pin $tableRoot (pins: ${pins.keys})")
    Manifest.snapshot(s, tableRoot, Some(pins(tableRoot)))
  }

  /** The catalog's own commit history: every live catalog version with
    * the full pin vector it published, ascending — CONSISTENT-PAIR time
    * travel ("what did the hybrid index look like two publishes ago").
    * Each entry is a cross-table-consistent state by construction (one
    * pin = one atomic vector), so replaying history through
    * [[snapshotOf]] with these versions replays exactly the states
    * readers ever saw. Cost: one small-file read per live version.
    */
  def history(s: SparkSession, catRoot: String): Seq[(Int, Map[String, Int])] =
    Manifest.versions(s, catRoot)
      .map(v => v -> resolve(s, catRoot, Some(v)))

  /** The catalog version live as of a wall-clock instant —
    * [[Manifest.versionAt]] on the catalog's own manifests (a pin is
    * written exactly once, so its file mtime IS the publish instant).
    * None before the first pin; shares every mtime caveat of the
    * single-table AS OF.
    */
  def versionAt(s: SparkSession, catRoot: String, tsMillis: Long)
      : Option[Int] =
    Manifest.versionAt(s, catRoot, tsMillis)

  /** Cross-table-consistent snapshot AS OF a wall-clock instant: the
    * table as the catalog pinned it at `tsMillis` — every table read
    * through the same instant resolves through the SAME pin vector, so
    * a multi-table reader gets the consistent pair of that moment, not
    * a mix of epochs.
    */
  def snapshotOfAt(s: SparkSession, catRoot: String, tableRoot: String,
      tsMillis: Long): DataFrame = {
    val v = versionAt(s, catRoot, tsMillis).getOrElse(
      throw new IllegalArgumentException(
        s"no version of catalog $catRoot existed at $tsMillis"))
    snapshotOf(s, catRoot, tableRoot, Some(v))
  }
}
