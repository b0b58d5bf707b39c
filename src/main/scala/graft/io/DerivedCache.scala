package graft.io

import java.nio.file.{Files, Paths}

/** Staleness guard for derived per-SF artifacts cached under
  * `target/` (bucketed twins, partitioned/zone-mapped/compacted event
  * layouts, Bloom indexes, media staging, the co-purchase edge list).
  *
  * Every such cache used to be guarded only by its `_SUCCESS` marker;
  * a driver-side fixture regeneration (round 7 regenerated
  * events.parquet mid-round) would then serve STALE derived data into
  * value-oracled queries while the oracle read the fresh table — a
  * silent wrong-answer, the worst failure class. The guard is a cheap
  * driver-side metadata walk of the SOURCE tables (file names, sizes,
  * mtimes — O(file count), the same listing any scan performs),
  * stamped next to the artifact; builders rebuild whenever the stamp
  * does not match the current source.
  */
object DerivedCache {

  /** Fingerprint of the given source tables' on-disk files. */
  def fingerprint(dir: String, tables: Seq[String]): String = {
    def ls(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq.flatMap(ls)
      else Seq(f)
    val sig = tables.map { t =>
      val root = new java.io.File(dir, s"$t.parquet")
      if (!root.exists()) s"$t:absent"
      else ls(root).map(f => s"${f.getName}:${f.length}:${f.lastModified}")
        .mkString(s"$t[", "|", "]")
    }.mkString(";")
    java.util.UUID.nameUUIDFromBytes(sig.getBytes("UTF-8")).toString
  }

  private def stampPath(loc: String) = Paths.get(loc, "_FINGERPRINT")

  /** True iff the artifact's ready marker exists AND its stamped source
    * fingerprint matches `fp`. An artifact built before stamping was
    * introduced (no `_FINGERPRINT`) counts as stale — one extra rebuild
    * beats one stale read.
    */
  def isFresh(loc: String, readyMarker: String, fp: String): Boolean =
    Files.exists(Paths.get(readyMarker)) &&
      Files.exists(stampPath(loc)) &&
      new String(Files.readAllBytes(stampPath(loc)), "UTF-8") == fp

  /** Record `fp` as the source state the artifact at `loc` was built
    * from. Call AFTER the build completes (marker order: data, then
    * stamp — a crash between the two re-builds, never serves stale).
    */
  def stamp(loc: String, fp: String): Unit = {
    Files.createDirectories(Paths.get(loc))
    Files.write(stampPath(loc), fp.getBytes("UTF-8"))
    ()
  }
}
