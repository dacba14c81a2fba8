package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Filename-policy machinery — reference `filename-policy`
  * (core.clj:2157-2209) and the text-writer `:prefix/:suffix/:naming-fn`
  * options (core.clj:1219-1253).
  *
  * Spark's committer owns in-flight filenames, so a filename policy is
  * applied as a post-commit staged rename of the committer's `part-*`
  * output. The rename sequence (proven first in the windowed sink,
  * streaming/Sources.scala) is shared between batch and streaming:
  *
  * A re-emission (batch overwrite replay, or a refined streaming pane)
  * may carry a DIFFERENT shard count than the previous emission —
  * exact-name replacement would leave stale `prefix-i-of-oldN` files
  * beside the new set, and a reader globbing the prefix would
  * double-count. So: (0) sweep hidden debris left by crashed prior
  * attempts, (1) stage the new shards into the target dir under
  * dot-temp names (hidden from globs), (2) move the ENTIRE previous
  * emission matching `cleanupGlob` aside to hidden `.trash-*` names
  * (NOT deleted — a crash between here and step 3 must not lose the
  * only durable copy of the data; batch callers have no replay to
  * redo the write), (3) same-dir rename temp → final (each rename
  * atomic), (4) drop the trash. A crash mid-sequence leaves the old
  * emission either visible or recoverable from `.trash-*`; the next
  * successful emission of the SAME name shape sweeps the leftovers.
  * Writers emitting different name shapes may share a directory
  * (the sweep and cleanup are scoped to `cleanupGlob`); concurrent
  * writers of the SAME shape race by nature of the contract.
  *
  * Cost note for rename-as-copy object stores (S3-style): step 2
  * copies the previous emission aside before dropping it, so a
  * replacement pays one extra copy of the OLD data's size — the
  * price of the crash-recoverability guarantee. On HDFS/local
  * (atomic metadata rename) it is free.
  */
object FileNaming {

  /** Default shard-naming policy, `prefix-00000-of-00002.suffix` — the
    * reference's `mk-default-unwindowed-fn` (core.clj:2170-2176)
    * modulo zero-padding (stable lexicographic ordering at any shard
    * count, same convention as the windowed sink). */
  def defaultName(prefix: String, suffix: String)(shard: Int, of: Int): String =
    f"$prefix-$shard%05d-of-$of%05d$suffix"

  /** Rename the committed `part-*` files under `srcDir` into `destDir`
    * as `nameFor(shardIndex, shardCount)`, with the crash-safe staged
    * sequence documented above; deletes `srcDir` when done and returns
    * the final paths in shard order.
    *
    * `cleanupGlob` names the previous emission to replace (e.g.
    * `prefix-*suffix`); pass None with a custom naming fn whose output
    * shape can't be globbed — then only exact-name targets are
    * replaced, and a shrink in shard count can strand old tails (the
    * same contract Beam's custom FileNaming has). `stageTag` makes the
    * hidden temp names unique per emission (batch id, window, …). */
  def stagedRename(conf: Configuration, srcDir: String, destDir: String,
                   nameFor: (Int, Int) => String,
                   cleanupGlob: Option[String],
                   stageTag: String): Seq[String] = {
    val src = new Path(srcDir)
    val fs = FileSystem.get(src.toUri, conf)
    val dest = new Path(destDir)
    if (!fs.exists(dest)) fs.mkdirs(dest)
    def glob(pattern: String): Array[org.apache.hadoop.fs.FileStatus] =
      Option(fs.globStatus(new Path(dest, pattern)))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
    // (0) sweep hidden debris from crashed prior attempts of THIS
    //     emission's output shape ONLY — `.pending-<anytag>-<name>` /
    //     `.trash-<anytag>-<name>` where <name> matches the cleanup
    //     glob. Debris of other writers/windows sharing the dir (their
    //     names don't match) and in-flight `.staging-*` dirs (not
    //     name-scoped — a concurrent writer may own them) are left
    //     alone; custom-policy emissions without a cleanupGlob keep
    //     only the exact-name replacement below (the Beam custom
    //     FileNaming contract).
    cleanupGlob.foreach { g =>
      (glob(s".pending-*$g") ++ glob(s".trash-*$g"))
        .foreach(st => fs.delete(st.getPath, true))
    }
    val parts = Option(fs.globStatus(new Path(src, "part-*")))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .sortBy(_.getPath.getName)
    val n = parts.length
    // (0b) custom-policy path (no cleanupGlob): debris of a crashed
    //      prior attempt can't be glob-scoped, but its trailing name is
    //      a final name this emission is about to (re)produce — sweep
    //      exactly those `.pending-*`/`.trash-*` entries (listStatus +
    //      suffix match, NOT globStatus: a custom naming fn's output may
    //      contain glob metacharacters). Debris from an attempt with a
    //      different shard count keeps different names and stays — the
    //      same shrink caveat the exact-name replacement contract above
    //      already documents.
    if (cleanupGlob.isEmpty && n > 0) {
      val finalNames = (0 until n).map(i => nameFor(i, n))
      Option(fs.listStatus(dest)).getOrElse(Array.empty)
        .map(_.getPath)
        .filter { p =>
          val nm = p.getName
          (nm.startsWith(".pending-") || nm.startsWith(".trash-")) &&
            finalNames.exists(f => nm.endsWith(s"-$f"))
        }
        .foreach(p => fs.delete(p, true))
    }
    // (1) stage under hidden names in the destination dir
    val staged = parts.zipWithIndex.map { case (st, i) =>
      val finalName = nameFor(i, n)
      val pending = new Path(dest, s".pending-$stageTag-$finalName")
      if (fs.exists(pending)) fs.delete(pending, false)
      if (!fs.rename(st.getPath, pending))
        throw new java.io.IOException(s"rename ${st.getPath} -> $pending failed")
      (pending, new Path(dest, finalName))
    }
    // (2) move the previous emission aside — hidden but recoverable
    //     until the new emission is fully in place: everything the
    //     cleanup glob matches plus exact-name targets a custom-policy
    //     glob didn't cover, deduped by name (same dir)
    val toTrash = (cleanupGlob.map(glob).getOrElse(Array.empty)
        .map(_.getPath).filterNot(_.getName.startsWith(".")) ++
        staged.map(_._2).filter(fs.exists))
      .groupBy(_.getName).map(_._2.head).toSeq
    val trashed = toTrash.map { p =>
      val aside = new Path(dest, s".trash-$stageTag-${p.getName}")
      if (fs.exists(aside)) fs.delete(aside, false)
      if (!fs.rename(p, aside))
        throw new java.io.IOException(s"rename $p -> $aside failed")
      aside
    }
    // (3) same-dir rename into place, each atomic
    staged.foreach { case (pending, target) =>
      if (fs.exists(target)) fs.delete(target, false)
      if (!fs.rename(pending, target))
        throw new java.io.IOException(s"rename $pending -> $target failed")
    }
    // (4) the new emission is durable — drop the superseded one
    trashed.foreach(p => fs.delete(p, false))
    fs.delete(src, true)
    staged.map(_._2.toString).toIndexedSeq
  }
}
