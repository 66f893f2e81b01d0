package graft.operators

/**
 * Recursive file walk (r18 optimization round, guide §6/§7): Hadoop's
 * `fs.listFiles(path, recursive = true)` RemoteIterator costs ~10 ms
 * PER FILE on the local filesystem — measured 2.6 s over a 266-file
 * index tree, 120× the per-level `listStatus` recursion below (21 ms),
 * which yields the same statuses. Every index health snapshot,
 * compaction trigger, vacuum locate and streaming `indexHasData` gate
 * walks a tree through here, several times per lifecycle row. On
 * non-local filesystems the native recursive iterator is kept: HDFS
 * serves it in bulk RPCs and object stores answer it with a flat LIST,
 * both of which beat client-side per-directory recursion at 100 TB.
 */
private[graft] object FsWalk {

  /** Apply `f` to every FILE status under `path` (directories are
    * recursed into, never passed to `f`) — the exact visit set of
    * `fs.listFiles(path, recursive = true)`. */
  def foreachFile(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path)(
      f: org.apache.hadoop.fs.FileStatus => Unit): Unit =
    if (fs.getScheme == "file") {
      def rec(p: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(p).foreach { st =>
          if (st.isDirectory) rec(st.getPath) else f(st)
        }
      rec(path)
    } else {
      val it = fs.listFiles(path, true)
      while (it.hasNext) f(it.next())
    }

  /** [[foreachFile]] with early exit: stop the walk as soon as `f`
    * returns true (the `indexHasData` gate needs only the FIRST data
    * file). @return whether any file matched */
  def existsFile(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path)(
      f: org.apache.hadoop.fs.FileStatus => Boolean): Boolean =
    if (fs.getScheme == "file") {
      def rec(p: org.apache.hadoop.fs.Path): Boolean =
        fs.listStatus(p).exists { st =>
          if (st.isDirectory) rec(st.getPath) else f(st)
        }
      rec(path)
    } else {
      val it = fs.listFiles(path, true)
      var found = false
      while (!found && it.hasNext) found = f(it.next())
      found
    }
}
