package graft

/** Local-filesystem helpers for the offline harness's file-based sinks
  * (one copy — previously duplicated by the retention sink and the
  * bucketed-layout setup).
  */
object LocalFs {

  /** Recursive delete. Tolerates an entry vanishing mid-walk
    * (`listFiles` returns null for a concurrently-deleted directory).
    */
  def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(rmrf)
    }
    f.delete()
    ()
  }
}
