package graft.util

/** The one recursive-delete helper — every module that cleans scratch
  * trees (streaming work dirs, maintenance staging, fixtures) delegates
  * here so a future hardening (symlink safety, locked-file retry) lands
  * in exactly one place.
  */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
