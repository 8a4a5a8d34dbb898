package graft

/** Resolver for the committed byte-pinned fixture corpus under
  * `tools/fixtures/`. Queries that grade codecs against foreign golden
  * bytes (JPEG, HDF5, encoder goldens) scan these COMMITTED files, so
  * the path must work for any checkout location, not just the
  * historical `/root/repo`: resolution order is the
  * `graft.fixtures.dir` system property, then `$GRAFT_FIXTURES_DIR`,
  * then `tools/fixtures` under the working directory, then the
  * historical absolute path as a last resort. The first candidate that
  * exists wins; if none exist the first (most explicit) is returned so
  * the downstream scan reports the real missing path. */
object Fixtures {
  lazy val base: String = {
    val cands = Seq(
      sys.props.get("graft.fixtures.dir"),
      sys.env.get("GRAFT_FIXTURES_DIR"),
      Some(new java.io.File("tools/fixtures").getAbsolutePath),
      Some("/root/repo/tools/fixtures")
    ).flatten
    cands.find(p => new java.io.File(p).isDirectory).getOrElse(cands.head)
  }

  def path(rel: String): String = s"$base/$rel"
}
