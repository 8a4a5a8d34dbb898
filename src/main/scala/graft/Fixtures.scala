package graft

/** Resolver for the committed byte-pinned fixture corpus under
  * `tools/fixtures/`. Queries that grade codecs against foreign golden
  * bytes (JPEG, HDF5, encoder goldens) scan these COMMITTED files, so
  * the path must work for any checkout location, not just the
  * historical `/root/repo`: resolution order is the
  * `graft.fixtures.dir` system property, then `$GRAFT_FIXTURES_DIR`,
  * then `tools/fixtures` under the working directory, then the
  * historical absolute path as a last resort. The first candidate that
  * exists wins; if NONE exists, resolution FAILS FAST with a message
  * naming the override knobs — a relocated checkout must die at first
  * fixture access, not return empty query results an hour later. */
object Fixtures {
  /** Pure resolution over explicit candidates — testable without
    * mutating JVM-global properties. Throws [[IllegalStateException]]
    * when no candidate is an existing directory. */
  def resolve(cands: Seq[String]): String =
    cands.find(p => new java.io.File(p).isDirectory).getOrElse {
      throw new IllegalStateException(
        "graft fixtures directory not found; tried: " +
          cands.mkString(", ") +
          " — set -Dgraft.fixtures.dir=<path> or $GRAFT_FIXTURES_DIR " +
          "to the checkout's tools/fixtures")
    }

  lazy val base: String = resolve(Seq(
    sys.props.get("graft.fixtures.dir"),
    sys.env.get("GRAFT_FIXTURES_DIR"),
    Some(new java.io.File("tools/fixtures").getAbsolutePath),
    Some("/root/repo/tools/fixtures")
  ).flatten)

  def path(rel: String): String = s"$base/$rel"
}
