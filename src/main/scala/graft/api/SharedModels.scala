package graft.api

import org.apache.spark.sql.SparkSession

/** Bookkeeping for the shared-model registry (SURVEY §5.3): families
  * train/mine an artifact once per (session, sfDir) and persist it as a
  * warehouse table; this object centralizes the two pieces every family
  * needs identically:
  *
  *   - [[key]]/[[tableFor]]: the marker key AND the table name both carry
  *     the scale factor — a marker keyed by sfDir pointing at a GLOBAL
  *     table name would silently serve one scale factor's artifact to
  *     another after an interleaved build (sf0.001 -> sf0.01 -> sf0.001
  *     re-reads sf0.01 rows). The sf rides the table name, so each scale
  *     factor owns its tables and staleness is structurally impossible.
  *   - [[track]]/[[resetAll]]: every family registers its marker map at
  *     class-init; `resetAll` clears them ALL, so determinism specs (the
  *     SimSpec pattern: reset, build twice, compare) genuinely retrain
  *     instead of re-reading the persisted table — for every family, not
  *     just the one that happened to expose a reset.
  */
object SharedModels {

  type Key = (Int, String)

  def key(s: SparkSession, d: String): Key =
    (System.identityHashCode(s.sparkContext), d)

  /** `base` + a sanitized scale-factor tag + a short hash of the FULL
    * path, e.g. `ngram_pairs_full__sf0_01_1a2b3c4d` for
    * `/root/testdata/sf0.01`. The basename alone is not enough: markers
    * are keyed by the full sfDir, so two directories sharing a basename
    * (`/a/sf0.1` and `/b/sf0.1`) would share one physical table while
    * holding independent markers — after B builds, A's still-set marker
    * would serve B's artifact to A's consumers. The path hash makes
    * table identity agree with marker identity.
    */
  def tableFor(base: String, d: String): String = {
    val tag = d.split('/').filter(_.nonEmpty).lastOption.getOrElse("root")
      .toLowerCase.replaceAll("[^a-z0-9]", "_")
    val h = scala.util.hashing.MurmurHash3.stringHash(d) & 0xffffffffL
    f"${base}__${tag}_$h%08x"
  }

  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[java.util.Map[_, _]]

  /** Register a family's marker map; returns it for inline declaration. */
  def track[M <: java.util.Map[_, _]](m: M): M = { tracked.add(m); m }

  /** Clear every tracked marker map — the next consumer of each artifact
    * retrains/re-mines and overwrites its table. Test hook.
    */
  def resetAll(): Unit = tracked.forEach(_.clear())
}
