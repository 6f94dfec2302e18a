package graft.util

/** Collision-proof internal column names. Operators that add scratch
  * columns (salt, union side tags, synthetic ts) must not silently
  * overwrite user data that happens to share the name; a deterministic
  * numeric suffix keeps plans stable run-to-run (no UUIDs — identical
  * input schemas always produce identical plans, which matters for plan
  * caching and for debugging at scale).
  */
object Names {
  /** A name starting with `base` that appears in none of `taken`. */
  def fresh(base: String, taken: Iterable[String]): String = {
    val used = taken.toSet
    if (!used.contains(base)) base
    else Iterator.from(1).map(i => s"${base}_$i").find(!used.contains(_)).get
  }
}
