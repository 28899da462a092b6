package graft.ops

import graft.QuerySpec

/** Placeholder — filled by the dedup/similarity/text extension modules. */
object ExtensionQueries {
  def all: Seq[QuerySpec] = Seq.empty
}
