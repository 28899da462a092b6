package graft.ops

import graft.QuerySpec

/** Placeholder — filled by the augmentation pipeline module. */
object AugmentQueries {
  def all: Seq[QuerySpec] = Seq.empty
}
