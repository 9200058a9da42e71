"""groonga_ray — a Ray-Data-native fulltext index + BM25 query engine.

A from-scratch rebuild of the fulltext core of Groonga 5.0.4
(reference: /root/reference): inverted-index construction as a Ray Data
pipeline (map_batches tokenize -> per-shard encoded segment runs ->
bucketed merge shuffle), delta+varbyte-compressed posting lists with
per-chunk skip pointers and block-max metadata, a sorted-term lexicon
(standing in for the reference's patricia trie, lib/pat.c), and top-k
BM25 / tf-idf / Groonga-default scoring with both an exhaustive
conjunctive "zipper" (reference: grn_ii_select, lib/ii.c:6319) and
block-max WAND.

Nothing in here is a port: the reference defines WHAT is computed
(token streams, posting payloads, score formulas, select semantics);
the execution engine is ray.data.Dataset end to end.
"""

__version__ = "0.1.0"

from .utils import tune_malloc as _tune_malloc

_tune_malloc()
