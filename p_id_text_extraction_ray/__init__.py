"""Ray-Data-native P&ID text-extraction engine.

A from-scratch reimplementation of the capabilities of
``ExMonsterJoker/P-ID-text-extraction`` (reference at ``/root/reference``,
read-only) as a streaming ``ray.data.Dataset`` DAG over Arrow batches:

    read docs (doc_id, spans[]) -> explode spans
      -> TEXT path: batched tokenize + boilerplate strip
      -> IMAGE path: decode media_ref -> tile -> detect (actor pool)
         -> groupby(doc_id, offset).map_groups(group) -> crop -> recognize
         -> tag classify
      -> union -> groupby(doc_id) reassemble ordered spans -> write

The reference is a single-process, filesystem-staged pipeline
(``run_pipeline.py``); this engine keeps every intermediate in-flight as
Arrow blocks in the Ray object store and replaces the nine disk barriers
with one streaming DAG whose only wide operations are the two
``groupby(doc_id)`` shuffles (grouping and reassembly).
"""

__version__ = "0.1.0"
