"""The flagship extraction pipeline: interleaved docs -> ordered spans.

One streaming DAG (SURVEY.md §7.0):

    read docs (doc_id, spans[])
      ├─ TEXT branch:  explode -> route text  -> clean (boilerplate strip)
      └─ IMAGE branch: explode -> route image
           -> unique media_refs (groupby(media_ref) count)   [shuffle #1, tiny rows]
           -> tile -> detect (actor pool)
           -> group per image: batch-local for whole-image work units (the
              normal case — detections stream straight into crop/recognize
              with NO shuffle); only giant images split across tile-range
              units take a groupby(media_ref) path    [shuffle #2 — rare, coords only]
           -> crop -> recognize (actor pool) -> classify
           -> join back to (doc_id, offset) spans on media_ref
                                                             [shuffle #3 — co-partitioned]
      -> union -> groupby(doc_id).map_groups(reassemble)     [shuffle #4]

Scale notes:
* The CV path processes each DISTINCT image once; popular media_refs
  (boilerplate diagrams, repeated attachments) cost one decode/detect/
  recognize regardless of how many documents reference them. The join back
  to spans is an equi-key groupby(media_ref, salt) over tiny coordinate/
  text rows. A media_ref referenced by millions of docs would skew the
  join group, so refs above ``hot_ref_span_threshold`` spans are salted:
  their spans split into ``join_salt`` doc-hash sub-groups and their
  (small) recognized rows are replicated per salt (metamorphic test:
  salted == unsalted output).
* The two branches each consume the (lazy) exploded spans, so the input is
  read twice; both branches prune immediately. The alternative is a
  materialize() barrier of the whole exploded table — re-reading a
  column-pruned Parquet/Lance input streams and is cheaper.
* No shuffle ever carries pixels: tiles and crops flow forward through the
  object store between adjacent stages only (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa

from ..config import ExtractConfig
from ..stages.assemble import reassemble_doc
from ..stages.cv import (CropStage, DetectStage, PixelDetector, StubRecognizer,
                         join_spans_to_media, make_group_fn, make_tag_media_fn,
                         make_tag_span_fn)
from ..stages.spans import (explode_spans, make_clean_text_fn,
                            route_image, route_text)

if TYPE_CHECKING:
    import ray.data


def extract_media_rows(uniq_refs: "ray.data.Dataset", media_root: str,
                       cfg: ExtractConfig,
                       detector_cls=PixelDetector,
                       detector_args: tuple = (),
                       recognizer_cls=StubRecognizer,
                       stop_after: str | None = None,
                       counter=None) -> "ray.data.Dataset":
    """CV path over unique media_ref rows -> recognized per-media rows."""
    # Pool sizing: tiling+detection dominates CV compute, so the detector
    # pool gets ~60% of the cluster, recognition ~25%, the remainder stays
    # free for the stateless task stages and shuffles (a pool that reserves
    # every CPU would starve them). Pools autoscale (min, max) with a warm
    # minimum of ~2/3: the streaming executor spawns min actors at
    # execution start, hiding most of the per-actor process spawn + import
    # latency behind the read/explode phase, while small clusters keep a
    # floor of free CPUs so the task stages can't starve.
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # Since grouping went batch-local, detect and recognize overlap for
    # the whole run, so the recognize pool grew from 25% to 3/8 of the
    # cluster (measured: ~27s vs ~30s for 6k docs at 32 CPUs — recognize
    # was the post-overlap bottleneck). The pools' autoscaling minimum
    # (2/3) leaves the early-run slack the task stages need.
    det_max = cfg.detect_concurrency or max(1, cpus * 5 // 8)
    rec_max = cfg.recognize_concurrency or max(1, cpus * 3 // 8)
    det_pool = (max(1, det_max * 5 // 6), det_max)
    rec_pool = (max(1, rec_max * 2 // 3), rec_max)

    # Plan tile-range work units from header-only reads (giant images split
    # across tasks), then split into enough blocks for pool load balance —
    # but not so many that per-task fixed costs dominate: ~4 per detector.
    from ..stages.cv import TilePlanStage
    work = uniq_refs.map_batches(
        TilePlanStage(media_root, cfg, cfg.max_tiles_per_task,
                      size_threshold=cfg.tile_plan_size_threshold),
        batch_format="pyarrow")
    # Which media were SPLIT across work units? Only giant images (rare).
    # An unsplit image's detections are complete inside one detect batch
    # (its single work-unit row can't straddle batches), so those group
    # batch-locally with NO shuffle — detect streams straight into
    # crop/recognize instead of stalling at a global sort barrier. Only
    # split-media detections take the groupby path. materialize() here is
    # free: the repartition below is a barrier anyway, and work rows are
    # (ref, lo, hi) triples only.
    import pyarrow.compute as pc
    work = work.materialize()
    split_refs = frozenset(
        r["media_ref"] for r in work.map_batches(
            lambda t: t.filter(pc.greater(t.column("tile_lo"), 0))
            .select(["media_ref"]),
            batch_format="pyarrow").take_all())
    n_work_blocks = max(32, det_max * 8)
    detections = work.repartition(n_work_blocks).map_batches(
        DetectStage,
        fn_constructor_args=(media_root, cfg, detector_cls, detector_args),
        batch_format="pyarrow", batch_size=8,
        concurrency=det_pool, num_cpus=1)
    if stop_after == "detect":
        return detections

    group_fn = make_group_fn(cfg)

    def group_block(t: pa.Table) -> pa.Table:
        # every media in this block is complete (one grouped-output row
        # set per distinct ref); block ≪ target block size, so Ray never
        # slices a single UDF output across blocks
        refs = pc.unique(t.column("media_ref")).to_pylist()
        if not refs:
            return group_fn(t)
        return pa.concat_tables(
            [group_fn(t.filter(pc.equal(t.column("media_ref"), ref)))
             for ref in refs])

    if split_refs:
        split_arr = pa.array(sorted(split_refs), pa.string())
        whole = detections.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t.column("media_ref"),
                                                  value_set=split_arr))),
            batch_format="pyarrow")
        split = detections.map_batches(
            lambda t: t.filter(pc.is_in(t.column("media_ref"),
                                        value_set=split_arr)),
            batch_format="pyarrow")
        grouped = whole.map_batches(group_block, batch_format="pyarrow",
                                    batch_size=None) \
            .union(split.groupby("media_ref").map_groups(
                group_fn, batch_format="pyarrow"))
    else:
        grouped = detections.map_batches(group_block, batch_format="pyarrow",
                                         batch_size=None)
    if stop_after == "group":
        return grouped
    crops = grouped.map_batches(
        CropStage(media_root, cfg, counter), batch_format="pyarrow",
        batch_size=cfg.recognize_batch_size)
    return crops.map_batches(
        recognizer_cls, fn_constructor_args=(cfg, counter),
        batch_format="pyarrow", batch_size=cfg.recognize_batch_size,
        concurrency=rec_pool, num_cpus=1)


def extract_spans(docs: "ray.data.Dataset", media_root: str,
                  cfg: ExtractConfig | None = None,
                  detector_cls=PixelDetector,
                  detector_args: tuple = (),
                  recognizer_cls=StubRecognizer,
                  stop_after: str | None = None,
                  counter=None) -> "ray.data.Dataset":
    """Build the lazy extraction Dataset. Does NOT call ray.init().

    ``stop_after`` returns the named intermediate dataset instead of the
    final spans — the engine's debug equivalent of the reference's step
    registry with ``--start-at/--stop-at`` slicing
    (``run_pipeline.py:355-383``, SURVEY.md §2.10). Valid names:
    ``explode``, ``text_clean``, ``unique_media``, ``detect``, ``group``,
    ``recognize``, ``join``.
    """
    cfg = cfg or ExtractConfig()

    spans = docs.map_batches(explode_spans, batch_format="pyarrow")
    if stop_after == "explode":
        return spans

    text_rows = (spans
                 .map_batches(route_text, batch_format="pyarrow")
                 .map_batches(make_clean_text_fn(counter, cfg.html_strip),
                              batch_format="pyarrow"))
    if stop_after == "text_clean":
        return text_rows

    img_spans = spans.map_batches(route_image, batch_format="pyarrow")
    # bucketed pandas count, NOT Ray's native groupby().aggregate(Count):
    # the native path pays ~1.4 ms/group in EACH of its map and reduce
    # suboperators — ~20 s of the headline at ~8k unique media — while a
    # per-batch partial count + one vectorized groupby per hash bucket is
    # milliseconds and scales with rows, not groups
    from ._util import bucketed_group_sum
    uniq_refs = bucketed_group_sum(
        img_spans.map_batches(
            lambda df: df.groupby("media_ref", as_index=False).size()
            .rename(columns={"size": "n_spans"}).astype({"n_spans": "int64"}),
            batch_format="pandas"),
        "media_ref", ["n_spans"])
    if stop_after == "unique_media":
        return uniq_refs

    # Hot-ref salting for the span fan-out join: a media_ref referenced by
    # millions of docs would funnel every referencing span into ONE join
    # group; refs above the span threshold are split into join_salt
    # doc-hash sub-groups instead. The hot list comes from the (tiny)
    # unique-media aggregate: materialize() it — the groupby is a barrier
    # anyway, the materialized rows are (media_ref, count) only, and the
    # CV path reuses the materialized result instead of re-executing the
    # explode+count lineage.
    hot_refs: frozenset = frozenset()
    if cfg.join_salt > 1:
        uniq_refs = uniq_refs.materialize()
        import pyarrow.compute as _pc
        hot = uniq_refs.map_batches(
            lambda t: t.filter(_pc.greater_equal(
                t.column("n_spans"),
                pa.scalar(cfg.hot_ref_span_threshold, pa.int64())))
                       .select(["media_ref"]),
            batch_format="pyarrow").take_all()
        hot_refs = frozenset(r["media_ref"] for r in hot)

    media_rows = extract_media_rows(uniq_refs, media_root, cfg,
                                    detector_cls, detector_args,
                                    recognizer_cls=recognizer_cls,
                                    stop_after=stop_after, counter=counter)
    if stop_after in ("detect", "group", "recognize"):
        return media_rows

    # The tail shuffles move tiny coordinate/text rows spread across many
    # small upstream blocks; left at Ray's default (one reduce partition
    # per input block, ~200 here) the sort-based groupby mints O(blocks²)
    # shuffle fragments and orchestration dominates (~20 s of a 63 s run
    # at 24k docs / 32 CPUs). Bound the reduce side to ~2 tasks per core —
    # it scales with the cluster, not with the block count.
    import ray as _ray
    _cpus = (int(_ray.cluster_resources().get("CPU", 8))
             if _ray.is_initialized() else 8)
    tail_parts = max(16, _cpus * 2)

    tag_media = make_tag_media_fn(hot_refs, cfg.join_salt)
    tag_spans = make_tag_span_fn(hot_refs, cfg.join_salt)
    joined = (media_rows.map_batches(tag_media, batch_format="pyarrow")
              .union(img_spans.map_batches(tag_spans, batch_format="pyarrow"))
              .groupby(["media_ref", "salt"], num_partitions=tail_parts)
              .map_groups(join_spans_to_media, batch_format="pyarrow"))
    if stop_after == "join":
        return joined

    all_rows = text_rows.union(joined)
    return all_rows.groupby("doc_id", num_partitions=tail_parts).map_groups(
        reassemble_doc, batch_format="pyarrow")
