"""The flagship extraction pipeline: interleaved docs -> ordered spans.

One streaming DAG (SURVEY.md §7.0):

    read docs (doc_id, spans[])
      ├─ TEXT branch:  explode -> route text  -> clean (boilerplate strip)
      └─ IMAGE branch: explode -> route image -> tile -> detect (actor pool)
           -> groupby(img_key).map_groups(group)   [shuffle #1 — coords only]
           -> crop -> recognize (actor pool) -> classify
      -> union -> groupby(doc_id).map_groups(reassemble)  [shuffle #2]

Scale notes:
* The two branches each consume the (lazy) exploded spans, so the input is
  read twice; both branches prune to their own columns immediately. At
  cluster scale the alternative is a materialize() barrier of the whole
  exploded table — re-reading a column-pruned Parquet/Lance input streams
  and is the cheaper choice.
* Shuffle #1 moves detection *coordinates*, never pixels; the crop stage
  re-resolves ``media_ref`` from the store (SURVEY.md §7.3).
* Shuffle keys: ``img_key`` = (doc_id, offset) for grouping (finer than
  doc_id: each image span groups independently — also the first skew
  valve, since a many-image doc spreads over many groups), then ``doc_id``
  for reassembly.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from ..config import ExtractConfig
from ..stages.assemble import reassemble_doc
from ..stages.cv import CropStage, PixelDetector, StubRecognizer, TileStage, make_group_fn
from ..stages.spans import clean_text_spans, explode_spans, route_image, route_text

if TYPE_CHECKING:
    import ray.data


def extract_spans(docs: "ray.data.Dataset", media_root: str,
                  cfg: ExtractConfig | None = None,
                  detector_cls=PixelDetector,
                  detector_args: tuple = ()) -> "ray.data.Dataset":
    """Build the lazy extraction Dataset. Does NOT call ray.init()."""
    cfg = cfg or ExtractConfig()

    # Autoscaling actor-pool caps: ~1/3 of the cluster's CPUs each (min 1),
    # leaving headroom for the stateless task stages and the shuffles. Pools
    # start at 1 actor and grow only while CPUs are free, so an 8-CPU
    # cluster cannot deadlock on pending actors.
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    det_max = cfg.detect_concurrency or max(1, cpus // 3)
    rec_max = cfg.recognize_concurrency or max(1, cpus // 3)

    spans = docs.map_batches(explode_spans, batch_format="pyarrow")

    text_rows = (spans
                 .map_batches(route_text, batch_format="pyarrow")
                 .map_batches(clean_text_spans, batch_format="pyarrow"))

    img_spans = spans.map_batches(route_image, batch_format="pyarrow")
    tiles = img_spans.map_batches(
        TileStage(media_root, cfg), batch_format="pyarrow",
        batch_size=8)  # few image rows per task: each fans out to many tiles
    detections = tiles.map_batches(
        detector_cls, fn_constructor_args=detector_args or (cfg,),
        batch_format="pyarrow", batch_size=cfg.detect_batch_size,
        concurrency=(1, det_max), num_cpus=1)
    grouped = detections.groupby("img_key").map_groups(
        make_group_fn(cfg), batch_format="pyarrow")
    crops = grouped.map_batches(
        CropStage(media_root, cfg), batch_format="pyarrow",
        batch_size=cfg.recognize_batch_size)
    img_rows = crops.map_batches(
        StubRecognizer, fn_constructor_args=(cfg,),
        batch_format="pyarrow", batch_size=cfg.recognize_batch_size,
        concurrency=(1, rec_max), num_cpus=1)

    all_rows = text_rows.union(img_rows)
    return all_rows.groupby("doc_id").map_groups(
        reassemble_doc, batch_format="pyarrow")
