"""Offline dataset preparation: annotation-format converters.

Rebuild of the reference's prep scripts (``datasets/coco2ytvis.py``,
``datasets/ytvis2coco.py``, ``datasets/lvvis2ytvis.py``):

  * ``coco2ytvis``: re-label a COCO-instances json into a YTVIS taxonomy
    using the public COCO->YTVIS category maps, keeping only mapped
    categories (used to produce the pseudo-video COCO training jsons);
  * ``ytvis2coco``: re-label a YTVIS json into the merged 101-class
    YTVIS∪COCO taxonomy (name-keyed);
  * ``lvvis2ytvis``: normalize LVVIS jsons to YTVIS style (areas/bboxes may
    be missing; per-frame lists repaired to video length — the reference's
    broken-frame fixing, ``lvvis2ytvis.py:20-39``).

Usage:
  python tools/prep_datasets.py coco2ytvis2019 in.json out.json
  python tools/prep_datasets.py ytvis2coco     in.json out.json
  python tools/prep_datasets.py lvvis2ytvis    in.json out.json
"""

from __future__ import annotations

import json
import sys

from openvis_tpu.data.catalog import _load

COCO_TO_YTVIS_2019 = {int(k): v for k, v in _load("coco_to_ytvis_2019.json").items()}
COCO_TO_YTVIS_2021 = {int(k): v for k, v in _load("coco_to_ytvis_2021.json").items()}
COCO_TO_OVIS = {int(k): v for k, v in _load("coco_to_ovis.json").items()}


def coco_relabel(data: dict, cat_map: dict, categories: list) -> dict:
    """Keep + re-id annotations whose category maps into the target set."""
    anns = [
        {**a, "category_id": cat_map[a["category_id"]]}
        for a in data.get("annotations", [])
        if a["category_id"] in cat_map
    ]
    img_ids = {a["image_id"] for a in anns}
    images = [im for im in data["images"] if im["id"] in img_ids]
    return {"images": images, "annotations": anns, "categories": categories}


def ytvis_to_merged_taxonomy(data: dict, merged_categories: list) -> dict:
    """Re-label a YTVIS json into the merged taxonomy by category NAME."""
    name_to_new = {c["name"]: c["id"] for c in merged_categories}
    old_by_id = {c["id"]: c["name"] for c in data["categories"]}
    out_anns = []
    for a in data.get("annotations", []):
        name = old_by_id[a["category_id"]]
        if name in name_to_new:
            out_anns.append({**a, "category_id": name_to_new[name]})
    return {
        "videos": data["videos"],
        "annotations": out_anns,
        "categories": merged_categories,
    }


def lvvis_to_ytvis(data: dict) -> dict:
    """Normalize LVVIS to YTVIS style: pad/truncate per-frame lists to the
    video length, fill missing areas (lvvis2ytvis.py:20-39)."""
    length_by_vid = {v["id"]: v["length"] for v in data["videos"]}
    out_anns = []
    for a in data.get("annotations", []):
        t = length_by_vid[a["video_id"]]
        segs = list(a.get("segmentations") or [])
        segs = (segs + [None] * t)[:t]
        bboxes = list(a.get("bboxes") or [])
        bboxes = (bboxes + [None] * t)[:t]
        areas = a.get("areas")
        if not areas:
            areas = [None] * t
        out_anns.append({
            **a, "segmentations": segs, "bboxes": bboxes,
            "areas": (list(areas) + [None] * t)[:t],
        })
    return {**data, "annotations": out_anns}


def main():
    kind, src, dst = sys.argv[1:4]
    with open(src) as f:
        data = json.load(f)
    if kind == "coco2ytvis2019":
        cats = _load("ytvis_categories_2019.json")
        out = coco_relabel(data, COCO_TO_YTVIS_2019, cats)
    elif kind == "coco2ytvis2021":
        cats = _load("ytvis_categories_2021.json")
        out = coco_relabel(data, COCO_TO_YTVIS_2021, cats)
    elif kind == "coco2ovis":
        cats = _load("ovis_categories.json")
        out = coco_relabel(data, COCO_TO_OVIS, cats)
    elif kind == "cocomerged":
        # COCO json into the merged 101-class taxonomy (identity by name)
        cats = _load("ytvis_coco_categories.json")
        name_to_new = {c["name"]: c["id"] for c in cats}
        old = {c["id"]: c["name"] for c in data["categories"]}
        cmap = {
            oid: name_to_new[n] for oid, n in old.items() if n in name_to_new
        }
        out = coco_relabel(data, cmap, cats)
    elif kind == "ytvis2coco":
        cats = _load("ytvis_coco_categories.json")
        out = ytvis_to_merged_taxonomy(data, cats)
    elif kind == "lvvis2ytvis":
        out = lvvis_to_ytvis(data)
    else:
        raise SystemExit(f"unknown kind {kind!r}")
    with open(dst, "w") as f:
        json.dump(out, f)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
