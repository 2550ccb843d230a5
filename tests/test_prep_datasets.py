"""Dataset prep converters."""

import numpy as np

from openvis_tpu.data.catalog import _load
from tools.prep_datasets import (
    COCO_TO_YTVIS_2019,
    coco_relabel,
    lvvis_to_ytvis,
    ytvis_to_merged_taxonomy,
)


def test_coco_relabel():
    cats = _load("ytvis_categories_2019.json")
    data = {
        "images": [{"id": 1}, {"id": 2}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1},   # person -> 1
            {"id": 11, "image_id": 2, "category_id": 90},  # unmapped -> drop
        ],
        "categories": [],
    }
    out = coco_relabel(data, COCO_TO_YTVIS_2019, cats)
    assert len(out["annotations"]) == 1
    assert out["annotations"][0]["category_id"] == COCO_TO_YTVIS_2019[1]
    assert [im["id"] for im in out["images"]] == [1]
    assert len(out["categories"]) == 40


def test_ytvis_to_merged():
    merged = _load("ytvis_coco_categories.json")
    name_to_id = {c["name"]: c["id"] for c in merged}
    data = {
        "videos": [{"id": 1}],
        "annotations": [{"id": 5, "video_id": 1, "category_id": 7}],
        "categories": [{"id": 7, "name": "person"}],
    }
    out = ytvis_to_merged_taxonomy(data, merged)
    assert out["annotations"][0]["category_id"] == name_to_id["person"]
    assert len(out["categories"]) == 101


def test_lvvis_repair():
    data = {
        "videos": [{"id": 1, "length": 4}],
        "annotations": [{
            "id": 1, "video_id": 1, "category_id": 3,
            "segmentations": [None, {"size": [2, 2], "counts": [4]}],
            "bboxes": None,
        }],
        "categories": [],
    }
    out = lvvis_to_ytvis(data)
    a = out["annotations"][0]
    assert len(a["segmentations"]) == 4
    assert len(a["bboxes"]) == 4
    assert len(a["areas"]) == 4
