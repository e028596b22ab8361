"""Dataset/metadata catalogs: register / get / remove / re-register cycle."""

import json

import numpy as np
import pytest

from neuralsim_tpu.detector.catalog import (
    DatasetCatalog,
    Metadata,
    MetadataCatalog,
    register_coco_instances,
)


def test_register_get_remove_cycle():
    cat = DatasetCatalog()
    cat.register("train_dataset", lambda: [{"id": 1}])
    assert cat.get("train_dataset") == [{"id": 1}]
    with pytest.raises(KeyError):
        cat.register("train_dataset", lambda: [])
    # the reference's outer loop pattern: remove then re-register (:758-764)
    cat.remove("train_dataset")
    cat.register("train_dataset", lambda: [{"id": 2}])
    assert cat.get("train_dataset") == [{"id": 2}]
    cat.remove("never_registered")  # no-op, no raise


def test_metadata_write_once():
    md = Metadata("val")
    md.thing_classes = ["a", "b"]
    assert md.thing_classes == ["a", "b"]
    md.thing_classes = ["a", "b"]  # same value ok
    with pytest.raises(AttributeError):
        md.thing_classes = ["c"]
    with pytest.raises(AttributeError):
        _ = md.missing_key


def test_register_coco_instances(tmp_path):
    doc = {
        "images": [{"id": 1, "file_name": "a.png", "height": 10, "width": 12}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 2, "bbox": [1, 2, 3, 4]}
        ],
        "categories": [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}],
    }
    jf = tmp_path / "ann.json"
    jf.write_text(json.dumps(doc))

    ds_cat, md_cat = DatasetCatalog(), MetadataCatalog()
    register_coco_instances("val_dataset", {}, str(jf), str(tmp_path),
                            ds_cat, md_cat)
    dicts = ds_cat.get("val_dataset")
    assert len(dicts) == 1
    ann = dicts[0]["annotations"][0]
    assert ann["bbox"] == [1, 2, 4, 6]  # XYWH -> XYXY
    assert md_cat.get("val_dataset").thing_classes == ["x", "y"]
