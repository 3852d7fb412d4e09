"""Offline-tool logic tests: IAOG label generation, caption fallback, image
label table loading, ROI image-level split."""

import json

import numpy as np

from macsa_tpu.tools.generate_captions import PLACEHOLDER, generate
from macsa_tpu.tools.iaog_labels import (
    generate_iaog_labels,
    implicit_aspects,
    load_polarity_lexicon,
)
from macsa_tpu.tools.image_categories import load_label_table
from macsa_tpu.tools.roi_categories import image_level_split


def test_implicit_aspects():
    got = implicit_aspects(["Room#Positive", "Food#Negative"],
                           ["Room#Positive"])
    assert got == ["Food"]
    assert implicit_aspects(["Room#Positive"], ["Room#Positive"]) == []


def test_generate_iaog_labels_with_lexicons(tmp_path):
    records = [{"comment": "phòng sạch và đẹp quá",
                "text_img_label": ["Room#Positive", "Food#Positive"],
                "text_label": ["Food#Positive"]}]
    polarity = {"sạch", "đẹp"}
    adjectives = {"sạch", "đẹp", "quá"}
    out = generate_iaog_labels(records, polarity, adjectives)
    assert out[0]["iaog_labels"] == ["sạch#Room", "đẹp#Room"]

    # pluggable filter mimics the reference's LLM step
    records[0].pop("iaog_labels")
    out = generate_iaog_labels(records, polarity, adjectives,
                               filter_fn=lambda asp, words, text: words[:1])
    assert out[0]["iaog_labels"] == ["sạch#Room"]


def test_polarity_lexicon_loading(tmp_path):
    path = tmp_path / "lex.csv"
    path.write_text("word,pos,neg\nngon,1,0\nbẩn,0,1\nvà,0,0\n")
    lex = load_polarity_lexicon(str(path))
    assert lex == {"ngon", "bẩn"}


def test_caption_placeholder(tmp_path):
    from PIL import Image
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / "a.png")
    out = generate(str(tmp_path), captioner=None)
    assert out == {"a.png": PLACEHOLDER}


def test_image_label_table_formats(tmp_path):
    jpath = tmp_path / "labels.json"
    jpath.write_text(json.dumps({"a.png": ["Room"], "b.png": []}))
    table = load_label_table(str(jpath), ["Location", "Room"])
    assert table[0][0] == "a.png"
    np.testing.assert_array_equal(table[0][1], [0, 1])
    np.testing.assert_array_equal(table[1][1], [0, 0])

    cpath = tmp_path / "labels.csv"
    cpath.write_text("file_name,Location,Room\na.png,1,0\n")
    table = load_label_table(str(cpath), ["Location", "Room"])
    np.testing.assert_array_equal(table[0][1], [1, 0])


def test_roi_image_level_split_no_leak():
    rows = [{"file_name": f"img{i % 5}", "box": (0, 1, 0, 1), "label": "Room"}
            for i in range(20)]
    train, dev, test = image_level_split(rows, seed=1)
    names = lambda rs: {r["file_name"] for r in rs}
    assert not (names(train) & names(dev))
    assert not (names(train) & names(test))
    assert not (names(dev) & names(test))
    assert len(train) + len(dev) + len(test) == 20
