"""Dataset-construction tests: exact tokenization formats vs the reference's
string templates (vimacsa_dataset.py:96-106, iaog_dataset.py:77-96), label
parsing, IAOG grouping/shift semantics, text normalization, loader collation."""

import numpy as np
import pytest

from macsa_tpu.config import ASPECTS
from macsa_tpu.data.iaog import IAOGDataset, build_decoder_ids, group_iaog_labels
from macsa_tpu.data.loader import DataLoader, collate, pad_batch
from macsa_tpu.data.text_preprocess import TextNormalize, convert_unicode
from macsa_tpu.data.vimacsa import (
    MACSADataset,
    build_aspect_views,
    gather_visual_tags,
    parse_labels,
)


class FakeTokenizer:
    """Records call args; emits deterministic ids (hash of chars)."""

    pad_token_id = 1

    def __init__(self):
        self.calls = []

    def __call__(self, text, pair=None, max_length=None, truncation=None,
                 padding=None, return_token_type_ids=False):
        self.calls.append({"text": text, "pair": pair, "max_length": max_length,
                           "truncation": truncation, "padding": padding})
        ids = [ord(c) % 97 + 3 for c in (text + (pair or ""))][: max_length - 1]
        ids = [0] + ids  # bos
        ids = ids + [self.pad_token_id] * (max_length - len(ids))
        out = {"input_ids": ids,
               "attention_mask": [1 if i != self.pad_token_id else 0 for i in ids]}
        if return_token_type_ids:
            out["token_type_ids"] = [0] * max_length
        return out


def test_parse_labels_fills_missing_with_none():
    labels = parse_labels(["Food#Positive", "Room#Negative"])
    assert labels["Food"] == "Positive"
    assert labels["Room"] == "Negative"
    assert labels["Location"] == "None"
    assert labels["Public area"] == "None"  # display-name key


def test_gather_visual_tags_dedup_and_fallback():
    img_tags, roi_tags = gather_visual_tags(
        ["a.png", "b.png", "c.png"],
        {"a.png": ["Food", "Room"], "b.png": ["Food"]},
        {}, num_img=2)
    assert img_tags == ["Food", "Room"]  # c.png beyond num_img, deduped
    assert roi_tags == ["empty"]


def test_aspect_view_format():
    tok = FakeTokenizer()
    views = build_aspect_views("Phòng ốc SẠCH sẽ", ["food", "room"],
                               ["empty"], tok, max_text_len=32, num_patches=7)
    assert views["input_ids"].shape == (6, 32)
    assert views["added_mask"].shape == (6, 32 + 7)
    assert len(tok.calls) == 6
    # the exact reference string templates (vimacsa_dataset.py:96-101)
    assert tok.calls[0]["text"] == "location </s></s> phòng ốc sạch sẽ"
    assert tok.calls[5]["text"] == "public area </s></s> phòng ốc sạch sẽ"
    assert tok.calls[0]["pair"] == " food , room </s></s>  empty"
    assert tok.calls[0]["truncation"] == "only_first"
    assert tok.calls[0]["padding"] == "max_length"
    assert tok.calls[0]["max_length"] == 32


def test_macsa_dataset_end_to_end(tmp_path):
    tok = FakeTokenizer()
    records = [{"comment": "khách sạn tuyệt vời",
                "list_img": ["x.png"],
                "text_img_label": ["Food#Positive"]}]
    ds = MACSADataset(records, tok, str(tmp_path), {}, {}, {}, num_img=2,
                      num_roi=2, max_text_len=16, num_patches=4)
    s = ds[0]
    assert s["input_ids"].shape == (6, 16)
    assert s["labels"].shape == (6,)
    assert s["labels"][ASPECTS.index("Food")] == 3  # Positive
    assert s["labels"][ASPECTS.index("Room")] == 0  # None
    assert s["images"].shape == (2, 224, 224, 3)
    assert s["roi_images"].shape == (2, 2, 224, 224, 3)
    # missing image -> zero tensors (vimacsa_dataset.py:130-135)
    assert np.all(s["images"] == 0)


def test_macsa_dataset_packed_pixels(tmp_path):
    """pixel_mode='packed' (the drivers' default): uint32 frame words whose
    device unpack matches the f32 pipeline, empty slots exact zeros."""
    import jax.numpy as jnp
    from macsa_tpu.ops.image_prep import (packed_words_per_frame,
                                          unpack_normalize_pixels)
    from PIL import Image
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)).save(
        tmp_path / "x.png")
    tok = FakeTokenizer()
    records = [{"comment": "khách sạn tuyệt vời", "list_img": ["x.png"],
                "text_img_label": ["Food#Positive"]}]
    mk = lambda mode: MACSADataset(records, tok, str(tmp_path), {}, {}, {},
                                   num_img=2, num_roi=2, max_text_len=16,
                                   num_patches=4, pixel_mode=mode)
    packed, f32 = mk("packed")[0], mk("f32")[0]
    wpf = packed_words_per_frame(224)
    assert packed["images"].shape == (2, wpf)
    assert packed["images"].dtype == np.uint32
    assert packed["roi_images"].shape == (2, 2, wpf)
    got = np.asarray(unpack_normalize_pixels(
        jnp.asarray(packed["images"]), 224, jnp.float32))
    # frame 0 decodes; frame 1 is the empty slot -> exact zeros
    np.testing.assert_allclose(got[0], f32["images"][0], rtol=1e-6, atol=1e-6)
    assert (got[1] == 0.0).all() and (f32["images"][1] == 0.0).all()


def test_iaog_grouping_and_shift():
    groups = group_iaog_labels(["sạch#Room", "đẹp#Room", "ngon#Food",
                                "sạch#Room", "bad#NotAnAspect"])
    assert groups == {"Room": ["sạch", "đẹp"], "Food": ["ngon"]}

    tok = FakeTokenizer()
    ids, labels = build_decoder_ids("Room", ["sạch", "đẹp"], tok, 8)
    # labels are ids rolled by -1 with -100 at the end/pad slots
    assert labels.shape == (8,)
    assert labels[-1] == -100
    valid = ids != tok.pad_token_id
    np.testing.assert_array_equal(labels[:valid.sum() - 1], ids[1:valid.sum()])
    # sorted join (iaog_dataset.py:53): 'sạch' < 'đẹp' in unicode order
    assert tok.calls[-1]["text"] == "room sạch , đẹp"


def test_iaog_dataset_expansion(tmp_path):
    tok = FakeTokenizer()
    records = [
        {"comment": "abc", "list_img": [],
         "iaog_labels": ["x#Room", "y#Food"]},
        {"comment": "def", "list_img": [], "iaog_labels": []},
    ]
    ds = IAOGDataset(records, tok, str(tmp_path), {}, {}, {}, num_img=2,
                     num_roi=2, max_text_len=16, num_patches=4,
                     max_len_decoder=8)
    assert len(ds) == 2  # 2 aspects from record 0; record 1 filtered out
    s = ds[0]
    assert s["enc_input_ids"].shape == (16,)
    assert s["dec_input_ids"].shape == (8,)
    assert s["labels"].shape == (8,)


def test_text_normalize():
    tn = TextNormalize()
    # golden value verified against the reference implementation
    # (text_preprocess.py:133-156): '@' is stripped by the punct class before
    # the mention regex runs, so 'user' survives
    assert tn.normalize("PHÒNG   đẹppp!!! #hotel @user :)") == "phòng đẹp  user "
    assert tn.normalize("Khách sạn rất TUYỆT vời!!! 😀😀") == "khách sạn rất tuyệt vời "
    assert convert_unicode("ngon") == "ngon"
    # tone repositioning (dormant in reference normalize, available here)
    assert tn.word_standardize("thúy") == "thúy"
    assert tn.word_standardize("qúy") == "quý"


def test_loader_collate_shuffle_cache(tmp_path):
    class TinyDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.int32), "text": f"t{i}"}

    dl = DataLoader(TinyDS(), batch_size=4, shuffle=True, seed=1, cache=True)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["x"].shape == (4, 3)
    assert isinstance(batches[0]["text"], list)
    seen = sorted(int(b["x"][i, 0]) for b in batches for i in range(b["x"].shape[0]))
    assert seen == list(range(10))
    # epoch changes the order
    dl.set_epoch(1)
    order2 = [int(b["x"][i, 0]) for b in dl for i in range(b["x"].shape[0])]
    dl.set_epoch(0)
    order0 = [int(b["x"][i, 0]) for b in dl for i in range(b["x"].shape[0])]
    assert order2 != order0

    padded = pad_batch(batches[-1], 4)
    assert padded["x"].shape == (4, 3)
    assert padded["pad_mask"].sum() == 2


def test_loader_cache_never_retains_pixels():
    """The sample cache must hold LIGHT entries only — float32 pixel tensors
    are ~21 MB/sample at reference shapes (~60 GB/train split if retained;
    VERDICT r1 weak #3).  Pixels are re-fetched per batch until the driver's
    needs_pixels gate reports the feature cache owns the row."""
    decodes = {"n": 0}

    class PixelDS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            decodes["n"] += 1
            return {"images": np.full((2, 4, 4, 3), i, np.float32),
                    "roi_images": np.zeros((2, 2, 4, 4, 3), np.float32),
                    "input_ids": np.asarray([i], np.int32)}

    warm = np.zeros(6, np.bool_)
    dl = DataLoader(PixelDS(), batch_size=3, cache=True, num_workers=2,
                    needs_pixels=lambda i: not warm[i])
    # epoch 0: cold — every batch carries pixels, cache fills with light rows
    for b in dl:
        assert "images" in b and "roi_images" in b
        warm[b["_idx"]] = True  # what featurize() does after scattering
    assert decodes["n"] == 6
    assert all("images" not in s and "roi_images" not in s
               for s in dl._cache.values()), "pixels retained in sample cache"
    # epoch 1: warm — batches are light and nothing is re-decoded
    for b in dl:
        assert "images" not in b and "roi_images" not in b
        assert "input_ids" in b
    assert decodes["n"] == 6
    # mixed batch (one row cold again): pixels reappear for the whole batch
    warm[4] = False
    batches = list(dl)
    assert any("images" in b for b in batches)
    assert all("images" in b
               for b in batches if 4 in b["_idx"].tolist())


def test_loader_host_sharding():
    class TinyDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.asarray([i], np.int32)}

    a = DataLoader(TinyDS(), batch_size=2, num_hosts=2, host_id=0)
    b = DataLoader(TinyDS(), batch_size=2, num_hosts=2, host_id=1)
    xs_a = {int(batch["x"][i, 0]) for batch in a for i in range(2)}
    xs_b = {int(batch["x"][i, 0]) for batch in b for i in range(2)}
    assert xs_a == {0, 1, 2, 3} and xs_b == {4, 5, 6, 7}


def test_loader_eval_stripe_lockstep():
    """Sharded lockstep eval: every host yields the SAME number of full-size
    batches; global step s covers rows [s*G, (s+1)*G); pad slots carry
    `_idx == -1`; real rows are covered exactly once across hosts, in
    global-row order host-major within a step."""
    class TinyDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.asarray([i], np.int32)}

    loaders = [DataLoader(TinyDS(), batch_size=4, num_hosts=2, host_id=h,
                          eval_stripe=True) for h in (0, 1)]
    assert len(loaders[0]) == len(loaders[1]) == 2  # ceil(10 / 8)
    per_host = [list(ld) for ld in loaders]
    seen = []
    for s in range(2):
        for h in (0, 1):
            batch = per_host[h][s]
            assert batch["x"].shape == (4, 1)  # always full-size
            for k in range(4):
                gidx = s * 8 + h * 4 + k
                if gidx < 10:
                    assert batch["_idx"][k] == gidx
                    assert batch["x"][k, 0] == gidx
                    seen.append(gidx)
                else:
                    assert batch["_idx"][k] == -1
    assert seen == list(range(10))


def test_loader_eval_stripe_pixel_gate_is_global():
    """The light-vs-pixels decision must be made over the GLOBAL step rows so
    all hosts agree (a divergent call would desync SPMD featurize): host 1's
    stripe being fully warm must NOT produce a light batch while host 0
    still has a cold row in the same step."""
    class PixDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"images": np.zeros((1, 2, 2, 3), np.float32),
                    "x": np.asarray([i], np.int32)}

    warm = np.ones(8, np.bool_)
    warm[1] = False  # cold row in host 0's stripe of step 0
    batches = list(DataLoader(PixDS(), batch_size=4, num_hosts=2, host_id=1,
                              eval_stripe=True, cache=True,
                              needs_pixels=lambda i: not warm[i]))
    assert "images" in batches[0], "host 1 must ship pixels: step 0 has a " \
        "cold row (on host 0) even though host 1's own stripe is warm"
    warm[1] = True
    batches = list(DataLoader(PixDS(), batch_size=4, num_hosts=2, host_id=1,
                              eval_stripe=True, cache=True,
                              needs_pixels=lambda i: not warm[i]))
    assert "images" not in batches[0]


def test_loader_propagates_worker_exceptions():
    """A failing sample must raise in the consumer, not silently truncate the
    epoch (regression: tokenizer races used to end epochs at 0 steps)."""
    class PoisonDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("poison")
            return {"x": np.asarray([i], np.int32)}

    dl = DataLoader(PoisonDS(), batch_size=2, num_workers=4)
    with pytest.raises(RuntimeError, match="poison"):
        list(dl)


def test_thread_safe_tokenizer_concurrent():
    """ThreadSafeTokenizer serializes/copies a thread-unsafe tokenizer."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from macsa_tpu.data.loader import ThreadSafeTokenizer

    class UnsafeTok:
        """Raises if two threads are inside __call__ at once (the HF fast
        tokenizer 'Already borrowed' failure mode)."""
        pad_token_id = 1

        def __init__(self):
            self._busy = threading.Lock()

        def __call__(self, text, **kw):
            if not self._busy.acquire(blocking=False):
                raise RuntimeError("Already borrowed")
            try:
                import time
                time.sleep(0.001)
                return {"input_ids": [0, len(text), 2]}
            finally:
                self._busy.release()

        def __len__(self):
            return 10

    tok = ThreadSafeTokenizer(UnsafeTok())
    pool = ThreadPoolExecutor(max_workers=8)
    results = list(pool.map(lambda i: tok(f"t{i}"), range(64)))
    assert len(results) == 64
    assert tok.pad_token_id == 1 and len(tok) == 10
